"""Chip A/B for the stage-2 grad-accum coalescing lever
(TrainArgs.micro_batch_coalesce; VERDICT r3 #2).

Measures one full accumulation WINDOW both ways, in ONE process,
back-to-back (CLAUDE.md: only same-process A/Bs are valid):

  seq    accum_steps sequential micro-dispatches (the round-3 production
         shape: B=8 micro-batches through the 1B body) + one update
  coal   accum_steps/k coalesced dispatches (k stacked micro-batches ->
         one k*B-row LLM fwd/bwd via caption_loss_grouped) + one update

Both run the identical math (same per-group rotation keys, dropout rngs,
token-mean losses — pinned equal up to summation order by
test_hypernet_e2e.py::test_coalesced_micro_steps_match_sequential); the
delta is pure dispatch/MXU-shape efficiency.  Windows serialize through
the AdamW params chain, so no cross-window overlap inflates the numbers.

Usage: python scripts/profile_coalesce.py [--batch 8] [--seq 128]
       [--subset 128] [--accum 40] [--ks 5,8,10] [--windows 3] [--small]
Prints one JSON object.  Run with the host otherwise idle.
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=128)
    ap.add_argument("--subset", type=int, default=128)
    ap.add_argument("--accum", type=int, default=40)
    ap.add_argument("--ks", type=str, default="5,8")
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.small:
        jax.config.update("jax_platforms", "cpu")

    import optax

    from dmi_tpu.models import hypernet as hn
    from dmi_tpu.models import llama, mmmodel
    from dmi_tpu.models import projector as proj
    from dmi_tpu.training.hypernet_trainer import process_embeddings

    if args.small:
        cfg = llama.tiny_config(vocab_size=512, hidden_size=128, n_layers=2,
                                n_heads=4, n_kv=2, intermediate=256)
        mm_dim, hyp_dim, rank = 32, 32, 4
        args.batch, args.subset, args.seq = 2, 8, 16
        args.accum, args.windows = 4, 2
        args.ks = "2"
    else:
        import dataclasses

        cfg = dataclasses.replace(llama.llama32_1b(), vocab_size=8192)
        mm_dim, hyp_dim, rank = 768, 768, 32

    B, T, accum = args.batch, args.seq, args.accum
    ks = [int(k) for k in args.ks.split(",")]
    pspec = proj.ProjectorSpec(mm_dim=hyp_dim, lm_dim=cfg.hidden_size, n_layers=2)
    pparams = proj.init(jax.random.key(1), pspec)
    hspec = hn.HypnetSpec(
        lm_dim=cfg.hidden_size, mm_dim=mm_dim, n_tokens=args.subset,
        arch="attention", n_heads=4, hypnet_dim=hyp_dim, rank=rank,
        alpha=rank, predict_bias=True, n_proj_layers=2, use_pos_encs=True,
    )
    hparams = hn.init(jax.random.key(2), hspec)
    llm_params = llama.init(jax.random.key(0), cfg)
    opt = optax.adamw(1e-4)
    opt_state0 = opt.init(hparams)

    rng = np.random.default_rng(0)
    mm1 = jnp.asarray(rng.normal(size=(B, mm_dim)).astype(np.float32))
    subset1 = (
        jnp.asarray(rng.normal(size=(args.subset, mm_dim)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(args.subset, mm_dim)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(1, mm_dim)).astype(np.float32)),
    )
    ids1 = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(B, T)), jnp.int32)
    mask1 = jnp.ones((B, T), jnp.int32)
    labels1 = jnp.where(jnp.arange(T)[None] < T // 2, -100, ids1)
    base_key = jax.random.key(7)

    def per_group_soft(hp, pp, mm, subset, step):
        rot_key = jax.random.fold_in(base_key, 2 * step)
        hn_rng = jax.random.fold_in(base_key, 2 * step + 1)
        mm2, z = process_embeddings(
            mm, subset, feed_txt_embs=True, augment=True,
            rotate_key=rot_key, pad_to=None,
        )
        a, b, d = hn.apply(hspec, hp, z, train=True, rng=hn_rng)
        return proj.lora_apply(pspec, pp, mm2, a, b, d)

    @jax.jit
    def micro_seq(accum_g, hp, llm_p, pp, mm, subset, ids, mask, labels, step):
        def loss_fn(hp):
            soft = per_group_soft(hp, pp, mm, subset, step)
            return mmmodel.caption_loss(cfg, llm_p, soft, ids, mask, labels) / accum

        loss, g = jax.value_and_grad(loss_fn)(hp)
        return jax.tree.map(jnp.add, accum_g, g), loss

    @jax.jit
    def micro_coal(accum_g, hp, llm_p, pp, mm_k, subset_k, ids_k, mask_k,
                   labels_k, steps_k):
        def loss_fn(hp):
            soft = jax.vmap(
                lambda mm, sub, st: per_group_soft(hp, pp, mm, sub, st)
            )(mm_k, subset_k, steps_k)
            k, b, h = soft.shape
            losses = mmmodel.caption_loss_grouped(
                cfg, llm_p, soft.reshape(k * b, h),
                ids_k.reshape(k * b, -1), mask_k.reshape(k * b, -1),
                labels_k.reshape(k * b, -1), k,
            )
            return jnp.sum(losses) / accum

        loss, g = jax.value_and_grad(loss_fn)(hp)
        return jax.tree.map(jnp.add, accum_g, g), loss

    @jax.jit
    def update(hp, opt_state, accum_g):
        updates, opt_state = opt.update(accum_g, opt_state, hp)
        hp = optax.apply_updates(hp, updates)
        return hp, opt_state, jax.tree.map(jnp.zeros_like, accum_g)

    def stack_k(k):
        mm_k = jnp.tile(mm1[None], (k, 1, 1))
        subset_k = tuple(jnp.tile(s[None], (k, 1, 1)) for s in subset1)
        ids_k = jnp.tile(ids1[None], (k, 1, 1))
        mask_k = jnp.tile(mask1[None], (k, 1, 1))
        labels_k = jnp.tile(labels1[None], (k, 1, 1))
        return mm_k, subset_k, ids_k, mask_k, labels_k

    def run_seq(n_windows):
        hp, opt_state = hparams, opt_state0
        accum_g = jax.tree.map(jnp.zeros_like, hparams)
        loss = None
        for w in range(n_windows):
            for s in range(accum):
                accum_g, loss = micro_seq(
                    accum_g, hp, llm_params, pparams, mm1, subset1,
                    ids1, mask1, labels1, w * accum + s,
                )
            hp, opt_state, accum_g = update(hp, opt_state, accum_g)
        return loss, hp

    def run_coal(k, n_windows):
        mm_k, subset_k, ids_k, mask_k, labels_k = stack_k(k)
        hp, opt_state = hparams, opt_state0
        accum_g = jax.tree.map(jnp.zeros_like, hparams)
        loss = None
        for w in range(n_windows):
            for c in range(accum // k):
                steps = jnp.arange(w * accum + c * k, w * accum + (c + 1) * k,
                                   dtype=jnp.int32)
                accum_g, loss = micro_coal(
                    accum_g, hp, llm_params, pparams, mm_k, subset_k,
                    ids_k, mask_k, labels_k, steps,
                )
            hp, opt_state, accum_g = update(hp, opt_state, accum_g)
        return loss, hp

    def measure(fn):
        loss, hp = fn(1)  # compile + warm
        _ = np.asarray(loss)
        t0 = time.perf_counter()
        loss, hp = fn(args.windows)
        _ = np.asarray(loss)  # host transfer = completion on the relay
        dt = time.perf_counter() - t0
        return dt

    out = {"accum": accum, "batch": B, "seq": T, "windows": args.windows}
    dt_seq = measure(run_seq)
    out["seq_s_per_window"] = round(dt_seq / args.windows, 4)
    out["seq_samples_per_sec"] = round(B * accum * args.windows / dt_seq, 2)
    print(json.dumps(out), flush=True)  # partial, in case a k OOMs
    for k in ks:
        if accum % k:
            out[f"coal{k}"] = "skipped (accum % k != 0)"
            continue
        try:
            dt = measure(lambda n, k=k: run_coal(k, n))
        except Exception as e:  # RESOURCE_EXHAUSTED at compile: the k*B-row
            # fwd/bwd's [k*B*T, V] logits+grads don't fit; record and move on
            msg = str(e)
            out[f"coal{k}"] = ("oom" if "memory" in msg.lower()
                               or "RESOURCE_EXHAUSTED" in msg else
                               f"error: {msg[:160]}")
            print(json.dumps(out), flush=True)
            continue
        out[f"coal{k}_s_per_window"] = round(dt / args.windows, 4)
        out[f"coal{k}_samples_per_sec"] = round(B * accum * args.windows / dt, 2)
        out[f"coal{k}_speedup"] = round(dt_seq / dt, 3)
        print(json.dumps(out), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
