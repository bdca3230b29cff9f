"""Stage-2 (hypernet) micro-step decomposition: where do the 5 MFU points
vs stage-1 go?  (VERDICT r2 weak #4 / next-round #8.)

Stage-2 measured 63% MFU (smoke_stage2_chip) vs stage-1's 68%
(profile_train_step) — this ablates the micro-step into its parts, each
inside ONE jitted fori_loop with chained dependencies (CLAUDE.md round-2
lessons: isolated single-op loops under-report ~6x; trust only in-loop
deltas measured back-to-back in one process):

  full      the production micro: rotation + conditioning + hypernet +
            LoRA emission + frozen-LLM fwd/bwd, grads w.r.t. hparams
  noaug     augment=False — delta = the QR-Haar rotation share
  chain     everything EXCEPT the LLM (process_embeddings -> hn.apply ->
            lora_apply -> sum(soft^2)), grads w.r.t. hparams
  llm       the frozen-LLM fwd/bwd alone, grads w.r.t. the soft tokens
            (the stage-1-shaped core at stage-2's B/T)
  llm_s1    the same LLM fwd/bwd at stage-1's bench shape (B=64, T=48) —
            isolates the tokens-per-dispatch effect from the machinery

NOTE: an earlier draft wrapped value_and_grad inside a fori_loop (the
microbench discipline for tiny ops); the 1B fwd+bwd grad graph inside a
loop reproducibly crashes the local compile helper ("Broken pipe" at
~30 min, twice).  The production trainers (and smoke_stage2_chip, which
compiled fine) jit ONE micro-step and Python-loop it, syncing once per
measurement — so this profiler does the same: per variant, one jitted
micro-step, n chained dispatches (each step's input depends on the
previous step's loss so nothing is DCE'd or reordered), one host fetch.
Per-dispatch overhead is identical across variants and cancels in the
deltas; only back-to-back same-process deltas are quoted.

SECOND helper-killer (measured): closing a jit over the 1B param pytree
embeds ~5 GB of f32 literals in the lowered module (tiny-config lowering:
2.97 MB closure vs 84 KB arg — 35x) and the serialized-HLO POST to the
one-core compile helper dies with the same Broken pipe.  Every step here
takes ALL large pytrees (llm, projector, hypernet params) as explicit
jit arguments, matching the production trainers.

Usage: python scripts/profile_stage2.py [--batch 8] [--seq 128]
       [--subset 128] [--inner 4] [--small]
Prints one JSON object.  Run with the host otherwise idle.
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def timeit(fn, n=3, warmup=1):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=128)
    ap.add_argument("--subset", type=int, default=128)
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.small:
        jax.config.update("jax_platforms", "cpu")

    from dmi_tpu.models import hypernet as hn
    from dmi_tpu.models import llama, mmmodel
    from dmi_tpu.models import projector as proj
    from dmi_tpu.training.hypernet_trainer import process_embeddings

    if args.small:
        cfg = llama.tiny_config(vocab_size=512, hidden_size=128, n_layers=2,
                                n_heads=4, n_kv=2, intermediate=256)
        mm_dim, hyp_dim, rank = 32, 32, 4
        args.batch, args.subset, args.seq, args.inner = 2, 8, 16, 2
    else:
        import dataclasses

        cfg = dataclasses.replace(llama.llama32_1b(), vocab_size=8192)
        mm_dim, hyp_dim, rank = 768, 768, 32

    B, T, inner = args.batch, args.seq, args.inner
    pspec = proj.ProjectorSpec(mm_dim=hyp_dim, lm_dim=cfg.hidden_size,
                               n_layers=2)
    pparams = proj.init(jax.random.key(1), pspec)
    hspec = hn.HypnetSpec(
        lm_dim=cfg.hidden_size, mm_dim=mm_dim, n_tokens=args.subset,
        arch="attention", n_heads=4, hypnet_dim=hyp_dim, rank=rank,
        alpha=rank, predict_bias=True, n_proj_layers=2, use_pos_encs=True,
    )
    hparams = hn.init(jax.random.key(2), hspec)
    llm_params = llama.init(jax.random.key(0), cfg)

    rng = np.random.default_rng(0)
    mm = jnp.asarray(rng.normal(size=(B, mm_dim)).astype(np.float32))
    subset = (
        jnp.asarray(rng.normal(size=(args.subset, mm_dim)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(args.subset, mm_dim)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(1, mm_dim)).astype(np.float32)),
    )
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(B, T)), jnp.int32)
    mask = jnp.ones((B, T), jnp.int32)
    labels = jnp.where(jnp.arange(T)[None] < T // 2, -100, ids)
    key = jax.random.key(7)

    def stage2_loss(hp, llm_p, pp, mm_in, rot_key, hn_rng, augment):
        mm2, z = process_embeddings(
            mm_in, subset, feed_txt_embs=True, augment=augment,
            rotate_key=rot_key, pad_to=None,
        )
        a, b, d = hn.apply(hspec, hp, z, train=True, rng=hn_rng)
        soft = proj.lora_apply(pspec, pp, mm2, a, b, d)
        return mmmodel.caption_loss(cfg, llm_p, soft, ids, mask, labels)

    def chain_loss(hp, pp, mm_in, rot_key, hn_rng):
        mm2, z = process_embeddings(
            mm_in, subset, feed_txt_embs=True, augment=True,
            rotate_key=rot_key, pad_to=None,
        )
        a, b, d = hn.apply(hspec, hp, z, train=True, rng=hn_rng)
        soft = proj.lora_apply(pspec, pp, mm2, a, b, d)
        return jnp.sum(soft * soft)

    # single-micro-step jits (production dispatch pattern; see NOTEs above):
    # each returns (chained_input, loss) — the caller feeds chained_input
    # into the next dispatch so successive steps stay data-dependent.  ALL
    # large pytrees are explicit jit args (closure => embedded literals).
    def make_grad_step(loss, aug):
        @jax.jit
        def step(w, llm_p, pp, mm_in, i):
            rot = jax.random.fold_in(key, 2 * i)
            hrng = jax.random.fold_in(key, 2 * i + 1)
            l, g = jax.value_and_grad(loss)(w, llm_p, pp, mm_in, rot, hrng,
                                            aug)
            gsum = sum(jnp.sum(x) for x in jax.tree.leaves(g))
            return mm_in * (1 + (l + gsum) * 1e-12), l

        return step

    step_full = make_grad_step(stage2_loss, True)
    step_noaug = make_grad_step(stage2_loss, False)

    @jax.jit
    def step_chain(hp, pp, mm_in, i):
        rot = jax.random.fold_in(key, 2 * i)
        hrng = jax.random.fold_in(key, 2 * i + 1)
        l, g = jax.value_and_grad(chain_loss)(hp, pp, mm_in, rot, hrng)
        gsum = sum(jnp.sum(x) for x in jax.tree.leaves(g))
        return mm_in * (1 + (l + gsum) * 1e-12), l

    def make_llm_step(ids_l, mask_l, labels_l):
        B_l = ids_l.shape[0]

        def llm_loss(soft, llm_p):
            return mmmodel.caption_loss(cfg, llm_p, soft, ids_l, mask_l,
                                        labels_l)

        @jax.jit
        def step(llm_p, soft, i):
            l, g = jax.value_and_grad(llm_loss)(soft, llm_p)
            return soft * (1 + (l + jnp.sum(g)) * 1e-12), l

        return step, jnp.asarray(
            np.random.default_rng(3).normal(size=(B_l, cfg.hidden_size))
            .astype(np.float32)
        )

    step_llm, soft0 = make_llm_step(ids, mask, labels)
    B1, T1 = (64, 48) if not args.small else (4, 8)
    ids1 = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(B1, T1)),
                       jnp.int32)
    labels1 = jnp.where(jnp.arange(T1)[None] < T1 // 2, -100, ids1)
    step_llm_s1, soft1 = make_llm_step(ids1, jnp.ones((B1, T1), jnp.int32),
                                       labels1)

    def run_steps(step, x0, *weights):
        """n chained dispatches, ONE host fetch at the end."""
        x, l = x0, None
        for i in range(inner):
            x, l = step(*weights, x, i)
        return float(l)

    res = {}
    res["full_ms"] = round(timeit(
        lambda: run_steps(step_full, mm, hparams, llm_params, pparams))
        / inner, 2)
    res["noaug_ms"] = round(timeit(
        lambda: run_steps(step_noaug, mm, hparams, llm_params, pparams))
        / inner, 2)
    res["chain_ms"] = round(timeit(
        lambda: run_steps(step_chain, mm, hparams, pparams)) / inner, 2)
    res["llm_ms"] = round(timeit(
        lambda: run_steps(step_llm, soft0, llm_params)) / inner, 2)
    res["llm_s1_ms"] = round(timeit(
        lambda: run_steps(step_llm_s1, soft1, llm_params)) / inner, 2)
    # re-measure full for drift control (only back-to-back deltas count)
    res["full2_ms"] = round(timeit(
        lambda: run_steps(step_full, mm, hparams, llm_params, pparams))
        / inner, 2)

    res["rotation_ms"] = round(res["full_ms"] - res["noaug_ms"], 2)
    res["machinery_ms"] = round(res["full_ms"] - res["llm_ms"], 2)
    res["additivity_gap_ms"] = round(
        res["full_ms"] - res["llm_ms"] - res["chain_ms"], 2
    )
    # per-token LLM throughput: does stage-2's B/T shape underfill the MXU
    # relative to stage-1's bench shape?
    ntok, ntok1 = B * T, B1 * T1
    res["llm_us_per_tok"] = round(res["llm_ms"] * 1e3 / ntok, 2)
    res["llm_s1_us_per_tok"] = round(res["llm_s1_ms"] * 1e3 / ntok1, 2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
