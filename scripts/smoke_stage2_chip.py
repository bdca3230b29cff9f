"""Production-scale stage-2 (hypernet) hot-loop smoke on the real chip.

VERDICT r1 item 8: the projector pipeline ran at production scale on
hardware; this does the same for the stage-2 hypernet hot loop
(reference: dmi/train_hypernet.py:110-164) and records samples/s + MFU:

  * 1B-dim frozen Llama body (random weights — identical compute graph)
  * conditioning set of subset_batch_size=128 (v4 config value)
  * on-device QR-Haar orthogonal augmentation of mm + subset embeddings
  * hypernet (attention arch, 768-dim, rank 32) -> per-sample LoRA on the
    frozen projector -> soft token -> frozen-LLM loss -> AdamW over
    hypernet params, grad-accum 40 micro-steps per update

Usage: python scripts/smoke_stage2_chip.py [--updates 2] [--batch 8]
(v4 trains micro-batch 8 x accum 40; DMI_SMOKE_SMALL=1 for a CPU run)
Prints one JSON line; append to BASELINE.md by hand or via --baseline.
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--updates", type=int, default=2)
    ap.add_argument("--accum", type=int, default=40)
    ap.add_argument("--batch", type=int, default=8)  # v4 train_batch_size
    ap.add_argument("--seq", type=int, default=128)
    ap.add_argument("--subset", type=int, default=128)  # v4 subset_batch_size
    ap.add_argument("--baseline", action="store_true",
                    help="append the measured row to BASELINE.md")
    args = ap.parse_args()

    small = os.environ.get("DMI_SMOKE_SMALL") == "1"

    import jax
    import jax.numpy as jnp
    import optax

    if small:
        jax.config.update("jax_platforms", "cpu")

    from dmi_tpu.models import hypernet as hn
    from dmi_tpu.models import llama, mmmodel
    from dmi_tpu.models import projector as proj
    from dmi_tpu.training.hypernet_trainer import TrainState, process_embeddings
    

    if small:
        cfg = llama.tiny_config(vocab_size=512, hidden_size=128, n_layers=2,
                                n_heads=4, n_kv=2, intermediate=256)
        mm_dim, hyp_dim, rank = 32, 32, 4
        args.batch, args.accum, args.subset, args.seq = 2, 3, 8, 16
    else:
        import dataclasses

        cfg = dataclasses.replace(llama.llama32_1b(), vocab_size=8192)
        mm_dim, hyp_dim, rank = 768, 768, 32

    pspec = proj.ProjectorSpec(mm_dim=hyp_dim, lm_dim=cfg.hidden_size, n_layers=2)
    pparams = proj.init(jax.random.key(1), pspec)
    hspec = hn.HypnetSpec(
        lm_dim=cfg.hidden_size, mm_dim=mm_dim, n_tokens=args.subset,
        arch="attention", n_heads=4, hypnet_dim=hyp_dim, rank=rank, alpha=rank,
        predict_bias=True, n_proj_layers=2, use_pos_encs=True,
    )
    hparams = hn.init(jax.random.key(2), hspec)
    llm_params = llama.init(jax.random.key(0), cfg)
    opt = optax.adamw(1e-4)

    def loss_fn(hp, llm_p, mm, subset, ids, mask, labels, rot_key, hn_rng):
        mm2, z = process_embeddings(
            mm, subset, feed_txt_embs=True, augment=True,
            rotate_key=rot_key, pad_to=None,
        )
        a, b, d = hn.apply(hspec, hp, z, train=True, rng=hn_rng)
        soft = proj.lora_apply(pspec, pparams, mm2, a, b, d)
        return mmmodel.caption_loss(cfg, llm_p, soft, ids, mask, labels)

    accum_steps = args.accum

    @jax.jit
    def micro(state, llm_p, mm, subset, ids, mask, labels, rot_key, hn_rng, do_upd):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, llm_p, mm, subset, ids, mask, labels, rot_key, hn_rng
        )
        grads = jax.tree.map(lambda g: g / accum_steps, grads)
        accum = jax.tree.map(jnp.add, state.accum, grads)

        def upd(_):
            updates, o = opt.update(accum, state.opt_state, state.params)
            p = jax.tree.map(jnp.add, state.params, updates)
            return TrainState(p, o, jax.tree.map(jnp.zeros_like, accum),
                              state.sched_step + 1)

        def keep(_):
            return state._replace(accum=accum)

        return jax.lax.cond(do_upd, upd, keep, None), loss / accum_steps

    state = TrainState(
        hparams, opt.init(hparams), jax.tree.map(jnp.zeros_like, hparams),
        jnp.asarray(0, jnp.int32),
    )

    rng = np.random.default_rng(0)
    B, T = args.batch, args.seq
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

    def one_update(state, base):
        for m in range(accum_steps):
            rot = jax.random.fold_in(key, 2 * (base + m))
            hrng = jax.random.fold_in(key, 2 * (base + m) + 1)
            state, loss = micro(
                state, llm_params, mm, subset, ids, mask, labels, rot, hrng,
                m == accum_steps - 1,
            )
        return state, loss

    state, loss = one_update(state, 0)  # compile + warm
    _ = float(loss)
    t0 = time.perf_counter()
    for u in range(args.updates):
        state, loss = one_update(state, (u + 1) * accum_steps)
    _ = float(loss)
    dt = time.perf_counter() - t0

    micro_steps = args.updates * accum_steps
    samples = micro_steps * B
    samples_per_s = samples / dt
    # per-sample FLOPs: fwd+bwd through the frozen body = ~3 passes of
    # 2*P_body*T (grads w.r.t. inputs_embeds needed for the projector chain)
    p_body = (
        cfg.num_hidden_layers
        * (
            cfg.hidden_size * (cfg.num_attention_heads + 2 * cfg.num_key_value_heads)
            * cfg.head_dim
            + cfg.num_attention_heads * cfg.head_dim * cfg.hidden_size
            + 3 * cfg.hidden_size * cfg.intermediate_size
        )
    )
    flops_per_sample = 3 * 2 * p_body * (T + 1)
    tflops = samples_per_s * flops_per_sample / 1e12
    out = {
        "metric": "stage2_hypernet_samples_per_sec_per_chip_1b"
        + ("_small" if small else ""),
        "value": round(samples_per_s, 2),
        "unit": "samples/s/chip",
        "micro_batch": B,
        "grad_accum": accum_steps,
        "subset": args.subset,
        "seq": T,
        "est_tflops_per_s": round(tflops, 1),
        "est_mfu_vs_197tf": round(tflops / 197.0, 3),
        "final_loss": round(float(loss), 4),
    }
    print(json.dumps(out))
    if args.baseline:
        repo = osp.dirname(osp.dirname(osp.abspath(__file__)))
        with open(osp.join(repo, "BASELINE.md"), "a") as f:
            f.write(
                f"\n- stage-2 hypernet chip smoke: {out['value']} samples/s/chip "
                f"(micro-batch {B} x accum {accum_steps}, subset {args.subset}, "
                f"seq {T}, ~{out['est_tflops_per_s']} TFLOP/s, "
                f"MFU~{out['est_mfu_vs_197tf']}), loss {out['final_loss']}\n"
            )


if __name__ == "__main__":
    main()
