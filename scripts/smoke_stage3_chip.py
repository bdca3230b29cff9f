"""Production-scale stage-3 (few-shot integration) smoke on the real chip.

Completes the hardware-validation trilogy (stage 1: round-1 projector
pipeline; stage 2: smoke_stage2_chip.py): the few-shot flow of
dmi/train_hypernet.py:168-295 at 1B-body scale —

  * hypernet emits LoRA adapters for N independent conditioning-subset
    draws of the unseen modality (v6: subset 128, n_draws averaging)
  * adapters are averaged and baked into a concrete projector
    (combine_lora)
  * the generated projector is fine-tuned on the few-shot set (32 paired
    samples, micro-batch 8) with fwd+bwd through the frozen 1B body

Reports one-off emission+bake latency and the finetune samples/s.

Usage: python scripts/smoke_stage3_chip.py [--steps 10] [--draws 4]
(DMI_SMOKE_SMALL=1 for a CPU run; --baseline appends to BASELINE.md)
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
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--draws", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=48)
    ap.add_argument("--subset", type=int, default=128)
    ap.add_argument("--baseline", action="store_true")
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
    from dmi_tpu.training.hypernet_trainer import process_embeddings

    if small:
        cfg = llama.tiny_config(vocab_size=512, hidden_size=128, n_layers=2,
                                n_heads=4, n_kv=2, intermediate=256)
        mm_dim, hyp_dim, rank = 32, 32, 4
        args.batch, args.subset, args.seq, args.steps, args.draws = 2, 8, 16, 2, 2
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

    rng = np.random.default_rng(0)

    # ---- adapter emission over independent subset draws + averaging -----
    @jax.jit
    def emit(hp, subset_mm, subset_txt, mean_txt):
        _, z = process_embeddings(
            jnp.zeros((1, mm_dim)), (subset_mm, subset_txt, mean_txt),
            feed_txt_embs=True, augment=False, rotate_key=None, pad_to=None,
        )
        return hn.apply(hspec, hp, z, train=False, rng=None)

    t0 = time.perf_counter()
    adapters = []
    for d in range(args.draws):
        sub_mm = jnp.asarray(rng.normal(size=(args.subset, mm_dim)).astype(np.float32))
        sub_txt = jnp.asarray(rng.normal(size=(args.subset, mm_dim)).astype(np.float32))
        mean_txt = jnp.asarray(rng.normal(size=(1, mm_dim)).astype(np.float32))
        adapters.append(emit(hparams, sub_mm, sub_txt, mean_txt))
    avg = hn.average_adapters(adapters)
    a, b, dd = avg
    gen_proj = proj.combine_lora(pspec, pparams, a, b, dd)
    # force completion through a host transfer before stopping the clock
    # (block_until_ready returns early on the relay), then re-device
    gen_proj = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), gen_proj)
    emit_s = time.perf_counter() - t0

    # ---- generated-projector finetune (the stage-3 hot loop) ------------
    opt = optax.adamw(1e-4)
    opt_state = opt.init(gen_proj)

    def loss_fn(p, llm_p, mm, ids, mask, labels):
        soft = proj.apply(pspec, p, mm, train=False)
        return mmmodel.caption_loss(cfg, llm_p, soft, ids, mask, labels)

    @jax.jit
    def step(p, s, llm_p, mm, ids, mask, labels):
        loss, g = jax.value_and_grad(loss_fn)(p, llm_p, mm, ids, mask, labels)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s, loss

    B, T = args.batch, args.seq
    mm = jnp.asarray(rng.normal(size=(B, hyp_dim)).astype(np.float32))
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(B, T)), jnp.int32)
    mask = jnp.ones((B, T), jnp.int32)
    labels = jnp.where(jnp.arange(T)[None] < T // 2, -100, ids)

    gen_proj, opt_state, loss = step(gen_proj, opt_state, llm_params, mm, ids, mask, labels)
    loss0 = float(loss)  # compile + force
    t0 = time.perf_counter()
    for _ in range(args.steps):
        gen_proj, opt_state, loss = step(gen_proj, opt_state, llm_params, mm, ids, mask, labels)
    lossN = float(loss)  # one sync at the end (production-trainer style)
    dt = time.perf_counter() - t0

    out = {
        "metric": "stage3_fewshot_samples_per_sec_per_chip_1b"
        + ("_small" if small else ""),
        "value": round(args.steps * B / dt, 2),
        "unit": "samples/s/chip",
        "emit_avg_bake_s": round(emit_s, 2),
        "draws": args.draws,
        "subset": args.subset,
        "micro_batch": B,
        "seq": T,
        "loss_first_to_last": [round(loss0, 4), round(lossN, 4)],
    }
    print(json.dumps(out))
    if args.baseline:
        with open(osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                           "BASELINE.md"), "a") as f:
            f.write(
                f"\n- stage-3 fewshot chip smoke: {out['value']} samples/s/chip "
                f"finetune (micro-batch {B}, seq {T}); adapter emission x"
                f"{args.draws} draws + averaging + combine_lora = "
                f"{out['emit_avg_bake_s']}s one-off; loss "
                f"{out['loss_first_to_last'][0]} -> {out['loss_first_to_last'][1]}\n"
            )


if __name__ == "__main__":
    main()
