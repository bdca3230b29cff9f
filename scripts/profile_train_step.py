"""Train-step decomposition: is the frozen-LLM backward paying for
weight gradients it doesn't need?

The stage-1/3 hot loop diffs ONLY the projector; the 1B Llama body is
frozen.  The VJP of x@W w.r.t. x needs just g@W^T — if XLA dead-code
eliminates the (unused) weight-cotangent matmuls, backward ~= 1x forward
FLOPs and the step ceiling is ~2x forward.  This times, at the bench
shape (B=64, seq 48), inside one jitted fori_loop each:

  fwd        caption_loss only
  grad       value_and_grad w.r.t. projector params (the bench step, no opt)
  grad_rm    same with jax.checkpoint over the LLM scan body if enabled

and prints the grad/fwd ratio.  Ratio ~2 => weight-grad matmuls are
eliminated; ~3 => they are not (or remat is recomputing the forward).

Usage: python scripts/profile_train_step.py [--batch 64] [--seq 48] [--small]
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import statistics
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def timeit(fn, n=5, warmup=2):
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq", type=int, default=48)
    ap.add_argument("--inner", type=int, default=5)
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.small:
        jax.config.update("jax_platforms", "cpu")
        args.batch, args.inner = 4, 2

    from dmi_tpu.models import llama, mmmodel
    from dmi_tpu.models import projector as proj

    if args.small:
        cfg = llama.tiny_config(vocab_size=512, hidden_size=128, n_layers=4,
                                n_heads=8, n_kv=4, intermediate=256)
        mm_dim = 64
    else:
        cfg = llama.llama32_1b()
        mm_dim = 1024

    B, T = args.batch, args.seq
    llm_params = llama.init(jax.random.key(0), cfg)
    pspec = proj.ProjectorSpec(mm_dim=mm_dim, lm_dim=cfg.hidden_size, n_layers=2)
    pparams = proj.init(jax.random.key(1), pspec)

    rng = np.random.default_rng(0)
    embs = jnp.asarray(rng.normal(size=(B, mm_dim)).astype(np.float32))
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(B, T)), jnp.int32)
    mask = jnp.ones((B, T), jnp.int32)
    labels = jnp.where(jnp.arange(T)[None] < T // 2, -100, ids)

    def loss_fn(p, llm_p, embs):
        soft = proj.apply(pspec, p, embs, train=False)
        return mmmodel.caption_loss(cfg, llm_p, soft, ids, mask, labels)

    results = {}

    @jax.jit
    def run_fwd(p, llm_p, embs):
        def body(i, carry):
            e, acc = carry
            loss = loss_fn(p, llm_p, e)
            # loss feeds the next iteration's inputs: no collapse
            return e * (1 + loss * 1e-12), acc + loss

        return jax.lax.fori_loop(0, args.inner, body, (embs, 0.0))[1]

    @jax.jit
    def run_grad(p, llm_p, embs):
        def body(i, carry):
            e, acc = carry
            loss, g = jax.value_and_grad(loss_fn)(p, llm_p, e)
            gsum = sum(jnp.sum(x) for x in jax.tree.leaves(g))
            return e * (1 + (loss + gsum) * 1e-12), acc + loss

        return jax.lax.fori_loop(0, args.inner, body, (embs, 0.0))[1]

    results["fwd_ms"] = round(
        timeit(lambda: float(run_fwd(pparams, llm_params, embs))) / args.inner, 2
    )
    results["grad_ms"] = round(
        timeit(lambda: float(run_grad(pparams, llm_params, embs))) / args.inner, 2
    )
    results["grad_over_fwd"] = round(results["grad_ms"] / results["fwd_ms"], 3)
    ntok = B * T
    body_params = sum(
        x.size for k, v in llm_params["layers"].items() for x in [v]
    ) + llm_params["final_norm"].size
    results["fwd_tflops_per_s"] = round(
        2 * body_params * ntok / (results["fwd_ms"] * 1e-3) / 1e12, 1
    )
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
