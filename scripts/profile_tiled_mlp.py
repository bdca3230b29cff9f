"""Settle DMI_PALLAS_TILED_MLP in-loop (VERDICT r2 weak #3 / next-round #7).

The column-tiled fused MLP2 kernel's only default-shape consumer is the
serving pipeline's projector prefill: f32 [256,1024]x[1024,2048]x[2048,2048]
(bench.py/serve.py shapes), which exceeds the single-block VMEM budget and
dispatches to the tiled kernel (default-on since round 3; this script's
measurement is what promoted it — DMI_PALLAS_TILED_MLP=0 opts out).
Standalone the tiled kernel re-measured 1.2x over the twin (commit
2e902be), but a once-per-batch prefill op inside a 22-token decode loop
may be invisible end-to-end.  This measures, in ONE process back to back
(CLAUDE.md: only same-process A/Bs are valid):

  noproj_ms   caption_generate on precomputed soft tokens (projector share
              baseline)
  xla_ms      full pipeline, tiled OFF (today's default: XLA twin)
  tiled_ms    full pipeline, tiled ON
  projloop_{xla,tiled}_ms  pure projector fori-loop with chained deps at
              the same shape (the standalone 1.2x claim, re-checked
              in-process)

Env-at-trace-time hazard: fused_mlp2 reads DMI_PALLAS_TILED_MLP when
TRACED, so each variant gets its own jit wrapper (distinct function
object => distinct trace) with the env set before its first call.

Usage: python scripts/profile_tiled_mlp.py [--small]
Prints one JSON object.  Run with the host otherwise idle.
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import statistics
import sys
import time

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
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--new-tokens", type=int, default=22)
    ap.add_argument("--inner", type=int, default=32,
                    help="projector fori-loop iterations per dispatch")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.small:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses
    from functools import partial

    from dmi_tpu.models import llama, mmmodel
    from dmi_tpu.models import projector as proj

    if args.small:
        cfg = llama.tiny_config(vocab_size=512, hidden_size=128, n_layers=2,
                                n_heads=4, n_kv=2, intermediate=256)
        mm_dim = 64
        args.batch, args.new_tokens, args.inner = 8, 4, 2
    else:
        cfg = llama.llama32_1b()
        mm_dim = 1024
    cfg = dataclasses.replace(cfg, eos_token_ids=())

    B, max_new, prefix_len = args.batch, args.new_tokens, 15
    llm_params = llama.fuse_projections(llama.init(jax.random.key(0), cfg))
    pspec = proj.ProjectorSpec(mm_dim=mm_dim, lm_dim=cfg.hidden_size,
                               n_layers=2)
    pparams = proj.init(jax.random.key(1), pspec)  # f32: the tiled shape

    rng = np.random.default_rng(0)
    embs = jnp.asarray(rng.normal(size=(B, mm_dim)).astype(np.float32))
    prefix = jnp.asarray(
        rng.integers(1, cfg.vocab_size, size=(B, prefix_len)), jnp.int32)

    def pipeline_body(pp, lp, e, pre):
        soft = proj.apply(pspec, pp, e, train=False)
        return mmmodel.caption_generate(cfg, lp, soft, pre, max_new, 0,
                                        batch_first=False)

    # distinct function objects => distinct traces under the env flag
    os.environ["DMI_PALLAS_TILED_MLP"] = "0"

    @jax.jit
    def pipe_xla(pp, lp, e, pre):
        return pipeline_body(pp, lp, e, pre)

    @jax.jit
    def pipe_noproj(lp, soft, pre):
        return mmmodel.caption_generate(cfg, lp, soft, pre, max_new, 0,
                                        batch_first=False)

    @partial(jax.jit, static_argnames=())
    def projloop_xla(pp, e):
        def body(i, x):
            y = proj.apply(pspec, pp, x, train=False)
            # chain: next input depends on a FULL reduction of the output
            # (prevents loop-invariant hoisting and dot slicing)
            return x * (1 + jnp.sum(y) * 1e-12)
        return jax.lax.fori_loop(0, args.inner, body, e)

    soft_pre = proj.apply(pspec, pparams, embs, train=False)
    soft_pre = jax.block_until_ready(soft_pre)

    res = {}

    def run_pipe(fn, *a):
        return np.asarray(fn(*a))

    res["xla_ms"] = round(timeit(lambda: run_pipe(
        pipe_xla, pparams, llm_params, embs, prefix)), 1)
    res["noproj_ms"] = round(timeit(lambda: run_pipe(
        pipe_noproj, llm_params, soft_pre, prefix)), 1)
    res["projloop_xla_ms"] = round(timeit(lambda: float(jnp.sum(
        projloop_xla(pparams, embs)))) / args.inner, 3)

    os.environ["DMI_PALLAS_TILED_MLP"] = "1"

    @jax.jit
    def pipe_tiled(pp, lp, e, pre):
        return pipeline_body(pp, lp, e, pre)

    @jax.jit
    def projloop_tiled(pp, e):
        def body(i, x):
            y = proj.apply(pspec, pp, x, train=False)
            return x * (1 + jnp.sum(y) * 1e-12)
        return jax.lax.fori_loop(0, args.inner, body, e)

    res["tiled_ms"] = round(timeit(lambda: run_pipe(
        pipe_tiled, pparams, llm_params, embs, prefix)), 1)
    res["projloop_tiled_ms"] = round(timeit(lambda: float(jnp.sum(
        projloop_tiled(pparams, embs)))) / args.inner, 3)
    # drift control: re-measure the xla pipeline (only b2b deltas count)
    res["xla2_ms"] = round(timeit(lambda: run_pipe(
        pipe_xla, pparams, llm_params, embs, prefix)), 1)

    res["proj_share_ms"] = round(res["xla_ms"] - res["noproj_ms"], 1)
    res["tiled_delta_ms"] = round(res["xla_ms"] - res["tiled_ms"], 1)
    res["projloop_speedup"] = round(
        res["projloop_xla_ms"] / max(res["projloop_tiled_ms"], 1e-9), 3)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
