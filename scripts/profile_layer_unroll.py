"""A/B the DMI_DECODE_LAYER_UNROLL knob inside the serving pipeline.

The decode loop's layer scan runs the per-layer weight stream at 69-79%
of HBM peak (BASELINE.md binding-limit analysis).  Unrolling the scan
lets XLA's scheduler start layer i+1's weight fetch while layer i
computes; this measures whether that closes any of the gap, in ONE
process back to back (CLAUDE.md: only same-process A/Bs are valid).

Env-at-trace-time hazard: _decode_step_bl reads DMI_DECODE_LAYER_UNROLL
when TRACED, so each unroll factor gets its own jit wrapper (distinct
function object => distinct trace) with the env set before its first
call.

Usage: python scripts/profile_layer_unroll.py [--small]
           [--unrolls 1,2,4] [--modes w8a8,bf16]
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


def timeit(fn, n=7, warmup=2):
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
    ap.add_argument("--unrolls", default="1,2,4")
    ap.add_argument("--modes", default="w8a8,bf16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.small:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    from dmi_tpu.models import llama, mmmodel
    from dmi_tpu.models import projector as proj
    from dmi_tpu.models.quant import quantize_llama

    if args.small:
        cfg = llama.tiny_config(vocab_size=512, hidden_size=128, n_layers=2,
                                n_heads=4, n_kv=2, intermediate=256)
        mm_dim = 64
        args.batch, args.new_tokens = 8, 4
    else:
        cfg = llama.llama32_1b()
        mm_dim = 1024
    cfg = dataclasses.replace(cfg, eos_token_ids=())

    B, max_new, prefix_len = args.batch, args.new_tokens, 15
    llm_params = llama.fuse_projections(llama.init(jax.random.key(0), cfg))
    pspec = proj.ProjectorSpec(mm_dim=mm_dim, lm_dim=cfg.hidden_size,
                               n_layers=2)
    pparams = proj.init(jax.random.key(1), pspec)

    rng = np.random.default_rng(0)
    embs = jnp.asarray(rng.normal(size=(B, mm_dim)).astype(np.float32))
    prefix = jnp.asarray(
        rng.integers(1, cfg.vocab_size, size=(B, prefix_len)), jnp.int32)

    weights = {"bf16": (llm_params, None)}
    if "w8a8" in args.modes:
        weights["w8a8"] = (quantize_llama(llm_params, native=True), llm_params)

    res = {"batch": B, "new_tokens": max_new}
    ref_tokens = {}
    for unroll in [int(u) for u in args.unrolls.split(",")]:
        os.environ["DMI_DECODE_LAYER_UNROLL"] = str(unroll)
        # greedy_generate_bl is module-level-jitted: a fresh OUTER wrapper
        # does NOT invalidate its inner trace cache, so without this every
        # factor would silently re-measure the first one's program
        jax.clear_caches()

        def pipe(pp, lp, e, pre, pre_params, _u=unroll):
            soft = proj.apply(pspec, pp, e, train=False)
            return mmmodel.caption_generate(cfg, lp, soft, pre, max_new, 0,
                                            prefill_params=pre_params,
                                            batch_first=False)

        pipe = jax.jit(pipe)
        for mode in args.modes.split(","):
            lp, pre = weights[mode]
            toks = np.asarray(pipe(pparams, lp, embs, prefix, pre))
            if mode in ref_tokens:  # unroll must be token-exact
                np.testing.assert_array_equal(toks, ref_tokens[mode])
            else:
                ref_tokens[mode] = toks
            ms = timeit(lambda: np.asarray(
                pipe(pparams, lp, embs, prefix, pre)))
            res[f"{mode}_unroll{unroll}_ms"] = round(ms, 1)
            res[f"{mode}_unroll{unroll}_cps"] = round(B / (ms / 1e3), 1)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
