"""In-loop A/B of W4A8 decode variants against the W8A8 production path.

The isolated matmul microbench (profile_w4_matmul.py) is not
bandwidth-bound (~130 GB/s apparent) and cannot rank these; only the
real greedy_generate_bl loop can.  One process, jax.clear_caches()
between variants (env knobs are read at trace time), W8A8 re-measured
last to bound within-process drift.

Variants: w8a8 | w4a8 Pallas bo<=1024/256/128 | w4a8 XLA twin.

Usage: python scripts/profile_w4_inloop.py [--batch 256] [--steps 22]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import os.path as osp
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=22)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.small:
        jax.config.update("jax_platforms", "cpu")
        args.batch, args.steps, args.iters = 8, 4, 2

    from dmi_tpu.models import decode, llama
    from dmi_tpu.models.quant import quantize_llama

    if args.small:
        cfg = llama.tiny_config(vocab_size=512, hidden_size=128, n_layers=2,
                                n_heads=8, n_kv=4, intermediate=256)
    else:
        cfg = llama.llama32_1b()
    cfg = dataclasses.replace(cfg, eos_token_ids=())
    params = llama.fuse_projections(llama.init(jax.random.key(0), cfg))
    w8 = quantize_llama(params, native=True)
    w4 = quantize_llama(params, bits=4)
    rng = np.random.default_rng(0)
    embs = jnp.asarray(
        rng.normal(size=(args.batch, 8, cfg.hidden_size)).astype(np.float32) * 0.1
    )

    def run(lp):
        toks = decode.greedy_generate_bl(cfg, lp, embs, args.steps, 0,
                                         prefill_params=params)
        return np.asarray(toks)

    def measure(lp):
        jax.clear_caches()
        run(lp)  # compile
        run(lp)  # warm
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            run(lp)
            ts.append((time.perf_counter() - t0) * 1e3)
        return round(statistics.median(ts), 2)

    results = {}
    results["w8a8_ms"] = measure(w8)
    for bo in (1024, 256, 128):
        os.environ["DMI_W4_BO"] = str(bo)
        results[f"w4a8_pallas_bo{bo}_ms"] = measure(w4)
    os.environ.pop("DMI_W4_BO")
    os.environ["DMI_W4_XLA"] = "1"
    results["w4a8_xla_twin_ms"] = measure(w4)
    os.environ.pop("DMI_W4_XLA")
    results["w8a8_again_ms"] = measure(w8)  # drift bound
    base = results["w8a8_ms"]
    for k in list(results):
        if k != "w8a8_ms":
            results[k.replace("_ms", "_vs_w8")] = round(base / results[k], 3)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
