"""Isolated microbench of the decode-attention formulations.

Runs each formulation (einsum/MXU, multiply-reduce/VPU, Pallas kernel)
inside a jitted fori_loop (~200 chained iterations, one host fetch) so
per-dispatch relay overhead (~25 ms) is amortized and the steady-state
per-op cost is visible.  Distinguishes kernel-internal slowness from
pallas_call boundary costs (layout conversion of the cache operands).

Usage: python scripts/profile_attn_kernel.py [--batch 256] [--s 38] [--small]
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
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--s", type=int, default=38)
    ap.add_argument("--inner", type=int, default=200)
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.small:
        jax.config.update("jax_platforms", "cpu")
        args.batch, args.inner = 4, 5

    from dmi_tpu.models import llama
    from dmi_tpu.ops.pallas import decode_attn as dk

    B, nh, nkv, hd, S = args.batch, 32, 8, 64, args.s
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, nh, 1, hd)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, nkv, S, hd)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, nkv, S, hd)), jnp.bfloat16)
    valid = (np.arange(S) <= S - 2)[None, None, :]
    bias = jnp.asarray(
        np.where(np.broadcast_to(valid, (B, 1, S)), 0.0, np.finfo(np.float32).min),
        jnp.float32,
    )

    nb = dk._pick_block(B * nkv, nh // nkv, S, hd)

    def loop(fn):
        @jax.jit
        def run(q, k, v, bias):
            def body(i, q):
                out = fn(q, k, v, bias)
                # chain: feed a hair of the output back so iterations
                # cannot be collapsed
                return q + out.astype(q.dtype) * 1e-6

            return jax.lax.fori_loop(0, args.inner, body, q)

        return lambda: np.asarray(run(q, k, v, bias)[0, 0, 0, :4])

    results = {"batch": B, "S": S, "inner_iters": args.inner, "nb": nb}
    variants = {
        "einsum_mxu": llama._attention,
        "vpu_xla": dk._decode_attn_xla,
    }
    if nb is not None and jax.default_backend() == "tpu":
        variants["pallas"] = lambda q, k, v, b: dk._decode_attn_pallas(q, k, v, b, nb)
    for name, fn in variants.items():
        ms = timeit(loop(fn))
        results[f"{name}_ms_per_call"] = round(ms / args.inner, 4)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
