"""Does Mosaic engage the native int8 MXU path (2x bf16 FLOPs on v5e)?

XLA int8 dots measured no faster than bf16 (profile_matmul_dtypes.py), so
the remaining route to int8 compute is a Pallas kernel whose jnp.dot runs
on int8 blocks with an int32 accumulator.  This times, at a COMPUTE-bound
square shape (M=N=K=4096, arithmetic intensity ~680), inside one jitted
fori_loop with a full-reduction feedback chain:

  xla_bf16     jnp.dot bf16 -> f32           (MXU baseline, ~197 TFLOP/s peak)
  xla_int8     jnp.dot int8 -> int32 via XLA (known: no gain)
  pl_bf16      Pallas blocked matmul, bf16 blocks
  pl_int8      Pallas blocked matmul, int8 blocks -> int32

If pl_int8 ~= pl_bf16/2, prefill and the decode weight stream can ride the
int8 MXU through Pallas where XLA won't.

Usage: python scripts/profile_int8_mxu.py [--n 4096] [--inner 30] [--small]
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
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--inner", type=int, default=30)
    ap.add_argument("--bm", type=int, default=256)
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    interpret = False
    if args.small:
        jax.config.update("jax_platforms", "cpu")
        args.n, args.inner, args.bm = 256, 2, 128
        interpret = True

    N, bm = args.n, args.bm
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 128, size=(N, N)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 128, size=(N, N)), jnp.int8)
    abf = jnp.asarray(rng.normal(size=(N, N)), jnp.bfloat16)
    bbf = jnp.asarray(rng.normal(size=(N, N)), jnp.bfloat16)

    def mm_kernel(acc_t, a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=acc_t)

    def pallas_mm(a, b, acc_t):
        return pl.pallas_call(
            partial(mm_kernel, acc_t),
            out_shape=jax.ShapeDtypeStruct((N, N), acc_t),
            grid=(N // bm, N // bm),
            in_specs=[
                pl.BlockSpec((bm, N), lambda i, j: (i, 0)),
                pl.BlockSpec((N, bm), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((bm, bm), lambda i, j: (i, j)),
            interpret=interpret,
        )(a, b)

    variants = {
        "xla_bf16": (abf, bbf, lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)),
        "xla_int8": (a8, b8, lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.int32)),
        "pl_bf16": (abf, bbf, lambda a, b: pallas_mm(a, b, jnp.float32)),
        "pl_int8": (a8, b8, lambda a, b: pallas_mm(a, b, jnp.int32)),
    }

    results = {}
    flops = 2 * N * N * N
    for name, (a, b, f) in variants.items():
        if a.dtype == jnp.int8:
            def body(i, a, b=b, f=f):
                c = f(a, b)
                # xor with a full-reduction bit: consumes every output
                # element, perturbs a, keeps int8 range
                s = (jnp.sum(c, dtype=jnp.int32) & 1).astype(jnp.int8)
                return a ^ s
        else:
            def body(i, a, b=b, f=f):
                c = f(a, b)
                s = jnp.sum(c.astype(jnp.float32)) * 1e-30
                return a * (1 + s).astype(a.dtype)

        @jax.jit
        def run(a, body=body):
            return jax.lax.fori_loop(0, args.inner, body, a)

        def fetch(run=run, a=a):
            return np.asarray(run(a)[:2, :2])

        ms = timeit(fetch) / args.inner
        results[f"{name}_ms"] = round(ms, 4)
        results[f"{name}_tflops"] = round(flops / (ms * 1e-3) / 1e12, 1)
        print(json.dumps({name: results[f"{name}_ms"],
                          "tflops": results[f"{name}_tflops"]}), flush=True)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
