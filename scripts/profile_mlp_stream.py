"""Can a Pallas matmul stream the decode MLP weights faster than XLA?

The decode loop's weight stream runs at 550-645 GB/s effective vs
819 GB/s HBM peak (BASELINE.md round-2).  This times the bandwidth-bound
gate-up matmul (w [2048, 16384] bf16, batch-last h [2048, 256]) as XLA
dot_general vs a Pallas blocked kernel at several output-block sizes,
inside one jitted fori_loop.  The chain folds the FULL [16384, 256]
output back into the next h (reshape-sum) so no rows can be dead-code
eliminated and iterations cannot collapse.

Usage: python scripts/profile_mlp_stream.py [--inner 50] [--small]
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
    ap.add_argument("--inner", type=int, default=50)
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    interpret = False
    if args.small:
        jax.config.update("jax_platforms", "cpu")
        interpret = True
        args.inner = 2

    I, O, B = (128, 256, 32) if args.small else (2048, 16384, 256)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(I, O)).astype(np.float32), jnp.bfloat16)
    h0 = jnp.asarray(rng.normal(size=(I, B)).astype(np.float32), jnp.bfloat16)

    def mm_kernel(w_ref, h_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            w_ref[...], h_ref[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    def pallas_mm(w, h, bo):
        return pl.pallas_call(
            mm_kernel,
            out_shape=jax.ShapeDtypeStruct((O, B), jnp.bfloat16),
            grid=(O // bo,),
            in_specs=[
                pl.BlockSpec((I, bo), lambda j: (0, j)),
                pl.BlockSpec((I, B), lambda j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((bo, B), lambda j: (j, 0)),
            interpret=interpret,
        )(w, h)

    def chain(h, out):
        # reshape-sum consumes every output row: no DCE, cheap fold
        return (h + out.reshape(O // I, I, B).sum(0) * 1e-6).astype(h.dtype)

    variants = {"xla": lambda h: jax.lax.dot_general(
        w, h, (((0,), (0,)), ((), ())))}
    for bo in ([O] if args.small else [512, 1024, 2048]):
        if I * bo * 2 * 2 + I * B * 2 + bo * B * 4 < 15e6:
            variants[f"pl_bo{bo}"] = partial(pallas_mm, w, bo=bo)

    results = {}
    gb = I * O * 2 / 1e9
    for name, f in variants.items():
        def body(i, h, f=f):
            return chain(h, f(h).astype(jnp.bfloat16))

        @jax.jit
        def run(h, body=body):
            return jax.lax.fori_loop(0, args.inner, body, h)

        def fetch(run=run):
            return np.asarray(run(h0)[:2, :2])

        ms = timeit(fetch) / args.inner
        results[f"{name}_ms"] = round(ms, 4)
        results[f"{name}_gbps"] = round(gb / (ms * 1e-3), 1)
        print(json.dumps({name: results[f"{name}_ms"],
                          "GB/s": results[f"{name}_gbps"]}), flush=True)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
