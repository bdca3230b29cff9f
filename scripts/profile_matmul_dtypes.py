"""Amortized microbench: decode-matmul cost by weight/activation dtype.

Diagnoses why W8A8 (int8 x int8 -> int32 MXU) gained only ~3% end-to-end
when halved weight reads + halved MXU time predicted ~40%.  For each
serving-shape matmul (batch-last, B lanes) times, inside ONE jitted
fori_loop (relay dispatch amortized, one tiny fetch):

  bf16       h[I,B] x w[I,O] in bf16                      (baseline)
  q          int8 weights dequantized to bf16 at the dot  (round-1 int8)
  w8a8       dynamic per-token act quant + int8 MXU dot   (the new mode)
  w8a8_pre   int8 MXU dot with PRE-quantized activations  (isolates the
             act-quant overhead from the int8 dot itself)

Usage: python scripts/profile_matmul_dtypes.py [--batch 256] [--inner 100]
       [--shapes gu,down,head] [--small]
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


SHAPES = {
    # (in_dim, out_dim) of the batch-last decode matmuls, Llama-3.2-1B
    "gu": (2048, 16384),  # fused gate-up
    "down": (8192, 2048),
    "head": (2048, 128256),  # tied embed head (as [I, O] here)
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--inner", type=int, default=100)
    ap.add_argument("--shapes", default="gu,down,head")
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.small:
        jax.config.update("jax_platforms", "cpu")
        args.batch, args.inner = 8, 3
        SHAPES.update({"gu": (64, 256), "down": (256, 64), "head": (64, 512)})

    from dmi_tpu.models.quant import quantize_act, quantize_tensor

    B = args.batch
    rng = np.random.default_rng(0)
    results = {}

    for name in args.shapes.split(","):
        I, O = SHAPES[name]
        w = jnp.asarray(rng.normal(size=(I, O)).astype(np.float32), jnp.bfloat16)
        h = jnp.asarray(rng.normal(size=(I, B)).astype(np.float32), jnp.bfloat16)
        qw = quantize_tensor(w)          # {"q": int8, "s": [1, O]}
        nw = quantize_tensor(w, True)    # {"q8": int8, "s": [1, O]}
        hq0, a0 = quantize_act(h, axis=0)

        def chain(h, out):
            # scalar feedback through a FULL reduction: iterations can't
            # collapse, and XLA can't dead-code-eliminate matmul columns
            # (out[0,0] alone lets it slice the dot to one column — measured
            # an impossible 1.5 TB/s effective on the head shape)
            return h * (1.0 + jnp.mean(out.astype(jnp.float32)).astype(jnp.bfloat16) * 1e-12)

        # weights arrive as ARGUMENTS (closed-over jnp constants are shipped
        # inside the relay's compile request body -> HTTP 413 at 525 MB)
        def bf16_body(w, i, h):
            out = jax.lax.dot_general(w, h, (((0,), (0,)), ((), ())))
            return chain(h, out)

        def q_body(w, i, h):
            out = jax.lax.dot_general(
                w["q"].astype(h.dtype), h, (((0,), (0,)), ((), ()))
            ) * w["s"].astype(h.dtype).reshape(-1, 1)
            return chain(h, out)

        def w8a8_body(w, i, h):
            hq, a = quantize_act(h, axis=0)
            acc = jax.lax.dot_general(
                w["q8"], hq, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            out = (acc * w["s"].reshape(-1, 1) * a).astype(h.dtype)
            return chain(h, out)

        def w8a8_pre_body(w, i, h):
            acc = jax.lax.dot_general(
                w["q8"], w["hq0"], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            out = (acc * w["s"].reshape(-1, 1) * w["a0"]).astype(h.dtype)
            return chain(h, out)

        for vname, body, wop in [
            ("bf16", bf16_body, w),
            ("q", q_body, qw),
            ("w8a8", w8a8_body, nw),
            ("w8a8_pre", w8a8_pre_body, {**nw, "hq0": hq0, "a0": a0}),
        ]:
            @jax.jit
            def run(wop, h, body=body):
                return jax.lax.fori_loop(0, args.inner, partial(body, wop), h)

            def fetch(run=run, wop=wop):
                return np.asarray(run(wop, h)[:2, :2])

            ms = timeit(fetch) / args.inner
            results[f"{name}_{vname}_ms"] = round(ms, 4)
            # ideal bf16 weight-stream time at 645 GB/s measured effective
            results[f"{name}_bf16_floor_ms"] = round(I * O * 2 / 645e9 * 1e3, 4)
            print(json.dumps({f"{name}_{vname}_ms": results[f"{name}_{vname}_ms"]}),
                  flush=True)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
