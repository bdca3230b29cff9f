"""Isolated A/B of the decode-loop weight-stationary matmul streams:
int8 (W8A8) vs nibble-packed uint8 (W4A8, arithmetic unpack fused into
the dot).

The decode loop is weight-stream bound (BASELINE.md binding-limit): a
[K, out] weight read per token dominates.  W4A8 halves that stream IF
XLA fuses the uint8->2x int8 nibble unpack into the dot instead of
materializing the unpacked tensor in HBM.  This measures exactly that,
with the profile_attn_kernel.py amortization discipline (fori_loop,
chained full-reduction consumption, one tiny fetch).

NOTE: jnp.int4 is unusable on this stack — S4 jit arguments trip
"Recursively calling jit" on the axon relay, S4 host fetches are
UNIMPLEMENTED, and lax.bitcast_convert_type(uint8 -> int4) MISCOMPILES
when fused into a dot (all three measured 2026-08-17).  The arithmetic
unpack (lo = (p<<4)>>4, hi = p>>4, stacked minor dim) is the one
formulation that is both correct and int4-free.

Usage: python scripts/profile_w4_matmul.py [--batch 256] [--inner 100]
"""

from __future__ import annotations

import argparse
import json
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
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--k", type=int, default=2048)
    ap.add_argument("--out", type=int, default=16384)
    ap.add_argument("--inner", type=int, default=100)
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    if args.small:
        jax.config.update("jax_platforms", "cpu")
        args.batch, args.inner, args.k, args.out = 4, 3, 64, 128

    B, K, OUT = args.batch, args.k, args.out
    rng = np.random.default_rng(0)
    w8 = jnp.asarray(rng.integers(-7, 8, size=(K, OUT)), jnp.int8)
    packed = np.asarray(w8)
    packed = ((packed[:, 0::2] & 0xF) | ((packed[:, 1::2] & 0xF) << 4)).astype(
        np.uint8
    )
    p = jnp.asarray(packed)  # [K, OUT/2]
    h = jnp.asarray(rng.integers(-64, 64, size=(K, B)), jnp.int8)

    def dot_w8(w, h):
        return lax.dot_general(
            w, h, (((0,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )  # [OUT, B]

    def dot_w4(p, h):
        p8 = p.astype(jnp.int8)
        lo = (p8 << 4) >> 4
        hi = p8 >> 4
        w = jnp.stack([lo, hi], axis=-1)  # [K, OUT/2, 2]
        acc = lax.dot_general(
            h, w, (((0,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )  # [B, OUT/2, 2]
        return acc.reshape(B, OUT).T

    # split-OUT: byte j holds out-columns j (lo) and j+OUT/2 (hi) -- the
    # column permutation is applied at pack time, so each dot's weight
    # operand is a pure elementwise map of p (no reshape/stack), and the
    # two results concat along the output axis.
    p_so = jnp.asarray(
        ((np.asarray(w8)[:, : OUT // 2] & 0xF)
         | ((np.asarray(w8)[:, OUT // 2 :] & 0xF) << 4)).astype(np.uint8)
    )  # [K, OUT/2]

    def dot_w4_so(p, h):
        p8 = p.astype(jnp.int8)
        lo = (p8 << 4) >> 4
        hi = p8 >> 4
        a = lax.dot_general(lo, h, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        b = lax.dot_general(hi, h, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        return jnp.concatenate([a, b], axis=0)  # [OUT, B]

    # split-K: byte k holds contraction rows k (lo) and k+K/2 (hi); the
    # two partial dots sum.  Weight operands again pure-elementwise of p.
    p_sk = jnp.asarray(
        ((np.asarray(w8)[: K // 2] & 0xF)
         | ((np.asarray(w8)[K // 2 :] & 0xF) << 4)).astype(np.uint8)
    )  # [K/2, OUT]

    def dot_w4_sk(p, h):
        p8 = p.astype(jnp.int8)
        lo = (p8 << 4) >> 4
        hi = p8 >> 4
        a = lax.dot_general(lo, h[: K // 2], (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        b = lax.dot_general(hi, h[K // 2 :], (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        return a + b  # [OUT, B]

    def loop(fn, w):
        @jax.jit
        def run(w, h):
            def body(i, h):
                out = fn(w, h)
                # consume a FULL reduction so XLA cannot slice the dot
                return h + (jnp.sum(out, dtype=jnp.int32) % 3).astype(jnp.int8)

            return lax.fori_loop(0, args.inner, body, h)

        return lambda: np.asarray(run(w, h)[:2, 0])

    # Pallas: stream the PACKED bytes HBM->VMEM (half the weight stream —
    # the thing XLA cannot express because it materializes the unpack),
    # unpack in-registers, two MXU dots per block.  Output [2, OUT/2, B]
    # reshapes to original column order under the global split-OUT packing.
    from functools import partial as _partial

    from jax.experimental import pallas as pl

    def _w4_kernel(h_ref, p_ref, o_ref):
        # Mosaic can't shift i8 vectors ('arith.shli' unsupported); unpack
        # in i32 and narrow for the MXU dot.
        p32 = p_ref[...].astype(jnp.int32)  # [K, bo], 0..255
        lo = ((p32 << 28) >> 28).astype(jnp.int8)
        hi = ((p32 << 24) >> 28).astype(jnp.int8)
        hh = h_ref[...]  # [K, B]
        dn = (((0,), (0,)), ((), ()))
        o_ref[0] = lax.dot_general(lo, hh, dn, preferred_element_type=jnp.int32)
        o_ref[1] = lax.dot_general(hi, hh, dn, preferred_element_type=jnp.int32)

    def dot_w4_pallas(p, h):
        KK, half = p.shape
        bo = min(512, half)
        acc = pl.pallas_call(
            _w4_kernel,
            out_shape=jax.ShapeDtypeStruct((2, half, B), jnp.int32),
            grid=(half // bo,),
            in_specs=[
                pl.BlockSpec((KK, B), lambda i: (0, 0)),
                pl.BlockSpec((KK, bo), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((2, bo, B), lambda i: (0, i, 0)),
            interpret=args.small,
        )(h, p)
        return acc.reshape(2 * half, B)

    # K-packed Pallas: contraction dim packed (byte = rows k, k+K/2), two
    # dots summed — no output reshape, unifies layer + head kernels.
    def _w4k_kernel(h_ref, p_ref, o_ref):
        p32 = p_ref[...].astype(jnp.int32)  # [K/2, bo]
        lo = ((p32 << 28) >> 28).astype(jnp.int8)
        hi = ((p32 << 24) >> 28).astype(jnp.int8)
        hh = h_ref[...]  # [K, B]
        dn = (((0,), (0,)), ((), ()))
        o_ref[...] = lax.dot_general(
            lo, hh[: K // 2], dn, preferred_element_type=jnp.int32
        ) + lax.dot_general(hi, hh[K // 2 :], dn, preferred_element_type=jnp.int32)

    def dot_w4_pallas_k(p, h):
        Kh, OO = p.shape
        bo = min(512, OO)
        return pl.pallas_call(
            _w4k_kernel,
            out_shape=jax.ShapeDtypeStruct((OO, B), jnp.int32),
            grid=(OO // bo,),
            in_specs=[
                pl.BlockSpec((2 * Kh, B), lambda i: (0, 0)),
                pl.BlockSpec((Kh, bo), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((bo, B), lambda i: (i, 0)),
            interpret=args.small,
        )(h, p)

    # correctness gate before timing: every packed variant must match int8
    ref = np.asarray(jax.jit(dot_w8)(w8, h))
    for nm, (fn, w) in {
        "w4_packed": (dot_w4, p),
        "w4_split_out": (dot_w4_so, p_so),
        "w4_split_k": (dot_w4_sk, p_sk),
        "w4_pallas": (dot_w4_pallas, p_so),
        "w4_pallas_k": (dot_w4_pallas_k, p_sk),
    }.items():
        got = np.asarray(jax.jit(fn)(w, h))
        assert np.array_equal(ref, got), f"{nm} mismatch: {np.abs(ref-got).max()}"
    print("correctness: all packed variants exact vs int8", file=sys.stderr)

    results = {"batch": B, "K": K, "OUT": OUT, "inner_iters": args.inner}
    for name, (fn, w) in {
        "w8_int8_stream": (dot_w8, w8),
        "w4_packed_stream": (dot_w4, p),
        "w4_split_out": (dot_w4_so, p_so),
        "w4_split_k": (dot_w4_sk, p_sk),
        "w4_pallas": (dot_w4_pallas, p_so),
        "w4_pallas_k": (dot_w4_pallas_k, p_sk),
    }.items():
        ms = timeit(loop(fn, w))
        results[f"{name}_ms_per_call"] = round(ms / args.inner, 4)
    r = results
    if "w8_int8_stream_ms_per_call" in r:
        r["w4_speedup"] = round(
            r["w8_int8_stream_ms_per_call"] / r["w4_packed_stream_ms_per_call"], 3
        )
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
