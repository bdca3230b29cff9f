"""W4A8 packed-weight matmul for the batch-last decode loop.

The decode loop is weight-stream bound (BASELINE.md binding-limit): at
the serving batch each token step reads every layer weight once from
HBM.  int4 halves that stream vs int8 — but ONLY if the nibble unpack
happens after the HBM read.  XLA materializes the unpacked int8 tensor
(every arithmetic-unpack formulation measured 0.88-0.96x vs int8,
scripts/profile_w4_matmul.py), so the saving is structurally out of
XLA's reach.  This kernel streams the PACKED bytes HBM->VMEM, unpacks
in-registers (i32 shifts — Mosaic cannot shift i8 vectors), runs the two
half-dots on the MXU and rescales to the output dtype in-kernel, so
neither the unpacked weights nor the int32 accumulator ever touch HBM.

Layout contract (quant.pack_w4): weights are K-split packed — byte
(k, n) of qp [K/2, out] holds contraction rows k (low nibble) and
k + K/2 (high nibble), so each half-dot contracts a contiguous slice of
the int8 activations.  Scales are per-output-channel (1, out) f32;
grouped ("s4g") weights take the XLA oracle path instead.

Reference behavior replaced: the bf16 matmuls inside HF generate's
decode (dmi/model/mmmodel.py:149-169); quantization itself has no
reference counterpart (the reference serves bf16/fp32 torch).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from dmi_tpu.ops.pallas.projector import _pallas_enabled

# VMEM plan per grid step (budget ~14MB of the 16MB scoped limit):
#   qp block   [K/2, bo] uint8   — grid-varying => DOUBLE-buffered (2x)
#   unpack     p32 i32 + lo/hi i8 [K/2, bo] — 4 + 2 bytes per packed byte
#              (Mosaic materializes the i32 widen; measured 34M for a
#              kh=4096, bo=1024 block => ~8 bytes per packed byte total)
#   h          [K, B] int8       — constant-index => single-buffered
#   a, s       tiny f32
#   out block  [bo, B] bf16      — grid-varying => double-buffered
_VMEM_BUDGET = 14 * 1024 * 1024


def _vmem_bytes(kh: int, bo: int, b: int) -> int:
    return 8 * (kh * bo) + 2 * kh * b + 2 * (2 * bo * b) + 8 * (bo + b)


def _pick_bo(kh: int, out: int, b: int) -> int | None:
    """Largest output-block size that divides `out`, keeps the int8
    (32, 128) min tile, and fits the VMEM plan.  DMI_W4_BO caps the
    candidate size (read at trace time — pair env flips with
    jax.clear_caches() in same-process A/Bs)."""
    import os

    cap = int(os.environ.get("DMI_W4_BO", "1024"))
    for bo in (1024, 768, 512, 384, 256, 128):
        if bo <= cap and out % bo == 0 and _vmem_bytes(kh, bo, b) <= _VMEM_BUDGET:
            return bo
    return None


def _kernel(h_ref, a_ref, s_ref, p_ref, o_ref, *, kh):
    p32 = p_ref[...].astype(jnp.int32)  # [K/2, bo], 0..255
    lo = ((p32 << 28) >> 28).astype(jnp.int8)  # rows [0, K/2)
    hi = ((p32 << 24) >> 28).astype(jnp.int8)  # rows [K/2, K)
    hh = h_ref[...]  # [K, B] int8
    dn = (((0,), (0,)), ((), ()))
    acc = jax.lax.dot_general(
        lo, hh[:kh], dn, preferred_element_type=jnp.int32
    ) + jax.lax.dot_general(hi, hh[kh:], dn, preferred_element_type=jnp.int32)
    # rescale in-kernel: int32 acc never leaves VMEM (an int32 [out, B]
    # boundary output would cost 2x the bytes the packed stream saves)
    o_ref[...] = (
        acc.astype(jnp.float32) * s_ref[...][0][:, None] * a_ref[...]
    ).astype(o_ref.dtype)


def w4_available(w: dict, hq: jax.Array) -> bool:
    """Static predicate: can the packed kernel serve this (weight, act)
    pair?  Falls back to the XLA twin otherwise."""
    import os

    if os.environ.get("DMI_W4_XLA") == "1":  # force the XLA twin (A/Bs)
        return False
    if not _pallas_enabled():
        return False
    if "s4g" in w or "s" not in w:
        return False
    kh, out = w["qp"].shape[-2:]
    b = hq.shape[-1]
    # int8 minor tiling: batch lane dim and the kh sublane dim must align
    if b % 128 or kh % 32:
        return False
    return _pick_bo(kh, out, b) is not None


def w4_mm_bl(w: dict, hq: jax.Array, a: jax.Array, out_dtype,
             interpret: bool = False) -> jax.Array:
    """Packed W4 batch-last matmul: qp [K/2, out] uint8, hq [K, B] int8
    (pre-quantized per token), a [1, B] f32 activation scales, s (1, out)
    f32 channel scales -> [out, B] out_dtype."""
    kh, out = w["qp"].shape
    b = hq.shape[1]
    bo = _pick_bo(kh, out, b)
    s = w["s"].reshape(1, out).astype(jnp.float32)
    return pl.pallas_call(
        partial(_kernel, kh=kh),
        out_shape=jax.ShapeDtypeStruct((out, b), out_dtype),
        grid=(out // bo,),
        in_specs=[
            pl.BlockSpec((2 * kh, b), lambda i: (0, 0)),
            pl.BlockSpec((1, b), lambda i: (0, 0)),
            pl.BlockSpec((1, bo), lambda i: (0, i)),
            pl.BlockSpec((kh, bo), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((bo, b), lambda i: (i, 0)),
        interpret=interpret,
    )(hq, a.astype(jnp.float32), s, w["qp"])
