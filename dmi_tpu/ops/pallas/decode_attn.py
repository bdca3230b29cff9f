"""Fused single-token decode attention (the decode hot op).

Profiled on the v5e chip (scripts/profile_decode.py, B=256, 1B model,
22-token budget): the einsum formulation lowers to B*nkv batched
[group, hd] x [hd, S] matmuls, whose MXU tile padding costs 6.1 ms/step
(45% of the decode loop); the XLA multiply-reduce formulation halves that
but materializes two [B, nkv, g, S, hd] f32 intermediates in HBM
(~2.8 ms/step of pure bandwidth).  This kernel keeps those intermediates in
VMEM: per grid step it loads a block of (batch x kv-head) rows of K/V once,
forms scores, softmax, and the value reduction entirely on-chip.

Layout: callers pass q [B, nh, 1, hd] + caches [B, nkv, S, hd] (the
llama.py decode shapes); the wrapper folds (B, nkv) into one leading dim so
every in-kernel intermediate is rank-4 with (S, hd) or (S) in the tiled
trailing dims.  The decode bias is batch-uniform by construction (every
sequence sits at the same absolute position), so only its first row ships.

The block size over (B*nkv) adapts to S under the same double-buffer-aware
VMEM budget model as ops/pallas/projector.py; out-of-budget or non-TPU
falls back to the XLA multiply-reduce twin (numerically identical math).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dmi_tpu.ops.pallas.projector import VMEM_BUDGET, _pallas_enabled


def _decode_attn_xla(q, k, v, bias):
    """VPU multiply-reduce oracle — same contract as
    llama._decode_attention: products stay in the INPUT dtype with f32
    accumulation (an earlier version upcast q/k/v to f32 first, which
    does not bit-match the production loop's attention)."""
    B, nh, _, hd = q.shape
    nkv = k.shape[1]
    group = nh // nkv
    qr = q.reshape(B, nkv, group, hd)
    scores = jnp.sum(
        qr[:, :, :, None, :] * k[:, :, None, :, :], axis=-1, dtype=jnp.float32
    )
    scores = scores / np.sqrt(hd) + bias[:, :, None, :]
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.sum(
        probs[..., None] * v[:, :, None, :, :], axis=3, dtype=jnp.float32
    )
    return out.reshape(B, nh, 1, hd).astype(v.dtype)


def _kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale):
    qf = q_ref[...].astype(jnp.float32)  # [nb, g, hd]
    kf = k_ref[...].astype(jnp.float32)  # [nb, S, hd]
    s = jnp.sum(qf[:, :, None, :] * kf[:, None, :, :], axis=-1) * scale
    s = s + bias_ref[...][0][None, None, :]  # [nb, g, S]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    vf = v_ref[...].astype(jnp.float32)  # [nb, S, hd]
    o = jnp.sum(p[..., None] * vf[:, None, :, :], axis=2) / denom
    out_ref[...] = o.astype(out_ref.dtype)


def _vmem_bytes(nb, g, S, hd, itemsize):
    """Streamed blocks double-buffer (x2); the two rank-4 f32 intermediates
    ([nb,g,S,hd] for QK^T and PV) live in VMEM one at a time — budget both
    to stay conservative."""
    return (
        2 * nb * g * hd * itemsize  # q block x2
        + 2 * 2 * nb * S * hd * itemsize  # k + v blocks x2
        + S * 4  # bias row (resident)
        + 2 * nb * g * hd * itemsize  # out block x2
        + 2 * nb * g * S * hd * 4  # multiply-reduce intermediates (f32)
        + 2 * nb * g * S * 4  # scores + probs (f32)
    )


def _pick_block(N, group, S, hd, itemsize=2):
    """itemsize must be the OPERAND dtype's (f32 models double the block
    footprint vs bf16 — a hardcoded 2 under-budgeted them 2x and could
    pass a config that overflows the ~16M scoped vmem on hardware)."""
    nb = 64
    while nb > 1 and (N % nb != 0
                      or _vmem_bytes(nb, group, S, hd, itemsize) > VMEM_BUDGET):
        nb //= 2
    if N % nb != 0 or _vmem_bytes(nb, group, S, hd, itemsize) > VMEM_BUDGET:
        return None
    return nb


def fused_decode_attention(q, k, v, bias):
    """q: [B, nh, 1, hd], k/v: [B, nkv, S, hd], bias: [B, 1, S] with
    identical rows (single decode position) -> [B, nh, 1, hd].

    MEASURED SLOWER than the XLA twin inside the production decode loop on
    the v5e chip (213 vs 968 captions/s end-to-end): invoked per layer
    inside scan-in-while_loop, each call adds ~2.7 ms — consistent with
    XLA inserting layout conversions of the KV-cache operands at the
    pallas_call boundary.  Kept opt-in behind DMI_PALLAS_DECODE_ATTN=1 for
    standalone use; the decode loop uses the multiply-reduce twin, which
    profiled at 2.2x over the einsum formulation."""
    import os

    T = q.shape[2]
    if not (
        _pallas_enabled()
        and T == 1
        and os.environ.get("DMI_PALLAS_DECODE_ATTN") == "1"
    ):
        return _decode_attn_xla(q, k, v, bias)
    nb = _pick_block(q.shape[0] * k.shape[1], q.shape[1] // k.shape[1],
                     k.shape[2], q.shape[3], jnp.dtype(q.dtype).itemsize)
    if nb is None:
        return _decode_attn_xla(q, k, v, bias)
    return _decode_attn_pallas(q, k, v, bias, nb)


def _decode_attn_pallas(q, k, v, bias, nb):
    B, nh, _, hd = q.shape
    nkv, S = k.shape[1], k.shape[2]
    group = nh // nkv
    N = B * nkv
    q3 = q.reshape(B, nkv, group, hd).reshape(N, group, hd)
    k3 = k.reshape(N, S, hd)
    v3 = v.reshape(N, S, hd)
    bias_row = bias[:1, 0, :]  # [1, S] — batch-uniform by construction

    out = pl.pallas_call(
        lambda q_ref, k_ref, v_ref, b_ref, o_ref: _kernel(
            q_ref, k_ref, v_ref, b_ref, o_ref, scale=1.0 / float(np.sqrt(hd))
        ),
        grid=(N // nb,),
        in_specs=[
            pl.BlockSpec((nb, group, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, S, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, S, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (nb, group, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N, group, hd), v.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * N * group * S * hd,
            bytes_accessed=(k3.size + v3.size) * k.dtype.itemsize
            + (q3.size + N * group * hd) * q.dtype.itemsize,
            transcendentals=N * group * S,
        ),
    )(q3, k3, v3, bias_row)
    return out.reshape(B, nkv, group, hd).reshape(B, nh, 1, hd)
