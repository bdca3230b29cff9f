"""Int8 weight quantization for the serving/decode path.

Greedy decode at caption batch sizes is weight-read bound (BASELINE.md:
~2.5GB of bf16 weights per token step).  Symmetric per-output-channel int8
halves that traffic; XLA fuses the int8->bf16 convert into the dot so the
dequantized weights never round-trip HBM.

    w ≈ q * s,   q = round(w / s) ∈ [-127, 127],   s = absmax_col / 127
    h @ w == (h @ q) * s          (s is per output column)

quantize_llama returns the same pytree shape with each matmul weight
replaced by {"q": int8, "s": scales}; llama._mm dispatches on that
structure, so forward/decode code is shared between precisions.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

# weights quantized per layer dict key; norms/bias-free tensors stay bf16
# (w_qkv/w_gu are the fused layouts from llama.fuse_projections).  MoE
# expert stacks quantize too (their HBM stream dominates a MoE decode
# step); they are consumed through dequantize() fused into the expert
# einsums — the reads stay int8/packed, the math runs in the model dtype.
_QUANT_KEYS = {"wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down", "w_qkv",
               "w_gu", "moe_w1", "moe_w3", "moe_w2",
               # deepseek-v2: MLA projections + MoE shared experts (the
               # a-norms q_a_norm/kv_a_norm stay unquantized like every
               # other norm)
               "wq_a", "wq_b", "wkv_a", "wkv_b",
               "w_shared_gate", "w_shared_up", "w_shared_down"}


def quantize_tensor(w: jax.Array, native: bool = False) -> dict:
    """Symmetric per-output-channel int8: reduce over the contraction (in)
    axis only, keeping layer-stack axes — (L, in, out) -> scales (L, 1, out)
    so lax.scan still slices per layer.

    native=False ("q" key): weights dequantize to bf16 before the matmul —
    halves weight HBM reads, compute unchanged (the round-1 mode).
    native=True ("q8" key): W8A8 — activations are quantized per token and
    the matmul runs int8 x int8 -> int32 on the MXU (2x bf16 throughput on
    v5e), halving BOTH the weight stream and the matmul time.  The key name
    is the mode marker so dispatch is static under tracing.

    Stacked (L, in, out) leaves quantize layer-by-layer via lax.map: the
    math is per-layer independent (scales reduce over the in axis only),
    and the full-leaf f32 temp OOM'd the 3B in-process companion build
    (round-4/5 bench: bf16 tree + int8 copy + a 2.8 GB f32 temp).  4-D
    MoE expert stacks (L, E, in, out) recurse one stack axis at a time —
    the (16, 8, 2048, 4096) f32 temp of a mixtral-shape leaf OOM'd the
    round-5 MoE chip companion."""
    if w.ndim >= 3 and w.shape[0] > 1:
        return jax.lax.map(lambda wl: quantize_tensor(wl, native), w)
    wf = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return {("q8" if native else "q"): q, "s": s}


def pack_w4(q: jax.Array) -> jax.Array:
    """K-split nibble packing: int8 nibbles in [-7, 7] with even contraction
    dim K (axis -2) -> uint8 (..., K/2, out) where byte (k, n) holds rows k
    (low nibble) and k + K/2 (high nibble).

    Why not jnp.int4: on this TPU stack S4 arrays cannot cross the jit
    boundary (relay arg transfer recurses, host fetch UNIMPLEMENTED) and
    lax.bitcast_convert_type(uint8 -> int4) MISCOMPILES when fused into a
    dot (all measured 2026-08-17, scripts/profile_w4_matmul.py).  uint8 is
    the boundary dtype; the arithmetic unpack is the one formulation that
    is both correct and int4-free.  K-split means each half-dot contracts a
    contiguous activation slice, which unifies the layer and head kernels
    (ops/pallas/w4_matmul)."""
    K = q.shape[-2]
    if K % 2:
        raise ValueError(f"contraction dim {K} must be even to nibble-pack")
    u = q.astype(jnp.uint8)
    lo = u[..., : K // 2, :]
    hi = u[..., K // 2 :, :]
    return (lo & 0xF) | ((hi & 0xF) << 4)


def unpack_w4(p: jax.Array) -> jax.Array:
    """Inverse of pack_w4: uint8 (..., K/2, out) -> int8 (..., K, out),
    sign-extending each nibble.  XLA fuses the shifts elementwise; inside
    Mosaic kernels the i32 variant is used instead (i8 shifts unsupported)."""
    p8 = p.astype(jnp.int8)
    lo = (p8 << 4) >> 4  # low nibble, sign-extended
    hi = p8 >> 4  # high nibble (arithmetic shift sign-extends)
    return jnp.concatenate([lo, hi], axis=-2)


def quantize_tensor_int4(w: jax.Array, group_size: int | None = None) -> dict:
    """W4A8 weights: symmetric int4 in [-7, 7], nibble-packed along the
    contraction axis (pack_w4), halving the decode loop's weight stream vs
    int8 — the stream is the binding limit at serving batch (BASELINE.md
    round-2).  Activations stay per-token int8.

    group_size None: per-output-channel scales over the full contraction
    axis ({"qp", "s"}, s (..., 1, out)) — the fast path
    (ops/pallas/w4_matmul streams the packed bytes and unpacks in-VMEM;
    the XLA twin runs two half-dots).
    group_size k: scales per k-sized block of the contraction axis
    ({"qp", "s4g"}, s4g (..., G, out)) — recovers most of int4's quality
    loss from absmax outliers; the matmul unpacks then runs G-batched
    partial dots weighted by s4g (the accuracy-oracle formulation).

    Stacked leaves chunk layer-by-layer like quantize_tensor (exact; the
    f32 temp of a whole 3B stacked leaf OOMs the in-process companion);
    4-D MoE expert stacks recurse one stack axis at a time."""
    if w.ndim >= 3 and w.shape[0] > 1:
        return jax.lax.map(
            lambda wl: quantize_tensor_int4(wl, group_size), w
        )
    wf = w.astype(jnp.float32)
    if group_size is None:
        s = jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 7.0
        s = jnp.maximum(s, 1e-12)
        q = jnp.clip(jnp.round(wf / s), -7, 7).astype(jnp.int8)
        return {"qp": pack_w4(q), "s": s}
    K = wf.shape[-2]
    if K % group_size:
        raise ValueError(f"contraction dim {K} not divisible by group {group_size}")
    G = K // group_size
    wg = wf.reshape(*wf.shape[:-2], G, group_size, wf.shape[-1])
    s = jnp.max(jnp.abs(wg), axis=-2, keepdims=True) / 7.0  # (..., G, 1, out)
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(wg / s), -7, 7).astype(jnp.int8).reshape(wf.shape)
    return {"qp": pack_w4(q), "s4g": jnp.squeeze(s, -2)}


def quantize_act(h: jax.Array, axis: int) -> tuple:
    """Dynamic symmetric per-token int8 activations: scale over the
    contraction axis.  Returns (h_q int8, scales f32 with axis kept)."""
    a = jnp.max(jnp.abs(h.astype(jnp.float32)), axis=axis, keepdims=True)
    a = jnp.maximum(a / 127.0, 1e-12)
    hq = jnp.clip(jnp.round(h.astype(jnp.float32) / a), -127, 127).astype(jnp.int8)
    return hq, a


def quantize_embed_tensor(w: jax.Array, native: bool = False) -> dict:
    """Per-vocab-row scales: correct for both the gather (rows * s[row])
    and the tied head x @ embed.T (output channel == vocab row)."""
    wf = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=-1, keepdims=True) / 127.0  # [V, 1]
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    # per-row scales distinguished by shape [V, 1]
    return {("q8" if native else "q"): q, "s": s}


def dequantize(w, dtype) -> jax.Array:
    """Materialize a quantized weight dict back to `dtype` — for consumers
    without a quantized matmul formulation (the MoE expert einsums).  XLA
    fuses the convert/rescale into the consuming einsum, so the HBM reads
    stay int8 / packed int4; only compute runs dense."""
    if not isinstance(w, dict):
        return w
    if "q8" in w or "q" in w:
        q = w["q8"] if "q8" in w else w["q"]
        return (q.astype(jnp.float32) * w["s"]).astype(dtype)
    if "qp" in w:
        q = unpack_w4(w["qp"]).astype(jnp.float32)
        if "s4g" in w:
            s4g = w["s4g"]  # (..., G, out)
            G = s4g.shape[-2]
            K = q.shape[-2]
            qg = q.reshape(*q.shape[:-2], G, K // G, q.shape[-1])
            return (qg * s4g[..., :, None, :]).reshape(q.shape).astype(dtype)
        return (q * w["s"]).astype(dtype)
    raise ValueError(f"unknown quantized dict keys {sorted(w)}")


def quantize_llama(
    params: dict,
    quantize_embed: bool = True,
    native: bool = False,
    bits: int = 8,
    group_size: int | None = None,
) -> dict:
    """Quantize the stacked-layer Llama pytree for decode.  native=True
    selects W8A8 int8-MXU matmuls (see quantize_tensor).  bits=4 selects
    W4A8 for the LAYER weights (nibble-packed int4, per-token int8
    activations; group_size optionally groups the scales along the
    contraction axis).  The tied embed stays native int8 ("q8") under
    bits=4: a packed-int4 head either materializes the [V, B] logits at a
    kernel boundary (+2x the bytes it saves) or double-reads the packed
    bytes in the XLA twin — the embed is ~11% of the per-step stream, not
    worth those costs (measured round 3)."""
    if bits not in (8, 4):
        raise ValueError(f"bits must be 8 or 4, got {bits}")
    out: dict[str, Any] = {}
    out["final_norm"] = params["final_norm"]
    layers = {}
    for k, v in params["layers"].items():
        if k not in _QUANT_KEYS:
            layers[k] = v
        elif bits == 4:
            layers[k] = quantize_tensor_int4(v, group_size)
        else:
            layers[k] = quantize_tensor(v, native)
    out["layers"] = layers
    if quantize_embed:
        out["embed"] = quantize_embed_tensor(
            params["embed"], native=native or bits == 4
        )
    else:
        out["embed"] = params["embed"]
    if "lm_head" in params:
        if bits == 4:
            out["lm_head"] = quantize_tensor_int4(params["lm_head"], group_size)
        else:
            out["lm_head"] = quantize_tensor(params["lm_head"], native)
    return out


def is_quantized(w) -> bool:
    return isinstance(w, dict) and ("q" in w or "q8" in w or "qp" in w)
