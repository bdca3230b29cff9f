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
# (w_qkv/w_gu are the fused layouts from llama.fuse_projections)
_QUANT_KEYS = {"wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down", "w_qkv", "w_gu"}


def quantize_tensor(w: jax.Array, native: bool = False) -> dict:
    """Symmetric per-output-channel int8: reduce over the contraction (in)
    axis only, keeping layer-stack axes — (L, in, out) -> scales (L, 1, out)
    so lax.scan still slices per layer.

    native=False ("q" key): weights dequantize to bf16 before the matmul —
    halves weight HBM reads, compute unchanged (the round-1 mode).
    native=True ("q8" key): W8A8 — activations are quantized per token and
    the matmul runs int8 x int8 -> int32 on the MXU (2x bf16 throughput on
    v5e), halving BOTH the weight stream and the matmul time.  The key name
    is the mode marker so dispatch is static under tracing."""
    wf = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return {("q8" if native else "q"): q, "s": s}


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


def quantize_llama(
    params: dict, quantize_embed: bool = True, native: bool = False
) -> dict:
    """Quantize the stacked-layer Llama pytree for decode.  native=True
    selects W8A8 int8-MXU matmuls (see quantize_tensor)."""
    out: dict[str, Any] = {}
    out["final_norm"] = params["final_norm"]
    layers = {}
    for k, v in params["layers"].items():
        layers[k] = quantize_tensor(v, native) if k in _QUANT_KEYS else v
    out["layers"] = layers
    if quantize_embed:
        out["embed"] = quantize_embed_tensor(params["embed"], native)
    else:
        out["embed"] = params["embed"]
    if "lm_head" in params:
        out["lm_head"] = quantize_tensor(params["lm_head"], native)
    return out


def is_quantized(w) -> bool:
    return isinstance(w, dict) and ("q" in w or "q8" in w)
