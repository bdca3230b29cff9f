"""Fused vocab-head matmul + greedy argmax for the decode loop.

Greedy decode never needs the logits — only argmax over them.  The XLA
path materializes the [V, B] logits in HBM every step (bf16 65 MB write +
65 MB argmax read at V=128256, B=256) purely to reduce them to [B] ids.
This kernel streams the tied-embedding rows in blocks, forms each block's
scores on the MXU in VMEM, and keeps only a running (best score, best
index) pair per batch column — the logits never touch HBM.

MEASURED ON CHIP (round 2, in-process A/B at B=256/V=128256): ~4 ms/batch
SLOWER than the XLA route in both bf16 and W8A8 modes — XLA already fuses
the argmax into the head matmul's consumer chain (the logits round-trip
this kernel targets doesn't exist in practice), and the 167-block grid x
21 steps adds ~3.5k grid-step overheads.  Kept as an OPT-IN
(DMI_PALLAS_HEAD_ARGMAX=1) with full parity tests; the only divisor of
V=128256 that fits VMEM is bv=768, so a coarser grid can't be bought
without padding the vocab.

Supports the three decode weight modes (dmi_tpu/models/quant.py):
  * plain bf16 embed [V, H]
  * "q"  int8 embed + per-row scales: rows dequantized in VMEM
  * "q8" W8A8: int8 x int8 -> int32 MXU dot, rescaled by row scales and
    the caller's per-token activation scales

Argmax parity with the XLA path (jnp.argmax(logits, axis=0)):
  * scores are rounded to the logits dtype (bf16) BEFORE comparison, so
    the compare sees exactly the values the XLA path would
  * within a block, ties pick the smallest row; across blocks, a strict
    `>` keeps the earlier block — together: first occurrence, like argmax

Reference behavior replaced: HF greedy selection inside llm.generate
(dmi/model/mmmodel.py:149-169).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from dmi_tpu.ops.pallas.projector import _pallas_enabled

def _pick_bv(V: int) -> int | None:
    """Largest block size <= 1024 that divides V and respects the int8
    (32, 128) min tile sublane; None if V has no such divisor."""
    for bv in range(1024, 31, -32):
        if V % bv == 0:
            return bv
    return None


def _kernel(e_ref, s_ref, h_ref, a_ref, idx_ref, best_ref, *, bv, mode):
    i = pl.program_id(0)
    # each mode reproduces the XLA logits path's EXACT rounding order (the
    # final .astype(bf16)) so the compare sees bit-identical values; the
    # bf16 result is then widened back to f32 EXACTLY because Mosaic's
    # in-kernel argmax supports only f32 (bf16 ties stay ties in f32, and
    # jnp.argmax picks the first, preserving argmax's tie semantics)
    if mode == "q8":
        # XLA: (int32 acc * s * a).astype(bf16)
        acc = jnp.dot(e_ref[...], h_ref[...], preferred_element_type=jnp.int32)
        scores = (
            acc.astype(jnp.float32) * s_ref[...][0][:, None] * a_ref[...]
        ).astype(jnp.bfloat16)
    elif mode == "q":
        # XLA: dot(e_bf16, h) -> bf16, then * s_bf16
        acc = jnp.dot(
            e_ref[...].astype(jnp.bfloat16), h_ref[...],
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        scores = acc * s_ref[...][0][:, None].astype(jnp.bfloat16)
    else:
        # XLA: bf16 dot accumulates f32, rounds the output to bf16
        scores = jnp.dot(
            e_ref[...], h_ref[...], preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)
    scores = scores.astype(jnp.float32)
    m = jnp.max(scores, axis=0)  # [B]
    idx = i * bv + jnp.argmax(scores, axis=0).astype(jnp.int32)

    @pl.when(i == 0)
    def _init():
        best_ref[0, :] = m
        idx_ref[0, :] = idx

    @pl.when(i > 0)
    def _update():
        # strict > keeps the earlier block on cross-block ties, matching
        # argmax's first-occurrence rule (blocks run in row order)
        better = m > best_ref[0, :]
        best_ref[0, :] = jnp.where(better, m, best_ref[0, :])
        idx_ref[0, :] = jnp.where(better, idx, idx_ref[0, :])


def _head_argmax_pallas(embed, scales, h, act_scales, mode, bv, interpret=False):
    """embed [V, H] (int8 or bf16), scales [1, V] f32 (row scales,
    transposed for lane tiling) or None, h [H, B] (int8 for q8, bf16
    otherwise), act_scales [1, B] f32 or ones.  Returns [B] int32."""
    V, H = embed.shape
    B = h.shape[1]
    grid = (V // bv,)
    if scales is None:
        scales = jnp.ones((1, V), jnp.float32)
    if act_scales is None:
        act_scales = jnp.ones((1, B), jnp.float32)
    idx, _ = pl.pallas_call(
        partial(_kernel, bv=bv, mode=mode),
        out_shape=(
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bv, H), lambda i: (i, 0)),
            pl.BlockSpec((1, bv), lambda i: (0, i)),
            pl.BlockSpec((H, B), lambda i: (0, 0)),
            pl.BlockSpec((1, B), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, B), lambda i: (0, 0)),
            pl.BlockSpec((1, B), lambda i: (0, 0)),
        ),
        interpret=interpret,
    )(embed, scales, h, act_scales)
    return idx[0]


def head_argmax_available(params: dict) -> bool:
    """Static predicate: can head_argmax serve this weight pytree?  Used
    to pick the decode-loop carry structure before tracing."""
    import os

    if os.environ.get("DMI_PALLAS_HEAD_ARGMAX", "0") != "1":
        return False
    if not _pallas_enabled():
        return False
    if "lm_head" in params:
        return False
    embed = params["embed"]
    if isinstance(embed, dict):
        key = "q8" if "q8" in embed else "q"
        if embed["s"].ndim != 2:
            return False
        return _pick_bv(embed[key].shape[0]) is not None
    return _pick_bv(embed.shape[0]) is not None


def head_argmax(params: dict, h: jax.Array, interpret: bool = False):
    """Greedy next-token ids straight from the final hidden state.

    params: the decode weight pytree (tied embeddings; plain, "q" or "q8"
    — see module docstring).  h: [H, B] batch-last final-norm output.
    Returns [B] int32, or None if the fused path doesn't apply (fall back
    to the logits + argmax route)."""
    embed = params["embed"]
    if not (interpret or _pallas_enabled()):
        return None
    if "lm_head" in params:  # untied head: not wired (no 1B use case)
        return None
    if isinstance(embed, dict):
        key = "q8" if "q8" in embed else "q"
        V, H = embed[key].shape
        bv = _pick_bv(V)
        if bv is None:
            return None
        scales = embed["s"].reshape(1, V) if embed["s"].ndim == 2 else None
        if scales is None:
            return None
        if key == "q8":
            from dmi_tpu.models.quant import quantize_act

            hq, a = quantize_act(h, axis=0)
            return _head_argmax_pallas(
                embed[key], scales, hq, a.astype(jnp.float32), "q8", bv, interpret
            )
        return _head_argmax_pallas(
            embed[key], scales, h.astype(jnp.bfloat16), None, "q", bv, interpret
        )
    V, H = embed.shape
    bv = _pick_bv(V)
    if bv is None:
        return None
    return _head_argmax_pallas(
        embed, None, h.astype(jnp.bfloat16), None, "bf16", bv, interpret
    )
