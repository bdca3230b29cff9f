"""Fused batch-last decode-step MLP: one single-pass weight stream.

The decode loop below pool saturation is bound by the per-step weight
stream (BASELINE.md binding-limit analysis), and the MLP holds ~84% of a
llama layer's loop bytes (3*H*I of 3*H*I + H*(nh+2*nkv+nh)*hd).  The XLA
form runs it as two streamed matmuls with an elementwise stage between
([2I,B] gate/up -> act(gate)*up -> [I,B] @ w_down), which bounces the
[2I,B] intermediate through HBM scheduling seams at the op boundaries.

This kernel makes the whole MLP ONE grid over I-tiles:

    for each tile i:                        (streamed, double-buffered)
        g = w_gu[:, i]ᵀ  @ h                 [tI, B]  (MXU, f32 acc)
        u = w_gu[:, I+i]ᵀ @ h                [tI, B]
        acc += w_down[i]ᵀ @ (act(g) * u)     [H, B]   (resident f32)

Every weight byte is read exactly once per step; h ([H, B]) and the f32
accumulator stay resident in VMEM; Mosaic double-buffers the three
streamed weight blocks, so the next tile's DMA overlaps this tile's
MXU work with no cross-op scheduling gap.

Opt-in via DMI_PALLAS_DECODE_MLP=1 until the in-loop chip A/B promotes
it (CLAUDE.md: only in-loop ablation deltas are trustworthy); the XLA
twin `_mlp_xla_bl` is the numerics oracle (f32-accumulated bf16 matmuls
both ways; parity pinned in tests/test_pallas.py).

Reference context: the reference has no decode loop of its own (HF
generate, dmi/model/mmmodel.py:149-169); this is framework serving
surface.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dmi_tpu.ops.pallas.projector import VMEM_BUDGET, _pallas_enabled


def _act(name, x):
    if name == "silu":
        return jax.nn.silu(x)
    if name == "gelu_tanh":
        return jax.nn.gelu(x, approximate=True)
    raise ValueError(f"unknown mlp_act {name!r}")


def _kernel(act, n_tiles, gw_ref, uw_ref, dw_ref, h_ref, out_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    h = h_ref[:]
    g = jax.lax.dot_general(
        gw_ref[:], h, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    u = jax.lax.dot_general(
        uw_ref[:], h, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # round g/u to the model dtype before the activation — the XLA twin's
    # dots emit bf16, so this keeps the kernel bit-comparable to it
    a = _act(act, g.astype(h.dtype)) * u.astype(h.dtype)
    acc_ref[:] += jax.lax.dot_general(
        dw_ref[:], a, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == n_tiles - 1)
    def _flush():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _vmem_bytes(H, B, tile, itemsize):
    streamed = 3 * H * tile * itemsize * 2  # gate+up+down blocks, x2 buffered
    resident = H * B * itemsize + H * B * 4 + H * B * itemsize  # h, acc, out
    return streamed + resident


def _pick_tile(H, I, B, itemsize):
    for tile in (512, 256, 128):
        if I % tile == 0 and _vmem_bytes(H, B, tile, itemsize) <= VMEM_BUDGET:
            return tile
    return None


@partial(jax.jit, static_argnames=("act",))
def _mlp_pallas_bl(w_gu, w_down, h, act):
    H, I2 = w_gu.shape
    I = I2 // 2
    B = h.shape[1]
    tile = _pick_tile(H, I, B, np.dtype(h.dtype).itemsize)
    n_tiles = I // tile
    return pl.pallas_call(
        partial(_kernel, act, n_tiles),
        grid=(n_tiles,),
        in_specs=[
            # two views into the same concatenated [H, 2I] buffer
            pl.BlockSpec((H, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (H, tile), lambda i, n=n_tiles: (0, n + i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((tile, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((H, B), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, B), h.dtype),
        scratch_shapes=[pltpu.VMEM((H, B), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (2 * H * I + I * H),
            bytes_accessed=(w_gu.size + w_down.size + 2 * h.size)
            * np.dtype(h.dtype).itemsize,
            transcendentals=I * B,
        ),
    )(w_gu, w_gu, w_down, h)


def _mlp_xla_bl(w_gu, w_down, h, act):
    """The numerics oracle — identical math to the decode step's fused
    branch (bf16 dots with f32 internal accumulation, activation applied
    in the model dtype)."""
    gu = jax.lax.dot_general(w_gu, h, (((0,), (0,)), ((), ())))
    gate, up = jnp.split(gu, 2, axis=0)
    return jax.lax.dot_general(
        w_down, _act(act, gate) * up, (((0,), (0,)), ((), ()))
    )


def decode_mlp_available(w_gu, h) -> bool:
    if not (_pallas_enabled()
            and os.environ.get("DMI_PALLAS_DECODE_MLP") == "1"):
        return False
    if isinstance(w_gu, dict):  # quantized layouts keep the XLA path
        return False
    H, I2 = w_gu.shape
    if I2 % 2 or H % 128:
        return False
    I, B = I2 // 2, h.shape[1]
    if B % 8:
        return False
    return _pick_tile(H, I, B, np.dtype(h.dtype).itemsize) is not None


def fused_decode_mlp_bl(w_gu, w_down, h, act):
    """act(w_guᵀ[gate] h) * (w_guᵀ[up] h) -> w_downᵀ · — batch-last.

    Dispatches to the single-pass Pallas stream when enabled + aligned,
    else the XLA twin."""
    if decode_mlp_available(w_gu, h):
        return _mlp_pallas_bl(w_gu, w_down, h, act)
    return _mlp_xla_bl(w_gu, w_down, h, act)
