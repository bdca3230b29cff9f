"""Fused projector kernels.

The projector MLP2 (x @ W0 + b0 -> gelu_tanh -> @ W1 + b1) and the
hypernet-train LoRA layer-0 forward gelu(x @ W0 + b0 + (x @ A) @ B + d)
are the trainable-path hot ops (reference: dmi/model/projector.py:56-159).
Fusing them keeps the [B, lm] intermediate in VMEM instead of round-tripping
HBM, and feeds both matmuls to the MXU back-to-back.

Kernel design:
  * grid over batch tiles (TILE_B=128 = MXU height); weights are small
    enough (mm<=1024, lm=2048 -> W0 4MB + W1 8MB bf16) to sit whole in
    VMEM for every grid step, streamed once from HBM by the pipeline
  * f32 accumulation on the MXU (preferred_element_type), cast on store
  * tanh-GELU computed in-register between the two matmuls (VPU)

Wrappers fall back to the XLA twin when shapes are not lane-aligned or the
backend is not TPU; gradients route through the twin via custom_vjp (the
backward is matmul-shaped and XLA-fuses well already).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_B = 128


def _gelu_tanh(x):
    # nn.GELU(approximate='tanh') == jax.nn.gelu(approximate=True)
    return jax.nn.gelu(x, approximate=True)


# ---------------------------------------------------------------------------
# fused MLP2
# ---------------------------------------------------------------------------

def _mlp2_kernel(x_ref, w0_ref, b0_ref, w1_ref, b1_ref, out_ref):
    h = jnp.dot(x_ref[:], w0_ref[:], preferred_element_type=jnp.float32)
    h = _gelu_tanh(h + b0_ref[:].astype(jnp.float32))
    y = jnp.dot(h.astype(w1_ref.dtype), w1_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = (y + b1_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


def _mlp2_xla(x, w0, b0, w1, b1):
    return _gelu_tanh(x @ w0 + b0) @ w1 + b1


def _mlp2_tiled_kernel(x_ref, w0_ref, b0_ref, w1_ref, b1_ref, out_ref, h_ref):
    """Grid (batch tiles, output-column tiles), j fastest: the hidden
    activation is computed once per batch tile (j == 0) into VMEM scratch
    and reused for every W1 column block — W1 never needs to be fully
    resident, so f32 production dims fit the 16MB VMEM.

    Biases arrive as (1, n) 2-D blocks: Mosaic requires 1-D operand blocks
    to match XLA's lane tiling, which a 512-wide slice of a 2048 vector
    violates."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        h = jnp.dot(x_ref[:], w0_ref[:], preferred_element_type=jnp.float32)
        h_ref[:] = _gelu_tanh(h + b0_ref[0].astype(jnp.float32))

    y = jnp.dot(
        h_ref[:].astype(w1_ref.dtype), w1_ref[:], preferred_element_type=jnp.float32
    )
    out_ref[:] = (y + b1_ref[0].astype(jnp.float32)).astype(out_ref.dtype)


def _mlp2_pallas_tiled(x, w0, b0, w1, b1, tile_n=256):
    B = x.shape[0]
    mm, lm = w0.shape
    lm2 = w1.shape[1]
    tb = TILE_B_TILED
    pad_b = (-B) % tb
    xp = jnp.pad(x, ((0, pad_b), (0, 0))) if pad_b else x
    grid = (xp.shape[0] // tb, lm2 // tile_n)
    out = pl.pallas_call(
        _mlp2_tiled_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, mm), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mm, lm), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lm), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lm, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tb, tile_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], lm2), x.dtype),
        scratch_shapes=[pltpu.VMEM((tb, lm), jnp.float32)],
    )(xp, w0, b0.reshape(1, -1), w1, b1.reshape(1, -1))
    return out[:B] if pad_b else out


def _aligned(*dims):
    return all(d % 128 == 0 for d in dims)


# Hardware enforces a ~16M scoped-VMEM limit per core.  Mosaic
# double-buffers every streamed (grid-varying) block — the estimators
# count that x2 explicitly (verified: the x2 model reproduces the 18.51M
# the chip reported for the old 512-wide tiled config) — so the budget
# only needs a small safety margin below the real limit.
VMEM_BUDGET = int(15.5 * 1024 * 1024)


def _mlp2_vmem_bytes(x, w0, w1):
    i = x.dtype.itemsize
    mm, lm = w0.shape
    lm2 = w1.shape[1]
    return (
        (mm * lm + lm + lm * lm2 + lm2) * w0.dtype.itemsize  # resident weights
        + 2 * TILE_B * mm * i                                 # input tile x2
        + TILE_B * lm * 4                                     # f32 intermediate
        + 2 * TILE_B * lm2 * i                                # output tile x2
    )


TILE_B_TILED = 64


def _mlp2_tiled_vmem_bytes(x, w0, w1, tile_n):
    """Streamed blocks are double-buffered by the pipeline (x2)."""
    i = x.dtype.itemsize
    mm, lm = w0.shape
    return (
        (mm * lm + lm) * w0.dtype.itemsize          # W0 resident (const idx)
        + 2 * (lm * tile_n + tile_n) * w0.dtype.itemsize  # W1 block x2
        + 2 * TILE_B_TILED * mm * i                 # input tile x2
        + TILE_B_TILED * lm * 4                     # h scratch (f32)
        + 2 * TILE_B_TILED * tile_n * i             # output tile x2
    )


def _lora0_vmem_bytes(x, w0, a, b):
    i = x.dtype.itemsize
    mm, lm = w0.shape
    r = ((a.shape[1] + 127) // 128) * 128
    return (
        (mm * lm + lm + mm * r + r * lm + lm) * w0.dtype.itemsize  # resident
        + 2 * TILE_B * mm * i          # input tile x2 (streamed)
        + TILE_B * (lm + r) * 4        # f32 intermediates
        + 2 * TILE_B * lm * i          # output tile x2 (streamed)
    )


def _pallas_enabled() -> bool:
    """Default ON for TPU backends (measured ~1.8x faster than the XLA twin
    for the fused MLP2 at [128,1024]x[1024,2048]x[2048,2048] bf16);
    DMI_DISABLE_PALLAS=1 falls back to the XLA twins (numerically
    equivalent up to bf16 rounding)."""
    import os

    return (
        os.environ.get("DMI_DISABLE_PALLAS") != "1"
        and jax.default_backend() == "tpu"
    )


def _mlp2_pallas(x, w0, b0, w1, b1):
    B = x.shape[0]
    mm, lm = w0.shape
    lm2 = w1.shape[1]
    pad_b = (-B) % TILE_B
    xp = jnp.pad(x, ((0, pad_b), (0, 0))) if pad_b else x
    grid = (xp.shape[0] // TILE_B,)
    out = pl.pallas_call(
        _mlp2_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_B, mm), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mm, lm), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lm,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((lm, lm2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lm2,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_B, lm2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], lm2), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * xp.shape[0] * (mm * lm + lm * lm2),
            bytes_accessed=xp.size * x.dtype.itemsize
            + (w0.size + w1.size) * w0.dtype.itemsize,
            transcendentals=xp.shape[0] * lm,
        ),
    )(xp, w0, b0, w1, b1)
    return out[:B] if pad_b else out


@partial(jax.custom_vjp, nondiff_argnums=())
def fused_mlp2(x, w0, b0, w1, b1):
    """gelu_tanh(x @ w0 + b0) @ w1 + b1 — Pallas on aligned TPU shapes.

    The single-block kernel is default-on (hardware-validated ~1.8x over
    the XLA twin at the bf16 production shapes).  The column-tiled variant
    for shapes exceeding a single block is ALSO default-on since round 3:
    an early ~700 ms/call chip reading was relay pathology — re-measured
    healthy twice (standalone 77.4 vs 89.0 ms XLA, commit 2e902be; in-loop
    1.015 vs 1.146 ms/call = 1.13x inside the serving pipeline process,
    scripts/profile_tiled_mlp.py; f32 numerics exact).  End-to-end the
    projector is ~1.4% of the 22-token serving pipeline, so the win is
    ~0.7% there; it matters at larger projector shares.
    DMI_PALLAS_TILED_MLP=0 opts back out to the XLA twin."""
    import os

    if _pallas_enabled() and _aligned(w0.shape[0], w0.shape[1], w1.shape[1]):
        if _mlp2_vmem_bytes(x, w0, w1) <= VMEM_BUDGET:
            return _mlp2_pallas(x, w0, b0, w1, b1)
        if os.environ.get("DMI_PALLAS_TILED_MLP", "1") != "0":
            tile_n = 256 if w1.shape[1] % 256 == 0 else (128 if w1.shape[1] % 128 == 0 else None)
            if tile_n is not None and _mlp2_tiled_vmem_bytes(x, w0, w1, tile_n) <= VMEM_BUDGET:
                return _mlp2_pallas_tiled(x, w0, b0, w1, b1, tile_n)
    return _mlp2_xla(x, w0, b0, w1, b1)


def _mlp2_fwd(x, w0, b0, w1, b1):
    return fused_mlp2(x, w0, b0, w1, b1), (x, w0, b0, w1, b1)


def _mlp2_bwd(res, g):
    x, w0, b0, w1, b1 = res
    _, vjp = jax.vjp(_mlp2_xla, x, w0, b0, w1, b1)
    return vjp(g)


fused_mlp2.defvjp(_mlp2_fwd, _mlp2_bwd)


# ---------------------------------------------------------------------------
# fused LoRA layer-0 (the hypernet-train forward)
# ---------------------------------------------------------------------------

def _lora0_kernel(x_ref, w0_ref, b0_ref, a_ref, b_ref, d_ref, out_ref):
    base = jnp.dot(x_ref[:], w0_ref[:], preferred_element_type=jnp.float32)
    inter = jnp.dot(x_ref[:], a_ref[:], preferred_element_type=jnp.float32)
    delta = jnp.dot(inter.astype(b_ref.dtype), b_ref[:], preferred_element_type=jnp.float32)
    y = base + delta + b0_ref[0].astype(jnp.float32) + d_ref[0].astype(jnp.float32)
    out_ref[:] = _gelu_tanh(y).astype(out_ref.dtype)


def _lora0_xla(x, w0, b0, a, b, d):
    return _gelu_tanh(x @ w0 + b0 + (x @ a) @ b + d)


def _lora0_pallas(x, w0, b0, a, b, d):
    B = x.shape[0]
    mm, lm = w0.shape
    r = a.shape[1]
    pad_b = (-B) % TILE_B
    xp = jnp.pad(x, ((0, pad_b), (0, 0))) if pad_b else x
    # rank (32) is below the 128-lane tile; pad A's columns / B's rows —
    # zero columns contribute nothing
    pad_r = (-r) % 128
    if pad_r:
        a = jnp.pad(a, ((0, 0), (0, pad_r)))
        b = jnp.pad(b, ((0, pad_r), (0, 0)))
        r = r + pad_r
    grid = (xp.shape[0] // TILE_B,)
    # bias vectors ride as (1, lm) blocks, not (lm,): a 1-D spec lowers
    # fine standalone but breaks under jax.vmap (the stage-2 coalesced
    # path vmaps this kernel over adapter groups, so the batched bias
    # becomes a (G, lm) array whose squeezed leading block Mosaic
    # rejects); with (1, lm) the vmapped block is (1, lm) == the array's
    # trailing dims and lowers everywhere.  Measured on chip via
    # scripts/profile_coalesce.py.
    out = pl.pallas_call(
        _lora0_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_B, mm), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mm, lm), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lm), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mm, r), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, lm), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lm), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_B, lm), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], lm), x.dtype),
    )(xp, w0, b0[None, :], a, b, d[None, :])
    return out[:B] if pad_b else out


@partial(jax.custom_vjp, nondiff_argnums=())
def fused_lora_layer0(x, w0, b0, a, b, d):
    """gelu_tanh(x@w0 + b0 + (x@a)@b + d) — the reference-faithful
    hypernet-train soft-token forward, fused."""
    if (
        _pallas_enabled()
        and _aligned(w0.shape[0], w0.shape[1])
        and _lora0_vmem_bytes(x, w0, a, b) <= VMEM_BUDGET
    ):
        return _lora0_pallas(x, w0, b0, a, b, d)
    return _lora0_xla(x, w0, b0, a, b, d)


def _lora0_fwd(x, w0, b0, a, b, d):
    return fused_lora_layer0(x, w0, b0, a, b, d), (x, w0, b0, a, b, d)


def _lora0_bwd(res, g):
    _, vjp = jax.vjp(_lora0_xla, *res)
    return vjp(g)


fused_lora_layer0.defvjp(_lora0_fwd, _lora0_bwd)
