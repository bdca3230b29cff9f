"""Pallas kernel tests (interpreter mode on CPU; compiled path exercised on
TPU by bench/production)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmi_tpu.ops.pallas import projector as pk


def _data(B=200, mm=256, lm=256, r=32, seed=0, dtype=np.float32, lm2=None):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.normal(size=(B, mm)).astype(dtype)),
        jnp.asarray(rng.normal(size=(mm, lm)).astype(dtype) * 0.05),
        jnp.asarray(rng.normal(size=(lm,)).astype(dtype) * 0.05),
        jnp.asarray(rng.normal(size=(lm, lm)).astype(dtype) * 0.05),
        jnp.asarray(rng.normal(size=(lm,)).astype(dtype) * 0.05),
        jnp.asarray(rng.normal(size=(mm, r)).astype(dtype) * 0.05),
        jnp.asarray(rng.normal(size=(r, lm)).astype(dtype) * 0.05),
        jnp.asarray(rng.normal(size=(lm,)).astype(dtype) * 0.05),
    )


def test_fused_mlp2_interpret_matches_xla():
    from jax.experimental.pallas import tpu as pltpu

    x, w0, b0, w1, b1, *_ = _data()
    ref = pk._mlp2_xla(x, w0, b0, w1, b1)
    with pltpu.force_tpu_interpret_mode():
        out = pk._mlp2_pallas(x, w0, b0, w1, b1)
    assert out.shape == ref.shape  # batch 200 padded to 256 then sliced
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_lora0_interpret_matches_xla():
    from jax.experimental.pallas import tpu as pltpu

    x, w0, b0, _, _, a, b, d = _data(seed=1)
    ref = pk._lora0_xla(x, w0, b0, a, b, d)
    with pltpu.force_tpu_interpret_mode():
        out = pk._lora0_pallas(x, w0, b0, a, b, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_wrappers_fall_back_off_tpu():
    x, w0, b0, w1, b1, a, b, d = _data(B=8)
    # default_backend is cpu under tests -> wrapper must use the XLA twin
    out = pk.fused_mlp2(x, w0, b0, w1, b1)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(pk._mlp2_xla(x, w0, b0, w1, b1)), atol=1e-6
    )
    out = pk.fused_lora_layer0(x, w0, b0, a, b, d)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(pk._lora0_xla(x, w0, b0, a, b, d)), atol=1e-6
    )


def test_custom_vjp_grads_match_xla():
    x, w0, b0, w1, b1, a, b, d = _data(B=16)

    g1 = jax.grad(lambda *args: pk.fused_mlp2(*args).sum(), argnums=(0, 1, 2, 3, 4))(
        x, w0, b0, w1, b1
    )
    g2 = jax.grad(lambda *args: pk._mlp2_xla(*args).sum(), argnums=(0, 1, 2, 3, 4))(
        x, w0, b0, w1, b1
    )
    for u, v in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v), atol=1e-5)

    g1 = jax.grad(lambda *args: pk.fused_lora_layer0(*args).sum(), argnums=(0, 3, 4, 5))(
        x, w0, b0, a, b, d
    )
    g2 = jax.grad(lambda *args: pk._lora0_xla(*args).sum(), argnums=(0, 3, 4, 5))(
        x, w0, b0, a, b, d
    )
    for u, v in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v), atol=1e-5)


def test_tiled_mlp2_interpret_matches_xla():
    """Column-tiled variant (h scratch reuse) for weights too big for
    single-block residency."""
    from jax.experimental.pallas import tpu as pltpu

    x, w0, b0, w1, b1, *_ = _data(B=130, mm=256, lm=512, seed=3)
    ref = pk._mlp2_xla(x, w0, b0, w1, b1)
    with pltpu.force_tpu_interpret_mode():
        out = pk._mlp2_pallas_tiled(x, w0, b0, w1, b1, tile_n=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_vmem_estimators_pin_hardware_point():
    """The x2-double-buffering model must keep reproducing the scoped
    allocation the chip reported (18.51M for the old 128x512 tiled f32
    config) and keep routing the production shapes correctly."""
    import jax.numpy as jnp

    M = 2**20
    # old failing tiled config, computed with the same x2 terms the
    # estimator uses (TILE_B=128, tile_n=512, f32 1024->2048):
    i, mm, lm, tb, tn = 4, 1024, 2048, 128, 512
    est = (mm * lm + lm) * i + 2 * (lm * tn + tn) * i + 2 * tb * mm * i \
        + tb * lm * 4 + 2 * tb * tn * i
    assert abs(est / M - 18.51) < 0.01  # chip: "Scoped allocation ... 18.51M"

    # production routing: bf16 training shape stays on the (hardware-
    # validated) single block; f32 serving shape fits only the tiled path
    xb = jnp.zeros((128, 1024), jnp.bfloat16)
    w0b = jnp.zeros((1024, 2048), jnp.bfloat16)
    w1b = jnp.zeros((2048, 2048), jnp.bfloat16)
    assert pk._mlp2_vmem_bytes(xb, w0b, w1b) <= pk.VMEM_BUDGET

    xf, w0f, w1f = (z.astype(jnp.float32) for z in (xb, w0b, w1b))
    assert pk._mlp2_vmem_bytes(xf, w0f, w1f) > pk.VMEM_BUDGET
    assert pk._mlp2_tiled_vmem_bytes(xf, w0f, w1f, 256) <= pk.VMEM_BUDGET
