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


def test_fused_decode_mlp_interpret_matches_xla():
    """Single-pass streamed decode-MLP kernel (ops/pallas/decode_mlp) vs
    its XLA twin — silu and gelu_tanh, at shapes exercising multi-tile
    grids and the resident f32 accumulator."""
    from jax.experimental.pallas import tpu as pltpu

    from dmi_tpu.ops.pallas import decode_mlp as dm

    key = jax.random.PRNGKey(3)
    H, I, B = 256, 512, 16
    k1, k2, k3 = jax.random.split(key, 3)
    w_gu = jax.random.normal(k1, (H, 2 * I), jnp.float32) * 0.05
    w_down = jax.random.normal(k2, (I, H), jnp.float32) * 0.05
    h = jax.random.normal(k3, (H, B), jnp.float32)
    for act in ("silu", "gelu_tanh"):
        ref = dm._mlp_xla_bl(w_gu, w_down, h, act)
        with pltpu.force_tpu_interpret_mode():
            out = dm._mlp_pallas_bl(w_gu, w_down, h, act)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
        )


def test_fused_decode_mlp_gating():
    """decode_mlp_available: off by default (opt-in), off for quant
    dicts and unaligned shapes."""
    from dmi_tpu.ops.pallas import decode_mlp as dm

    w = jnp.zeros((256, 1024), jnp.float32)
    h = jnp.zeros((256, 16), jnp.float32)
    assert not dm.decode_mlp_available(w, h)  # env flag unset
    import os

    os.environ["DMI_PALLAS_DECODE_MLP"] = "1"
    try:
        assert not dm.decode_mlp_available({"q8": w}, h)  # quant dict
        assert not dm.decode_mlp_available(
            jnp.zeros((250, 1024), jnp.float32), h
        )  # H not 128-aligned
    finally:
        del os.environ["DMI_PALLAS_DECODE_MLP"]


def test_fused_lora0_vmapped_interpret_matches_xla():
    """The stage-2 coalesced path vmaps the lora0 kernel over adapter
    groups (hypernet_trainer micro_step_k -> lora_apply); 1-D bias block
    specs lowered standalone but broke under vmap on real Mosaic (round-5
    coalesce chip run), so the kernel carries (1, lm) bias blocks now —
    pin the vmapped numerics against the XLA twin."""
    from jax.experimental.pallas import tpu as pltpu

    x, w0, b0, _, _, a, b, d = _data(seed=2)
    G = 3
    xg = jnp.stack([x + i for i in range(G)])
    ag = jnp.stack([a * (1 + 0.1 * i) for i in range(G)])
    bg = jnp.stack([b * (1 - 0.1 * i) for i in range(G)])
    dg = jnp.stack([d + 0.05 * i for i in range(G)])
    ref = jax.vmap(
        lambda x_, a_, b_, d_: pk._lora0_xla(x_, w0, b0, a_, b_, d_)
    )(xg, ag, bg, dg)
    with pltpu.force_tpu_interpret_mode():
        out = jax.vmap(
            lambda x_, a_, b_, d_: pk._lora0_pallas(x_, w0, b0, a_, b_, d_)
        )(xg, ag, bg, dg)
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


def test_fused_decode_attention_interpret_matches_oracle():
    """Kernel numerics pinned to the XLA multiply-reduce twin (which the
    llama decode tests in turn pin to the einsum oracle + HF decode)."""
    import os

    from jax.experimental.pallas import tpu as pltpu

    from dmi_tpu.ops.pallas import decode_attn as dk

    rng = np.random.default_rng(5)
    B, nh, nkv, S, hd = 4, 8, 2, 13, 16
    q = jnp.asarray(rng.normal(size=(B, nh, 1, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, nkv, S, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, nkv, S, hd)).astype(np.float32))
    # batch-uniform decode bias: keys [0, pos] valid
    valid = (np.arange(S) <= 8)[None, None, :]
    bias = jnp.asarray(
        np.where(np.broadcast_to(valid, (B, 1, S)), 0.0, np.finfo(np.float32).min)
    )

    ref = dk._decode_attn_xla(q, k, v, bias)
    nb = dk._pick_block(B * nkv, nh // nkv, S, hd)
    assert nb is not None
    with pltpu.force_tpu_interpret_mode():
        out = dk._decode_attn_pallas(q, k, v, bias, nb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_decode_attention_falls_back_off_tpu():
    from dmi_tpu.ops.pallas import decode_attn as dk

    rng = np.random.default_rng(6)
    q = jnp.asarray(rng.normal(size=(2, 4, 1, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 2, 5, 8)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 2, 5, 8)).astype(np.float32))
    bias = jnp.zeros((2, 1, 5), jnp.float32)
    out = dk.fused_decode_attention(q, k, v, bias)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(dk._decode_attn_xla(q, k, v, bias)), atol=1e-6
    )


def test_decode_attn_block_picker_respects_vmem():
    from dmi_tpu.ops.pallas import decode_attn as dk

    # caption shapes: plenty of headroom -> largest block
    assert dk._pick_block(2048, 4, 40, 64) == 64
    # long-context decode: must shrink but still fit
    nb = dk._pick_block(2048, 4, 1024, 64)
    assert nb is not None and nb <= 4
    assert dk._vmem_bytes(nb, 4, 1024, 64, 2) <= pk.VMEM_BUDGET


def test_pallas_kernels_under_mesh_shard_map():
    """Sharding contract (ops/pallas/__init__ docstring): the kernels are
    per-shard ops — under a mesh, call them inside shard_map with the batch
    dim sharded over 'data'; each shard sees a lane-aligned local batch and
    the kernel runs unchanged.  (Under plain jit GSPMD treats pallas_call
    as an opaque replicated op: correct but wasteful.)  Numerics pinned to
    the XLA twin on the virtual 8-device mesh in interpret mode."""
    from functools import partial

    from jax.experimental.pallas import tpu as pltpu
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.array(jax.devices("cpu")[:4])
    mesh = Mesh(devs, ("data",))

    B, mm, lm = 4 * 128, 256, 256  # 128-row local batch per shard
    x, w0, b0, w1, b1, a, b, d = _data(B=B, mm=mm, lm=lm)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("data", None), P(), P(), P(), P()),
        out_specs=P("data", None),
        check_rep=False,
    )
    def sharded_mlp2(x, w0, b0, w1, b1):
        return pk._mlp2_pallas(x, w0, b0, w1, b1)

    ref = pk._mlp2_xla(x, w0, b0, w1, b1)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None)))
    with pltpu.force_tpu_interpret_mode():
        out = jax.jit(sharded_mlp2)(xs, w0, b0, w1, b1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("data", None), P(), P(), P(), P(), P()),
        out_specs=P("data", None),
        check_rep=False,
    )
    def sharded_lora0(x, w0, b0, a, b, d):
        return pk._lora0_pallas(x, w0, b0, a, b, d)

    ref = pk._lora0_xla(x, w0, b0, a, b, d)
    with pltpu.force_tpu_interpret_mode():
        out = jax.jit(sharded_lora0)(xs, w0, b0, a, b, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
