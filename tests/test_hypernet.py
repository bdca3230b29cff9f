"""Hypernetwork tests: shapes, masking invariance, torch oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from dmi_tpu.models import hypernet as hn
from dmi_tpu.models import projector as proj

SPEC = hn.HypnetSpec(
    lm_dim=16,
    mm_dim=12,
    n_tokens=8,
    arch="attention",
    n_heads=2,
    hypnet_dim=12,
    rank=4,
    alpha=4,
    predict_bias=True,
    n_proj_layers=2,
    use_pos_encs=True,
)


def test_adapter_shapes():
    params = hn.init(jax.random.key(0), SPEC)
    z = jnp.asarray(np.random.default_rng(0).normal(size=(8, 12)).astype(np.float32))
    a, b, d = hn.apply(SPEC, params, z)
    assert a[0].shape == (12 * 4,)  # hypnet_dim == mm_dim, no truncation
    assert a[1].shape == (16 * 4,)
    assert b[0].shape == (4 * 16,) and b[1].shape == (4 * 16,)
    assert d[0].shape == (16,) and d[1].shape == (16,)


def test_first_layer_truncation_when_hypnet_wider_than_mm():
    spec = hn.HypnetSpec(
        lm_dim=16, mm_dim=8, n_tokens=4, arch="attention", n_heads=1,
        hypnet_dim=12, rank=4, alpha=4, predict_bias=True, n_proj_layers=2,
    )
    params = hn.init(jax.random.key(1), spec)
    z = jnp.zeros((4, 12))
    a, b, d = hn.apply(spec, params, z)
    # generator emits hypnet_dim*rank = 48, truncated to mm_dim*rank = 32
    assert a[0].shape == (8 * 4,)
    assert a[1].shape == (16 * 4,)


def test_padding_mask_invariance():
    """Padding z with garbage rows (marked invalid via z_len) must not
    change the emitted adapters."""
    params = hn.init(jax.random.key(2), SPEC)
    rng = np.random.default_rng(1)
    z_short = jnp.asarray(rng.normal(size=(5, 12)).astype(np.float32))
    a1, b1, d1 = hn.apply(SPEC, params, z_short)

    garbage = jnp.asarray(rng.normal(size=(6, 12)).astype(np.float32)) * 100.0
    z_padded = jnp.concatenate([z_short, garbage], axis=0)
    a2, b2, d2 = hn.apply(SPEC, params, z_padded, z_len=jnp.asarray(5))
    for x, y in zip(a1 + b1 + d1, a2 + b2 + d2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


def test_attention_matches_torch_oracle():
    """Bare-MHSA semantics: scores/sqrt(d_model), no out-projection
    (reference: dmi/model/hypernet.py:46-82)."""
    spec = hn.HypnetSpec(
        lm_dim=16, mm_dim=12, n_tokens=2, arch="attention", n_heads=2,
        hypnet_dim=12, rank=2, alpha=2, predict_bias=False, n_proj_layers=2,
        use_pos_encs=False,
    )
    params = hn.init(jax.random.key(3), spec)
    # full context: n_z = 2*n_tokens + 1 = 5 -> no padding
    rng = np.random.default_rng(2)
    z = rng.normal(size=(5, 12)).astype(np.float32)

    a_ours, b_ours, _ = hn.apply(spec, params, jnp.asarray(z))

    # --- torch oracle ---
    seq = np.concatenate([np.asarray(params["prefix_tokens"]), z], axis=0)
    x = torch.tensor(seq)
    d, h = 12, 2
    q = x @ torch.tensor(np.asarray(params["attn"]["q"]["w"])) + torch.tensor(np.asarray(params["attn"]["q"]["b"]))
    k = x @ torch.tensor(np.asarray(params["attn"]["k"]["w"])) + torch.tensor(np.asarray(params["attn"]["k"]["b"]))
    v = x @ torch.tensor(np.asarray(params["attn"]["v"]["w"])) + torch.tensor(np.asarray(params["attn"]["v"]["b"]))
    L = x.shape[0]
    q = q.view(L, h, d // h).transpose(0, 1)
    k = k.view(L, h, d // h).transpose(0, 1)
    v = v.view(L, h, d // h).transpose(0, 1)
    scores = q @ k.transpose(-2, -1) / np.sqrt(d)
    attn = torch.softmax(scores, dim=-1) @ v
    enc = attn.transpose(0, 1).contiguous().view(L, d)
    for idx in range(2):
        gw = torch.tensor(np.asarray(params["generators"][idx]["w"]))
        gb = torch.tensor(np.asarray(params["generators"][idx]["b"]))
        w = (spec.alpha / spec.rank) * (enc[idx] @ gw + gb)
        a_dim = spec.a_dim(idx)
        np.testing.assert_allclose(
            np.asarray(a_ours[idx]), w[:a_dim].numpy(), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(b_ours[idx]), w[a_dim : a_dim + spec.b_dim(idx)].numpy(), atol=1e-5
        )


def test_transformer_matches_torch_encoder_layer():
    d, heads = 8, 2
    spec = hn.HypnetSpec(
        lm_dim=16, mm_dim=8, n_tokens=2, arch="transformer", n_layers=1,
        n_heads=heads, hypnet_dim=d, rank=2, alpha=2, predict_bias=True,
        n_proj_layers=2, use_pos_encs=False,
    )
    params = hn.init(jax.random.key(4), spec)
    blk = params["blocks"][0]

    layer = torch.nn.TransformerEncoderLayer(
        d_model=d, nhead=heads, dim_feedforward=4 * d, batch_first=True,
        activation="gelu",
    )
    layer.eval()
    sd = layer.state_dict()
    sd["self_attn.in_proj_weight"] = torch.tensor(np.asarray(blk["in_proj_w"]).T.copy())
    sd["self_attn.in_proj_bias"] = torch.tensor(np.asarray(blk["in_proj_b"]).copy())
    sd["self_attn.out_proj.weight"] = torch.tensor(np.asarray(blk["out_proj"]["w"]).T.copy())
    sd["self_attn.out_proj.bias"] = torch.tensor(np.asarray(blk["out_proj"]["b"]).copy())
    sd["linear1.weight"] = torch.tensor(np.asarray(blk["ff1"]["w"]).T.copy())
    sd["linear1.bias"] = torch.tensor(np.asarray(blk["ff1"]["b"]).copy())
    sd["linear2.weight"] = torch.tensor(np.asarray(blk["ff2"]["w"]).T.copy())
    sd["linear2.bias"] = torch.tensor(np.asarray(blk["ff2"]["b"]).copy())
    sd["norm1.weight"] = torch.tensor(np.asarray(blk["ln1"]["scale"]).copy())
    sd["norm1.bias"] = torch.tensor(np.asarray(blk["ln1"]["bias"]).copy())
    sd["norm2.weight"] = torch.tensor(np.asarray(blk["ln2"]["scale"]).copy())
    sd["norm2.bias"] = torch.tensor(np.asarray(blk["ln2"]["bias"]).copy())
    layer.load_state_dict(sd)

    rng = np.random.default_rng(3)
    x = rng.normal(size=(7, d)).astype(np.float32)
    ours = np.asarray(
        hn._transformer_block(
            spec, blk, jnp.asarray(x), jnp.ones(7, bool), train=False, rng=None
        )
    )
    theirs = layer(torch.tensor(x)[None])[0].detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_average_adapters():
    params = hn.init(jax.random.key(5), SPEC)
    rng = np.random.default_rng(4)
    z1 = jnp.asarray(rng.normal(size=(8, 12)).astype(np.float32))
    z2 = jnp.asarray(rng.normal(size=(8, 12)).astype(np.float32))
    t1 = hn.apply(SPEC, params, z1)
    t2 = hn.apply(SPEC, params, z2)
    avg = hn.average_adapters([t1, t2])
    np.testing.assert_allclose(
        np.asarray(avg[0][0]), (np.asarray(t1[0][0]) + np.asarray(t2[0][0])) / 2, atol=1e-6
    )


def test_generated_projector_pipeline():
    """hypernet -> combine_lora -> apply composes (wrapper semantics,
    dmi/model/hypernet.py:228-274)."""
    pspec = proj.ProjectorSpec(mm_dim=12, lm_dim=16, n_layers=2)
    pparams = proj.init(jax.random.key(6), pspec)
    hparams = hn.init(jax.random.key(7), SPEC)
    z = jnp.asarray(np.random.default_rng(5).normal(size=(8, 12)).astype(np.float32))
    a, b, d = hn.apply(SPEC, hparams, z)
    generated = proj.combine_lora(pspec, pparams, a, b, d)
    x = jnp.asarray(np.random.default_rng(6).normal(size=(3, 12)).astype(np.float32))
    y = proj.apply(pspec, generated, x)
    assert y.shape == (3, 16)
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.parametrize("arch", ["transformer", "att_w_nonlinear"])
def test_other_archs_jit_and_shapes(arch):
    """The reference defaults hn_arch to 'transformer' (dmi/utils/args.py:87)
    and also offers att_w_nonlinear; both must emit adapters under jit.
    (att_w_nonlinear is actually broken in the reference — nn.Sequential
    cannot take the mask argument, dmi/model/hypernet.py:172 — ours works.)"""
    spec = hn.HypnetSpec(
        lm_dim=16, mm_dim=12, n_tokens=4, arch=arch, n_layers=1, n_heads=2,
        hypnet_dim=12, rank=4, alpha=4, predict_bias=True, n_proj_layers=2,
        use_pos_encs=True,
    )
    params = hn.init(jax.random.key(8), spec)
    z = jnp.asarray(np.random.default_rng(8).normal(size=(4, 12)).astype(np.float32))

    @jax.jit
    def emit(p, z):
        return hn.apply(spec, p, z)

    a, b, d = emit(params, z)
    assert a[0].shape == (12 * 4,) and b[1].shape == (4 * 16,) and d[0].shape == (16,)
    assert all(bool(jnp.isfinite(x).all()) for x in a + b + d)

    # training mode with dropout rng runs too
    a2, _, _ = hn.apply(spec, params, z, train=True, rng=jax.random.key(9))
    assert bool(jnp.isfinite(a2[0]).all())
