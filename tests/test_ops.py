"""Tests for dmi_tpu.ops.linalg."""

import jax
import jax.numpy as jnp
import numpy as np

from dmi_tpu.ops import (
    interleave_rows,
    l2_normalize,
    pad_features,
    random_orthogonal,
    sinusoidal_positions,
)


def test_l2_normalize_rows():
    x = jnp.array([[3.0, 4.0], [0.5, 0.0]])
    y = l2_normalize(x)
    np.testing.assert_allclose(np.linalg.norm(y, axis=1), 1.0, rtol=1e-6)
    np.testing.assert_allclose(y[0], [0.6, 0.8], rtol=1e-6)


def test_random_orthogonal_is_orthogonal():
    q = random_orthogonal(jax.random.key(0), 64)
    np.testing.assert_allclose(np.asarray(q @ q.T), np.eye(64), atol=1e-5)
    # Haar sign correction: determinant is ±1, distribution over both signs
    dets = [
        float(jnp.linalg.det(random_orthogonal(jax.random.key(i), 8)))
        for i in range(16)
    ]
    assert any(d > 0 for d in dets) and any(d < 0 for d in dets)


def test_random_orthogonal_preserves_norms():
    key = jax.random.key(1)
    q = random_orthogonal(key, 32)
    x = jax.random.normal(jax.random.key(2), (5, 32))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(x @ q), axis=1),
        np.linalg.norm(np.asarray(x), axis=1),
        rtol=1e-5,
    )


def test_interleave_rows_matches_torch_semantics():
    import torch

    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    b = -np.arange(12, dtype=np.float32).reshape(3, 4)
    ours = np.asarray(interleave_rows(jnp.asarray(a), jnp.asarray(b)))
    # reference: torch.stack((a,b),0).transpose(0,1).reshape(-1, d)
    theirs = (
        torch.stack((torch.tensor(a), torch.tensor(b)), dim=0)
        .transpose(0, 1)
        .reshape(-1, 4)
        .numpy()
    )
    np.testing.assert_array_equal(ours, theirs)


def test_pad_features():
    x = jnp.ones((2, 3))
    y = pad_features(x, 5)
    assert y.shape == (2, 5)
    np.testing.assert_array_equal(np.asarray(y[:, 3:]), 0.0)
    np.testing.assert_array_equal(np.asarray(pad_features(x, 3)), np.asarray(x))


def test_sinusoidal_positions_matches_torch_formula():
    import math

    import torch

    d_model, max_len = 16, 10
    pe_t = torch.zeros(max_len, d_model)
    position = torch.arange(0, max_len, dtype=torch.float).unsqueeze(1)
    div_term = torch.exp(
        torch.arange(0, d_model, 2, dtype=torch.float) * (-math.log(10000.0) / d_model)
    )
    pe_t[:, 0::2] = torch.sin(position * div_term)
    pe_t[:, 1::2] = torch.cos(position * div_term)
    ours = np.asarray(sinusoidal_positions(d_model, max_len))
    np.testing.assert_allclose(ours, pe_t.numpy(), atol=1e-6)


def test_pin_to_device_identity_and_passthrough():
    # pin_to_device (relay residency guard, BASELINE.md round-5 8B
    # pathology) must be a bit-exact identity on array leaves of any
    # dtype and leave non-array leaves (and their positions) untouched.
    from dmi_tpu.utils.platform import pin_to_device

    tree = {
        "w": jnp.arange(12, dtype=jnp.bfloat16).reshape(3, 4),
        "q": jnp.array([1, -2, 3], dtype=jnp.int8),
        "mask": jnp.array([True, False]),
        "nested": {"scale": jnp.float32(0.5), "k": 7, "name": "adapter"},
        "none": None,
    }
    out = pin_to_device(tree)
    assert out["nested"]["k"] == 7
    assert out["nested"]["name"] == "adapter"
    assert out["none"] is None
    for path in ("w", "q", "mask"):
        assert out[path].dtype == tree[path].dtype
        np.testing.assert_array_equal(np.asarray(out[path]), np.asarray(tree[path]))
    np.testing.assert_array_equal(
        np.asarray(out["nested"]["scale"]), np.asarray(tree["nested"]["scale"])
    )
    # the array leaves must be NEW buffers (a fresh device program output),
    # not aliases of the inputs — that is the entire point of the guard
    assert out["w"] is not tree["w"]
