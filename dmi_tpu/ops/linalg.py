"""Small linear-algebra ops shared across the stack (pure XLA, jittable).

These replace host-side compute the reference performs inside its hot loop:
  * random_orthogonal — on-device isometric augmentation via QR of a
    Gaussian, replacing scipy.stats.ortho_group.rvs on CPU
    (reference: dmi/train_hypernet.py:56-57).
  * l2_normalize — row normalization of modality/text/prefix embeddings
    (reference: dmi/utils/model_utils.py:47-62).
  * interleave_rows — (mm, text) row interleaving of the conditioning set
    (reference: dmi/train_hypernet.py:76-83).
  * pad_features — zero-pad pruned embeddings back to the shared interface
    dim (reference: dmi/train_hypernet.py:99-100).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 0.0) -> jax.Array:
    """Row-normalize like torch `x / x.norm(dim=1, keepdim=True)` (no eps
    by default — the reference divides by the raw norm)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    if eps:
        norm = jnp.maximum(norm, eps)
    return x / norm


def random_orthogonal(key: jax.Array, dim: int, dtype=jnp.float32) -> jax.Array:
    """Haar-distributed random orthogonal matrix, entirely on device.

    QR of an i.i.d. Gaussian with sign correction of R's diagonal yields the
    Haar measure on O(dim) — the same distribution as scipy's ortho_group
    used by the reference for isometric embedding-space augmentation, but
    jittable and TPU-resident (no host round-trip in the train step).
    """
    g = jax.random.normal(key, (dim, dim), dtype=jnp.float32)
    q, r = jnp.linalg.qr(g)
    # Make the decomposition unique (and Haar): flip columns so diag(r) > 0.
    d = jnp.sign(jnp.diagonal(r))
    d = jnp.where(d == 0, 1.0, d)
    return (q * d[None, :]).astype(dtype)


def interleave_rows(a: jax.Array, b: jax.Array) -> jax.Array:
    """Interleave rows of two [n, d] arrays -> [2n, d] as (a0, b0, a1, b1, …).

    Matches torch.stack((a, b), 0).transpose(0, 1).reshape(-1, d)."""
    assert a.shape == b.shape, (a.shape, b.shape)
    stacked = jnp.stack((a, b), axis=1)  # [n, 2, d]
    return stacked.reshape(-1, *a.shape[1:])


def pad_features(x: jax.Array, target_dim: int) -> jax.Array:
    """Zero-pad the last dim up to target_dim (no-op if already there)."""
    cur = x.shape[-1]
    if cur == target_dim:
        return x
    if cur > target_dim:
        raise ValueError(f"cannot pad {cur} -> {target_dim}")
    pad = [(0, 0)] * (x.ndim - 1) + [(0, target_dim - cur)]
    return jnp.pad(x, pad)


def sinusoidal_positions(d_model: int, max_len: int, pos_offset: int = 0) -> jax.Array:
    """Standard sinusoidal positional table [max_len, d_model]
    (semantics of dmi/model/hypernet.py:16-23; interleaved sin/cos)."""
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None] + pos_offset
    div_term = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-jnp.log(10000.0) / d_model)
    )
    angles = position * div_term[None, :]
    pe = jnp.zeros((max_len, d_model), dtype=jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(angles))
    pe = pe.at[:, 1::2].set(jnp.cos(angles))
    return pe
