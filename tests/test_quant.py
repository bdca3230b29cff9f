"""Int8 weight-quantized decode path tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmi_tpu.models import decode, llama
from dmi_tpu.models.quant import quantize_llama, quantize_tensor


def test_quantize_tensor_roundtrip_error():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    qt = quantize_tensor(w)
    assert qt["q"].dtype == jnp.int8
    deq = qt["q"].astype(jnp.float32) * qt["s"].astype(jnp.float32)
    # per-channel absmax int8: max error <= s/2 per element
    err = np.abs(np.asarray(deq - w))
    bound = np.asarray(qt["s"].astype(jnp.float32))[0] / 2 + 1e-6
    assert (err <= bound[None, :]).all()


def test_quantized_forward_close_to_fp():
    cfg = llama.tiny_config(vocab_size=256, hidden_size=64, n_layers=2, n_heads=4, n_kv=2)
    params = llama.init(jax.random.key(0), cfg)
    qparams = quantize_llama(params)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(1, 256, size=(2, 10)))
    emb_fp = llama.embed_tokens(cfg, params, ids)
    emb_q = llama.embed_tokens(cfg, qparams, ids)
    # embedding rows reconstruct within int8 error
    assert float(jnp.abs(emb_fp - emb_q).max()) < 0.02

    logits_fp = llama.forward(cfg, params, emb_fp)
    logits_q = llama.forward(cfg, qparams, emb_q)
    # logits drift bounded; argmax mostly agrees on random tiny model
    agree = float((logits_fp.argmax(-1) == logits_q.argmax(-1)).mean())
    assert agree > 0.6, agree
    assert float(jnp.abs(logits_fp - logits_q).mean()) < 0.05


def test_quantized_greedy_decode_runs():
    cfg = llama.tiny_config(vocab_size=256, hidden_size=64, n_layers=2, n_heads=4, n_kv=2)
    params = llama.init(jax.random.key(0), cfg)
    qparams = quantize_llama(params)
    rng = np.random.default_rng(2)
    embeds = jnp.asarray(rng.normal(size=(3, 6, 64)).astype(np.float32) * 0.1)
    toks = decode.greedy_generate(cfg, qparams, embeds, 8, 5)
    assert toks.shape == (3, 8)
    assert np.isfinite(np.asarray(toks)).all()


def test_quantized_params_memory():
    cfg = llama.tiny_config(vocab_size=256, hidden_size=64, n_layers=2, n_heads=4, n_kv=2)
    params = llama.init(jax.random.key(0), cfg)
    qparams = quantize_llama(params)

    def nbytes(tree):
        return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))

    # int8 + small scales ≈ half the bf16... tiny config is f32 so ~1/4
    assert nbytes(qparams) < 0.5 * nbytes(params)


def test_fused_projections_match_unfused():
    from dmi_tpu.models.llama import fuse_projections

    cfg = llama.tiny_config(vocab_size=256, hidden_size=64, n_layers=2, n_heads=4, n_kv=2)
    params = llama.init(jax.random.key(0), cfg)
    fused = fuse_projections(params)
    assert "w_qkv" in fused["layers"] and "wq" not in fused["layers"]

    rng = np.random.default_rng(3)
    emb = jnp.asarray(rng.normal(size=(2, 7, 64)).astype(np.float32) * 0.1)
    l1 = llama.forward(cfg, params, emb)
    l2 = llama.forward(cfg, fused, emb)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)

    # decode equivalence (token-exact)
    t1 = decode.greedy_generate(cfg, params, emb, 6, 5)
    t2 = decode.greedy_generate(cfg, fused, emb, 6, 5)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))

    # fused + int8 compose
    q = quantize_llama(fused)
    t3 = decode.greedy_generate(cfg, q, emb, 6, 5)
    assert t3.shape == (2, 6)

def test_w8a8_matmul_error_bound():
    """Native W8A8 (int8 x int8 -> int32 MXU) matmuls: both the batch-first
    (_mm) and batch-last (_mm_bl) forms stay within the combined weight+
    activation int8 quantization error of the exact product."""
    from dmi_tpu.models.decode import _mm_bl

    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.normal(size=(64, 48)).astype(np.float32))
    h = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
    exact = np.asarray(h @ w)
    scale = np.abs(exact).max()

    qt = quantize_tensor(w, native=True)
    assert qt["q8"].dtype == jnp.int8
    got_bf = np.asarray(llama._mm(h, qt))
    got_bl = np.asarray(_mm_bl(qt, h.T)).T
    # ~1% relative: two symmetric int8 roundings over 64-length dots
    assert np.abs(got_bf - exact).max() < 0.02 * scale
    assert np.abs(got_bl - exact).max() < 0.02 * scale
    # same int accumulations, same rescale factors -> near-identical paths
    assert np.abs(got_bf - got_bl).max() < 1e-5 * scale


def test_w8a8_decode_runs_and_tracks_fp():
    """W8A8 greedy decode (batch-first and batch-last) runs end-to-end and
    mostly agrees with the fp path on a tiny random model."""
    cfg = llama.tiny_config(vocab_size=256, hidden_size=64, n_layers=2, n_heads=4, n_kv=2)
    params = llama.init(jax.random.key(0), cfg)
    nparams = quantize_llama(params, native=True)
    rng = np.random.default_rng(4)
    embeds = jnp.asarray(rng.normal(size=(3, 6, 64)).astype(np.float32) * 0.1)

    fp = np.asarray(decode.greedy_generate(cfg, params, embeds, 8, 5))
    q_bf = np.asarray(decode.greedy_generate(cfg, nparams, embeds, 8, 5))
    q_bl = np.asarray(decode.greedy_generate_bl(cfg, nparams, embeds, 8, 5))
    assert q_bf.shape == fp.shape == q_bl.shape
    # quantization flips occasional argmaxes on a random tiny model, but
    # the sequences should still track the fp decode closely
    assert (q_bl == fp).mean() > 0.5, (q_bl, fp)

    # fused-projection quantized tree also works
    nfused = quantize_llama(llama.fuse_projections(params), native=True)
    q_blf = np.asarray(decode.greedy_generate_bl(cfg, nfused, embeds, 8, 5))
    assert q_blf.shape == fp.shape


def test_w8a8_forward_close_to_fp():
    """Full-sequence forward with q8 weights (prefill path) stays close to
    the fp logits — exercises _mm and the tied q8 head matmul."""
    cfg = llama.tiny_config(vocab_size=256, hidden_size=64, n_layers=2, n_heads=4, n_kv=2)
    params = llama.init(jax.random.key(0), cfg)
    nparams = quantize_llama(params, native=True)
    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(1, 256, size=(2, 10)))
    emb_fp = llama.embed_tokens(cfg, params, ids)
    emb_q = llama.embed_tokens(cfg, nparams, ids)
    assert float(jnp.abs(emb_fp - emb_q).max()) < 0.02

    logits_fp = llama.forward(cfg, params, emb_fp)
    logits_q = llama.forward(cfg, nparams, emb_q)
    agree = float((logits_fp.argmax(-1) == logits_q.argmax(-1)).mean())
    assert agree > 0.6, agree
    assert float(jnp.abs(logits_fp - logits_q).mean()) < 0.08
