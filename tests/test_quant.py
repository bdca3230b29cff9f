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
