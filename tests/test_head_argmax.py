"""Fused head+argmax Pallas kernel (ops/pallas/head_argmax.py): argmax
parity with the XLA logits route in all three decode weight modes, tie
semantics, and the availability predicate."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dmi_tpu.ops.pallas.head_argmax import (
    _head_argmax_pallas,
    _pick_bv,
    head_argmax,
    head_argmax_available,
)
from dmi_tpu.models.quant import quantize_act, quantize_embed_tensor


def _xla_tokens_bf16(embed, h):
    logits = jax.lax.dot_general(embed, h, (((1,), (0,)), ((), ())))
    return jnp.argmax(logits, axis=0).astype(jnp.int32)


def test_pick_bv():
    assert _pick_bv(128256) == 768  # Llama-3.2 vocab
    assert 128256 % 768 == 0
    assert _pick_bv(256) == 256
    assert _pick_bv(97) is None  # prime: no 32-multiple divisor


def test_bf16_parity_multiblock():
    rng = np.random.default_rng(0)
    V, H, B = 256, 64, 16
    embed = jnp.asarray(rng.normal(size=(V, H)), jnp.bfloat16)
    h = jnp.asarray(rng.normal(size=(H, B)), jnp.bfloat16)
    want = np.asarray(_xla_tokens_bf16(embed, h))
    got = np.asarray(
        _head_argmax_pallas(embed, None, h, jnp.ones((1, B), jnp.float32),
                            "bf16", bv=64, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_q8_parity():
    rng = np.random.default_rng(1)
    V, H, B = 128, 64, 8
    embed = jnp.asarray(rng.normal(size=(V, H)).astype(np.float32))
    q = quantize_embed_tensor(embed, native=True)  # {"q8", "s"[V,1]}
    h = jnp.asarray(rng.normal(size=(H, B)), jnp.bfloat16)
    hq, a = quantize_act(h, axis=0)
    # XLA route exactly as _decode_step_bl's q8 branch
    acc = jax.lax.dot_general(q["q8"], hq, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    logits = (acc * q["s"][:, 0][:, None] * a).astype(h.dtype)
    want = np.asarray(jnp.argmax(logits, axis=0))
    got = np.asarray(
        _head_argmax_pallas(q["q8"], q["s"].reshape(1, V), hq,
                            a.astype(jnp.float32), "q8", bv=32, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_q_parity():
    rng = np.random.default_rng(2)
    V, H, B = 128, 64, 8
    embed = jnp.asarray(rng.normal(size=(V, H)).astype(np.float32))
    q = quantize_embed_tensor(embed)  # {"q", "s"[V,1]}
    h = jnp.asarray(rng.normal(size=(H, B)), jnp.bfloat16)
    logits = jax.lax.dot_general(
        q["q"].astype(h.dtype), h, (((1,), (0,)), ((), ()))
    ) * q["s"].astype(h.dtype)[:, 0][:, None]
    want = np.asarray(jnp.argmax(logits, axis=0))
    got = np.asarray(
        _head_argmax_pallas(q["q"], q["s"].reshape(1, V), h,
                            jnp.ones((1, B), jnp.float32), "q", bv=32,
                            interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_tie_breaks_to_first_row_across_blocks():
    V, H, B = 128, 32, 4
    # every row identical -> every logit ties; argmax must return 0
    embed = jnp.ones((V, H), jnp.bfloat16)
    h = jnp.asarray(np.random.default_rng(3).normal(size=(H, B)), jnp.bfloat16)
    got = np.asarray(
        _head_argmax_pallas(embed, None, h, jnp.ones((1, B), jnp.float32),
                            "bf16", bv=32, interpret=True)
    )
    np.testing.assert_array_equal(got, np.zeros(B, np.int32))


def test_availability_predicate(monkeypatch):
    monkeypatch.setenv("DMI_PALLAS_HEAD_ARGMAX", "1")
    params = {"embed": jnp.ones((256, 32), jnp.bfloat16)}
    # CPU backend: _pallas_enabled() is False -> unavailable
    assert head_argmax_available(params) is False
    monkeypatch.setenv("DMI_PALLAS_HEAD_ARGMAX", "0")
    assert head_argmax_available(params) is False


def test_head_argmax_wrapper_interpret():
    rng = np.random.default_rng(4)
    V, H, B = 256, 64, 8
    embed = jnp.asarray(rng.normal(size=(V, H)), jnp.bfloat16)
    h = jnp.asarray(rng.normal(size=(H, B)), jnp.bfloat16)
    want = np.asarray(_xla_tokens_bf16(embed, h))
    got = np.asarray(head_argmax({"embed": embed}, h, interpret=True))
    np.testing.assert_array_equal(got, want)
    # untied head: wrapper declines
    assert head_argmax({"embed": embed, "lm_head": embed}, h, interpret=True) is None
