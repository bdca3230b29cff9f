"""HF-parity tests for the JAX Llama: logits, loss, greedy decode.

Oracle: transformers.LlamaForCausalLM with a tiny random config on CPU —
the exact module the reference treats as its frozen LM
(dmi/utils/model_utils.py:17-20)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from dmi_tpu.models import decode as dec
from dmi_tpu.models import llama

transformers = pytest.importorskip("transformers")

EOS = (5, 7)
PAD = 5


def make_pair(seed=0, tie=True):
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=512,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=tie,
        attn_implementation="eager",
        bos_token_id=0,
        eos_token_id=list(EOS),
        pad_token_id=PAD,
    )
    torch.manual_seed(seed)
    hf = transformers.LlamaForCausalLM(hf_cfg)
    hf.eval()

    cfg = llama.tiny_config(eos=EOS)
    params = llama.from_hf_state_dict(hf.state_dict(), cfg)
    return hf, cfg, params


def test_logits_match_hf():
    hf, cfg, params = make_pair()
    rng = np.random.default_rng(0)
    B, T, H = 3, 11, 64
    embeds = rng.normal(size=(B, T, H)).astype(np.float32) * 0.1
    mask = np.ones((B, T), np.int64)
    mask[1, -3:] = 0  # right padding
    mask[2, -1:] = 0

    ours = np.asarray(
        llama.forward(cfg, params, jnp.asarray(embeds), jnp.asarray(mask))
    )
    with torch.no_grad():
        theirs = hf(
            inputs_embeds=torch.tensor(embeds), attention_mask=torch.tensor(mask)
        ).logits.numpy()
    # padded query rows are garbage on both sides; compare valid rows
    for b in range(B):
        t_valid = int(mask[b].sum())
        # f32 accumulation-order noise (XLA vs oneDNN) reaches ~5e-4 here;
        # real mask/rope/layout bugs produce O(1) differences.
        np.testing.assert_allclose(
            ours[b, :t_valid], theirs[b, :t_valid], atol=1e-3, rtol=1e-3
        )


def test_logits_match_hf_untied():
    hf, cfg, params = make_pair(seed=3, tie=False)
    cfg = llama.LlamaConfig(**{**cfg.__dict__, "tie_word_embeddings": False})
    params = llama.from_hf_state_dict(hf.state_dict(), cfg)
    rng = np.random.default_rng(4)
    embeds = rng.normal(size=(2, 7, 64)).astype(np.float32) * 0.1
    ours = np.asarray(llama.forward(cfg, params, jnp.asarray(embeds)))
    with torch.no_grad():
        theirs = hf(inputs_embeds=torch.tensor(embeds)).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-3, rtol=1e-3)


def test_loss_matches_hf():
    hf, cfg, params = make_pair(seed=1)
    rng = np.random.default_rng(1)
    B, T = 2, 9
    embeds = rng.normal(size=(B, T, 64)).astype(np.float32) * 0.1
    mask = np.ones((B, T), np.int64)
    labels = rng.integers(0, 256, size=(B, T))
    labels[:, :3] = -100  # masked prompt region (collator semantics)
    labels[1, -2:] = -100

    logits = llama.forward(cfg, params, jnp.asarray(embeds), jnp.asarray(mask))
    ours = float(llama.causal_lm_loss(logits, jnp.asarray(labels)))
    with torch.no_grad():
        theirs = float(
            hf(
                inputs_embeds=torch.tensor(embeds),
                attention_mask=torch.tensor(mask),
                labels=torch.tensor(labels),
            ).loss
        )
    assert abs(ours - theirs) < 2e-4, (ours, theirs)


def test_greedy_generate_matches_hf():
    hf, cfg, params = make_pair(seed=2)
    rng = np.random.default_rng(2)
    B, T = 3, 6
    embeds = rng.normal(size=(B, T, 64)).astype(np.float32) * 0.1

    max_new = 12
    ours = np.asarray(
        dec.greedy_generate(cfg, params, jnp.asarray(embeds), max_new, PAD)
    )
    with torch.no_grad():
        theirs = hf.generate(
            inputs_embeds=torch.tensor(embeds),
            max_new_tokens=max_new,
            do_sample=False,
            pad_token_id=PAD,
            eos_token_id=list(EOS),
        ).numpy()
    # HF returns only new tokens for inputs_embeds prompts, trimmed to the
    # longest unfinished sequence; ours is fixed [B, max_new] pad-filled.
    W = theirs.shape[1]
    np.testing.assert_array_equal(ours[:, :W], theirs)
    assert (ours[:, W:] == PAD).all()


def test_decode_cache_matches_full_forward():
    """Prefill+steps through the KV cache must equal the full forward."""
    _, cfg, params = make_pair(seed=5)
    rng = np.random.default_rng(5)
    B, T, new = 2, 5, 4
    embeds = jnp.asarray(rng.normal(size=(B, T, 64)).astype(np.float32) * 0.1)

    tokens = dec.greedy_generate(cfg, params, embeds, new, PAD)
    # replay: full forward over prompt + embedded generated tokens
    gen_embeds = params["embed"][tokens]
    full = jnp.concatenate([embeds, gen_embeds], axis=1)
    logits = llama.forward(cfg, params, full)
    # next-token argmax at each position must reproduce the generated ids
    for b in range(B):
        for i in range(new):
            prev = np.asarray(tokens)[b, :i]
            if PAD in prev[:-1] if len(prev) else False:
                break
            pred = int(jnp.argmax(logits[b, T - 1 + i]))
            tok = int(tokens[b, i])
            if i > 0 and tok == PAD and int(tokens[b, i - 1]) in (*EOS, PAD):
                continue  # finished sequence
            assert pred == tok, (b, i, pred, tok)


def test_rope_llama3_scaling_matches_hf():
    """Llama-3 rope scaling parity against HF's rope utils."""
    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS

    cfg = llama.LlamaConfig()  # 1B defaults with llama3 scaling
    hf_cfg = transformers.LlamaConfig(
        hidden_size=2048,
        num_attention_heads=32,
        head_dim=64,
        rope_theta=500000.0,
        max_position_embeddings=131072,
        rope_scaling={
            "rope_type": "llama3",
            "factor": 32.0,
            "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 8192,
        },
    )
    inv_hf, _ = ROPE_INIT_FUNCTIONS["llama3"](hf_cfg, "cpu")
    ours = np.asarray(llama.rope_inv_freq(cfg))
    np.testing.assert_allclose(ours, inv_hf.numpy(), rtol=1e-6)


def test_remat_forward_and_grads_match():
    """jax.checkpoint rematerialization must not change values or grads."""
    import jax

    _, cfg, params = make_pair(seed=7)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 6, 64)).astype(np.float32) * 0.1)

    y1 = llama.forward(cfg, params, x, remat=False)
    y2 = llama.forward(cfg, params, x, remat=True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)

    g1 = jax.grad(lambda x: float_loss(cfg, params, x, False))(x)
    g2 = jax.grad(lambda x: float_loss(cfg, params, x, True))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


def float_loss(cfg, params, x, remat):
    return jnp.sum(llama.forward(cfg, params, x, remat=remat) ** 2)


def test_sample_generate_temperature_and_topk():
    _, cfg, params = make_pair(seed=8)
    rng = np.random.default_rng(8)
    embeds = jnp.asarray(rng.normal(size=(3, 5, 64)).astype(np.float32) * 0.1)

    # near-zero temperature reproduces greedy
    cold = dec.sample_generate(
        cfg, params, embeds, 8, PAD, jax.random.key(0), temperature=1e-4
    )
    greedy = dec.greedy_generate(cfg, params, embeds, 8, PAD)
    np.testing.assert_array_equal(np.asarray(cold), np.asarray(greedy))

    # hot sampling differs across keys (with overwhelming probability)
    h1 = dec.sample_generate(cfg, params, embeds, 8, PAD, jax.random.key(1), temperature=2.0)
    h2 = dec.sample_generate(cfg, params, embeds, 8, PAD, jax.random.key(2), temperature=2.0)
    assert not np.array_equal(np.asarray(h1), np.asarray(h2))

    # top-k=1 is greedy regardless of temperature
    tk = dec.sample_generate(
        cfg, params, embeds, 8, PAD, jax.random.key(3), temperature=5.0, top_k=1
    )
    np.testing.assert_array_equal(np.asarray(tk), np.asarray(greedy))


@pytest.mark.slow
def test_flash_attention_matches_xla(monkeypatch):
    """Pallas TPU flash attention (training path) vs the XLA oracle —
    causal + right-padding, values and grads, interpret mode on CPU."""
    import dataclasses

    from jax.experimental.pallas import tpu as pltpu

    monkeypatch.setenv("DMI_FORCE_FLASH", "1")  # CPU guard bypass for tests

    cfg = llama.tiny_config(
        vocab_size=256, hidden_size=256, n_layers=1, n_heads=2, n_kv=1,
        intermediate=256,
    )
    params = llama.init(jax.random.key(9), cfg)
    cfg_f = dataclasses.replace(cfg, attention_impl="flash")

    rng = np.random.default_rng(9)
    B, T = 2, 256  # flash block sizes need T >= 128
    x = jnp.asarray(rng.normal(size=(B, T, 256)).astype(np.float32) * 0.1)
    mask = np.ones((B, T), np.int64)
    mask[1, -64:] = 0
    mask_j = jnp.asarray(mask)

    y_ref = llama.forward(cfg, params, x, mask_j)
    with pltpu.force_tpu_interpret_mode():
        y_flash = llama.forward(cfg_f, params, x, mask_j)
    # pad-EXACT: every position must match, including pad-query rows (the
    # preserved collator quirk counts pad-position labels in the loss, so
    # those logits are part of the training objective)
    np.testing.assert_allclose(
        np.asarray(y_flash), np.asarray(y_ref), atol=2e-3, rtol=2e-3
    )

    # grads through the custom vjp
    labels = jnp.asarray(rng.integers(1, 256, size=(B, T)))

    def loss(cfg_, x):
        return llama.causal_lm_loss(llama.forward(cfg_, params, x, mask_j), labels)

    g_ref = jax.grad(lambda x: loss(cfg, x))(x)
    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(lambda x: loss(cfg_f, x))(x)
    np.testing.assert_allclose(
        np.asarray(g_flash), np.asarray(g_ref), atol=2e-3, rtol=2e-2
    )


def test_decode_attention_matches_oracle():
    """The VPU multiply-reduce decode attention must be numerically
    equivalent to the einsum oracle on the single-token cache step."""
    import numpy as np

    rng = np.random.default_rng(11)
    B, nh, nkv, S, hd = 3, 8, 2, 13, 16
    q = jnp.asarray(rng.normal(size=(B, nh, 1, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, nkv, S, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, nkv, S, hd)).astype(np.float32))
    valid = jnp.asarray(rng.integers(0, 2, size=(B, 1, S)).astype(bool))
    valid = valid.at[:, :, 0].set(True)  # at least one valid key
    bias = jnp.where(valid, 0.0, jnp.finfo(jnp.float32).min)

    oracle = np.asarray(llama._attention(q, k, v, bias))
    fast = np.asarray(llama._decode_attention(q, k, v, bias))
    np.testing.assert_allclose(fast, oracle, atol=2e-5)


def test_decode_attention_blockdiag_matches_oracle():
    """Block-diagonal batched-matmul decode attention vs the einsum oracle."""
    import numpy as np

    rng = np.random.default_rng(12)
    B, nh, nkv, S, hd = 3, 8, 2, 13, 16
    q = jnp.asarray(rng.normal(size=(B, nh, 1, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, nkv, S, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, nkv, S, hd)).astype(np.float32))
    valid = (np.arange(S) <= 7)[None, None, :]
    bias = jnp.asarray(
        np.where(np.broadcast_to(valid, (B, 1, S)), 0.0, np.finfo(np.float32).min)
    )
    oracle = np.asarray(llama._attention(q, k, v, bias))
    fast = np.asarray(llama._decode_attention_blockdiag(q, k, v, bias))
    np.testing.assert_allclose(fast, oracle, atol=2e-5)

def test_greedy_generate_bl_matches_reference_path():
    """Batch-last decode (dec.greedy_generate_bl) is token-identical to the
    batch-first reference path across tie/untie, EOS finishing, and the
    fused-projection layout."""
    for seed, tie in ((11, True), (12, False)):
        hf, cfg, params = make_pair(seed=seed, tie=tie)
        if not tie:
            cfg = llama.LlamaConfig(**{**cfg.__dict__, "tie_word_embeddings": False})
            params = llama.from_hf_state_dict(hf.state_dict(), cfg)
        rng = np.random.default_rng(seed)
        embeds = jnp.asarray(rng.normal(size=(4, 6, 64)).astype(np.float32) * 0.1)
        ref = np.asarray(dec.greedy_generate(cfg, params, embeds, 10, PAD))
        bl = np.asarray(dec.greedy_generate_bl(cfg, params, embeds, 10, PAD))
        np.testing.assert_array_equal(bl, ref)

        fused = llama.fuse_projections(params)
        blf = np.asarray(dec.greedy_generate_bl(cfg, fused, embeds, 10, PAD))
        np.testing.assert_array_equal(blf, ref)


def test_greedy_generate_bl_matches_hf():
    hf, cfg, params = make_pair(seed=2)
    rng = np.random.default_rng(2)
    B, T = 3, 6
    embeds = rng.normal(size=(B, T, 64)).astype(np.float32) * 0.1
    max_new = 12
    ours = np.asarray(
        dec.greedy_generate_bl(cfg, params, jnp.asarray(embeds), max_new, PAD)
    )
    with torch.no_grad():
        theirs = hf.generate(
            inputs_embeds=torch.tensor(embeds),
            max_new_tokens=max_new,
            do_sample=False,
            pad_token_id=PAD,
            eos_token_id=list(EOS),
        ).numpy()
    W = theirs.shape[1]
    np.testing.assert_array_equal(ours[:, :W], theirs)
    assert (ours[:, W:] == PAD).all()


@pytest.mark.slow
def test_greedy_generate_bl_int8():
    """Batch-last decode accepts int8-quantized pytrees (plain and fused)
    and agrees with the batch-first decode on the same quantized weights."""
    from dmi_tpu.models import quant

    _, cfg, params = make_pair(seed=13)
    rng = np.random.default_rng(13)
    embeds = jnp.asarray(rng.normal(size=(2, 5, 64)).astype(np.float32) * 0.1)
    q = quant.quantize_llama(params)
    ref = np.asarray(dec.greedy_generate(cfg, q, embeds, 8, PAD))
    bl = np.asarray(dec.greedy_generate_bl(cfg, q, embeds, 8, PAD))
    np.testing.assert_array_equal(bl, ref)
    qf = quant.quantize_llama(llama.fuse_projections(params))
    blf = np.asarray(dec.greedy_generate_bl(cfg, qf, embeds, 8, PAD))
    np.testing.assert_array_equal(blf, ref)

@pytest.mark.slow
def test_flash_attention_nonmultiple_seq(monkeypatch):
    """Flash at seq lengths that are NOT 128 multiples (605-style budgets,
    tiny smokes): the transparent pad-to-128 must keep values and grads
    equal to the oracle."""
    import dataclasses

    from jax.experimental.pallas import tpu as pltpu

    monkeypatch.setenv("DMI_FORCE_FLASH", "1")

    cfg = llama.tiny_config(
        vocab_size=128, hidden_size=128, n_layers=1, n_heads=2, n_kv=1,
        intermediate=128,
    )
    params = llama.init(jax.random.key(10), cfg)
    cfg_f = dataclasses.replace(cfg, attention_impl="flash")

    rng = np.random.default_rng(10)
    B, T = 2, 57  # pads to 128 inside _flash_attention
    x = jnp.asarray(rng.normal(size=(B, T, 128)).astype(np.float32) * 0.1)
    mask = np.ones((B, T), np.int64)
    mask[1, -9:] = 0
    mask_j = jnp.asarray(mask)

    y_ref = llama.forward(cfg, params, x, mask_j)
    with pltpu.force_tpu_interpret_mode():
        y_flash = llama.forward(cfg_f, params, x, mask_j)
    np.testing.assert_allclose(
        np.asarray(y_flash), np.asarray(y_ref), atol=2e-3, rtol=2e-3
    )

    labels = jnp.asarray(rng.integers(1, 128, size=(B, T)))

    def loss(cfg_, x):
        return llama.causal_lm_loss(llama.forward(cfg_, params, x, mask_j), labels)

    g_ref = jax.grad(lambda x: loss(cfg, x))(x)
    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(lambda x: loss(cfg_f, x))(x)
    np.testing.assert_allclose(
        np.asarray(g_flash), np.asarray(g_ref), atol=2e-3, rtol=2e-2
    )


@pytest.mark.slow
def test_greedy_generate_bl_phase_schedule_sweep():
    """The windowed-phase/pair-unroll/final-step-elision loop must stay
    token-identical to the batch-first path across prompt lengths and
    budgets that produce different phase structures: single phase,
    multi-phase, odd/even phase lengths, max_new=1, and EOS firing
    mid-phase (make_pair's EOS ids do occur in these random decodes)."""
    hf, cfg, params = make_pair(seed=7)
    rng = np.random.default_rng(7)
    for T, max_new in [(1, 1), (2, 3), (5, 9), (7, 16), (16, 22), (3, 24)]:
        embeds = jnp.asarray(
            rng.normal(size=(4, T, 64)).astype(np.float32) * 0.1
        )
        ref = np.asarray(dec.greedy_generate(cfg, params, embeds, max_new, PAD))
        bl = np.asarray(dec.greedy_generate_bl(cfg, params, embeds, max_new, PAD))
        np.testing.assert_array_equal(bl, ref, err_msg=f"T={T} new={max_new}")


def test_generate_zero_budget_returns_empty():
    """max_new_tokens=0 must return [B, 0] (review fix: the final-token
    write used to be unconditional and errored at trace time)."""
    _, cfg, params = make_pair(seed=3)
    embeds = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 4, 64)).astype(np.float32)
    )
    assert dec.greedy_generate(cfg, params, embeds, 0, PAD).shape == (2, 0)
    assert dec.greedy_generate_bl(cfg, params, embeds, 0, PAD).shape == (2, 0)
    assert dec.sample_generate(
        cfg, params, embeds, 0, PAD, jax.random.key(0)
    ).shape == (2, 0)


def test_sampling_applies_final_softcap():
    """Stochastic decode must draw from CAPPED logits (HF applies gemma-2's
    final_logit_softcapping before the warpers; tanh rescaling changes the
    distribution even though it is argmax-invariant).  Regression: the
    batch-last loop sampled from _decode_step_bl's uncapped head output
    while the prefill-derived first draw was capped.  Oracle: per-step
    full-sequence llama.forward (always caps) + the same request-indexed
    keys/warp chain.  A small cap (0.3) makes the near-uniform capped
    distribution unmistakably different from the uncapped one."""
    import dataclasses

    cfg = llama.tiny_gemma2_config(vocab_size=64, hidden_size=32,
                                   n_layers=2, n_heads=4, n_kv=2,
                                   intermediate=64)
    cfg = dataclasses.replace(cfg, final_logit_softcap=0.3,
                              eos_token_ids=(63,))
    params = llama.init(jax.random.key(11), cfg)
    # random-init tiny logits are ~±0.4 — too small for the cap to move
    # Gumbel draws; scale the tied embed/head so raw logits reach ~±3,
    # which the 0.3 cap compresses 10x (draws must visibly change)
    params = {**params, "embed": params["embed"] * 8.0}
    B, T, budget = 4, 5, 6
    rng = np.random.default_rng(12)
    embeds = jnp.asarray(rng.normal(size=(B, T, 32)).astype(np.float32) * 0.3)
    key = jax.random.key(7)

    got = np.asarray(dec.sample_generate_bl(
        cfg, params, embeds, budget, PAD, key, temperature=1.0))

    eos = np.asarray(cfg.eos_token_ids)
    cur = embeds
    done = np.zeros((B,), bool)
    want = np.full((B, budget), PAD, np.int32)
    for step in range(budget):
        logits = llama.forward(cfg, params, cur)[:, -1, :].T  # capped [V, B]
        keys = dec._req_keys(key, jnp.arange(B), budget, step)
        tok = np.asarray(dec._sample_pick_bl(logits, keys, 1.0, 0, 1.0))
        tok = np.where(done, PAD, tok)
        want[:, step] = tok
        done |= np.isin(tok, eos)
        nxt = llama.embed_tokens(cfg, params, jnp.asarray(tok))[:, None, :]
        cur = jnp.concatenate([cur, nxt.astype(cur.dtype)], axis=1)
    np.testing.assert_array_equal(got, want)
