"""HF-parity tests for the non-Llama decoder families.

The reference consumes its LM through AutoModelForCausalLM
(/root/reference/dmi/utils/model_utils.py:17-20) — any HF causal decoder.
These tests pin our generic stacked-scan decoder against the executed HF
modules for qwen2 (qkv biases), gemma-2 (GeGLU, (1+w) norms, post-block
norms, attn/final softcapping, sqrt(H) embedding scale, interleaved
sliding/full attention) and mistral, on tiny random configs built offline.

The config mapping itself goes through model_utils._hf_to_config, so the
family dispatch is under test too, not just the math.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from dmi_tpu.models import decode as dec
from dmi_tpu.models import llama
from dmi_tpu.training.model_utils import _hf_to_config

transformers = pytest.importorskip("transformers")

EOS = (5, 7)
PAD = 5

_COMMON = dict(
    vocab_size=256,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=512,
    rms_norm_eps=1e-5,
    rope_theta=10000.0,
    attn_implementation="eager",
    bos_token_id=0,
    eos_token_id=list(EOS),
    pad_token_id=PAD,
)


def _hf_config(family, tie=True, sliding_window=None):
    if family == "qwen2":
        return transformers.Qwen2Config(
            **_COMMON, tie_word_embeddings=tie, use_sliding_window=False
        )
    if family == "qwen3":
        return transformers.Qwen3Config(
            **_COMMON, tie_word_embeddings=tie, head_dim=16,
            use_sliding_window=False,
        )
    if family == "phi3":
        return transformers.Phi3Config(
            **_COMMON, tie_word_embeddings=tie,
            sliding_window=sliding_window,
        )
    if family == "olmo2":
        return transformers.Olmo2Config(
            **_COMMON, tie_word_embeddings=tie,
        )
    if family == "mixtral":
        return transformers.MixtralConfig(
            **_COMMON, tie_word_embeddings=tie,
            num_local_experts=4, num_experts_per_tok=2,
            sliding_window=sliding_window,
        )
    if family == "qwen3moe":
        # a DIFFERENT dense intermediate_size proves the expert shapes come
        # from moe_intermediate_size; norm_topk_prob False (released
        # checkpoints) exercises the non-renormalized router
        common = {**_COMMON, "intermediate_size": 96}
        return transformers.Qwen3MoeConfig(
            **common, tie_word_embeddings=tie, head_dim=16,
            num_experts=4, num_experts_per_tok=2,
            moe_intermediate_size=128, norm_topk_prob=False,
            decoder_sparse_step=1, mlp_only_layers=[],
        )
    if family == "olmoe":
        # full-width q/k RMSNorm in standard PRE-norm blocks (vs olmo2's
        # post-norm), MoE without top-k renormalization (config default)
        return transformers.OlmoeConfig(
            **_COMMON, tie_word_embeddings=tie,
            num_experts=4, num_experts_per_tok=2,
        )
    if family == "gemma3":
        # distinct global (1e6, linear-scaled) vs local (1e4, unscaled)
        # rope bases so the per-layer table split is discriminative; one
        # sliding + one full layer exercises both
        common = {**_COMMON, "rope_theta": 1_000_000.0}
        return transformers.Gemma3TextConfig(
            **common, tie_word_embeddings=tie,
            head_dim=16, query_pre_attn_scalar=16,
            rope_local_base_freq=10_000.0,
            rope_scaling={"rope_type": "linear", "factor": 8.0},
            sliding_window=sliding_window or 256,
            layer_types=["sliding_attention", "full_attention"],
        )
    if family == "granite":
        # distinctive multiplier values so every Granite transform is
        # discriminative (defaults are all 1.0 == llama)
        return transformers.GraniteConfig(
            **_COMMON, tie_word_embeddings=tie,
            embedding_multiplier=12.0,
            attention_multiplier=0.03125,
            residual_multiplier=0.22,
            logits_scaling=16.0,
        )
    if family == "deepseek":
        # MLA with the full-size q_lora bottleneck, all-dense MLP stack
        # (first_k_dense_replace >= L is HF's only dense deepseek shape;
        # mixed dense/MoE stacks are rejected by the config mapping)
        common = {**_COMMON, "num_key_value_heads": 4}
        return transformers.DeepseekV2Config(
            **common, tie_word_embeddings=tie,
            q_lora_rank=24, kv_lora_rank=16,
            qk_nope_head_dim=8, qk_rope_head_dim=4, v_head_dim=8,
            first_k_dense_replace=2, n_routed_experts=None,
        )
    if family == "deepseekmoe":
        # the Lite attention layout (no q bottleneck) + deepseek MoE:
        # f32 greedy gate, NO top-k renormalization, routed_scaling_factor,
        # always-on shared experts; a DIFFERENT dense intermediate proves
        # expert shapes come from moe_intermediate_size
        common = {**_COMMON, "num_key_value_heads": 4,
                  "intermediate_size": 96}
        return transformers.DeepseekV2Config(
            **common, tie_word_embeddings=tie,
            q_lora_rank=None, kv_lora_rank=16,
            qk_nope_head_dim=8, qk_rope_head_dim=4, v_head_dim=8,
            first_k_dense_replace=0,
            n_routed_experts=4, num_experts_per_tok=2,
            moe_intermediate_size=128, norm_topk_prob=False,
            n_shared_experts=2, routed_scaling_factor=2.5,
            topk_method="greedy",
        )
    if family == "mistral":
        return transformers.MistralConfig(
            **_COMMON,
            tie_word_embeddings=tie,
            head_dim=16,
            sliding_window=sliding_window,
        )
    if family == "gemma2":
        return transformers.Gemma2Config(
            **_COMMON,
            tie_word_embeddings=tie,
            head_dim=16,
            query_pre_attn_scalar=16,
            attn_logit_softcapping=50.0,
            final_logit_softcapping=30.0,
            hidden_activation="gelu_pytorch_tanh",
            # gemma-2 alternates sliding/full starting at layer 0; a window
            # this large never binds at test lengths unless a test says so
            sliding_window=sliding_window or 256,
        )
    raise AssertionError(family)


def make_pair(family, seed=0, tie=True, sliding_window=None):
    hf_cfg = _hf_config(family, tie=tie, sliding_window=sliding_window)
    torch.manual_seed(seed)
    hf = transformers.AutoModelForCausalLM.from_config(hf_cfg)
    hf.eval()
    cfg = _hf_to_config(hf_cfg, jnp.float32, None)
    params = llama.from_hf_state_dict(hf.state_dict(), cfg)
    return hf, cfg, params


FAMILIES = ["qwen2", "gemma2", "mistral", "qwen3", "phi3", "olmo2", "granite",
            "gemma3", "mixtral", "qwen3moe", "olmoe", "deepseek",
            "deepseekmoe"]


@pytest.mark.parametrize("family", FAMILIES)
def test_config_mapping(family):
    _, cfg, params = make_pair(family)
    if family == "qwen2":
        assert cfg.attention_bias and "bq" in params["layers"]
    if family == "gemma2":
        assert cfg.post_block_norms and "ln_post_attn" in params["layers"]
        assert cfg.attn_logit_softcap == 50.0
        assert cfg.final_logit_softcap == 30.0
        assert cfg.embedding_normalizer == pytest.approx(8.0)
        assert cfg.layer_sliding == (True, False)
        # folded (1 + w) norms live in f32 so the fold is exact
        assert params["layers"]["ln_attn"].dtype == jnp.float32
    if family == "mistral":
        assert not cfg.attention_bias and cfg.sliding_window is None
    if family == "qwen3":
        assert cfg.qk_norm and "q_norm" in params["layers"]
        assert not cfg.attention_bias
        assert params["layers"]["q_norm"].shape == (2, 16)
    if family == "phi3":
        # fused checkpoint split into the shardable unfused layout
        assert params["layers"]["wq"].shape == (2, 64, 64)
        assert params["layers"]["wk"].shape == (2, 64, 32)
        assert params["layers"]["w_gate"].shape == (2, 64, 128)
    if family == "olmo2":
        assert cfg.qk_norm_wide and cfg.norm_after and not cfg.qk_norm
        # FULL-projection-width norms (nh*hd=64, nkv*hd=32), not per-head
        assert params["layers"]["q_norm"].shape == (2, 64)
        assert params["layers"]["k_norm"].shape == (2, 32)
        # ln_attn/ln_mlp hold the post-attn/post-ff OUTPUT norms
        assert "ln_post_attn" not in params["layers"]
    if family == "mixtral":
        assert cfg.num_experts == 4 and cfg.num_experts_per_tok == 2
        # stacked expert weights [L, E, H, I] / router [L, H, E]
        assert params["layers"]["moe_w1"].shape == (2, 4, 64, 128)
        assert params["layers"]["moe_w2"].shape == (2, 4, 128, 64)
        assert params["layers"]["w_router"].shape == (2, 64, 4)
        assert "w_gate" not in params["layers"]
    if family == "qwen3moe":
        assert cfg.qk_norm and cfg.num_experts == 4
        assert not cfg.moe_norm_topk  # released-checkpoint router semantics
        # expert shapes from moe_intermediate_size (128), NOT the dense 96
        assert params["layers"]["moe_w1"].shape == (2, 4, 64, 128)
        assert params["layers"]["q_norm"].shape == (2, 16)
    if family == "olmoe":
        assert cfg.qk_norm_wide and cfg.num_experts == 4
        assert not cfg.norm_after  # standard PRE-norm blocks, unlike olmo2
        assert not cfg.moe_norm_topk  # OlmoeConfig default norm_topk_prob
        assert params["layers"]["q_norm"].shape == (2, 64)
        assert params["layers"]["k_norm"].shape == (2, 32)
        assert params["layers"]["moe_w1"].shape == (2, 4, 64, 128)
        assert "w_gate" not in params["layers"]
    if family == "gemma3":
        assert cfg.qk_norm and cfg.post_block_norms and cfg.norm_plus_one
        assert cfg.rope_local_theta == pytest.approx(10_000.0)
        assert cfg.rope_linear_factor == pytest.approx(8.0)
        assert cfg.rope_theta == pytest.approx(1_000_000.0)
        assert cfg.attn_logit_softcap is None
        assert cfg.final_logit_softcap is None
        assert cfg.layer_sliding == (True, False)
        assert cfg.embedding_normalizer == pytest.approx(8.0)
    if family == "deepseek":
        assert cfg.kv_lora_rank == 16 and cfg.q_lora_rank == 24
        assert cfg.head_dim == 12  # qk width (8 nope + 4 rope), NOT HF's
        assert cfg.num_key_value_heads == cfg.num_attention_heads
        assert cfg.v_head_dim == 8 and cfg.rope_interleaved
        assert cfg.num_experts == 0  # first_k_dense_replace >= L -> dense
        assert params["layers"]["wq_a"].shape == (2, 64, 24)
        assert params["layers"]["wq_b"].shape == (2, 24, 4 * 12)
        assert params["layers"]["wkv_a"].shape == (2, 64, 16 + 4)
        assert params["layers"]["wkv_b"].shape == (2, 16, 4 * (8 + 8))
        assert params["layers"]["wo"].shape == (2, 4 * 8, 64)
        assert params["layers"]["kv_a_norm"].shape == (2, 16)
        assert "wk" not in params["layers"]
    if family == "deepseekmoe":
        assert cfg.kv_lora_rank == 16 and cfg.q_lora_rank is None
        assert "wq" in params["layers"] and "wq_a" not in params["layers"]
        assert cfg.num_experts == 4 and not cfg.moe_norm_topk
        assert cfg.moe_gate_fp32
        assert cfg.routed_scaling_factor == pytest.approx(2.5)
        assert cfg.n_shared_experts == 2
        # expert shapes from moe_intermediate_size (128), NOT the dense 96
        assert params["layers"]["moe_w1"].shape == (2, 4, 64, 128)
        assert params["layers"]["w_shared_gate"].shape == (2, 64, 256)
        assert params["layers"]["w_shared_down"].shape == (2, 256, 64)
    if family == "granite":
        assert cfg.embedding_normalizer == pytest.approx(12.0)
        assert cfg.attn_scale == pytest.approx(0.03125)
        assert cfg.residual_multiplier == pytest.approx(0.22)
        assert cfg.logit_scale == pytest.approx(16.0)
        assert not cfg.norm_after and not cfg.post_block_norms


@pytest.mark.parametrize("family", FAMILIES)
def test_logits_match_hf(family):
    hf, cfg, params = make_pair(family)
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
    for b in range(B):
        t_valid = int(mask[b].sum())
        np.testing.assert_allclose(
            ours[b, :t_valid], theirs[b, :t_valid], atol=1e-3, rtol=1e-3
        )


@pytest.mark.parametrize("family", FAMILIES)
def test_logits_match_hf_untied(family):
    hf, cfg, params = make_pair(family, seed=3, tie=False)
    assert not cfg.tie_word_embeddings and "lm_head" in params
    rng = np.random.default_rng(4)
    embeds = rng.normal(size=(2, 7, 64)).astype(np.float32) * 0.1
    ours = np.asarray(llama.forward(cfg, params, jnp.asarray(embeds)))
    with torch.no_grad():
        theirs = hf(inputs_embeds=torch.tensor(embeds)).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("family", FAMILIES)
def test_loss_matches_hf(family):
    hf, cfg, params = make_pair(family, seed=1)
    rng = np.random.default_rng(1)
    B, T = 2, 9
    embeds = rng.normal(size=(B, T, 64)).astype(np.float32) * 0.1
    mask = np.ones((B, T), np.int64)
    labels = rng.integers(0, 256, size=(B, T))
    labels[:, :3] = -100
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


@pytest.mark.parametrize("family", FAMILIES)
def test_greedy_generate_matches_hf(family):
    hf, cfg, params = make_pair(family, seed=2)
    rng = np.random.default_rng(2)
    B, T = 3, 6
    embeds = rng.normal(size=(B, T, 64)).astype(np.float32) * 0.1

    max_new = 12
    ours = np.asarray(
        dec.greedy_generate(cfg, params, jnp.asarray(embeds), max_new, PAD)
    )
    ours_bl = np.asarray(
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
    np.testing.assert_array_equal(ours_bl, ours)


@pytest.mark.parametrize("family", FAMILIES)
def test_fused_projections_equal(family):
    """fuse_projections (qkv/gate-up concat, b_qkv for qwen2) is exact."""
    _, cfg, params = make_pair(family, seed=6)
    rng = np.random.default_rng(6)
    embeds = jnp.asarray(rng.normal(size=(2, 5, 64)).astype(np.float32) * 0.1)
    base = llama.forward(cfg, params, embeds)
    fused = llama.forward(cfg, llama.fuse_projections(params), embeds)
    np.testing.assert_allclose(np.asarray(base), np.asarray(fused), atol=1e-5)


def _sliding_pair(seed, family, window):
    hf, cfg, params = make_pair(family, seed=seed, sliding_window=window)
    assert cfg.sliding_window == window
    return hf, cfg, params


@pytest.mark.parametrize(
    "family,flags",
    [("gemma2", (True, False)), ("mistral", (True, True)),
     ("phi3", (True, True)), ("gemma3", (True, False))],
)
def test_sliding_window_logits_match_hf(family, flags):
    """Sliding-window masks (gemma-2 interleaved / mistral all-layers) at
    sequence lengths where the window BINDS, vs the executed HF model."""
    hf, cfg, params = _sliding_pair(8, family, window=4)
    assert cfg.layer_sliding == flags
    rng = np.random.default_rng(8)
    B, T = 2, 12  # lookback up to 11 >> window 4
    embeds = rng.normal(size=(B, T, 64)).astype(np.float32) * 0.1
    mask = np.ones((B, T), np.int64)
    mask[1, -2:] = 0

    ours = np.asarray(
        llama.forward(cfg, params, jnp.asarray(embeds), jnp.asarray(mask))
    )
    with torch.no_grad():
        theirs = hf(
            inputs_embeds=torch.tensor(embeds), attention_mask=torch.tensor(mask)
        ).logits.numpy()
    for b in range(B):
        t_valid = int(mask[b].sum())
        np.testing.assert_allclose(
            ours[b, :t_valid], theirs[b, :t_valid], atol=1e-3, rtol=1e-3
        )


@pytest.mark.parametrize("family", ["gemma2", "mistral", "phi3", "gemma3"])
def test_sliding_window_greedy_matches_hf(family):
    hf, cfg, params = _sliding_pair(9, family, window=4)
    rng = np.random.default_rng(9)
    B, T = 2, 6
    embeds = rng.normal(size=(B, T, 64)).astype(np.float32) * 0.1

    max_new = 10  # final positions look back past the window
    ours = np.asarray(
        dec.greedy_generate(cfg, params, jnp.asarray(embeds), max_new, PAD)
    )
    ours_bl = np.asarray(
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
    np.testing.assert_array_equal(ours_bl, ours)


def test_deepseek_yarn_rope_matches_hf():
    """Yarn-scaled interleaved rope (deepseek long-context checkpoints):
    inv_freq blend over the beta_fast/beta_slow correction ramp + the
    mscale-ratio attention factor on the cos/sin tables, vs the executed
    native HF module (ROPE_INIT_FUNCTIONS['yarn'])."""
    common = {**_COMMON, "num_key_value_heads": 4}
    hf_cfg = transformers.DeepseekV2Config(
        **common, tie_word_embeddings=True,
        q_lora_rank=None, kv_lora_rank=16,
        qk_nope_head_dim=8, qk_rope_head_dim=4, v_head_dim=8,
        first_k_dense_replace=2, n_routed_experts=None,
        rope_scaling={"rope_type": "yarn", "factor": 4.0,
                      "beta_fast": 32.0, "beta_slow": 1.0,
                      "mscale": 0.707, "mscale_all_dim": 0.707,
                      "original_max_position_embeddings": 64},
    )
    torch.manual_seed(12)
    hf = transformers.AutoModelForCausalLM.from_config(hf_cfg)
    hf.eval()
    cfg = _hf_to_config(hf_cfg, jnp.float32, None)
    assert cfg.rope_yarn_factor == pytest.approx(4.0)
    assert cfg.rope_original_max_position == 64
    params = llama.from_hf_state_dict(hf.state_dict(), cfg)
    rng = np.random.default_rng(12)
    # positions far past original_max so both ramp regimes contribute
    B, T = 2, 96
    embeds = rng.normal(size=(B, T, 64)).astype(np.float32) * 0.1
    ours = np.asarray(llama.forward(cfg, params, jnp.asarray(embeds)))
    with torch.no_grad():
        theirs = hf(inputs_embeds=torch.tensor(embeds)).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=2e-3)


def test_decode_cache_matches_full_forward_families():
    """Prefill + cached steps == full forward, for each family (the decode
    bias/normalizer/softcap plumbing can't drift from forward())."""
    for family in FAMILIES:
        _, cfg, params = make_pair(family, seed=5)
        rng = np.random.default_rng(5)
        B, T, new = 2, 5, 4
        embeds = jnp.asarray(rng.normal(size=(B, T, 64)).astype(np.float32) * 0.1)

        tokens = dec.greedy_generate(cfg, params, embeds, new, PAD)
        # embed_tokens (not raw rows): gemma-3 carries the sqrt(H) scale in
        # the LOOKUP, exactly like HF generate embeds continuation tokens
        gen_embeds = llama.embed_tokens(cfg, params, tokens)
        full = jnp.concatenate([embeds, gen_embeds], axis=1)
        logits = llama.forward(cfg, params, full)
        for b in range(B):
            for i in range(new):
                pred = int(jnp.argmax(logits[b, T - 1 + i]))
                tok = int(tokens[b, i])
                if i > 0 and tok == PAD and int(tokens[b, i - 1]) in (*EOS, PAD):
                    break  # finished sequence
                assert pred == tok, (family, b, i, pred, tok)


def test_w8a8_quantized_families_run_token_sane():
    """quantize_llama passes the family layouts through (biases/extra norms
    stay bf16) and the quantized decode emits the same first token as bf16
    at f32-friendly scales."""
    from dmi_tpu.models.quant import quantize_llama

    for family in FAMILIES:
        _, cfg, params = make_pair(family, seed=11)
        qp = quantize_llama(params, native=True)
        if cfg.attention_bias:
            assert not isinstance(qp["layers"]["bq"], dict)
        if cfg.post_block_norms:
            assert not isinstance(qp["layers"]["ln_post_attn"], dict)
        rng = np.random.default_rng(11)
        embeds = jnp.asarray(rng.normal(size=(2, 5, 64)).astype(np.float32) * 0.1)
        t_bf = np.asarray(dec.greedy_generate_bl(cfg, params, embeds, 3, PAD))
        t_q = np.asarray(
            dec.greedy_generate_bl(
                cfg, qp, embeds, 3, PAD, prefill_params=params
            )
        )
        assert t_bf.shape == t_q.shape
