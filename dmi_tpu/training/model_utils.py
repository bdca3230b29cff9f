"""LM/tokenizer builders (reference: dmi/utils/model_utils.py:8-20).

Resolution order for the language model:
  * "test:tiny[:<vocab>]" — a tiny random-config Llama + the offline
    byte-BPE tokenizer fixture (no network; used for tests/smokes/bench
    scaffolding in this zero-egress environment)
  * "test:1b[:<vocab>]" — the Llama-3.2-1B preset body with random weights
    and the fixture vocab (production-scale hardware validation offline)
  * anything else — HF transformers from the local cache
    (local_files_only), converted into the stacked-layer JAX pytree
The DMI_LM_OVERRIDE env var substitutes any configured name with one of
the above (lets the literal reference configs run offline).
"""

from __future__ import annotations

import logging
from typing import Tuple

import jax
import jax.numpy as jnp

from dmi_tpu.chat_templates import LLMS_CHATTEMPLATES
from dmi_tpu.models import llama

log = logging.getLogger("dmi_tpu")


def is_test_lm(name: str) -> bool:
    return name.startswith("test:")


def is_instruct_lm(name: str) -> bool:
    """reference: is_instruct = name in LLMS_CHATTEMPLATES
    (dmi/train_projector.py:188); test models run the instruct path."""
    return name in LLMS_CHATTEMPLATES or is_test_lm(name)


def _resolve_name(name: str) -> str:
    """DMI_LM_OVERRIDE substitutes the LM (e.g. 'test:tiny') so the literal
    reference configs run in offline/smoke environments."""
    import os

    return os.environ.get("DMI_LM_OVERRIDE") or name


def build_tokenizer(lm_args):
    name = _resolve_name(lm_args.lm_name_or_path)
    if is_test_lm(name):
        from dmi_tpu.data.tok_fixture import build_test_tokenizer

        return build_test_tokenizer()
    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(name)
    tokenizer.pad_token = tokenizer.eos_token
    if name in LLMS_CHATTEMPLATES:
        tokenizer.chat_template = LLMS_CHATTEMPLATES[name]
    return tokenizer


_SUPPORTED_FAMILIES = ("llama", "mistral", "qwen2", "gemma2", "qwen3", "phi3",
                       "olmo2", "granite", "gemma3_text", "mixtral",
                       "qwen3_moe", "olmoe", "deepseek_v2")


def _hf_to_config(hf_cfg, dtype, tokenizer) -> llama.LlamaConfig:
    """Map an HF config onto the generic stacked-scan decoder config.
    The reference is family-agnostic (AutoModelForCausalLM,
    dmi/utils/model_utils.py:17-20); supported here: llama (3.x rope
    scaling), mistral, qwen2 (qkv biases), qwen3 (per-head q/k RMSNorm),
    gemma2 (GeGLU, (1+w) norms, post-block norms, softcapping, sqrt(H)
    embed scale, interleaved sliding/full attention), phi3 (fused
    checkpoints), olmo2 (full-width q/k RMSNorm, post-norm blocks),
    granite (scalar multipliers)."""
    family = getattr(hf_cfg, "model_type", "llama")
    if family not in _SUPPORTED_FAMILIES:
        raise ValueError(
            f"unsupported model family {family!r}; supported: "
            f"{_SUPPORTED_FAMILIES}"
        )
    rs = getattr(hf_cfg, "rope_scaling", None) or {}
    eos = hf_cfg.eos_token_id
    if eos is None:
        eos = tokenizer.eos_token_id
    eos = tuple(eos) if isinstance(eos, (list, tuple)) else (eos,)

    # per-layer sliding flags from HF layer_types; window binds only if
    # some layer actually slides (qwen2 ships use_sliding_window=False).
    # mistral has no layer_types: a configured window applies to EVERY
    # layer (HF MistralModel semantics)
    layer_types = getattr(hf_cfg, "layer_types", None)
    if layer_types is None and family in ("mistral", "phi3", "mixtral") and getattr(
        hf_cfg, "sliding_window", None
    ):
        # a configured window applies to EVERY layer
        # (HF Mistral/Phi3/MixtralModel)
        layer_types = ["sliding_attention"] * hf_cfg.num_hidden_layers
    if layer_types is None and family == "gemma2":
        # transformers < ~4.54 Gemma2Config has no layer_types; the
        # alternation is fixed in the architecture: sliding on even
        # layers, full on odd (HF Gemma2Model) — silently dropping the
        # window would give wrong logits past 4096 tokens
        layer_types = [
            "sliding_attention" if i % 2 == 0 else "full_attention"
            for i in range(hf_cfg.num_hidden_layers)
        ]
    layer_sliding = (
        tuple(t == "sliding_attention" for t in layer_types) if layer_types else None
    )
    sliding_window = (
        getattr(hf_cfg, "sliding_window", None)
        if layer_sliding and any(layer_sliding)
        else None
    )
    if not sliding_window:
        layer_sliding = None

    kw = {}
    if family == "qwen2":
        kw["attention_bias"] = True
    elif family == "qwen3":
        # per-head q/k RMSNorm before rope; qkv biases off by default but
        # honored if a checkpoint sets them (HF Qwen3Config.attention_bias)
        kw["qk_norm"] = True
        kw["attention_bias"] = bool(getattr(hf_cfg, "attention_bias", False))
    elif family == "phi3":
        # llama math, fused-checkpoint layout (split at import); the
        # 128k longrope variants rescale rope in ways not modeled here
        if getattr(hf_cfg, "rope_scaling", None):
            raise ValueError("phi3 longrope rope_scaling is not supported")
        if getattr(hf_cfg, "partial_rotary_factor", 1.0) != 1.0:
            raise ValueError("phi3 partial_rotary_factor != 1 is not supported")
    elif family == "mixtral":
        # llama attention + sparse-MoE MLP (dense-evaluated here, expert
        # axis shards as expert parallelism — parallel/sharding.py)
        kw["num_experts"] = int(hf_cfg.num_local_experts)
        kw["num_experts_per_tok"] = int(hf_cfg.num_experts_per_tok)
    elif family == "qwen3_moe":
        # qwen3 attention (per-head q/k RMSNorm) + the mixtral MoE block
        # with configurable top-k renormalization; experts use
        # moe_intermediate_size.  The stacked scan needs UNIFORM layers —
        # mixed dense/sparse configs (decoder_sparse_step != 1 or
        # mlp_only_layers) are rejected, matching the released all-sparse
        # checkpoints.
        if getattr(hf_cfg, "decoder_sparse_step", 1) != 1 or getattr(
            hf_cfg, "mlp_only_layers", None
        ):
            raise ValueError(
                "qwen3_moe mixed dense/sparse layers are not supported "
                "(decoder_sparse_step must be 1 and mlp_only_layers empty)"
            )
        kw["qk_norm"] = True
        # honored like dense qwen3: a bias-ful checkpoint must import its
        # q/k/v biases, not silently drop them
        kw["attention_bias"] = bool(getattr(hf_cfg, "attention_bias", False))
        kw["num_experts"] = int(hf_cfg.num_experts)
        kw["num_experts_per_tok"] = int(hf_cfg.num_experts_per_tok)
        kw["moe_norm_topk"] = bool(hf_cfg.norm_topk_prob)
        kw["intermediate_override"] = int(hf_cfg.moe_intermediate_size)
    elif family == "olmoe":
        # olmo2's full-width q/k RMSNorm but in STANDARD pre-norm blocks
        # (HF OlmoeDecoderLayer), plus the sparse-MoE MLP with the
        # norm_topk_prob knob (False on the released checkpoints and the
        # OlmoeConfig default).  clip_qkv (elementwise clamp on q/k/v
        # projections) is null on released checkpoints and not modeled.
        if getattr(hf_cfg, "clip_qkv", None) is not None:
            raise ValueError("olmoe clip_qkv is not supported")
        if getattr(hf_cfg, "attention_bias", False):
            raise ValueError("olmoe attention_bias=True is not supported")
        kw["qk_norm_wide"] = True
        kw["num_experts"] = int(hf_cfg.num_experts)
        kw["num_experts_per_tok"] = int(hf_cfg.num_experts_per_tok)
        kw["moe_norm_topk"] = bool(hf_cfg.norm_topk_prob)
    elif family == "deepseek_v2":
        # MLA attention (q/k width = qk_nope+qk_rope, values v_head_dim
        # wide, compressed kv latent) + deepseek MoE (f32 greedy gate,
        # routed_scaling_factor, always-on shared experts), interleaved
        # rope over the decoupled qk_rope channel, optional yarn scaling
        # (HF DeepseekV2Attention / DeepseekV2MoE, native transformers).
        L = hf_cfg.num_hidden_layers
        fkd = int(getattr(hf_cfg, "first_k_dense_replace", 0) or 0)
        if 0 < fkd < L:
            # the stacked scan needs UNIFORM layers; HF makes the first
            # fkd layers dense MLPs.  fkd >= L is the all-dense degenerate
            # case (usable for MLA-only configs); mixed stacks are out.
            raise ValueError(
                "deepseek_v2 mixed dense/MoE stacks are not supported "
                f"(first_k_dense_replace={fkd} with {L} layers; only 0 "
                "or >= num_hidden_layers)"
            )
        if getattr(hf_cfg, "attention_bias", False):
            raise ValueError("deepseek_v2 attention_bias=True is not supported")
        kw.update(
            q_lora_rank=getattr(hf_cfg, "q_lora_rank", None),
            kv_lora_rank=int(hf_cfg.kv_lora_rank),
            qk_nope_head_dim=int(hf_cfg.qk_nope_head_dim),
            qk_rope_head_dim=int(hf_cfg.qk_rope_head_dim),
            v_head_dim=int(hf_cfg.v_head_dim),
            rope_interleaved=True,
            # the q/k width; HF's config.head_dim is the ROPE dim only
            head_dim_override=int(hf_cfg.qk_nope_head_dim)
            + int(hf_cfg.qk_rope_head_dim),
            # MLA expands the shared latent per-head: nkv == nh
            nkv_override=int(hf_cfg.num_attention_heads),
        )
        if fkd == 0 and getattr(hf_cfg, "n_routed_experts", None):
            if getattr(hf_cfg, "topk_method", "greedy") != "greedy":
                raise ValueError(
                    "deepseek_v2 topk_method "
                    f"{hf_cfg.topk_method!r} is not supported (greedy only; "
                    "group_limited_greedy needs n_group routing)"
                )
            kw.update(
                num_experts=int(hf_cfg.n_routed_experts),
                num_experts_per_tok=int(hf_cfg.num_experts_per_tok),
                moe_norm_topk=bool(getattr(hf_cfg, "norm_topk_prob", False)),
                routed_scaling_factor=float(hf_cfg.routed_scaling_factor),
                n_shared_experts=int(getattr(hf_cfg, "n_shared_experts", 0)
                                     or 0),
                moe_gate_fp32=True,
                intermediate_override=int(hf_cfg.moe_intermediate_size),
            )
        if rs.get("rope_type", rs.get("type")) == "yarn":
            kw.update(
                rope_yarn_factor=float(rs["factor"]),
                rope_yarn_beta_fast=float(rs.get("beta_fast") or 32),
                rope_yarn_beta_slow=float(rs.get("beta_slow") or 1),
                rope_yarn_mscale=rs.get("mscale"),
                rope_yarn_mscale_all_dim=rs.get("mscale_all_dim"),
                rope_yarn_attention_factor=rs.get("attention_factor"),
                rope_yarn_truncate=bool(rs.get("truncate", True)),
                # yarn's correction range falls back to the config's
                # max_position_embeddings, NOT the llama3 8192 default
                # (HF _compute_yarn_parameters)
                rope_original_max_position_override=int(
                    rs.get("original_max_position_embeddings")
                    or hf_cfg.max_position_embeddings
                ),
            )
    elif family == "olmo2":
        # RMSNorm over the FULL q/k projections before rope + post-norm
        # blocks (no input layernorms; the post-attention/post-feedforward
        # norms apply to the block outputs — HF Olmo2DecoderLayer)
        if getattr(hf_cfg, "attention_bias", False):
            # released OLMo-2 checkpoints are bias-free; the o_proj bias
            # this flag would add has no layout here
            raise ValueError("olmo2 attention_bias=True is not supported")
        kw["qk_norm_wide"] = True
        kw["norm_after"] = True
    elif family == "granite":
        # llama math + the four Granite scalar multipliers (HF
        # GraniteModel.forward / GraniteDecoderLayer / GraniteForCausalLM)
        kw.update(
            embedding_normalizer=float(hf_cfg.embedding_multiplier),
            attn_scale=float(hf_cfg.attention_multiplier),
            residual_multiplier=float(hf_cfg.residual_multiplier),
            logit_scale=float(hf_cfg.logits_scaling),
        )
        if getattr(hf_cfg, "attention_bias", False):
            # our bias layout covers q/k/v only; granite defaults bias-free
            raise ValueError("granite attention_bias=True is not supported")
    elif family == "gemma3_text":
        # gemma-2's norms/GeGLU/embed scale (softcaps default None) plus
        # per-head (1+w) q/k RMSNorm and the dual-rope split: sliding
        # layers rope at rope_local_base_freq unscaled, full layers at
        # rope_theta with optional "linear" scaling (HF Gemma3TextModel)
        if getattr(hf_cfg, "attention_bias", False):
            raise ValueError("gemma3 attention_bias=True is not supported")
        if getattr(hf_cfg, "use_bidirectional_attention", False):
            raise ValueError("gemma3 bidirectional attention not supported")
        if not (layer_sliding and sliding_window):
            raise ValueError(
                "gemma3 needs layer_types + sliding_window (the sliding "
                "flags select the local-rope layers)"
            )
        kw.update(
            mlp_act="gelu_tanh",
            attn_scale=float(hf_cfg.query_pre_attn_scalar) ** -0.5,
            attn_logit_softcap=getattr(hf_cfg, "attn_logit_softcapping", None),
            final_logit_softcap=getattr(hf_cfg, "final_logit_softcapping", None),
            embedding_normalizer=float(hf_cfg.hidden_size) ** 0.5,
            embedding_scale_at_lookup=True,
            post_block_norms=True,
            norm_plus_one=True,
            qk_norm=True,
            rope_local_theta=float(hf_cfg.rope_local_base_freq),
        )
    elif family == "gemma2":
        if getattr(hf_cfg, "attention_bias", False):
            # released gemma-2 checkpoints are all bias-free; the o_proj
            # bias this flag would add has no layout here
            raise ValueError("gemma2 attention_bias=True is not supported")
        kw.update(
            mlp_act="gelu_tanh",
            attn_scale=float(hf_cfg.query_pre_attn_scalar) ** -0.5,
            attn_logit_softcap=hf_cfg.attn_logit_softcapping,
            final_logit_softcap=hf_cfg.final_logit_softcapping,
            embedding_normalizer=float(hf_cfg.hidden_size) ** 0.5,
            post_block_norms=True,
            norm_plus_one=True,
        )
    return llama.LlamaConfig(
        vocab_size=hf_cfg.vocab_size,
        hidden_size=hf_cfg.hidden_size,
        # qwen3-moe experts are sized by moe_intermediate_size, not the
        # (dense-layer) intermediate_size its config also carries
        intermediate_size=kw.pop("intermediate_override",
                                 hf_cfg.intermediate_size),
        num_hidden_layers=hf_cfg.num_hidden_layers,
        num_attention_heads=hf_cfg.num_attention_heads,
        num_key_value_heads=kw.pop("nkv_override",
                                   hf_cfg.num_key_value_heads),
        head_dim=kw.pop(
            "head_dim_override",
            getattr(hf_cfg, "head_dim", None)
            or hf_cfg.hidden_size // hf_cfg.num_attention_heads,
        ),
        rms_norm_eps=hf_cfg.rms_norm_eps,
        rope_theta=hf_cfg.rope_theta,
        rope_scaling_factor=rs.get("factor") if rs.get("rope_type") == "llama3" else None,
        rope_linear_factor=rs.get("factor") if rs.get("rope_type") == "linear" else None,
        rope_low_freq_factor=rs.get("low_freq_factor", 1.0),
        rope_high_freq_factor=rs.get("high_freq_factor", 4.0),
        rope_original_max_position=kw.pop(
            "rope_original_max_position_override",
            rs.get("original_max_position_embeddings", 8192),
        ),
        tie_word_embeddings=hf_cfg.tie_word_embeddings,
        dtype=dtype,
        eos_token_ids=eos,
        bos_token_id=hf_cfg.bos_token_id,
        sliding_window=sliding_window,
        layer_sliding=layer_sliding,
        **kw,
    )


def _apply_attention_impl(cfg: llama.LlamaConfig) -> llama.LlamaConfig:
    """Production default 'auto': pad-exact Pallas flash attention on TPU
    (kills the [B,T,S] f32 bias — ~1.1GB/step at sharegpt4video's 605-token
    budget x batch 128), additive-bias oracle elsewhere.  Since the
    segment-id fix the two are numerically interchangeable on ragged
    batches (values+grads pinned, tests/test_llama.py), so this is a pure
    memory/perf knob: DMI_FLASH_ATTENTION=0 pins the oracle, =1 pins flash
    (decode is unaffected either way)."""
    import dataclasses
    import os

    impl = {"0": "xla", "1": "flash"}.get(
        os.environ.get("DMI_FLASH_ATTENTION", ""), "auto"
    )
    return dataclasses.replace(cfg, attention_impl=impl)


def build_lm(lm_args, tokenizer, seed: int = 0) -> Tuple[llama.LlamaConfig, dict]:
    name = _resolve_name(lm_args.lm_name_or_path)
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "float16": jnp.bfloat16}[
        lm_args.lm_dtype or "bfloat16"
    ]
    if is_test_lm(name):
        parts = name.split(":")
        vocab = int(parts[2]) if len(parts) > 2 else max(512, tokenizer.vocab_size + 8)
        if parts[1] == "1b":
            # 1B-bodied model (Llama-3.2-1B dims via the named preset) with
            # the fixture vocab — production-scale compute/memory without HF
            # weights, for hardware validation of the full train/decode loops
            import dataclasses

            cfg = dataclasses.replace(
                llama.llama32_1b(dtype),
                vocab_size=vocab,
                eos_token_ids=(tokenizer.eos_token_id,),
                bos_token_id=tokenizer.bos_token_id or 0,
                rope_scaling_factor=None,  # tiny contexts need no llama3 scaling
            )
        else:
            maker = {
                "tiny": llama.tiny_config,
                "tiny-qwen2": llama.tiny_qwen2_config,
                "tiny-gemma2": llama.tiny_gemma2_config,
            }[parts[1]]
            cfg = maker(
                vocab_size=vocab,
                hidden_size=64,
                n_layers=2,
                n_heads=4,
                n_kv=2,
                intermediate=128,
                dtype=dtype,
                eos=(tokenizer.eos_token_id,),
            )
        cfg = _apply_attention_impl(cfg)
        params = llama.init(jax.random.key(seed), cfg)
        return cfg, params

    import transformers

    log.info("loading %s from local HF cache", name)
    hf = transformers.AutoModelForCausalLM.from_pretrained(name)
    cfg = _apply_attention_impl(_hf_to_config(hf.config, dtype, tokenizer))
    params = llama.from_hf_state_dict(hf.state_dict(), cfg)
    del hf
    return cfg, params
