"""Generic causal decoder in pure JAX: forward, loss, HF-parity semantics.

The reference consumes its LM as a frozen black box through
``AutoModelForCausalLM`` (dmi/utils/model_utils.py:17-20) for (a) loss on
soft-prefix-extended ``inputs_embeds`` (dmi/model/mmmodel.py:112-147) and
(b) greedy decode from ``inputs_embeds`` (dmi/model/mmmodel.py:149-169).
Here the decoder is a TPU-first re-implementation covering the mainstream
decoder families — llama-3.x (the reference's production LM), mistral,
qwen2 (qkv biases), qwen3 (per-head q/k RMSNorm), gemma-2 (GeGLU, (1+w)
norms, post-block norms, softcapping, sqrt(H) embedding scale, interleaved
sliding attention), phi-3 (fused checkpoints, all-layer sliding), olmo2
(full-width q/k RMSNorm, post-norm blocks), granite (embedding/attention/
residual/logits scalar multipliers), gemma-3 text (per-head (1+w) q/k
RMSNorm, lookup-scaled embeddings, dual rope: sliding layers at the local
theta, full layers linear-scaled), mixtral (sparse MoE: top-k softmax
router over dense-evaluated experts, expert-parallel shardable), olmoe
(olmo2's full-width q/k RMSNorm in standard pre-norm blocks + the MoE
block without top-k renormalization) — behind
one config + one stacked-layer pytree:

  * pytree params with **stacked per-layer weights** so the transformer body
    is a single ``lax.scan`` over layers (fast compiles, one fused kernel
    sequence instead of n_layers copies)
  * bf16 weights/activations with f32 RMSNorm, f32 rope tables and f32
    attention softmax — matching HF Llama numerics choices
  * grouped-query attention, Llama-3 rope frequency scaling
  * loss: shifted next-token cross-entropy averaged over labels != -100,
    computed in f32 (HF semantics)

Decode (KV cache, while_loop early exit) lives in dmi_tpu.models.decode.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 128256
    hidden_size: int = 2048
    intermediate_size: int = 8192
    num_hidden_layers: int = 16
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    head_dim: int = 64
    rms_norm_eps: float = 1e-5
    rope_theta: float = 500000.0
    # NOTE attention_impl (below): "xla" = additive-bias oracle,
    # "flash" = Pallas TPU flash attention, "auto" = flash on TPU / oracle
    # elsewhere.  Since the segment-id fix the flash path is pad-EXACT vs
    # the oracle (values and grads pinned on ragged batches), so "auto" is
    # the production default set by the model builders.
    # Llama-3 rope scaling (config.json rope_scaling{rope_type: llama3})
    rope_scaling_factor: Optional[float] = 32.0
    rope_low_freq_factor: float = 1.0
    rope_high_freq_factor: float = 4.0
    rope_original_max_position: int = 8192
    tie_word_embeddings: bool = True
    dtype: Any = jnp.bfloat16
    # full-sequence attention implementation: "xla" (HF-parity oracle) or
    # "flash" (Pallas TPU flash attention for the training forward; decode
    # always uses the KV-cache path)
    attention_impl: str = "xla"
    # Llama-3.x instruct EOS ids: <|end_of_text|>, <|eom_id|>, <|eot_id|>
    eos_token_ids: Tuple[int, ...] = (128001, 128008, 128009)
    bos_token_id: int = 128000
    # ---- family generalization ------------------------------------------
    # The reference consumes its LM through AutoModelForCausalLM
    # (dmi/utils/model_utils.py:17-20) — any HF causal decoder.  These
    # fields extend the one stacked-scan decoder to the other mainstream
    # families (mistral = defaults; qwen2 = qkv biases; gemma-2 = the rest).
    attention_bias: bool = False          # biases on q/k/v (qwen2); o stays bias-free
    mlp_act: str = "silu"                 # "gelu_tanh" for gemma-2
    attn_scale: Optional[float] = None    # score multiplier; None -> head_dim**-0.5
    attn_logit_softcap: Optional[float] = None   # gemma-2: 50.0
    final_logit_softcap: Optional[float] = None  # gemma-2: 30.0
    embedding_normalizer: Optional[float] = None  # gemma-2: sqrt(hidden)
    # WHERE the normalizer applies: gemma-2 scales the hidden stream at
    # model entry (caller inputs_embeds included); gemma-3 bakes it into
    # the embedding LOOKUP (Gemma3TextScaledWordEmbedding) — caller
    # inputs_embeds pass through UNSCALED, token lookups carry the scale
    embedding_scale_at_lookup: bool = False
    post_block_norms: bool = False        # gemma-2 post-attn / post-mlp RMSNorms
    norm_plus_one: bool = False           # gemma RMSNorm scale is (1 + w); folded at import
    sliding_window: Optional[int] = None
    layer_sliding: Optional[Tuple[bool, ...]] = None  # per-layer sliding flags
    qk_norm: bool = False                 # qwen3: per-head RMSNorm on q/k before rope
    qk_norm_wide: bool = False            # olmo2: RMSNorm over the FULL q/k projection
    # gemma-3 dual rope: sliding layers rope at this base (never scaled),
    # full layers at rope_theta (optionally linear-scaled).  Requires
    # layer_sliding flags (the same per-layer selector as the masks).
    rope_local_theta: Optional[float] = None
    rope_linear_factor: Optional[float] = None  # HF rope_scaling {"rope_type": "linear"}
    # mixtral sparse MoE: > 0 replaces the gated MLP with num_experts
    # experts + a top-(num_experts_per_tok) softmax router (HF
    # MixtralSparseMoeBlock).  Evaluation is DENSE (all experts computed,
    # combined with zero weights for unselected ones) — exact, and the
    # expert axis shards as expert parallelism (parallel/sharding.py).
    num_experts: int = 0
    num_experts_per_tok: int = 2
    # mixtral renormalizes the top-k routing weights; qwen3-moe makes it a
    # config flag (norm_topk_prob, False on the released checkpoints)
    moe_norm_topk: bool = True
    norm_after: bool = False              # olmo2: no pre-norms; norm block OUTPUTS
    residual_multiplier: Optional[float] = None  # granite: residual + out * m
    logit_scale: Optional[float] = None   # granite: logits / logits_scaling
    # ---- deepseek-v2 multi-head latent attention (MLA) -------------------
    # kv_lora_rank set => MLA (HF DeepseekV2Attention): q projects to
    # nh * (qk_nope + qk_rope) — optionally through a q_lora_rank
    # bottleneck with RMSNorm — while k/v derive from ONE compressed
    # latent: kv_a = x @ W_a -> [kv_lora_rank | qk_rope] where the rope
    # part is a SINGLE shared key (MQA on the positional channel) and the
    # normed latent expands through W_b to per-head [qk_nope | v_head_dim].
    # head_dim here is the Q/K width (qk_nope + qk_rope); values are
    # v_head_dim wide.  Rope is INTERLEAVED (adjacent complex pairs, HF
    # apply_rotary_emb) over qk_rope_head_dim, optionally yarn-scaled.
    q_lora_rank: Optional[int] = None
    kv_lora_rank: Optional[int] = None
    qk_nope_head_dim: int = 0
    qk_rope_head_dim: int = 0
    v_head_dim: Optional[int] = None
    rope_interleaved: bool = False
    # yarn rope scaling (HF _compute_yarn_parameters; deepseek long-context
    # checkpoints carry mscale/mscale_all_dim).  rope_yarn_factor set =>
    # yarn; the attention factor multiplies BOTH cos and sin (HF scales the
    # complex phasor), so scores scale by its square.
    rope_yarn_factor: Optional[float] = None
    rope_yarn_beta_fast: float = 32.0
    rope_yarn_beta_slow: float = 1.0
    rope_yarn_mscale: Optional[float] = None
    rope_yarn_mscale_all_dim: Optional[float] = None
    rope_yarn_attention_factor: Optional[float] = None
    rope_yarn_truncate: bool = True
    # ---- deepseek-v2 MoE extensions ---------------------------------------
    # routed weights scale by routed_scaling_factor after top-k (the HF
    # greedy gate never renormalizes — norm_topk_prob is dead there), the
    # gate matmul runs in f32 (HF casts input AND weight), and
    # n_shared_experts always-on gated MLPs (width n * moe_intermediate)
    # add to the routed combination.
    routed_scaling_factor: float = 1.0
    n_shared_experts: int = 0
    moe_gate_fp32: bool = False


def llama32_1b(dtype=jnp.bfloat16) -> LlamaConfig:
    """meta-llama/Llama-3.2-1B-Instruct (HF config.json)."""
    return LlamaConfig(dtype=dtype)


def llama32_3b(dtype=jnp.bfloat16) -> LlamaConfig:
    return LlamaConfig(
        hidden_size=3072, intermediate_size=8192, num_hidden_layers=28,
        num_attention_heads=24, num_key_value_heads=8, head_dim=128, dtype=dtype,
    )


def llama31_8b(dtype=jnp.bfloat16) -> LlamaConfig:
    return LlamaConfig(
        hidden_size=4096, intermediate_size=14336, num_hidden_layers=32,
        num_attention_heads=32, num_key_value_heads=8, head_dim=128,
        rope_scaling_factor=8.0, dtype=dtype,
    )


def tiny_config(
    vocab_size=256, hidden_size=64, n_layers=2, n_heads=4, n_kv=2,
    intermediate=128, dtype=jnp.float32, eos=(5,),
) -> LlamaConfig:
    """Small random config for tests/benchmarks without HF weights."""
    return LlamaConfig(
        vocab_size=vocab_size, hidden_size=hidden_size,
        intermediate_size=intermediate, num_hidden_layers=n_layers,
        num_attention_heads=n_heads, num_key_value_heads=n_kv,
        head_dim=hidden_size // n_heads, dtype=dtype, eos_token_ids=eos,
        rope_scaling_factor=None, bos_token_id=0,
    )


def tiny_qwen2_config(**kw) -> LlamaConfig:
    """Qwen2-family tiny config: qkv biases, vanilla rope (theta 1e6 on the
    real models; irrelevant at test scale)."""
    import dataclasses

    return dataclasses.replace(tiny_config(**kw), attention_bias=True)


def tiny_qwen3_config(**kw) -> LlamaConfig:
    """Qwen3-family tiny config: per-head q/k RMSNorm before rope, no qkv
    biases (HF Qwen3Attention)."""
    import dataclasses

    return dataclasses.replace(tiny_config(**kw), qk_norm=True)


def tiny_olmo2_config(**kw) -> LlamaConfig:
    """Olmo2-family tiny config: RMSNorm over the FULL q/k projections
    before rope, and post-norm blocks — no input layernorms, the
    post-attention/post-feedforward norms apply to the block OUTPUT before
    the residual add (HF Olmo2DecoderLayer)."""
    import dataclasses

    return dataclasses.replace(
        tiny_config(**kw), qk_norm_wide=True, norm_after=True
    )


def tiny_granite_config(**kw) -> LlamaConfig:
    """Granite-family tiny config: llama math plus the four Granite scalar
    multipliers — embedding_multiplier on inputs_embeds, attention_multiplier
    as the score scale, residual_multiplier on each block output, and
    logits_scaling dividing the head output (HF GraniteModel /
    GraniteForCausalLM)."""
    import dataclasses

    return dataclasses.replace(
        tiny_config(**kw),
        embedding_normalizer=12.0,
        attn_scale=0.03125,
        residual_multiplier=0.22,
        logit_scale=16.0,
    )


def tiny_gemma2_config(sliding_window=None, **kw) -> LlamaConfig:
    """Gemma-2-family tiny config: GeGLU, (1+w) norms, post-block norms,
    attn/final softcapping, sqrt(H) embedding normalizer, query_pre_attn
    scaling, and (optionally) interleaved sliding/full attention layers
    starting with sliding at layer 0 (HF Gemma2Config.layer_types)."""
    import dataclasses

    cfg = tiny_config(**kw)
    n_layers = cfg.num_hidden_layers
    return dataclasses.replace(
        cfg,
        mlp_act="gelu_tanh",
        attn_scale=float(cfg.head_dim) ** -0.5,  # qpas == head_dim on 2B/9B
        attn_logit_softcap=50.0,
        final_logit_softcap=30.0,
        embedding_normalizer=float(cfg.hidden_size) ** 0.5,
        post_block_norms=True,
        norm_plus_one=True,
        sliding_window=sliding_window,
        layer_sliding=tuple(i % 2 == 0 for i in range(n_layers))
        if sliding_window
        else None,
    )


def tiny_mixtral_config(n_experts=4, top_k=2, **kw) -> LlamaConfig:
    """Mixtral-family tiny config: llama attention + a sparse-MoE MLP
    (top-k softmax router over n_experts gated-silu experts, HF
    MixtralSparseMoeBlock semantics)."""
    import dataclasses

    return dataclasses.replace(
        tiny_config(**kw), num_experts=n_experts, num_experts_per_tok=top_k
    )


def tiny_qwen3moe_config(n_experts=4, top_k=2, **kw) -> LlamaConfig:
    """Qwen3-MoE-family tiny config: qwen3's per-head q/k RMSNorm plus the
    sparse-MoE MLP WITHOUT top-k renormalization (HF Qwen3MoeSparseMoeBlock
    with the released checkpoints' norm_topk_prob=False)."""
    import dataclasses

    return dataclasses.replace(
        tiny_config(**kw), qk_norm=True, num_experts=n_experts,
        num_experts_per_tok=top_k, moe_norm_topk=False,
    )


def tiny_olmoe_config(n_experts=4, top_k=2, **kw) -> LlamaConfig:
    """OLMoE-family tiny config: olmo2's RMSNorm over the FULL q/k
    projections before rope — but in STANDARD pre-norm blocks (HF
    OlmoeDecoderLayer: input/post-attention layernorms, unlike olmo2's
    post-norm) — plus the sparse-MoE MLP without top-k renormalization
    (HF OlmoeSparseMoeBlock, norm_topk_prob=False on the released
    checkpoints and the config default)."""
    import dataclasses

    return dataclasses.replace(
        tiny_config(**kw), qk_norm_wide=True, num_experts=n_experts,
        num_experts_per_tok=top_k, moe_norm_topk=False,
    )


def tiny_deepseek_config(q_lora_rank=None, n_experts=0, top_k=2,
                         n_shared=0, routed_scale=1.0, **kw) -> LlamaConfig:
    """DeepSeek-V2-family tiny config: MLA attention (kv latent rank 16,
    qk 8 nope + 4 rope dims, 8-wide values, interleaved rope), optionally
    a q_lora_rank bottleneck (the full-size checkpoints; None = the Lite
    layout's plain q projection), optionally the deepseek MoE block
    (greedy top-k over an f32 gate, routed_scaling_factor, n_shared
    always-on shared experts).  head_dim is the q/k width (12)."""
    import dataclasses

    cfg = tiny_config(**kw)
    return dataclasses.replace(
        cfg,
        num_key_value_heads=cfg.num_attention_heads,
        head_dim=12,
        q_lora_rank=q_lora_rank,
        kv_lora_rank=16,
        qk_nope_head_dim=8,
        qk_rope_head_dim=4,
        v_head_dim=8,
        rope_interleaved=True,
        num_experts=n_experts,
        num_experts_per_tok=top_k,
        moe_norm_topk=False,
        moe_gate_fp32=bool(n_experts),
        routed_scaling_factor=routed_scale,
        n_shared_experts=n_shared,
    )


def tiny_gemma3_config(sliding_window=8, **kw) -> LlamaConfig:
    """Gemma-3 (text) tiny config: gemma-2's GeGLU / (1+w) norms /
    post-block norms / sqrt(H) embedding scale WITHOUT the softcaps, plus
    per-head q/k RMSNorm and the dual-rope split — sliding layers rope at
    rope_local_theta (never scaled), full layers at rope_theta with HF
    "linear" scaling (HF Gemma3TextConfig; real checkpoints slide 5 of
    every 6 layers — this tiny config alternates so a 2-layer model
    exercises BOTH rope tables)."""
    import dataclasses

    cfg = tiny_config(**kw)
    n_layers = cfg.num_hidden_layers
    return dataclasses.replace(
        cfg,
        mlp_act="gelu_tanh",
        attn_scale=float(cfg.head_dim) ** -0.5,
        embedding_normalizer=float(cfg.hidden_size) ** 0.5,
        embedding_scale_at_lookup=True,
        post_block_norms=True,
        norm_plus_one=True,
        qk_norm=True,
        rope_theta=1_000_000.0,
        rope_local_theta=10_000.0,
        rope_linear_factor=8.0,
        sliding_window=sliding_window,
        layer_sliding=tuple(i % 2 == 0 for i in range(n_layers)),
    )


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------

def init(key: jax.Array, cfg: LlamaConfig) -> dict:
    """Random init (normal 0.02) with stacked layers — used for tests; real
    runs import HF weights via from_hf_state_dict."""
    L, H = cfg.num_hidden_layers, cfg.hidden_size
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    I = cfg.intermediate_size
    keys = iter(jax.random.split(key, 16))

    def w(k, shape, scale=0.02):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(cfg.dtype)

    if cfg.num_experts:
        E = cfg.num_experts
        mlp = {
            "w_router": w(next(keys), (L, H, E)),
            "moe_w1": w(next(keys), (L, E, H, I)),
            "moe_w3": w(next(keys), (L, E, H, I)),
            "moe_w2": w(next(keys), (L, E, I, H)),
        }
        if cfg.n_shared_experts:
            Is = I * cfg.n_shared_experts
            mlp["w_shared_gate"] = w(next(keys), (L, H, Is))
            mlp["w_shared_up"] = w(next(keys), (L, H, Is))
            mlp["w_shared_down"] = w(next(keys), (L, Is, H))
    else:
        mlp = {
            "w_gate": w(next(keys), (L, H, I)),
            "w_up": w(next(keys), (L, H, I)),
            "w_down": w(next(keys), (L, I, H)),
        }
    # Draw the embed key BEFORE any attention weights: seeded-init
    # reproducibility pins the historical order mlp -> embed -> attention
    # (seed-pinned fixtures across tests depend on it).
    embed = w(next(keys), (cfg.vocab_size, H))
    if cfg.kv_lora_rank is not None:  # deepseek-v2 MLA
        r, dn, dr = cfg.kv_lora_rank, cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
        dv = cfg.v_head_dim
        attn = {
            "wkv_a": w(next(keys), (L, H, r + dr)),
            "kv_a_norm": jnp.ones((L, r), cfg.dtype),
            "wkv_b": w(next(keys), (L, r, nh * (dn + dv))),
            "wo": w(next(keys), (L, nh * dv, H)),
        }
        if cfg.q_lora_rank is None:
            attn["wq"] = w(next(keys), (L, H, nh * (dn + dr)))
        else:
            attn["wq_a"] = w(next(keys), (L, H, cfg.q_lora_rank))
            attn["q_a_norm"] = jnp.ones((L, cfg.q_lora_rank), cfg.dtype)
            attn["wq_b"] = w(next(keys), (L, cfg.q_lora_rank, nh * (dn + dr)))
    else:
        attn = {
            "wq": w(next(keys), (L, H, nh * hd)),
            "wk": w(next(keys), (L, H, nkv * hd)),
            "wv": w(next(keys), (L, H, nkv * hd)),
            "wo": w(next(keys), (L, nh * hd, H)),
        }
    params = {
        "embed": embed,
        "layers": {
            **attn,
            **mlp,
            "ln_attn": jnp.ones((L, H), cfg.dtype),
            "ln_mlp": jnp.ones((L, H), cfg.dtype),
        },
        "final_norm": jnp.ones((H,), cfg.dtype),
    }
    if cfg.attention_bias:
        params["layers"]["bq"] = w(next(keys), (L, nh * hd))
        params["layers"]["bk"] = w(next(keys), (L, nkv * hd))
        params["layers"]["bv"] = w(next(keys), (L, nkv * hd))
    if cfg.post_block_norms:
        params["layers"]["ln_post_attn"] = jnp.ones((L, H), cfg.dtype)
        params["layers"]["ln_post_mlp"] = jnp.ones((L, H), cfg.dtype)
    if cfg.qk_norm:
        params["layers"]["q_norm"] = jnp.ones((L, hd), cfg.dtype)
        params["layers"]["k_norm"] = jnp.ones((L, hd), cfg.dtype)
    if cfg.qk_norm_wide:
        params["layers"]["q_norm"] = jnp.ones((L, nh * hd), cfg.dtype)
        params["layers"]["k_norm"] = jnp.ones((L, nkv * hd), cfg.dtype)
    if not cfg.tie_word_embeddings:
        params["lm_head"] = w(next(keys), (H, cfg.vocab_size))
    return params


def fuse_projections(params: dict) -> dict:
    """Concatenate wq|wk|wv -> w_qkv and w_gate|w_up -> w_gu.

    Decode at caption batch sizes runs many skinny matmuls; fusing them
    into fewer, fatter ones improves MXU utilization and HBM pipelining.
    Best for single-chip / pure-dp execution — under tensor parallelism the
    fused column blocks straddle shard boundaries (use the unfused layout
    there)."""
    layers = dict(params["layers"])
    if "wk" in layers:
        # MLA (deepseek) has no separate wk/wv to fuse — its q projection
        # stays as-is; only the gate/up fusion below applies
        w_qkv = jnp.concatenate(
            [layers.pop("wq"), layers.pop("wk"), layers.pop("wv")], axis=-1
        )
        layers["w_qkv"] = w_qkv
    if "w_gate" in layers:  # MoE layers (mixtral) have no gate/up to fuse
        layers["w_gu"] = jnp.concatenate(
            [layers.pop("w_gate"), layers.pop("w_up")], axis=-1
        )
    if "bq" in layers:  # qwen2-style qkv biases fuse the same way
        layers["b_qkv"] = jnp.concatenate(
            [layers.pop("bq"), layers.pop("bk"), layers.pop("bv")], axis=-1
        )
    return {**params, "layers": layers}


def from_hf_state_dict(state_dict, cfg: LlamaConfig) -> dict:
    """Convert an HF *ForCausalLM state dict (torch tensors or numpy) into
    the stacked-layer pytree.  HF Linear weights are (out, in); ours are
    (in, out).  Family layout differences are driven by cfg flags:
    attention_bias stacks the qkv biases (qwen2); post_block_norms maps the
    gemma-2 four-norm block (input / post-attn / pre-ff / post-ff);
    norm_plus_one folds gemma's (1 + w) RMSNorm scale at import time,
    stored in f32 so the fold is exact (rms_norm multiplies in f32)."""

    def get(name):
        t = state_dict[name]
        if hasattr(t, "detach"):
            t = t.detach().to("cpu").float().numpy()
        return np.asarray(t)

    L = cfg.num_hidden_layers

    def stack(fmt, transpose=True):
        ws = [get(fmt.format(i)) for i in range(L)]
        ws = [w.T if transpose else w for w in ws]
        return jnp.asarray(np.stack(ws), cfg.dtype)

    def norm(fmt_or_name, stacked=True):
        arrs = (
            np.stack([get(fmt_or_name.format(i)) for i in range(L)])
            if stacked
            else get(fmt_or_name)
        )
        if cfg.norm_plus_one:
            return jnp.asarray(arrs.astype(np.float32) + 1.0, jnp.float32)
        return jnp.asarray(arrs, cfg.dtype)

    # gemma-2's pre-MLP norm is `pre_feedforward_layernorm`; everywhere else
    # the (misleadingly named) `post_attention_layernorm` plays that role.
    # olmo2 (norm_after) has NO pre-norms: ln_attn/ln_mlp hold the
    # post-attention/post-feedforward norms applied to the block outputs.
    if cfg.norm_after:
        attn_norm_key = "model.layers.{}.post_attention_layernorm.weight"
        pre_mlp_key = "model.layers.{}.post_feedforward_layernorm.weight"
    else:
        attn_norm_key = "model.layers.{}.input_layernorm.weight"
        pre_mlp_key = (
            "model.layers.{}.pre_feedforward_layernorm.weight"
            if cfg.post_block_norms
            else "model.layers.{}.post_attention_layernorm.weight"
        )
    nh, nkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                   cfg.head_dim)
    if cfg.num_experts:
        # sparse-MoE checkpoint layouts: mixtral ships
        # block_sparse_moe.{gate, experts.N.w1/w3/w2}; qwen3-moe AND
        # deepseek-v2 ship mlp.{gate, experts.N.gate_proj/up_proj/down_proj}
        # (deepseek's gate weight is a bare nn.Parameter named .weight on
        # the gate module — same key); deepseek adds mlp.shared_experts.*
        def stack_experts(fmt):
            out = []
            for i in range(L):
                ws = [get(fmt.format(i, e)).T for e in range(cfg.num_experts)]
                out.append(np.stack(ws))
            return jnp.asarray(np.stack(out), cfg.dtype)

        if "model.layers.0.block_sparse_moe.gate.weight" in state_dict:
            moe_pfx = "model.layers.{}.block_sparse_moe"
            e_names = ("w1", "w3", "w2")
        else:
            moe_pfx = "model.layers.{}.mlp"
            e_names = ("gate_proj", "up_proj", "down_proj")
        mlp = {
            "w_router": stack(moe_pfx + ".gate.weight"),
            "moe_w1": stack_experts(
                moe_pfx + ".experts.{}." + e_names[0] + ".weight"
            ),
            "moe_w3": stack_experts(
                moe_pfx + ".experts.{}." + e_names[1] + ".weight"
            ),
            "moe_w2": stack_experts(
                moe_pfx + ".experts.{}." + e_names[2] + ".weight"
            ),
        }
        if cfg.n_shared_experts:
            mlp["w_shared_gate"] = stack(moe_pfx + ".shared_experts.gate_proj.weight")
            mlp["w_shared_up"] = stack(moe_pfx + ".shared_experts.up_proj.weight")
            mlp["w_shared_down"] = stack(moe_pfx + ".shared_experts.down_proj.weight")
    elif "model.layers.0.self_attn.qkv_proj.weight" in state_dict:
        # phi-3 layout: the checkpoint ITSELF ships fused qkv / gate_up
        # projections (q|k|v rows, gate|up rows) — split into the unfused
        # stacked layout (shardable; fuse_projections re-fuses for serving)
        gu = stack("model.layers.{}.mlp.gate_up_proj.weight")
        w_gate, w_up = jnp.split(gu, 2, axis=-1)
        mlp = {"w_gate": w_gate, "w_up": w_up,
               "w_down": stack("model.layers.{}.mlp.down_proj.weight")}
    else:
        mlp = {
            "w_gate": stack("model.layers.{}.mlp.gate_proj.weight"),
            "w_up": stack("model.layers.{}.mlp.up_proj.weight"),
            "w_down": stack("model.layers.{}.mlp.down_proj.weight"),
        }
    if cfg.kv_lora_rank is not None:
        # deepseek-v2 MLA layout (HF DeepseekV2Attention): kv_a_proj_with_mqa
        # packs [kv latent | shared rope key]; kv_b expands the normed
        # latent to per-head [qk_nope | v_head_dim]
        attn = {
            "wkv_a": stack("model.layers.{}.self_attn.kv_a_proj_with_mqa.weight"),
            "kv_a_norm": norm("model.layers.{}.self_attn.kv_a_layernorm.weight"),
            "wkv_b": stack("model.layers.{}.self_attn.kv_b_proj.weight"),
            "wo": stack("model.layers.{}.self_attn.o_proj.weight"),
        }
        if cfg.q_lora_rank is None:  # the Lite layout
            attn["wq"] = stack("model.layers.{}.self_attn.q_proj.weight")
        else:
            attn["wq_a"] = stack("model.layers.{}.self_attn.q_a_proj.weight")
            attn["q_a_norm"] = norm("model.layers.{}.self_attn.q_a_layernorm.weight")
            attn["wq_b"] = stack("model.layers.{}.self_attn.q_b_proj.weight")
    elif "model.layers.0.self_attn.qkv_proj.weight" in state_dict:
        qkv = stack("model.layers.{}.self_attn.qkv_proj.weight")
        attn = {
            "wq": qkv[:, :, : nh * hd],
            "wk": qkv[:, :, nh * hd : nh * hd + nkv * hd],
            "wv": qkv[:, :, nh * hd + nkv * hd :],
            "wo": stack("model.layers.{}.self_attn.o_proj.weight"),
        }
    else:
        attn = {
            "wq": stack("model.layers.{}.self_attn.q_proj.weight"),
            "wk": stack("model.layers.{}.self_attn.k_proj.weight"),
            "wv": stack("model.layers.{}.self_attn.v_proj.weight"),
            "wo": stack("model.layers.{}.self_attn.o_proj.weight"),
        }
    params = {
        "embed": jnp.asarray(get("model.embed_tokens.weight"), cfg.dtype),
        "layers": {
            **attn,
            **mlp,
            "ln_attn": norm(attn_norm_key),
            "ln_mlp": norm(pre_mlp_key),
        },
        "final_norm": norm("model.norm.weight", stacked=False),
    }
    if cfg.attention_bias:
        params["layers"]["bq"] = stack(
            "model.layers.{}.self_attn.q_proj.bias", transpose=False
        )
        params["layers"]["bk"] = stack(
            "model.layers.{}.self_attn.k_proj.bias", transpose=False
        )
        params["layers"]["bv"] = stack(
            "model.layers.{}.self_attn.v_proj.bias", transpose=False
        )
    if cfg.post_block_norms:
        params["layers"]["ln_post_attn"] = norm(
            "model.layers.{}.post_attention_layernorm.weight"
        )
        params["layers"]["ln_post_mlp"] = norm(
            "model.layers.{}.post_feedforward_layernorm.weight"
        )
    if cfg.qk_norm or cfg.qk_norm_wide:
        params["layers"]["q_norm"] = norm("model.layers.{}.self_attn.q_norm.weight")
        params["layers"]["k_norm"] = norm("model.layers.{}.self_attn.k_norm.weight")
    if not cfg.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(get("lm_head.weight").T, cfg.dtype)
    return params


# ---------------------------------------------------------------------------
# Rope
# ---------------------------------------------------------------------------

def rope_inv_freq(cfg: LlamaConfig, local: bool = False) -> jax.Array:
    """Base inverse frequencies with Llama-3 wavelength-dependent scaling
    (HF modeling_rope_utils._compute_llama3_parameters semantics) or HF
    "linear" scaling (inv_freq / factor — gemma-3 global layers).
    local=True returns the gemma-3 sliding-layer table: plain rope at
    rope_local_theta, NEVER scaled (HF Gemma3TextModel.rotary_emb_local is
    built with rope_type 'default').  MLA (deepseek) ropes only the
    qk_rope_head_dim decoupled channel, optionally yarn-scaled (HF
    _compute_yarn_parameters: interpolated/extrapolated frequency blend
    over a linear ramp between the beta_fast/beta_slow correction dims)."""
    hd = rope_dim(cfg)
    if local:
        return 1.0 / (
            cfg.rope_local_theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd)
        )
    inv_freq = 1.0 / (
        cfg.rope_theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd)
    )
    if cfg.rope_yarn_factor is not None:
        import math

        def corr_dim(n_rot):
            return (hd * math.log(cfg.rope_original_max_position /
                                  (n_rot * 2 * math.pi))) / (2 * math.log(cfg.rope_theta))

        low = corr_dim(cfg.rope_yarn_beta_fast)
        high = corr_dim(cfg.rope_yarn_beta_slow)
        if cfg.rope_yarn_truncate:
            low, high = math.floor(low), math.ceil(high)
        low, high = max(low, 0), min(high, hd - 1)
        if low == high:
            high += 0.001  # HF singularity guard
        ramp = jnp.clip(
            (jnp.arange(hd // 2, dtype=jnp.float32) - low) / (high - low), 0, 1
        )
        extrapolation_w = 1.0 - ramp
        return (inv_freq / cfg.rope_yarn_factor) * (1 - extrapolation_w) + (
            inv_freq * extrapolation_w
        )
    if cfg.rope_linear_factor is not None:
        return inv_freq / cfg.rope_linear_factor
    if cfg.rope_scaling_factor is None:
        return inv_freq
    factor = cfg.rope_scaling_factor
    low_wl = cfg.rope_original_max_position / cfg.rope_low_freq_factor
    high_wl = cfg.rope_original_max_position / cfg.rope_high_freq_factor
    wavelen = 2 * jnp.pi / inv_freq
    smooth = (cfg.rope_original_max_position / wavelen - cfg.rope_low_freq_factor) / (
        cfg.rope_high_freq_factor - cfg.rope_low_freq_factor
    )
    scaled = jnp.where(
        wavelen > low_wl,
        inv_freq / factor,
        jnp.where(
            wavelen < high_wl,
            inv_freq,
            (1 - smooth) * inv_freq / factor + smooth * inv_freq,
        ),
    )
    return scaled


def rope_dim(cfg: LlamaConfig) -> int:
    """Width the rope tables cover: the full head_dim, except MLA
    (deepseek), where only the decoupled qk_rope_head_dim channel ropes."""
    return cfg.qk_rope_head_dim if cfg.kv_lora_rank is not None else cfg.head_dim


def rope_attention_factor(cfg: LlamaConfig) -> float:
    """Yarn post-scaling of the cos/sin tables (HF attention_factor; for
    deepseek's mscale/mscale_all_dim checkpoints the ratio of the two
    mscale corrections).  HF multiplies the complex phasor, so BOTH cos
    and sin carry it; 1.0 for every non-yarn table.

    The `mscale and mscale_all_dim` TRUTHINESS test deliberately matches
    native transformers (modeling_rope_utils._compute_yarn_parameters,
    4.57.6: `if mscale and mscale_all_dim:`): a checkpoint carrying
    mscale with mscale_all_dim=0 falls through to get_mscale(factor)
    there too.  Note the native DeepseekV2 port keeps softmax scaling at
    qk_head_dim**-0.5 and puts the ENTIRE yarn attention factor in the
    rope phasor (unlike the original remote-code modeling_deepseek.py,
    which folded mscale**2 into softmax_scale) — we pin against the
    native executed module."""
    if cfg.rope_yarn_factor is None:
        return 1.0
    if cfg.rope_yarn_attention_factor is not None:
        return float(cfg.rope_yarn_attention_factor)
    import math

    def get_mscale(scale, mscale=1.0):
        if scale <= 1:
            return 1.0
        return 0.1 * mscale * math.log(scale) + 1.0

    f = cfg.rope_yarn_factor
    if cfg.rope_yarn_mscale and cfg.rope_yarn_mscale_all_dim:
        return float(get_mscale(f, cfg.rope_yarn_mscale)
                     / get_mscale(f, cfg.rope_yarn_mscale_all_dim))
    return float(get_mscale(f))


def rope_tables(cfg: LlamaConfig, positions: jax.Array,
                local: bool = False) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables [*, rope_dim] in f32 (HF duplicates freqs: cat(f, f)).
    local=True builds the gemma-3 sliding-layer tables (rope_local_theta)."""
    inv = rope_inv_freq(cfg, local=local)
    freqs = positions[..., None].astype(jnp.float32) * inv  # [..., hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    scale = rope_attention_factor(cfg)
    return jnp.cos(emb) * scale, jnp.sin(emb) * scale


def rope_dual(cfg: LlamaConfig) -> bool:
    """True when layers select between two rope tables (gemma-3): sliding
    layers use the local table, full layers the global one.  Independent of
    sliding_effective — the table split applies at EVERY sequence length."""
    if cfg.rope_local_theta is None:
        return False
    if cfg.layer_sliding is None:
        raise ValueError(
            "rope_local_theta requires layer_sliding flags (the sliding "
            "layers are the local-rope layers)"
        )
    return True


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [B, n, T, hd]; cos/sin: [B, T, hd] or [T, hd]."""
    if cos.ndim == 2:
        cos = cos[None]
        sin = sin[None]
    cos = cos[:, None, :, :].astype(jnp.float32)
    sin = sin[:, None, :, :].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    out = xf * cos + _rotate_half(xf) * sin
    return out.astype(x.dtype)


def apply_rope_interleaved(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Deepseek rope: ADJACENT pairs (x0,x1),(x2,x3),... rotate as complex
    numbers (HF apply_rotary_emb via view_as_complex), vs rotate_half's
    front/back-half pairing.  cos/sin tables are the standard duplicated
    [*, d] layout; pair j reads entry j (the first copy).  Any yarn
    attention factor is already baked into the tables — it multiplies the
    phasor, so it scales both terms here exactly like HF."""
    if cos.ndim == 2:
        cos = cos[None]
        sin = sin[None]
    d2 = x.shape[-1] // 2
    cos = cos[:, None, :, :d2].astype(jnp.float32)
    sin = sin[:, None, :, :d2].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    x_even = xf[..., 0::2]
    x_odd = xf[..., 1::2]
    out_even = x_even * cos - x_odd * sin
    out_odd = x_odd * cos + x_even * sin
    out = jnp.stack([out_even, out_odd], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def sliding_effective(cfg: LlamaConfig, max_positions: int) -> bool:
    """True when per-layer sliding-window masks can differ from the plain
    causal mask: a sliding layer exists AND some query position can look
    back >= sliding_window.  Static (trace-time) — caption workloads sit
    far below gemma-2's 4096 window and skip the machinery entirely."""
    return (
        cfg.sliding_window is not None
        and cfg.layer_sliding is not None
        and any(cfg.layer_sliding)
        and max_positions > cfg.sliding_window
    )


def final_softcap(cfg: LlamaConfig, logits: jax.Array) -> jax.Array:
    """Head-output transforms: granite's logits/logits_scaling divide, then
    gemma-2 final-logit softcapping, in the logits dtype (HF semantics).
    Both are monotone, so greedy argmax paths may skip this entirely;
    DISTRIBUTION consumers (loss, sampling, speculative acceptance) must
    route logits through here."""
    if cfg.logit_scale is not None:
        logits = logits / jnp.asarray(cfg.logit_scale, logits.dtype)
    if cfg.final_logit_softcap is None:
        return logits
    cap = jnp.asarray(cfg.final_logit_softcap, logits.dtype)
    return jnp.tanh(logits / cap) * cap


def scale_embeds(cfg: LlamaConfig, x: jax.Array) -> jax.Array:
    """Apply gemma's sqrt(hidden) embedding normalizer (model-dtype
    rounded, HF Gemma2Model semantics); identity for other families AND
    for lookup-scaled families (gemma-3), where embed_tokens carries the
    scale instead — composing scale_embeds(embed_tokens(...)) is therefore
    exact for every family, and caller inputs_embeds are scaled exactly
    when HF would scale them."""
    if cfg.embedding_normalizer is None or cfg.embedding_scale_at_lookup:
        return x
    return x * jnp.asarray(cfg.embedding_normalizer, x.dtype)


def _mm(h: jax.Array, w) -> jax.Array:
    """Matmul dispatching on optionally int8-quantized weights
    (dmi_tpu.models.quant): h @ (q*s) == (h @ q_bf16) * s with per-output-
    column scales; XLA fuses the convert so HBM reads stay int8.
    "q8" weights run W8A8: activations quantized per token, int8 x int8 ->
    int32 on the MXU (2x bf16 throughput), rescaled by both factors."""
    if isinstance(w, dict) and "q8" in w:
        from dmi_tpu.models.quant import quantize_act

        hq, a = quantize_act(h, axis=-1)
        acc = jax.lax.dot_general(
            hq, w["q8"], (((h.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (acc * a * w["s"]).astype(h.dtype)
    if isinstance(w, dict) and "qp" in w:
        from dmi_tpu.models.quant import quantize_act, unpack_w4

        hq, a = quantize_act(h, axis=-1)
        q8 = unpack_w4(w["qp"])
        if "s4g" in w:
            # grouped scales: G-batched partial dots weighted per group.
            # Correctness-oracle formulation (the [.., G, out] int32
            # partials materialize); the serving loop uses _mm_bl.
            s4g = w["s4g"]
            G = s4g.shape[-2]
            K = q8.shape[-2]
            hg = hq.reshape(*hq.shape[:-1], G, K // G)
            qg = q8.reshape(G, K // G, q8.shape[-1])
            acc = jnp.einsum(
                "...gk,gkn->...gn", hg, qg, preferred_element_type=jnp.int32
            )
            out = jnp.sum(acc * s4g, axis=-2) * a  # a: (..., 1) broadcast
            return out.astype(h.dtype)
        acc = jax.lax.dot_general(
            hq, q8, (((h.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (acc * a * w["s"]).astype(h.dtype)
    if isinstance(w, dict) and "q" in w:
        return (h @ w["q"].astype(h.dtype)) * w["s"].astype(h.dtype)
    return h @ w


def _head_matmul(x: jax.Array, params: dict, cfg: "LlamaConfig") -> jax.Array:
    if "head" in params:
        # decode pre-transposes the tied head once ([H, V] resident) so the
        # 0.5GB embed transpose isn't re-materialized every token step
        return _mm(x, params["head"])
    if cfg.tie_word_embeddings:
        embed = params["embed"]
        if isinstance(embed, dict) and "q8" in embed:
            from dmi_tpu.models.quant import quantize_act

            hq, a = quantize_act(x, axis=-1)
            acc = jax.lax.dot_general(
                hq, embed["q8"], (((x.ndim - 1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return (acc * a * embed["s"][:, 0]).astype(x.dtype)
        if isinstance(embed, dict) and "q" in embed:
            # embed quantized per vocab row -> head output channel scales
            logits = x @ embed["q"].astype(x.dtype).T
            return logits * embed["s"].astype(x.dtype)[:, 0][None, None, :]
        return x @ embed.T
    return _mm(x, params["lm_head"])


def rms_norm(x: jax.Array, scale: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * scale.astype(jnp.float32)).astype(x.dtype)


def mlp_activation(cfg: LlamaConfig, x: jax.Array) -> jax.Array:
    """silu (llama/mistral/qwen2) or tanh-approx gelu (gemma)."""
    if cfg.mlp_act == "silu":
        return jax.nn.silu(x)
    if cfg.mlp_act == "gelu_tanh":
        return jax.nn.gelu(x, approximate=True)
    raise ValueError(f"unknown mlp_act {cfg.mlp_act!r}")


def moe_gate_weights(cfg: LlamaConfig, router_logits: jax.Array) -> jax.Array:
    """Per-token expert combination weights [..., E] from router logits
    [..., E] — HF MixtralSparseMoeBlock semantics: softmax over experts in
    f32, keep the top num_experts_per_tok, renormalize among the kept
    (qwen3-moe skips the renormalization when norm_topk_prob is off).
    Unselected experts get exactly 0, so a DENSE all-expert evaluation
    combined with these weights equals HF's sparse gather-loop."""
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    vals, idx = jax.lax.top_k(probs, cfg.num_experts_per_tok)
    if cfg.moe_norm_topk:
        vals = vals / jnp.sum(vals, axis=-1, keepdims=True)
    if cfg.routed_scaling_factor != 1.0:
        # deepseek-v2: kept weights scale AFTER top-k (HF DeepseekV2MoEGate
        # topk_weight * routed_scaling_factor; the greedy gate never
        # renormalizes, so this composes with moe_norm_topk=False)
        vals = vals * cfg.routed_scaling_factor
    onehot = jax.nn.one_hot(idx, cfg.num_experts, dtype=vals.dtype)
    return jnp.sum(onehot * vals[..., None], axis=-2)  # [..., E]


def _moe_mlp(cfg: LlamaConfig, lw: dict, h: jax.Array) -> jax.Array:
    """Dense-evaluated sparse MoE over [B, T, H]: every expert's gated-silu
    MLP runs (stacked einsum over the expert axis), combined with the
    top-k router weights (zeros for unselected experts — exact).  Dense
    evaluation trades E/top_k extra MLP FLOPs for static shapes and a
    shardable expert axis (expert parallelism in parallel/sharding.py);
    at caption batch sizes the decode loop is weight-stream bound, and
    the stream reads ALL experts' weights either way."""
    from dmi_tpu.models.quant import dequantize

    if cfg.moe_gate_fp32:
        # deepseek-v2 gate runs in f32 (HF casts input AND weight)
        router = jnp.einsum(
            "bth,he->bte",
            h.astype(jnp.float32),
            dequantize(lw["w_router"], jnp.float32).astype(jnp.float32),
        )
    else:
        router = _mm(h, lw["w_router"])  # [B, T, E]
    w_e = moe_gate_weights(cfg, router).astype(h.dtype)
    w1 = dequantize(lw["moe_w1"], h.dtype)
    w3 = dequantize(lw["moe_w3"], h.dtype)
    w2 = dequantize(lw["moe_w2"], h.dtype)
    g = jnp.einsum("bth,ehi->beti", h, w1)
    u = jnp.einsum("bth,ehi->beti", h, w3)
    y = jnp.einsum("beti,eih->beth", mlp_activation(cfg, g) * u, w2)
    out = jnp.einsum("beth,bte->bth", y, w_e)
    if cfg.n_shared_experts:
        # deepseek-v2 shared experts: an always-on gated MLP (width
        # n_shared * moe_intermediate) ADDED to the routed combination
        # (HF DeepseekV2MoE.forward: moe(...) + shared_experts(residuals))
        gate = mlp_activation(cfg, _mm(h, lw["w_shared_gate"]))
        out = out + _mm(gate * _mm(h, lw["w_shared_up"]), lw["w_shared_down"])
    return out


def _softcap(scores, cap):
    """gemma-2 logit softcapping: cap * tanh(scores / cap), pre-mask."""
    return cap * jnp.tanh(scores / cap)


def attn_score_scale(cfg: LlamaConfig) -> float:
    """Score multiplier: query_pre_attn_scalar**-0.5 when configured
    (gemma-2), else the universal head_dim**-0.5."""
    return (
        cfg.attn_scale if cfg.attn_scale is not None else float(cfg.head_dim) ** -0.5
    )


def _attention(q, k, v, bias, scale=None, softcap=None):
    """q: [B,nh,T,hd], k/v: [B,nkv,S,hd] -> [B,nh,T,hd]; f32 softmax."""
    B, nh, T, hd = q.shape
    nkv = k.shape[1]
    group = nh // nkv
    q = q.reshape(B, nkv, group, T, hd)
    scores = jnp.einsum("bkgtd,bksd->bkgts", q, k).astype(jnp.float32)
    scores = scores * (scale if scale is not None else 1.0 / np.sqrt(hd))
    if softcap is not None:
        scores = _softcap(scores, softcap)
    scores = scores + bias[:, None, None, :, :]  # bias: [B, T, S]
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bkgts,bksd->bkgtd", probs, v)
    return out.reshape(B, nh, T, v.shape[-1])  # MLA: v width != q/k width


def _decode_attention_blockdiag(q, k, v, bias):
    """Single-query GQA attention as ONE well-shaped batched matmul pair.

    The per-kv-head einsum runs B*nkv batched [g, hd] x [hd, S] matmuls
    whose MXU tile padding dominates (profiled 0.38 ms/layer at B=256);
    the multiply-reduce alternative materializes [B,nkv,g,S,hd] f32
    intermediates in HBM (~0.18 ms/layer of bandwidth).  Here the cache is
    flattened to [B, nkv*S, hd] and ALL heads' scores come from a single
    batched [nh, hd] x [hd, nkv*S] matmul — nkv-fold redundant FLOPs (still
    negligible) for a 30x smaller f32 intermediate and full MXU tiles.
    Cross-block (query head h vs keys of a different kv head) scores are
    masked to -inf before the softmax, so the value matmul over the full
    flattened axis is exact: masked probabilities are zero.

    q: [B, nh, 1, hd], k/v: [B, nkv, S, hd], bias: [B, 1, S] -> [B, nh, 1, hd]
    """
    B, nh, _, hd = q.shape
    nkv, S = k.shape[1], k.shape[2]
    g = nh // nkv
    J = nkv * S
    q2 = q[:, :, 0, :]
    kf = k.reshape(B, J, hd)
    vf = v.reshape(B, J, hd)
    scores = jax.lax.dot_general(
        q2, kf, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # [B, nh, J]
    scores = scores / np.sqrt(hd)
    # NOTE softcap/attn_scale are not threaded here: this formulation is a
    # measured-loser oracle kept for the profiling scripts (BASELINE.md)
    # static block-diagonal head->kv mask + dynamic position-validity bias
    allowed = (jnp.arange(J) // S)[None, :] == (jnp.arange(nh) // g)[:, None]
    bias_j = jnp.broadcast_to(bias[:, 0, None, :], (B, nkv, S)).reshape(B, 1, J)
    scores = jnp.where(allowed[None], scores + bias_j, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jax.lax.dot_general(
        probs, vf, (((2,), (1,)), ((0,), (0,)))
    )  # [B, nh, hd]
    return out[:, :, None, :]


def _decode_attention(q, k, v, bias, scale=None, softcap=None):
    """Single-query attention as elementwise multiply-reduce (VPU path).

    The natural einsum lowers to B*nkv batched [group, hd] x [hd, S]
    matmuls; at decode shapes (group=4, S a few dozen) the MXU pads each to
    full tiles and the padding dominates — in-process A/B on the v5e chip
    (scripts/profile_decode.py): einsum 133.8 ms, block-diagonal batched
    matmul 85.9 ms, this formulation 59.9 ms over a 22-step 1B decode at
    B=256.  Broadcast-multiply + reduce runs on the VPU where nothing is
    padded; the [B,nkv,g,S,hd] product intermediates stay in the INPUT
    dtype (bf16 in production — halves their HBM traffic, which is the
    entire cost of this op) with f32 reduction accumulators, matching the
    einsum oracle's MXU semantics up to bf16 product rounding.

    q: [B, nh, 1, hd], k/v: [B, nkv, S, hd], bias: [B, 1, S] -> [B, nh, 1, hd]
    """
    B, nh, _, hd = q.shape
    nkv = k.shape[1]
    group = nh // nkv
    q4 = q.reshape(B, nkv, group, hd)
    # [B,nkv,g,1,hd] * [B,nkv,1,S,hd] -> reduce hd (f32 accum) -> [B,nkv,g,S]
    scores = jnp.sum(
        q4[:, :, :, None, :] * k[:, :, None, :, :], axis=-1, dtype=jnp.float32
    )
    scores = scores * (scale if scale is not None else 1.0 / np.sqrt(hd))
    if softcap is not None:
        scores = _softcap(scores, softcap)
    scores = scores + bias[:, :, None, :]  # [B,1,1,S] bcast
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.sum(
        probs[..., None] * v[:, :, None, :, :], axis=3, dtype=jnp.float32
    )
    return out.reshape(B, nh, 1, v.shape[-1]).astype(v.dtype)


def _flash_attention(cfg, q, k, v, seg_ids):
    """Pallas TPU flash attention over the full sequence (training path).

    seg_ids is (q_seg, kv_seg).  Pad-exactness: HF's additive bias masks
    KEYS only (pad queries still attend the real prefix under the causal
    mask), so q_seg is all-ones and kv_seg is the attention mask — the
    segment equality test q_seg[i] == kv_seg[j] then reproduces the bias
    semantics bit-for-bit, including on ragged batches where the preserved
    label-pad collator quirk makes pad-position logits part of the loss.

    The kernel's default 128-wide blocks require seq % 128 == 0 (strictly,
    for the backward pass); arbitrary training budgets (e.g. 605 for
    sharegpt4video, tiny smoke configs) are handled by zero-padding the
    sequence to the next 128 multiple with kv_seg=0 on the tail (padded
    keys are unattendable; padded query rows are sliced off), so values
    AND grads are unchanged."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention,
    )

    group = cfg.num_attention_heads // cfg.num_key_value_heads
    if group > 1:
        k = jnp.repeat(k, group, axis=1)
        v = jnp.repeat(v, group, axis=1)
    B, _, T, _ = q.shape
    if seg_ids is not None:
        q_seg, kv_seg = seg_ids
    else:
        q_seg = kv_seg = jnp.ones((B, T), jnp.int32)
    BLK = 128
    Tp = -(-T // BLK) * BLK
    if Tp != T:
        pad = ((0, 0), (0, 0), (0, Tp - T), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        q_seg = jnp.pad(q_seg, ((0, 0), (0, Tp - T)), constant_values=1)
        kv_seg = jnp.pad(kv_seg, ((0, 0), (0, Tp - T)), constant_values=0)
    out = flash_attention(
        q, k, v, segment_ids=SegmentIds(q=q_seg, kv=kv_seg), causal=True,
        sm_scale=attn_score_scale(cfg),
    )
    return out[:, :, :T, :]


def _block(cfg: LlamaConfig, x, lw, cos, sin, bias, cache_kv=None, cache_index=None,
           seg_ids=None):
    """One transformer block.  lw holds this layer's (unstacked) weights.
    If cache_kv=(k_cache, v_cache) is given, new k/v are written at
    cache_index and attention runs against the full cache."""
    B, T, H = x.shape
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    # olmo2 (norm_after) has no input norm: attention reads the raw stream
    h = x if cfg.norm_after else rms_norm(x, lw["ln_attn"], cfg.rms_norm_eps)
    if cfg.kv_lora_rank is not None:
        # deepseek-v2 MLA (HF DeepseekV2Attention): q is per-head
        # [qk_nope | qk_rope]; k/v expand from ONE normed latent through
        # wkv_b to per-head [qk_nope | v_head_dim], plus a SINGLE shared
        # roped key channel (MQA on the positional dims).  This generic
        # path materializes per-head K [B,nh,T,dn+dr] / V [B,nh,T,dv]
        # (the HF-parity oracle); the batch-last serving path uses the
        # absorbed formulation over the compressed latent cache instead
        # (decode._decode_step_bl).
        r, dn, dr = cfg.kv_lora_rank, cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
        dv = cfg.v_head_dim
        if "wq" in lw:  # the Lite layout: plain q projection
            q = _mm(h, lw["wq"])
        else:
            qa = rms_norm(_mm(h, lw["wq_a"]), lw["q_a_norm"], cfg.rms_norm_eps)
            q = _mm(qa, lw["wq_b"])
        q = q.reshape(B, T, nh, dn + dr).transpose(0, 2, 1, 3)
        q_nope, q_pe = q[..., :dn], q[..., dn:]
        kv_a = _mm(h, lw["wkv_a"])  # [B, T, r + dr]
        latent = rms_norm(kv_a[..., :r], lw["kv_a_norm"], cfg.rms_norm_eps)
        k_pe = kv_a[..., None, :, r:]  # [B, 1, T, dr] shared across heads
        kv = _mm(latent, lw["wkv_b"]).reshape(B, T, nh, dn + dv)
        kv = kv.transpose(0, 2, 1, 3)
        k_nope, v = kv[..., :dn], kv[..., dn:]
        q_pe = apply_rope_interleaved(q_pe, cos, sin)
        k_pe = apply_rope_interleaved(k_pe, cos, sin)
        # compressed-cache rows (normed latent | roped shared key) — the
        # batch-last decode path prefills through this block and collects
        # them as scan outputs (decode._mla_prefill_compressed)
        mla_rows = (latent, k_pe[:, 0])
        q = jnp.concatenate([q_nope, q_pe], axis=-1)
        k = jnp.concatenate(
            [k_nope, jnp.broadcast_to(k_pe, (B, nh, T, dr))], axis=-1
        )
    else:
        mla_rows = None
        if "w_qkv" in lw:  # fused layout (fuse_projections)
            qkv = _mm(h, lw["w_qkv"])
            if "b_qkv" in lw:
                qkv = qkv + lw["b_qkv"]
            q, k, v = jnp.split(qkv, [nh * hd, nh * hd + nkv * hd], axis=-1)
        else:
            q, k, v = _mm(h, lw["wq"]), _mm(h, lw["wk"]), _mm(h, lw["wv"])
            if "bq" in lw:
                q, k, v = q + lw["bq"], k + lw["bk"], v + lw["bv"]
        if cfg.qk_norm_wide:  # olmo2: RMSNorm over the FULL projection width
            q = rms_norm(q, lw["q_norm"], cfg.rms_norm_eps)
            k = rms_norm(k, lw["k_norm"], cfg.rms_norm_eps)
        q = q.reshape(B, T, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, nkv, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, nkv, hd).transpose(0, 2, 1, 3)
        if cfg.qk_norm:  # qwen3: per-head RMSNorm before rope
            q = rms_norm(q, lw["q_norm"], cfg.rms_norm_eps)
            k = rms_norm(k, lw["k_norm"], cfg.rms_norm_eps)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

    new_cache = None
    if cache_kv is not None:
        k_cache, v_cache = cache_kv
        k_cache = jax.lax.dynamic_update_slice_in_dim(k_cache, k, cache_index, axis=2)
        v_cache = jax.lax.dynamic_update_slice_in_dim(v_cache, v, cache_index, axis=2)
        k, v = k_cache, v_cache
        new_cache = (k_cache, v_cache)

    scale = attn_score_scale(cfg)
    cap = cfg.attn_logit_softcap
    if cache_kv is None and seg_ids is not None:
        # seg_ids is only provided when forward() chose the flash path
        # (attention_impl 'flash'/'auto' on a TPU backend); everywhere else
        # the additive-bias oracle runs on `bias`.  forward() gates flash
        # off when attn_logit_softcap is set (the kernel has no softcap).
        attn = _flash_attention(cfg, q, k, v, seg_ids)
    elif cache_kv is not None and T == 1:
        # KV-cache token step: VPU multiply-reduce, the fastest of the four
        # profiled formulations in-loop (scripts/profile_decode.py A/B)
        attn = _decode_attention(q, k, v, bias, scale, cap)
    else:
        attn = _attention(q, k, v, bias, scale, cap)
    # width from the attention output itself: MLA values are v_head_dim
    # wide (!= the q/k width hd); every other family has them equal
    attn = attn.transpose(0, 2, 1, 3).reshape(B, T, nh * attn.shape[-1])
    attn_out = _mm(attn, lw["wo"])
    if cfg.post_block_norms:
        attn_out = rms_norm(attn_out, lw["ln_post_attn"], cfg.rms_norm_eps)
    if cfg.norm_after:  # olmo2: ln_attn norms the block OUTPUT instead
        attn_out = rms_norm(attn_out, lw["ln_attn"], cfg.rms_norm_eps)
    if cfg.residual_multiplier is not None:  # granite
        attn_out = attn_out * cfg.residual_multiplier
    x = x + attn_out

    h = x if cfg.norm_after else rms_norm(x, lw["ln_mlp"], cfg.rms_norm_eps)
    if cfg.num_experts:  # mixtral sparse MoE (dense-evaluated)
        mlp_out = _moe_mlp(cfg, lw, h)
    elif "w_gu" in lw:  # fused layout
        gu = _mm(h, lw["w_gu"])
        gate, up = jnp.split(gu, 2, axis=-1)
        mlp_out = _mm(mlp_activation(cfg, gate) * up, lw["w_down"])
    else:
        gate = mlp_activation(cfg, _mm(h, lw["w_gate"]))
        mlp_out = _mm(gate * _mm(h, lw["w_up"]), lw["w_down"])
    if cfg.post_block_norms:
        mlp_out = rms_norm(mlp_out, lw["ln_post_mlp"], cfg.rms_norm_eps)
    if cfg.norm_after:
        mlp_out = rms_norm(mlp_out, lw["ln_mlp"], cfg.rms_norm_eps)
    if cfg.residual_multiplier is not None:
        mlp_out = mlp_out * cfg.residual_multiplier
    x = x + mlp_out
    # MLA without a cache: hand the compressed rows to the caller (the
    # batch-last prefill scans them out; forward() ignores them)
    if cache_kv is None and mla_rows is not None:
        return x, mla_rows
    return x, new_cache


def forward(
    cfg: LlamaConfig,
    params: dict,
    inputs_embeds: jax.Array,
    attention_mask: Optional[jax.Array] = None,
    positions: Optional[jax.Array] = None,
    remat: bool = False,
) -> jax.Array:
    """Full-sequence forward -> logits [B, T, V].

    attention_mask: [B, T] with 1 = real token (HF convention).  Causal
    masking is always applied; positions default to arange (HF default for
    right-padded batches).  remat=True rematerializes each block on the
    backward pass (activation memory ~O(1) in depth — trades FLOPs for
    HBM when training through the frozen LLM at large batch/seq)."""
    B, T, H = inputs_embeds.shape
    # gemma scales inputs_embeds (soft prefixes included) by sqrt(H),
    # quantized to the model dtype (HF Gemma2Model.forward)
    x = scale_embeds(cfg, inputs_embeds.astype(cfg.dtype))
    explicit_positions = positions is not None
    if positions is None:
        positions = jnp.arange(T)
    cos, sin = rope_tables(cfg, positions)

    # sliding windows bind only when some key could fall OUT of the window;
    # with contiguous arange positions < window every sliding mask equals
    # the causal mask, so the interleaved-bias machinery is statically
    # skipped (caption budgets sit far below gemma-2's 4096 window).
    # Caller-supplied positions may be non-contiguous (gaps > window at
    # any T), so they force the overlay on — it is built from the actual
    # position values either way.
    sliding_on = sliding_effective(cfg, T if not explicit_positions else 0) or (
        explicit_positions
        and cfg.sliding_window is not None
        and cfg.layer_sliding is not None
        and any(cfg.layer_sliding)
    )
    if sliding_on and explicit_positions and jnp.ndim(positions) != 1:
        raise ValueError(
            "sliding-window models require 1-D positions (the window "
            "overlay broadcasts positions[:, None] - positions[None, :])"
        )

    seg_ids = None
    bias = bias_sw = None
    # flash needs a TPU (or interpret mode via DMI_FORCE_FLASH in tests);
    # off-TPU the additive-bias oracle runs even when configured 'flash'.
    # 'auto' resolves to flash on TPU (pad-exact, no [B,T,S] f32 bias in
    # HBM) and the oracle elsewhere.  Softcapped (gemma-2) and
    # sliding-bound models always take the oracle: the Pallas kernel
    # implements neither.
    import os as _os

    on_tpu = (
        jax.default_backend() == "tpu" or _os.environ.get("DMI_FORCE_FLASH") == "1"
    )
    use_flash = (
        cfg.attention_impl in ("flash", "auto")
        and on_tpu
        and cfg.attn_logit_softcap is None
        and not sliding_on
        # dual-rope (gemma-3) layers need per-layer tables; the flash
        # branch scans without the layer flags — take the oracle
        and cfg.rope_local_theta is None
        # MLA (deepseek): q/k and v widths differ — the flash kernel
        # assumes one head_dim; take the oracle
        and cfg.kv_lora_rank is None
    )
    if use_flash:
        # pad-exact masking: queries unmasked, keys masked (see
        # _flash_attention) — identical objective to the additive-bias
        # oracle on ragged batches, pad rows included
        ones = jnp.ones((B, T), jnp.int32)
        kv_seg = (
            attention_mask.astype(jnp.int32) if attention_mask is not None else ones
        )
        seg_ids = (ones, kv_seg)
    else:
        causal = jnp.tril(jnp.ones((T, T), bool))
        valid = causal[None, :, :]
        if attention_mask is not None:
            valid = valid & attention_mask[:, None, :].astype(bool)
        else:
            valid = jnp.broadcast_to(valid, (B, T, T))
        bias = jnp.where(valid, 0.0, jnp.finfo(jnp.float32).min)
        if sliding_on:
            # HF sliding_window_overlay: attend iff kv > q - window (and
            # causal) — the last `window` positions including the current
            in_win = (positions[:, None] - positions[None, :]) < cfg.sliding_window
            bias_sw = jnp.where(valid & in_win[None], 0.0, jnp.finfo(jnp.float32).min)

    layer_params = params["layers"]

    dual = rope_dual(cfg)
    if (sliding_on and not use_flash) or dual:
        # per-layer selection: sliding-vs-full bias and/or local-vs-global
        # rope tables (gemma-3), keyed by the same layer_sliding flags
        flags = jnp.asarray(cfg.layer_sliding)
        cos_l, sin_l = (
            rope_tables(cfg, positions, local=True) if dual else (cos, sin)
        )

        def body(x, xs):
            lw, fl = xs
            b = jnp.where(fl, bias_sw, bias) if bias_sw is not None else bias
            c = jnp.where(fl, cos_l, cos) if dual else cos
            s = jnp.where(fl, sin_l, sin) if dual else sin
            y, _ = _block(cfg, x, lw, c, s, b, seg_ids=None)
            return y, None

        if remat:
            body = jax.checkpoint(body)
        x, _ = jax.lax.scan(body, x, (layer_params, flags))
    else:

        def body(x, lw):
            y, _ = _block(cfg, x, lw, cos, sin, bias, seg_ids=seg_ids)
            return y, None

        if remat:
            body = jax.checkpoint(body)
        x, _ = jax.lax.scan(body, x, layer_params)
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    logits = _head_matmul(x, params, cfg)
    return final_softcap(cfg, logits)


def embed_tokens(cfg: LlamaConfig, params: dict, input_ids: jax.Array) -> jax.Array:
    embed = params["embed"]
    if isinstance(embed, dict):
        qk = "q8" if "q8" in embed else "q"
        rows = embed[qk][input_ids].astype(cfg.dtype)
        rows = rows * embed["s"][input_ids].astype(cfg.dtype)
    else:
        rows = embed[input_ids]
    if cfg.embedding_normalizer is not None and cfg.embedding_scale_at_lookup:
        # gemma-3: the sqrt(H) scale lives in the embedding lookup
        # (Gemma3TextScaledWordEmbedding), not at model entry
        rows = rows * jnp.asarray(cfg.embedding_normalizer, rows.dtype)
    return rows


def causal_lm_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """HF CausalLM loss: shift, ignore -100, token-mean cross-entropy in f32."""
    shift_logits = logits[:, :-1, :].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != -100
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    token_ll = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    n_valid = jnp.maximum(valid.sum(), 1)
    return -(token_ll * valid).sum() / n_valid


def causal_lm_loss_grouped(logits: jax.Array, labels: jax.Array,
                           groups: int) -> jax.Array:
    """causal_lm_loss of G stacked micro-batches in one [G*B, T] forward:
    returns [G] per-group token-mean losses, each mathematically equal to
    causal_lm_loss on that group's rows alone.  Rows padded past their own
    micro-batch length must carry -100 labels (extension positions are
    causally invisible to real positions and excluded here), so grad-accum
    micro-steps can be coalesced with per-group numerics intact."""
    shift_logits = logits[:, :-1, :].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != -100
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    token_ll = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    gb, t = token_ll.shape
    token_ll = token_ll.reshape(groups, gb // groups, t)
    valid = valid.reshape(groups, gb // groups, t)
    n_valid = jnp.maximum(valid.sum(axis=(1, 2)), 1)
    return -(token_ll * valid).sum(axis=(1, 2)) / n_valid
