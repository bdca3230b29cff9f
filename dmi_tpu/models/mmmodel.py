"""Frozen-LLM soft-prefix captioner glue.

Semantics of the reference MM model wrappers (dmi/model/mmmodel.py): project
the modality embedding to ONE soft token, prepend it to the text embeddings,
extend the attention mask with 1 and the labels with -100, and run the
frozen LM for loss; for generation, prepend the soft token to the embedded
chat prefix and greedy-decode.

The projector/hypernet/LoRA variants differ only in how the soft token is
produced — that composition happens in the trainers; these functions take
the soft tokens directly and are shared by all three model families.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from dmi_tpu.models import decode as dec
from dmi_tpu.models import llama
from dmi_tpu.models.llama import LlamaConfig


def assemble_inputs(
    cfg: LlamaConfig,
    llm_params: dict,
    soft_tokens: jax.Array,  # [B, lm_dim]
    input_ids: jax.Array,  # [B, T]
    attention_mask: jax.Array,  # [B, T]
    labels: jax.Array,  # [B, T]
):
    """Prepend the soft token (reference: dmi/model/mmmodel.py:112-136)."""
    B = soft_tokens.shape[0]
    text_embeds = llama.embed_tokens(cfg, llm_params, input_ids)
    inputs_embeds = jnp.concatenate(
        [soft_tokens[:, None, :].astype(text_embeds.dtype), text_embeds], axis=1
    )
    attention_mask = jnp.concatenate(
        [jnp.ones((B, 1), attention_mask.dtype), attention_mask], axis=1
    )
    labels = jnp.concatenate([jnp.full((B, 1), -100, labels.dtype), labels], axis=1)
    return inputs_embeds, attention_mask, labels


def caption_loss(
    cfg: LlamaConfig,
    llm_params: dict,
    soft_tokens: jax.Array,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    labels: jax.Array,
    mask_padding: bool = False,
) -> jax.Array:
    """loss = LM(inputs_embeds = soft ⊕ text, labels = -100 ⊕ labels).

    Reference quirk (preserved by default): all three reference MM models
    build the extended attention mask but NEVER pass it to the LLM — the
    loss forward is ``self.llm(inputs_embeds=…, labels=…)`` with no
    attention_mask kwarg (dmi/model/mmmodel.py:139-147, :49-57, :226-232),
    so HF runs full causal attention over the pad columns, whose positions
    carry loss (labels are padded with pad_token_id, dmi/data/base.py:40-50).
    On ragged batches masking the pads changes those positions' logits and
    therefore the loss; published results depend on the unmasked form.
    Pinned against the executed reference in
    tests/test_reference_model_parity.py.  mask_padding=True restores the
    "fixed" pad-masked objective."""
    inputs_embeds, attention_mask, labels = assemble_inputs(
        cfg, llm_params, soft_tokens, input_ids, attention_mask, labels
    )
    logits = llama.forward(
        cfg, llm_params, inputs_embeds,
        attention_mask if mask_padding else None,
    )
    return llama.causal_lm_loss(logits, labels)


def caption_loss_grouped(
    cfg: LlamaConfig,
    llm_params: dict,
    soft_tokens: jax.Array,   # [G*B, lm_dim]
    input_ids: jax.Array,     # [G*B, T]
    attention_mask: jax.Array,
    labels: jax.Array,
    groups: int,
    mask_padding: bool = False,
) -> jax.Array:
    """caption_loss of G stacked micro-batches in ONE LLM forward,
    returning [G] per-group losses (llama.causal_lm_loss_grouped).

    Enables grad-accum coalescing: stage-2's B=8 micro-batches underfill
    the MXU (BASELINE.md round-3 MFU decomposition), so k of them run as
    one k*B-row dispatch.  Groups padded to a common T must extend labels
    with -100 / mask with 0 — causal attention makes the extension
    invisible to real positions, so each group's loss equals its solo
    caption_loss run (summation order aside)."""
    inputs_embeds, attention_mask, labels = assemble_inputs(
        cfg, llm_params, soft_tokens, input_ids, attention_mask, labels
    )
    logits = llama.forward(
        cfg, llm_params, inputs_embeds,
        attention_mask if mask_padding else None,
    )
    return llama.causal_lm_loss_grouped(logits, labels, groups)


def assemble_prompt(
    cfg: LlamaConfig,
    llm_params: dict,
    soft_tokens: jax.Array,
    prefix_ids: Optional[jax.Array],
) -> jax.Array:
    """soft token ⊕ embedded chat prefix — the single prompt-assembly path
    shared by greedy and stochastic decoding."""
    embeds = soft_tokens[:, None, :]
    if prefix_ids is not None:
        prefix_embeds = llama.embed_tokens(cfg, llm_params, prefix_ids)
        embeds = jnp.concatenate(
            [embeds.astype(prefix_embeds.dtype), prefix_embeds], axis=1
        )
    return embeds


def caption_sample(
    cfg: LlamaConfig,
    llm_params: dict,
    soft_tokens: jax.Array,
    prefix_ids: Optional[jax.Array],
    max_new_tokens: int,
    pad_token_id: int,
    base_key: jax.Array,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    req_ids: Optional[jax.Array] = None,
    prefill_params: Optional[dict] = None,
) -> jax.Array:
    """Stochastic caption decode with request-indexed rng (serving
    surface; the reference only decodes greedily).  Tokens for a given
    (request id, age) are a pure function of base_key — the
    continuous-batching engine reproduces them bit-exactly under any slot
    assignment (dec.sample_generate_bl)."""
    embeds = assemble_prompt(
        cfg, llm_params if prefill_params is None else prefill_params,
        soft_tokens, prefix_ids,
    )
    return dec.sample_generate_bl(
        cfg, llm_params, embeds, max_new_tokens, pad_token_id, base_key,
        temperature, top_k, top_p, req_ids, prefill_params=prefill_params,
    )


def caption_generate(
    cfg: LlamaConfig,
    llm_params: dict,
    soft_tokens: jax.Array,
    prefix_ids: Optional[jax.Array],  # [B, P] chat-template prompt, or None
    max_new_tokens: int,
    pad_token_id: int,
    prefill_params: Optional[dict] = None,
    batch_first: Optional[bool] = None,
) -> jax.Array:
    """Greedy decode from soft token (+ optional chat prefix)
    (reference: dmi/model/mmmodel.py:149-169).

    Uses the batch-last loop (dec.greedy_generate_bl) — token-identical to
    dec.greedy_generate and faster on both TPU (205 vs 235 ms/batch at
    B=256 on v5e) and CPU; DMI_DECODE_BATCH_FIRST=1 pins the original.
    batch_first=None reads that env var — fine for eager callers, but a
    jitted caller must resolve the env itself and pass batch_first as a
    STATIC argument (like fused_head), or an env flip mid-process is
    silently ignored by the jit cache.
    prefill_params: optional bf16 weights for the prompt pass when
    llm_params are W8A8-quantized (see dec.greedy_generate_bl)."""
    import os

    if batch_first is None:
        batch_first = os.environ.get("DMI_DECODE_BATCH_FIRST") == "1"
    if batch_first:
        # the batch-first reference path has no prefill/loop weight split:
        # run it fully on llm_params so it stays a coherent parity oracle
        embeds = assemble_prompt(cfg, llm_params, soft_tokens, prefix_ids)
        return dec.greedy_generate(cfg, llm_params, embeds, max_new_tokens,
                                   pad_token_id)
    embeds = assemble_prompt(
        cfg, llm_params if prefill_params is None else prefill_params,
        soft_tokens, prefix_ids,
    )
    return dec.greedy_generate_bl(cfg, llm_params, embeds, max_new_tokens,
                                  pad_token_id, prefill_params=prefill_params)


def caption_generate_speculative(
    cfg: LlamaConfig,
    llm_params: dict,
    draft_cfg: LlamaConfig,
    draft_params: dict,
    soft_tokens: jax.Array,
    prefix_ids: Optional[jax.Array],
    max_new_tokens: int,
    pad_token_id: int,
    k: int = 4,
    prefill_params: Optional[dict] = None,
    draft_prefill_params: Optional[dict] = None,
    draft_prompt_embeds: Optional[jax.Array] = None,
    share_prefill: bool = False,
) -> jax.Array:
    """Greedy caption decode through the draft-verify speculative loop
    (dmi_tpu/models/speculative.py) — token-identical to caption_generate
    for ANY draft (greedy rejection), faster when the draft is cheap and
    usually right.

    The production draft is a W4A8-quantized copy of the target (built by
    serve.Captioner(speculative=k)): it shares the target's embedding
    space, so the assembled soft-token ⊕ chat-prefix prompt is reused as
    the draft prompt.  A heterogeneous draft model supplies its own
    draft_prompt_embeds (it must share the tokenizer's vocab ids).

    The reference decodes greedily with no speculation
    (dmi/model/mmmodel.py:149-169); serving surface, like streaming.py.
    """
    from dmi_tpu.models.speculative import speculative_generate_bl

    embeds = assemble_prompt(
        cfg, llm_params if prefill_params is None else prefill_params,
        soft_tokens, prefix_ids,
    )
    if draft_prompt_embeds is None:
        draft_prompt_embeds = embeds
    tokens, _ = speculative_generate_bl(
        cfg, llm_params, draft_cfg, draft_params, embeds,
        draft_prompt_embeds, max_new_tokens, pad_token_id, k=k,
        prefill_params=prefill_params,
        draft_prefill_params=draft_prefill_params,
        share_prefill=share_prefill,
    )
    return tokens


def caption_sample_speculative(
    cfg: LlamaConfig,
    llm_params: dict,
    draft_cfg: LlamaConfig,
    draft_params: dict,
    soft_tokens: jax.Array,
    prefix_ids: Optional[jax.Array],
    max_new_tokens: int,
    pad_token_id: int,
    base_key: jax.Array,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    req_ids: Optional[jax.Array] = None,
    k: int = 4,
    prefill_params: Optional[dict] = None,
    draft_prefill_params: Optional[dict] = None,
    draft_prompt_embeds: Optional[jax.Array] = None,
    share_prefill: bool = False,
) -> jax.Array:
    """Stochastic caption decode through the speculative draft-verify loop
    (speculative.speculative_sample_bl): the emitted tokens keep
    caption_sample's request-indexed warped-target DISTRIBUTION for any
    draft, and are bit-identical to caption_sample when draft == target.
    Serving surface (the reference decodes greedily only)."""
    from dmi_tpu.models.speculative import speculative_sample_bl

    embeds = assemble_prompt(
        cfg, llm_params if prefill_params is None else prefill_params,
        soft_tokens, prefix_ids,
    )
    if draft_prompt_embeds is None:
        draft_prompt_embeds = embeds
    tokens, _ = speculative_sample_bl(
        cfg, llm_params, draft_cfg, draft_params, embeds,
        draft_prompt_embeds, max_new_tokens, pad_token_id, base_key,
        temperature=temperature, top_k=top_k, top_p=top_p, req_ids=req_ids,
        k=k, prefill_params=prefill_params,
        draft_prefill_params=draft_prefill_params,
        share_prefill=share_prefill,
    )
    return tokens
