"""Batched KV-cache greedy decode as a lax.while_loop.

Replaces HF ``llm.generate(inputs_embeds=..., max_new_tokens=...,
pad_token_id=...)`` (reference: dmi/model/mmmodel.py:61-81,149-169,235-255),
which the reference uses with default generation config => pure greedy.

HF semantics replicated:
  * with inputs_embeds, only the newly generated ids are returned
  * per-sequence finish on any EOS id; finished sequences emit pad_token_id
  * the terminating EOS itself is written before the sequence is padded

TPU-first design:
  * static shapes: token buffer [B, max_new_tokens]; KV caches preallocated
    at prompt_len + max_new_tokens and updated in place per step
  * caches are stacked over layers and threaded through a lax.scan over the
    stacked layer weights — one compiled step function regardless of depth
  * early exit via lax.while_loop the moment every sequence has finished
    (decisive for short captions against a large max_new_tokens budget)
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from dmi_tpu.models import llama
from dmi_tpu.models.llama import LlamaConfig


def init_cache(cfg: LlamaConfig, batch: int, max_len: int) -> Tuple[jax.Array, jax.Array]:
    shape = (
        cfg.num_hidden_layers,
        batch,
        cfg.num_key_value_heads,
        max_len,
        cfg.head_dim,
    )
    return jnp.zeros(shape, cfg.dtype), jnp.zeros(shape, cfg.dtype)


def _run_layers(cfg, params, x, cos, sin, bias, caches, cache_index, last_only=False):
    """lax.scan over stacked layer weights, threading stacked KV caches.

    last_only restricts the vocab-head matmul to the final position —
    prefill only needs the next-token logits, and the [B, T, V] head output
    is by far its largest tensor."""
    k_cache, v_cache = caches

    def body(carry, xs):
        h = carry
        lw, kc, vc = xs
        h, (kc, vc) = llama._block(
            cfg, h, lw, cos, sin, bias, cache_kv=(kc, vc), cache_index=cache_index
        )
        return h, (kc, vc)

    x, (k_cache, v_cache) = jax.lax.scan(body, x, (params["layers"], k_cache, v_cache))
    if last_only:
        x = x[:, -1:, :]
    x = llama.rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    return llama._head_matmul(x, params, cfg), (k_cache, v_cache)


def prefill(cfg, params, inputs_embeds, caches):
    """Run the uniform-length prompt, filling caches at positions [0, T)."""
    B, T, _ = inputs_embeds.shape
    S = caches[0].shape[3]
    positions = jnp.arange(T)
    cos, sin = llama.rope_tables(cfg, positions)
    # queries at [0,T) attend causally within the prompt; cache tail unused
    key_pos = jnp.arange(S)
    valid = key_pos[None, :] <= positions[:, None]  # [T, S]
    bias = jnp.where(valid, 0.0, jnp.finfo(jnp.float32).min)[None]
    bias = jnp.broadcast_to(bias, (B, T, S))
    logits, caches = _run_layers(
        cfg, params, inputs_embeds.astype(cfg.dtype), cos, sin, bias, caches, 0,
        last_only=True,
    )
    return logits[:, -1, :], caches


def decode_step(cfg, params, token_embeds, caches, pos):
    """One token step; pos is the absolute position being written."""
    B = token_embeds.shape[0]
    S = caches[0].shape[3]
    cos, sin = llama.rope_tables(cfg, pos[None])
    valid = (jnp.arange(S) <= pos)[None, None, :]
    bias = jnp.where(valid, 0.0, jnp.finfo(jnp.float32).min)
    bias = jnp.broadcast_to(bias, (B, 1, S))
    logits, caches = _run_layers(
        cfg, params, token_embeds.astype(cfg.dtype), cos, sin, bias, caches, pos
    )
    return logits[:, 0, :], caches


@partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "pad_token_id", "temperature", "top_k"),
)
def sample_generate(
    cfg: LlamaConfig,
    params: dict,
    inputs_embeds: jax.Array,
    max_new_tokens: int,
    pad_token_id: int,
    rng: jax.Array,
    temperature: float = 1.0,
    top_k: int = 0,
) -> jax.Array:
    """Stochastic decode (temperature / top-k) with the same cache/early-exit
    machinery as greedy_generate.  The reference only ever decodes greedily
    (no sampling args passed to HF generate, dmi/model/mmmodel.py:72) — this
    is serving surface the framework adds."""
    B, T, _ = inputs_embeds.shape
    total = T + max_new_tokens
    caches = init_cache(cfg, B, total)
    eos = jnp.asarray(cfg.eos_token_ids)

    if cfg.tie_word_embeddings and not isinstance(params["embed"], dict):
        params = {**params, "head": params["embed"].T}

    logits, caches = prefill(cfg, params, inputs_embeds, caches)
    tokens0 = jnp.full((B, max_new_tokens), pad_token_id, jnp.int32)
    done0 = jnp.zeros((B,), bool)

    def pick(logits, key):
        scaled = logits.astype(jnp.float32) / max(temperature, 1e-6)
        if top_k > 0:
            kth = jnp.sort(scaled, axis=-1)[:, -top_k][:, None]
            scaled = jnp.where(scaled < kth, -jnp.inf, scaled)
        return jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)

    def cond(state):
        step, _, _, done, _, _ = state
        return (step < max_new_tokens) & ~jnp.all(done)

    def body(state):
        step, logits, caches, done, tokens, key = state
        key, sub = jax.random.split(key)
        next_tok = pick(logits, sub)
        next_tok = jnp.where(done, pad_token_id, next_tok)
        tokens = jax.lax.dynamic_update_slice(tokens, next_tok[:, None], (0, step))
        done = done | jnp.isin(next_tok, eos)
        embeds = llama.embed_tokens(cfg, params, next_tok)[:, None, :]
        logits, caches = decode_step(cfg, params, embeds, caches, T + step)
        return step + 1, logits, caches, done, tokens, key

    _, _, _, _, tokens, _ = jax.lax.while_loop(
        cond, body, (0, logits, caches, done0, tokens0, rng)
    )
    return tokens


@partial(jax.jit, static_argnames=("cfg", "max_new_tokens", "pad_token_id"))
def greedy_generate(
    cfg: LlamaConfig,
    params: dict,
    inputs_embeds: jax.Array,
    max_new_tokens: int,
    pad_token_id: int,
) -> jax.Array:
    """Greedy decode from a uniform-length prompt of embeddings.

    Returns [B, max_new_tokens] generated ids (pad-filled after finish)."""
    B, T, _ = inputs_embeds.shape
    total = T + max_new_tokens
    caches = init_cache(cfg, B, total)
    eos = jnp.asarray(cfg.eos_token_ids)

    if cfg.tie_word_embeddings and not isinstance(params["embed"], dict):
        params = {**params, "head": params["embed"].T}

    logits, caches = prefill(cfg, params, inputs_embeds, caches)

    tokens0 = jnp.full((B, max_new_tokens), pad_token_id, jnp.int32)
    done0 = jnp.zeros((B,), bool)

    def cond(state):
        step, _, _, done, _ = state
        return (step < max_new_tokens) & ~jnp.all(done)

    def body(state):
        step, logits, caches, done, tokens = state
        next_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        next_tok = jnp.where(done, pad_token_id, next_tok)
        tokens = jax.lax.dynamic_update_slice(tokens, next_tok[:, None], (0, step))
        done = done | jnp.isin(next_tok, eos)
        embeds = llama.embed_tokens(cfg, params, next_tok)[:, None, :]
        logits, caches = decode_step(cfg, params, embeds, caches, T + step)
        return step + 1, logits, caches, done, tokens

    _, _, _, _, tokens = jax.lax.while_loop(
        cond, body, (0, logits, caches, done0, tokens0)
    )
    return tokens
