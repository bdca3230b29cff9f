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
import numpy as np

from dmi_tpu.models import llama
from dmi_tpu.models.llama import LlamaConfig


def init_cache(cfg: LlamaConfig, batch: int, max_len: int) -> Tuple[jax.Array, jax.Array]:
    """Per-head K/V caches for the generic batch-first path.  MLA
    (deepseek) stores EXPANDED per-head tensors here — K at the q/k width
    (qk_nope+qk_rope = head_dim, nkv == nh) and V at v_head_dim; the
    batch-last serving path uses the compressed-latent layout instead."""
    nkv = (
        cfg.num_attention_heads
        if cfg.kv_lora_rank is not None
        else cfg.num_key_value_heads
    )
    base = (cfg.num_hidden_layers, batch, nkv, max_len)
    v_dim = cfg.v_head_dim if cfg.kv_lora_rank is not None else cfg.head_dim
    return (
        jnp.zeros(base + (cfg.head_dim,), cfg.dtype),
        jnp.zeros(base + (v_dim,), cfg.dtype),
    )


def _run_layers(cfg, params, x, cos, sin, bias, caches, cache_index, last_only=False,
                bias_sw=None, rope_local=None):
    """lax.scan over stacked layer weights, threading stacked KV caches.

    last_only restricts the vocab-head matmul to the final position —
    prefill only needs the next-token logits, and the [B, T, V] head output
    is by far its largest tensor.

    bias_sw: per-layer sliding-window bias (gemma-2); layers flagged
    sliding in cfg.layer_sliding use it instead of `bias`.  None whenever
    sliding cannot bind (llama.sliding_effective) — the hot path is then
    byte-identical to the single-bias formulation.

    rope_local: (cos, sin) local-rope tables for gemma-3 — layers flagged
    sliding use them instead of the global cos/sin (llama.rope_dual; the
    table split applies at EVERY length, unlike the bias overlay)."""
    k_cache, v_cache = caches

    if bias_sw is not None or rope_local is not None:
        flags = jnp.asarray(cfg.layer_sliding)
        cos_l, sin_l = rope_local if rope_local is not None else (cos, sin)

        def body(carry, xs):
            h = carry
            lw, kc, vc, fl = xs
            b = jnp.where(fl, bias_sw, bias) if bias_sw is not None else bias
            c = jnp.where(fl, cos_l, cos) if rope_local is not None else cos
            s = jnp.where(fl, sin_l, sin) if rope_local is not None else sin
            h, (kc, vc) = llama._block(
                cfg, h, lw, c, s, b,
                cache_kv=(kc, vc), cache_index=cache_index,
            )
            return h, (kc, vc)

        x, (k_cache, v_cache) = jax.lax.scan(
            body, x, (params["layers"], k_cache, v_cache, flags)
        )
    else:

        def body(carry, xs):
            h = carry
            lw, kc, vc = xs
            h, (kc, vc) = llama._block(
                cfg, h, lw, cos, sin, bias, cache_kv=(kc, vc), cache_index=cache_index
            )
            return h, (kc, vc)

        x, (k_cache, v_cache) = jax.lax.scan(
            body, x, (params["layers"], k_cache, v_cache)
        )
    if last_only:
        x = x[:, -1:, :]
    x = llama.rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    logits = llama._head_matmul(x, params, cfg)
    return llama.final_softcap(cfg, logits), (k_cache, v_cache)


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
    bias_sw = None
    if llama.sliding_effective(cfg, T):
        in_win = (positions[:, None] - key_pos[None, :]) < cfg.sliding_window
        bias_sw = jnp.where(valid & in_win, 0.0, jnp.finfo(jnp.float32).min)[None]
        bias_sw = jnp.broadcast_to(bias_sw, (B, T, S))
    rope_local = (
        llama.rope_tables(cfg, positions, local=True)
        if llama.rope_dual(cfg) else None
    )
    x = llama.scale_embeds(cfg, inputs_embeds.astype(cfg.dtype))
    logits, caches = _run_layers(
        cfg, params, x, cos, sin, bias, caches, 0, last_only=True,
        bias_sw=bias_sw, rope_local=rope_local,
    )
    return logits[:, -1, :], caches


def decode_step(cfg, params, token_embeds, caches, pos):
    """One token step; pos is the absolute position being written."""
    B = token_embeds.shape[0]
    S = caches[0].shape[3]
    cos, sin = llama.rope_tables(cfg, pos[None])
    key_pos = jnp.arange(S)
    valid = (key_pos <= pos)[None, None, :]
    bias = jnp.where(valid, 0.0, jnp.finfo(jnp.float32).min)
    bias = jnp.broadcast_to(bias, (B, 1, S))
    bias_sw = None
    if llama.sliding_effective(cfg, S):
        in_win = ((pos - key_pos) < cfg.sliding_window)[None, None, :]
        bias_sw = jnp.where(valid & in_win, 0.0, jnp.finfo(jnp.float32).min)
        bias_sw = jnp.broadcast_to(bias_sw, (B, 1, S))
    rope_local = (
        llama.rope_tables(cfg, pos[None], local=True)
        if llama.rope_dual(cfg) else None
    )
    x = llama.scale_embeds(cfg, token_embeds.astype(cfg.dtype))
    logits, caches = _run_layers(
        cfg, params, x, cos, sin, bias, caches, pos, bias_sw=bias_sw,
        rope_local=rope_local,
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
    prefill_params: dict | None = None,
) -> jax.Array:
    """Stochastic decode (temperature / top-k) with the same cache/early-exit
    machinery as greedy_generate.  The reference only ever decodes greedily
    (no sampling args passed to HF generate, dmi/model/mmmodel.py:72) — this
    is serving surface the framework adds.  prefill_params: as in
    greedy_generate_bl (bf16 prompt pass for quantized loop weights)."""
    B, T, _ = inputs_embeds.shape
    if max_new_tokens == 0:
        return jnp.zeros((B, 0), jnp.int32)
    total = T + max_new_tokens
    caches = init_cache(cfg, B, total)
    eos = jnp.asarray(cfg.eos_token_ids)

    if cfg.tie_word_embeddings and not isinstance(params["embed"], dict):
        params = {**params, "head": params["embed"].T}

    logits, caches = prefill(
        cfg, params if prefill_params is None else prefill_params,
        inputs_embeds, caches,
    )
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
        return (step < max_new_tokens - 1) & ~jnp.all(done)

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

    step, logits, _, done, tokens, key = jax.lax.while_loop(
        cond, body, (0, logits, caches, done0, tokens0, rng)
    )
    # final token needs no decode_step (see greedy_generate_bl)
    _, sub = jax.random.split(key)
    last = jnp.where(done, pad_token_id, pick(logits, sub))
    tokens = jax.lax.dynamic_update_slice(tokens, last[:, None], (0, step))
    return tokens


def _req_keys(base_key, req_ids, budget, n):
    """Per-request sampling keys: fold_in(base, req*budget + n).  Keyed by
    the REQUEST id and its own decode age — independent of batch
    composition or slot assignment, so continuous-batching engines and the
    batch loop draw identical tokens for the same request."""
    n = jnp.broadcast_to(n, req_ids.shape)  # scalar age (batch loop) or
    # per-slot ages (continuous batching)
    return jax.vmap(
        lambda r, nn: jax.random.fold_in(base_key, r * budget + nn)
    )(req_ids, n)


def _warp_bl(logits_vb, temperature, top_k, top_p=1.0):
    """HF-ordered warp chain over batch-last [V, N] logits (trace-time
    constant temperature/top_k/top_p): temperature -> top_k -> top_p
    (nucleus keeps the smallest prefix of descending-prob tokens whose
    mass reaches top_p; filter semantics pinned against HF's
    TopPLogitsWarper).  Returns warped f32 logits (-inf = filtered);
    shared by the sampling pick and speculative acceptance (which needs
    the full warped DISTRIBUTION, not just a draw)."""
    scaled = logits_vb.astype(jnp.float32) / max(temperature, 1e-6)
    if top_k > 0:
        kth = jnp.sort(scaled, axis=0)[-top_k, :][None, :]
        scaled = jnp.where(scaled < kth, -jnp.inf, scaled)
    if top_p < 1.0:
        desc = jnp.sort(scaled, axis=0)[::-1, :]
        probs = jax.nn.softmax(desc, axis=0)
        exceeded = jnp.cumsum(probs, axis=0) > top_p
        # keep every token up to AND INCLUDING the one that crosses top_p
        # (HF keeps the crossing token); min kept logit = the cutoff
        keep = jnp.concatenate(
            [jnp.ones_like(exceeded[:1]), ~exceeded[:-1]], axis=0
        )
        kth_p = jnp.min(jnp.where(keep, desc, jnp.inf), axis=0)[None, :]
        scaled = jnp.where(scaled < kth_p, -jnp.inf, scaled)
    return scaled


def _sample_pick_bl(logits_vb, keys, temperature, top_k, top_p=1.0):
    """Per-row categorical over batch-last [V, B] logits with per-row keys
    [B] through the _warp_bl chain."""
    scaled = _warp_bl(logits_vb, temperature, top_k, top_p)
    return jax.vmap(lambda k, l: jax.random.categorical(k, l))(
        keys, scaled.T
    ).astype(jnp.int32)


@partial(jax.jit, static_argnames=("cfg", "max_new_tokens", "pad_token_id",
                                   "temperature", "top_k", "top_p"))
def sample_generate_bl(
    cfg: LlamaConfig,
    params: dict,
    inputs_embeds: jax.Array,
    max_new_tokens: int,
    pad_token_id: int,
    base_key: jax.Array,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    req_ids: jax.Array | None = None,
    prefill_params: dict | None = None,
) -> jax.Array:
    """Batch-last stochastic decode with REQUEST-INDEXED rng: row r's
    token at age n is drawn with fold_in(base_key, req_ids[r]*budget + n),
    so the draw stream is a pure function of (request, age) — the
    continuous-batching engine (dmi_tpu/streaming.py, sampling mode)
    produces bit-identical tokens for the same requests regardless of slot
    assignment, admission order, or pool size.  Shares _decode_step_bl
    (and therefore bit-identical logits) with the greedy serving path.
    EOS/pad semantics as greedy_generate_bl."""
    B, T, _ = inputs_embeds.shape
    if max_new_tokens == 0:
        return jnp.zeros((B, 0), jnp.int32)
    if req_ids is None:
        req_ids = jnp.arange(B, dtype=jnp.int32)
    total = T + max_new_tokens
    eos = jnp.asarray(cfg.eos_token_ids)

    if cfg.kv_lora_rank is not None:
        # deepseek-v2: compressed-latent cache (see _mla_attn_bl)
        logits0, kv_cache = _mla_prefill_compressed(
            cfg, params if prefill_params is None else prefill_params,
            inputs_embeds, total,
        )
    else:
        caches = init_cache(cfg, B, total)
        logits0, caches = prefill(
            cfg, params if prefill_params is None else prefill_params,
            inputs_embeds, caches,
        )
        kv_cache = jnp.stack(
            [caches[0].transpose(0, 2, 3, 4, 1),
             caches[1].transpose(0, 2, 3, 4, 1)],
            axis=1,
        )
    logits = logits0.T  # [V, B]
    tokens0 = jnp.full((B, max_new_tokens), pad_token_id, jnp.int32)
    done0 = jnp.zeros((B,), bool)
    key_pos = jnp.arange(total)
    sliding_on = llama.sliding_effective(cfg, total)

    def pick(logits, step):
        keys = _req_keys(base_key, req_ids, max_new_tokens, step)
        return _sample_pick_bl(logits, keys, temperature, top_k, top_p)

    def cond(state):
        step, _, _, done, _ = state
        return (step < max_new_tokens - 1) & ~jnp.all(done)

    def body(state):
        step, logits, kv_cache, done, tokens = state
        next_tok = jnp.where(done, pad_token_id, pick(logits, step))
        tokens = jax.lax.dynamic_update_slice(tokens, next_tok[:, None], (0, step))
        done = done | jnp.isin(next_tok, eos)
        h = llama.scale_embeds(
            cfg, llama.embed_tokens(cfg, params, next_tok).T.astype(cfg.dtype)
        )
        pos = T + step
        bias = jnp.where(key_pos <= pos, 0.0, jnp.finfo(jnp.float32).min)
        bias_sw = None
        if sliding_on:
            bias_sw = jnp.where(
                (key_pos <= pos) & (pos - key_pos < cfg.sliding_window),
                0.0,
                jnp.finfo(jnp.float32).min,
            )
        logits, kv_cache = _decode_step_bl(
            cfg, params, h, kv_cache, pos, bias, bias_sw=bias_sw
        )
        # _decode_step_bl skips final_logit_softcap (argmax-invariant for
        # its greedy consumers) — sampling draws from the DISTRIBUTION, so
        # cap here like HF does before its warpers (prefill logits0 arrive
        # already capped; identity for non-gemma-2 configs at trace time)
        logits = llama.final_softcap(cfg, logits)
        return step + 1, logits, kv_cache, done, tokens

    step, logits, _, done, tokens = jax.lax.while_loop(
        cond, body, (0, logits, kv_cache, done0, tokens0)
    )
    last = jnp.where(done, pad_token_id, pick(logits, step))
    tokens = jax.lax.dynamic_update_slice(tokens, last[:, None], (0, step))
    return tokens


# ---------------------------------------------------------------------------
# Batch-last decode loop
# ---------------------------------------------------------------------------
#
# The token-step loop is HBM-bandwidth bound, and profiling on the v5e chip
# (scripts/profile_decode.py, BASELINE.md round-2 log) showed two structural
# costs in the batch-first formulation above:
#
#   * attention multiply-reduce contracts head_dim, the LANE dimension of
#     [B, nkv, g, S, hd] operands — cross-lane reductions serialize on the
#     VPU and defeat clean loop fusion;
#   * threading the stacked KV caches through lax.scan as xs/ys re-writes
#     the FULL per-layer cache slice every token step (~320 MB/step of
#     unchanged bytes at B=256) even though only one position changed.
#
# This path keeps the hidden state BATCH-LAST ([H, B]) through the loop:
# every matmul becomes dot_general(w, h) with batch in the lane dimension,
# attention reduces over sublane dims only (hd, then S), the position bias
# is a single [S] vector (every live sequence sits at the same position),
# and the caches are [L, nkv, S, hd, B] while_loop carry updated in place
# with one [1, nkv, 1, hd, B] dynamic_update_slice per layer.  No transpose
# of activations appears anywhere inside the loop; the tied head needs no
# pre-transposed [H, V] copy (dot_general(embed, h) yields [V, B] directly).
#
# Prefill stays batch-first (it is MXU compute-bound and already efficient);
# its caches are transposed once into the batch-last layout.


def _rotate_half_rows(x):
    """_rotate_half over a leading-of-last-two axis: x [..., hd, B]."""
    half = x.shape[-2] // 2
    return jnp.concatenate([-x[..., half:, :], x[..., :half, :]], axis=-2)


def _rope_bl(x, cos, sin):
    """Rope for batch-last tensors.  x: [..., hd, B]; cos/sin: [hd] for a
    single shared position, or [hd, B] for per-slot positions (the
    continuous-batching engine)."""
    c = (cos[:, None] if cos.ndim == 1 else cos).astype(jnp.float32)
    s = (sin[:, None] if sin.ndim == 1 else sin).astype(jnp.float32)
    xf = x.astype(jnp.float32)
    return (xf * c + _rotate_half_rows(xf) * s).astype(x.dtype)


def _rope_interleaved_bl(x, cos, sin):
    """Deepseek interleaved rope for batch-last tensors: adjacent rows
    (x[2j], x[2j+1]) rotate as complex pairs (llama.apply_rope_interleaved
    semantics).  x: [..., d, B]; cos/sin: duplicated [d] tables for one
    shared position, or [d, B] per-slot — pair j reads entry j (the first
    copy), like the batch-first helper."""
    d2 = x.shape[-2] // 2
    c = (cos[:, None] if cos.ndim == 1 else cos)[:d2].astype(jnp.float32)
    s = (sin[:, None] if sin.ndim == 1 else sin)[:d2].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    x_even = xf[..., 0::2, :]
    x_odd = xf[..., 1::2, :]
    out_even = x_even * c - x_odd * s
    out_odd = x_odd * c + x_even * s
    # interleave back: stacking pairs on a new axis after d2 makes the
    # (d2, 2) C-order flattening restore the original row order
    out = jnp.stack([out_even, out_odd], axis=-2)  # [..., d2, 2, B]
    return out.reshape(x.shape).astype(x.dtype)


def _rms_norm_head_bl(x, scale, eps):
    """rms_norm over the head axis (-2) of batch-last per-head tensors
    ([..., hd, B]); scale [hd] (qwen3 q/k norms)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-2, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * scale.astype(jnp.float32)[:, None]).astype(x.dtype)


def _rms_norm_bl(x, scale, eps):
    """rms_norm over the leading (feature) axis of a batch-last [H, B]."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=0, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * scale.astype(jnp.float32)[:, None]).astype(x.dtype)


def _mm_bl(w, h):
    """Batch-last matmul: w [in, out] (optionally int8-quantized), h [in, B]
    -> [out, B].  Equals (h^T @ w)^T without materializing a transpose.
    "q8" weights run W8A8 (per-token activation quantization, int8 MXU)."""
    if isinstance(w, dict) and "q8" in w:
        from dmi_tpu.models.quant import quantize_act

        hq, a = quantize_act(h, axis=0)  # a: [1, B]
        acc = jax.lax.dot_general(
            w["q8"], hq, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (acc * w["s"].reshape(-1, 1) * a).astype(h.dtype)
    if isinstance(w, dict) and "qp" in w:
        from dmi_tpu.models.quant import quantize_act, unpack_w4

        hq, a = quantize_act(h, axis=0)  # a: [1, B]
        if "s4g" in w:
            # grouped scales: unpack, then G-batched partial dots
            # [G, out, B] weighted by s4g and summed — the accuracy-oracle
            # formulation (the int32 partials materialize; the fast chip
            # path is the per-channel "s" mode)
            q8 = unpack_w4(w["qp"])
            s4g = w["s4g"]  # [G, out]
            G = s4g.shape[0]
            K = q8.shape[0]
            qg = q8.reshape(G, K // G, q8.shape[1])
            hg = hq.reshape(G, K // G, hq.shape[1])
            acc = jax.lax.dot_general(
                qg, hg, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )  # [G, out, B]
            return (jnp.sum(acc * s4g[:, :, None], axis=0) * a).astype(h.dtype)
        from dmi_tpu.ops.pallas.w4_matmul import w4_available, w4_mm_bl

        if w4_available(w, hq):
            # packed bytes stream HBM->VMEM, unpack + rescale in-kernel:
            # the halved weight stream XLA cannot express (it materializes
            # the unpack — scripts/profile_w4_matmul.py)
            return w4_mm_bl(w, hq, a, h.dtype)
        # XLA twin: two half-dots on the contiguous activation slices
        # (K-split packing), numerically identical to the kernel
        p8 = w["qp"].astype(jnp.int8)
        lo = (p8 << 4) >> 4
        hi = p8 >> 4
        kh = p8.shape[0]
        dn = (((0,), (0,)), ((), ()))
        acc = jax.lax.dot_general(
            lo, hq[:kh], dn, preferred_element_type=jnp.int32
        ) + jax.lax.dot_general(hi, hq[kh:], dn, preferred_element_type=jnp.int32)
        return (acc * w["s"].reshape(-1, 1) * a).astype(h.dtype)
    if isinstance(w, dict) and "q" in w:
        out = jax.lax.dot_general(
            w["q"].astype(h.dtype), h, (((0,), (0,)), ((), ()))
        )
        return out * w["s"].astype(h.dtype).reshape(-1, 1)
    return jax.lax.dot_general(w, h, (((0,), (0,)), ((), ())))


def _moe_mlp_bl(cfg, lw, hn):
    """Batch-last dense-evaluated sparse MoE: hn [H, N] -> [H, N] (N = any
    lane count — the decode step's B or the speculative verify's (k+1)*B).
    Same math as llama._moe_mlp; the expert axis stays leading so it
    shards as expert parallelism."""
    from dmi_tpu.models.quant import dequantize

    if cfg.moe_gate_fp32:
        # deepseek-v2 gate runs in f32 (HF casts input AND weight)
        router = jax.lax.dot_general(
            dequantize(lw["w_router"], jnp.float32).astype(jnp.float32),
            hn.astype(jnp.float32),
            (((0,), (0,)), ((), ())),
        )
    else:
        router = jax.lax.dot_general(
            lw["w_router"], hn, (((0,), (0,)), ((), ()))
        )  # [E, N]
    w_e = llama.moe_gate_weights(cfg, router.T).T.astype(hn.dtype)  # [E, N]
    w1 = dequantize(lw["moe_w1"], hn.dtype)
    w3 = dequantize(lw["moe_w3"], hn.dtype)
    w2 = dequantize(lw["moe_w2"], hn.dtype)
    g = jnp.einsum("ehi,hn->ein", w1, hn)
    u = jnp.einsum("ehi,hn->ein", w3, hn)
    y = jnp.einsum(
        "eih,ein->ehn", w2, llama.mlp_activation(cfg, g) * u
    )
    out = jnp.sum(y * w_e[:, None, :], axis=0)
    if cfg.n_shared_experts:
        # deepseek-v2 always-on shared experts add to the routed output
        gate = llama.mlp_activation(cfg, _mm_bl(lw["w_shared_gate"], hn))
        out = out + _mm_bl(
            lw["w_shared_down"], gate * _mm_bl(lw["w_shared_up"], hn)
        )
    return out


def _mla_attn_bl(cfg, lw, hn, kvcache, li, row, s_window, bias, cos, sin):
    """Absorbed-MLA single-position attention over the COMPRESSED latent
    cache — the TPU-first deepseek-v2 decode formulation.

    Instead of materializing per-head K [nh, S, dn+dr] / V [nh, S, dv]
    (llama._block's HF-parity oracle), the cache holds ONE row per token:
    [normed kv latent (r) | roped shared key (dr)] — [L, 1, 1, S, r+dr, B]
    in the merged layout.  Attention runs in the latent space by weight
    absorption (the DeepSeek-V2 paper's deployment trick):

      scores[h,s] = q_nope[h] . (Wb_k[h] lat[s]) + q_pe[h] . k_pe[s]
                  = [Wb_k[h]^T q_nope[h] | q_pe[h]] . cache_row[s]
      out[h]      = Wb_v[h]^T (sum_s probs[h,s] lat[s])

    so the per-token cache is (r+dr) values for ALL heads — 8.9x smaller
    than the expanded layout for V2-Lite (576 vs 5120 per layer-token) —
    and both reductions keep B in the lane dimension (the multiply-reduce
    idiom of _decode_attention_bl, f32 accumulation, products in the
    input dtype).  Exactness vs the oracle: same math reassociated
    (absorption moves a matmul across the softmax-linear value sum);
    token parity is pinned in tests/test_families.py.

    hn [H, B] normed input; returns (attn [nh*dv, B], kvcache)."""
    from dmi_tpu.models.quant import dequantize

    nh = cfg.num_attention_heads
    r, dn, dr = cfg.kv_lora_rank, cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
    dv = cfg.v_head_dim
    B = hn.shape[1]
    if "wq" in lw:  # the Lite layout: plain q projection
        q = _mm_bl(lw["wq"], hn)
    else:
        qa = _rms_norm_bl(
            _mm_bl(lw["wq_a"], hn), lw["q_a_norm"], cfg.rms_norm_eps
        )
        q = _mm_bl(lw["wq_b"], qa)
    q = q.reshape(nh, dn + dr, B)
    q_nope, q_pe = q[:, :dn], q[:, dn:]
    q_pe = _rope_interleaved_bl(q_pe, cos, sin)

    kv_a = _mm_bl(lw["wkv_a"], hn)  # [r + dr, B]
    lat = _rms_norm_bl(kv_a[:r], lw["kv_a_norm"], cfg.rms_norm_eps)
    k_pe = _rope_interleaved_bl(kv_a[r:], cos, sin)
    row_vec = jnp.concatenate([lat, k_pe], axis=0)  # [r + dr, B]
    kvcache = jax.lax.dynamic_update_slice(
        kvcache, row_vec[None, None, None, None], (li, 0, 0, row, 0, 0)
    )
    cache_s = jax.lax.dynamic_slice(
        kvcache,
        (li, 0, 0, 0, 0, 0),
        (1, 1, 1, s_window) + kvcache.shape[4:],
    )[0, 0, 0]  # [S, r + dr, B]

    # wkv_b is read once per step either way (the oracle expands K/V with
    # it); here it absorbs into q and out instead
    wkv_b = dequantize(lw["wkv_b"], hn.dtype).reshape(r, nh, dn + dv)
    q_eff = jnp.einsum("rhd,hdb->hrb", wkv_b[:, :, :dn], q_nope)
    q_abs = jnp.concatenate([q_eff, q_pe], axis=1)  # [nh, r + dr, B]

    scores = jnp.sum(
        q_abs[:, None] * cache_s[None], axis=2, dtype=jnp.float32
    )  # [nh, S, B]
    scores = scores * llama.attn_score_scale(cfg)
    b = bias[None, :, None] if bias.ndim == 1 else bias[None]
    scores = scores + b
    probs = jax.nn.softmax(scores, axis=1).astype(cache_s.dtype)
    ctx = jnp.sum(
        probs[:, :, None, :] * cache_s[None, :, :r, :], axis=1,
        dtype=jnp.float32,
    ).astype(cache_s.dtype)  # [nh, r, B]
    v_out = jnp.einsum("rhv,hrb->hvb", wkv_b[:, :, dn:], ctx)
    return v_out.reshape(nh * dv, B), kvcache


def _decode_attention_bl(q, kc, vc, bias, scale=None, softcap=None):
    """Single-position GQA attention, batch-last.

    q: [nkv, g, hd, B], kc/vc: [nkv, S, hd, B], bias: [S] (position
    validity, shared by the whole batch) -> [nkv, g, hd, B].

    Products stay in the input dtype with f32 accumulation (same contract
    as llama._decode_attention); both reductions (hd for scores, S for the
    value average) run over sublane dimensions, so the VPU vectorizes over
    the batch lane dimension with no cross-lane shuffles."""
    scores = jnp.sum(
        q[:, :, None, :, :] * kc[:, None, :, :, :], axis=3, dtype=jnp.float32
    )  # [nkv, g, S, B]
    scores = scores * (scale if scale is not None else 1.0 / np.sqrt(q.shape[2]))
    if softcap is not None:
        scores = llama._softcap(scores, softcap)
    # bias [S] (batch-uniform position, the batch decode) or [S, B]
    # (per-slot positions, the continuous-batching engine)
    b = bias[None, None, :, None] if bias.ndim == 1 else bias[None, None]
    scores = scores + b
    probs = jax.nn.softmax(scores, axis=2).astype(vc.dtype)
    out = jnp.sum(
        probs[:, :, :, None, :] * vc[:, None, :, :, :], axis=2, dtype=jnp.float32
    )  # [nkv, g, hd, B]
    return out.astype(vc.dtype)


def _mla_prefill_compressed(cfg, params, inputs_embeds, total):
    """MLA (deepseek-v2) prompt pass for the batch-last loop: run the
    standard batch-first prefill math through llama._block (expanded
    attention — prefill is MXU compute-bound either way) while collecting
    each layer's COMPRESSED rows [normed latent | roped shared key] as
    scan outputs, then lay them into the [L, 1, 1, S, r+dr, B] merged
    latent cache that _mla_attn_bl consumes.

    Returns (last-position logits [B, V] incl. final_softcap, kv_cache)."""
    B, T, _ = inputs_embeds.shape
    L = cfg.num_hidden_layers
    r, dr = cfg.kv_lora_rank, cfg.qk_rope_head_dim
    positions = jnp.arange(T)
    cos, sin = llama.rope_tables(cfg, positions)
    causal = jnp.tril(jnp.ones((T, T), bool))
    bias = jnp.broadcast_to(
        jnp.where(causal, 0.0, jnp.finfo(jnp.float32).min)[None], (B, T, T)
    )
    x = llama.scale_embeds(cfg, inputs_embeds.astype(cfg.dtype))

    def body(carry, lw):
        y, rows = llama._block(cfg, carry, lw, cos, sin, bias)
        return y, rows

    x, (lat, k_pe) = jax.lax.scan(body, x, params["layers"])
    # lat [L, B, T, r]; k_pe [L, B, T, dr]
    x = llama.rms_norm(x[:, -1:, :], params["final_norm"], cfg.rms_norm_eps)
    logits = llama.final_softcap(cfg, llama._head_matmul(x, params, cfg))
    rows = jnp.concatenate([lat, k_pe], axis=-1)  # [L, B, T, r+dr]
    kv = jnp.zeros((L, 1, 1, total, r + dr, B), cfg.dtype)
    kv = jax.lax.dynamic_update_slice(
        kv, rows.transpose(0, 2, 3, 1)[:, None, None], (0, 0, 0, 0, 0, 0)
    )
    return logits[:, 0, :], kv


def _decode_step_bl(cfg, params, h, caches, pos, bias, s_window=None,
                    head=True, rope=None, write_row=None, bias_sw=None,
                    rope_local=None):
    """One batch-last token step.  h: [H, B]; caches: ([L,nkv,S,hd,B] x2);
    pos: absolute position being written.  Returns (logits [V,B], caches).

    s_window (static) restricts the attention READ to cache positions
    [0, s_window): token-exact whenever pos < s_window, because positions
    > pos are masked by bias and unwritten tail positions contribute
    softmax weight 0 either way.  Cache WRITES always go to the full
    cache.  Early in the budget this trims the VPU attention work (the
    decode loop's compute-bound component) by the unused tail.

    caches here is ONE merged array [L, 2, nkv, S, hd, B] (k at index 0,
    v at 1): one dynamic_update_slice + one dynamic_slice per layer
    instead of two of each — halves the per-layer cache-op overhead
    measured by the no_cache_update ablation.

    rope / write_row: the continuous-batching engine (dmi_tpu/streaming)
    shares this exact step body with PER-SLOT positions — it passes
    precomputed [hd, B] rope tables and the shared ring row to write at
    (bias is already an [S, B] validity mask there); the batch decode
    leaves both None (rope from the scalar pos, write at pos).

    bias_sw: sliding-window bias for the layers flagged in
    cfg.layer_sliding (same shape contract as bias); None when sliding
    cannot bind.  NOTE the head output skips final_logit_softcap: tanh
    rescaling is argmax-invariant, so greedy consumers don't need it —
    DISTRIBUTION consumers (sampling picks, speculative acceptance) must
    apply llama.final_softcap themselves before using these logits
    (sample_generate_bl and the streaming engine do)."""
    kv_cache = caches
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    g = nh // nkv
    B = h.shape[1]
    if s_window is None:
        s_window = kv_cache.shape[3]
    bias = bias[:s_window]
    if bias_sw is not None:
        bias_sw = bias_sw[:s_window]
    dual = llama.rope_dual(cfg)
    if rope is None:
        cos, sin = llama.rope_tables(cfg, pos)  # [hd] each
        if dual:
            rope_local = llama.rope_tables(cfg, pos, local=True)
    else:
        cos, sin = rope
        if dual and rope_local is None:
            raise ValueError(
                "dual-rope config (gemma-3) needs rope_local alongside rope"
            )
    cos_l, sin_l = rope_local if rope_local is not None else (cos, sin)
    row = pos if write_row is None else write_row
    a_scale = llama.attn_score_scale(cfg)
    a_cap = cfg.attn_logit_softcap

    def body(carry, xs):
        x, kvcache = carry
        if bias_sw is not None or dual:
            lw, li, fl = xs
            b = jnp.where(fl, bias_sw, bias) if bias_sw is not None else bias
            c = jnp.where(fl, cos_l, cos) if dual else cos
            s = jnp.where(fl, sin_l, sin) if dual else sin
        else:
            lw, li = xs
            b, c, s = bias, cos, sin
        hn = x if cfg.norm_after else _rms_norm_bl(
            x, lw["ln_attn"], cfg.rms_norm_eps
        )
        if cfg.kv_lora_rank is not None:  # deepseek-v2 absorbed MLA
            attn, kvcache = _mla_attn_bl(
                cfg, lw, hn, kvcache, li, row, s_window, b, c, s
            )
        else:
            if "w_qkv" in lw:
                qkv = _mm_bl(lw["w_qkv"], hn)
                if "b_qkv" in lw:
                    qkv = qkv + lw["b_qkv"][:, None]
                q, k, v = jnp.split(qkv, [nh * hd, nh * hd + nkv * hd], axis=0)
            else:
                q, k, v = _mm_bl(lw["wq"], hn), _mm_bl(lw["wk"], hn), _mm_bl(lw["wv"], hn)
                if "bq" in lw:
                    q = q + lw["bq"][:, None]
                    k = k + lw["bk"][:, None]
                    v = v + lw["bv"][:, None]
            if cfg.qk_norm_wide:  # olmo2: RMSNorm over the FULL projection
                q = _rms_norm_bl(q, lw["q_norm"], cfg.rms_norm_eps)
                k = _rms_norm_bl(k, lw["k_norm"], cfg.rms_norm_eps)
            q = q.reshape(nkv, g, hd, B)
            k = k.reshape(nkv, hd, B)
            if cfg.qk_norm:  # qwen3/gemma3: per-head RMSNorm before rope
                q = _rms_norm_head_bl(q, lw["q_norm"], cfg.rms_norm_eps)
                k = _rms_norm_head_bl(k, lw["k_norm"], cfg.rms_norm_eps)
            q = _rope_bl(q, c, s)
            k = _rope_bl(k, c, s)
            v = v.reshape(nkv, hd, B)
            kvcache = jax.lax.dynamic_update_slice(
                kvcache,
                jnp.stack([k, v])[None, :, :, None],  # [1, 2, nkv, 1, hd, B]
                (li, 0, 0, row, 0, 0),
            )
            kvc = jax.lax.dynamic_slice(
                kvcache, (li, 0, 0, 0, 0, 0), (1, 2, nkv, s_window, hd, B)
            )[0]
            attn = _decode_attention_bl(
                q, kvc[0], kvc[1], b, a_scale, a_cap
            ).reshape(nh * hd, B)
        attn_out = _mm_bl(lw["wo"], attn)
        if cfg.post_block_norms:
            attn_out = _rms_norm_bl(attn_out, lw["ln_post_attn"], cfg.rms_norm_eps)
        if cfg.norm_after:  # olmo2: ln_attn norms the block OUTPUT
            attn_out = _rms_norm_bl(attn_out, lw["ln_attn"], cfg.rms_norm_eps)
        if cfg.residual_multiplier is not None:  # granite
            attn_out = attn_out * cfg.residual_multiplier
        x = x + attn_out
        hn = x if cfg.norm_after else _rms_norm_bl(
            x, lw["ln_mlp"], cfg.rms_norm_eps
        )
        if cfg.num_experts:  # mixtral sparse MoE (dense-evaluated)
            mlp_out = _moe_mlp_bl(cfg, lw, hn)
        elif "w_gu" in lw:
            from dmi_tpu.ops.pallas.decode_mlp import (
                _mlp_pallas_bl, decode_mlp_available)

            if decode_mlp_available(lw["w_gu"], hn):
                # single-pass streamed MLP kernel (opt-in,
                # DMI_PALLAS_DECODE_MLP=1; chip A/B in BASELINE.md)
                mlp_out = _mlp_pallas_bl(
                    lw["w_gu"], lw["w_down"], hn, cfg.mlp_act
                )
            else:
                gu = _mm_bl(lw["w_gu"], hn)
                gate, up = jnp.split(gu, 2, axis=0)
                mlp_out = _mm_bl(
                    lw["w_down"], llama.mlp_activation(cfg, gate) * up
                )
        else:
            gate = llama.mlp_activation(cfg, _mm_bl(lw["w_gate"], hn))
            mlp_out = _mm_bl(lw["w_down"], gate * _mm_bl(lw["w_up"], hn))
        if cfg.post_block_norms:
            mlp_out = _rms_norm_bl(mlp_out, lw["ln_post_mlp"], cfg.rms_norm_eps)
        if cfg.norm_after:
            mlp_out = _rms_norm_bl(mlp_out, lw["ln_mlp"], cfg.rms_norm_eps)
        if cfg.residual_multiplier is not None:
            mlp_out = mlp_out * cfg.residual_multiplier
        x = x + mlp_out
        return (x, kvcache), None

    L = kv_cache.shape[0]
    xs = (
        (params["layers"], jnp.arange(L), jnp.asarray(cfg.layer_sliding))
        if (bias_sw is not None or dual)
        else (params["layers"], jnp.arange(L))
    )
    # Layer scan stays unroll=1: unrolling (the former
    # DMI_DECODE_LAYER_UNROLL knob) let XLA fuse across body copies,
    # changing bf16 rounding enough to flip near-tie argmaxes — the chip
    # A/B failed token parity (73% mismatch at unroll=2/4 W8A8, 34.8%
    # bf16; BASELINE.md round-4 owed-run record) and the knob was deleted.
    (h, kv_cache), _ = jax.lax.scan(body, (h, kv_cache), xs)
    h = _rms_norm_bl(h, params["final_norm"], cfg.rms_norm_eps)
    if not head:
        # caller runs the fused head+argmax kernel on the normed state
        return h, kv_cache
    embed = params["embed"]
    if cfg.tie_word_embeddings:
        if isinstance(embed, dict) and "q8" in embed:
            from dmi_tpu.models.quant import quantize_act

            hq, a = quantize_act(h, axis=0)
            logits = (
                jax.lax.dot_general(
                    embed["q8"], hq, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                * embed["s"][:, 0][:, None]
                * a
            ).astype(h.dtype)
        elif isinstance(embed, dict) and "q" in embed:
            logits = jax.lax.dot_general(
                embed["q"].astype(h.dtype), h, (((1,), (0,)), ((), ()))
            ) * embed["s"].astype(h.dtype)[:, 0][:, None]
        else:
            logits = jax.lax.dot_general(embed, h, (((1,), (0,)), ((), ())))
    else:
        logits = _mm_bl(params["lm_head"], h)
    return logits, kv_cache


@partial(jax.jit,
         static_argnames=("cfg", "max_new_tokens", "pad_token_id", "fused_head"))
def greedy_generate_bl(
    cfg: LlamaConfig,
    params: dict,
    inputs_embeds: jax.Array,
    max_new_tokens: int,
    pad_token_id: int,
    prefill_params: dict | None = None,
    fused_head: bool | None = None,
) -> jax.Array:
    """Batch-last greedy decode — token-identical to greedy_generate (same
    f32-accumulated attention contract, same EOS/pad semantics), rebuilt
    around the memory system: see the layout commentary above.  Replaces
    HF `llm.generate` (reference: dmi/model/mmmodel.py:149-169) as the
    serving/bench default on TPU.

    prefill_params: optional separate weights for the prompt pass.  With
    W8A8 loop weights the int8 dot runs no faster than bf16 on this MXU
    stack (BASELINE.md round-2), so the compute-bound prefill only pays
    the per-matmul activation-quantization VPU cost — passing the bf16
    originals here keeps the loop's halved weight stream while prefill
    runs plain bf16 (costs one extra weight copy in HBM).

    fused_head: force the fused head+argmax Pallas kernel on/off; None
    resolves via head_argmax_available() (env + backend + weight layout).
    It is a STATIC jit argument precisely so same-process A/Bs retrace —
    an env-var flip alone would be ignored by the jit cache."""
    B, T, _ = inputs_embeds.shape
    if max_new_tokens == 0:
        return jnp.zeros((B, 0), jnp.int32)
    total = T + max_new_tokens
    eos = jnp.asarray(cfg.eos_token_ids)

    if cfg.kv_lora_rank is not None:
        # deepseek-v2: compressed-latent cache (see _mla_attn_bl)
        logits0, kv_cache = _mla_prefill_compressed(
            cfg, params if prefill_params is None else prefill_params,
            inputs_embeds, total,
        )
    else:
        caches = init_cache(cfg, B, total)
        # no pre-transposed [H, V] head copy: prefill's single last-position
        # head matmul folds the transpose into dot_general, and the loop's
        # dot_general(embed, h) consumes [V, H] directly
        logits0, caches = prefill(
            cfg, params if prefill_params is None else prefill_params,
            inputs_embeds, caches,
        )

        # one-time layout flip out of prefill into the merged batch-last
        # cache: [L,B,nkv,S,hd] x2 -> [L,2,nkv,S,hd,B]
        kv_cache = jnp.stack(
            [caches[0].transpose(0, 2, 3, 4, 1), caches[1].transpose(0, 2, 3, 4, 1)],
            axis=1,
        )
    logits = logits0.T  # [V, B]

    tokens0 = jnp.full((B, max_new_tokens), pad_token_id, jnp.int32)
    done0 = jnp.zeros((B,), bool)
    key_pos = jnp.arange(total)

    # With the fused head+argmax Pallas kernel the loop never materializes
    # [V, B] logits: the carry holds the RAW argmax ids instead (the
    # done/pad masking stays in the consuming iteration, unchanged).
    from dmi_tpu.ops.pallas.head_argmax import head_argmax, head_argmax_available

    if fused_head is None:
        # bf16-only: the kernel bakes in bf16 score rounding to match the
        # XLA logits path; f32 models would silently diverge
        fused_head = (
            head_argmax_available(params)
            and cfg.tie_word_embeddings
            and cfg.dtype == jnp.bfloat16
        )

    sliding_on = llama.sliding_effective(cfg, total)

    def one_token(step, sel, kv_cache, done, tokens, s_window):
        next_tok = sel if fused_head else jnp.argmax(sel, axis=0).astype(jnp.int32)
        next_tok = jnp.where(done, pad_token_id, next_tok)
        tokens = jax.lax.dynamic_update_slice(tokens, next_tok[:, None], (0, step))
        done = done | jnp.isin(next_tok, eos)
        h = llama.scale_embeds(
            cfg, llama.embed_tokens(cfg, params, next_tok).T.astype(cfg.dtype)
        )  # [H, B]
        pos = T + step
        bias = jnp.where(key_pos <= pos, 0.0, jnp.finfo(jnp.float32).min)  # [S]
        bias_sw = None
        if sliding_on:
            bias_sw = jnp.where(
                (key_pos <= pos) & (pos - key_pos < cfg.sliding_window),
                0.0,
                jnp.finfo(jnp.float32).min,
            )
        if fused_head:
            h_fin, kv_cache = _decode_step_bl(
                cfg, params, h, kv_cache, pos, bias, s_window, head=False,
                bias_sw=bias_sw,
            )
            sel = head_argmax(params, h_fin)
        else:
            sel, kv_cache = _decode_step_bl(
                cfg, params, h, kv_cache, pos, bias, s_window, bias_sw=bias_sw
            )
        return step + 1, sel, kv_cache, done, tokens

    def make_body(s_window, unroll):
        def body(state):
            step, sel, kv_cache, done, tokens = state
            for _ in range(unroll):
                step, sel, kv_cache, done, tokens = one_token(
                    step, sel, kv_cache, done, tokens, s_window
                )
            return step, sel, kv_cache, done, tokens

        return body

    # Windowed phase schedule: step s writes position T+s and attends to
    # positions [0, T+s] — round the read window up to a multiple of 8 and
    # group consecutive steps sharing a window into one while_loop.  Early
    # steps then skip the masked cache tail (token-exact; see
    # _decode_step_bl).  At T=16/new=22 this trims ~20% of the VPU
    # attention work for three compiled step bodies instead of one.
    # Even-length phases run TWO tokens per while iteration (token-exact —
    # the pair is the same two sequential steps; early-exit granularity
    # coarsens to the pair, which only ever costs masked pad work).
    # Only max_new-1 layer-stack steps are needed: iteration k consumes the
    # PREVIOUS logits and computes logits for token k+1, so a final full
    # decode_step would produce logits nothing reads (and cache writes
    # nothing reads) — the last token is just an argmax of the last logits.
    n_steps = max_new_tokens - 1
    phases = []  # (end_step, s_window)
    s = 0
    while s < n_steps:
        w = min(total, -(-(T + s + 1) // 8) * 8)
        e = min(n_steps, w - T)  # steps s.. with T+step < w
        phases.append((e, w))
        s = e

    sel0 = (
        jnp.argmax(logits0, axis=-1).astype(jnp.int32) if fused_head else logits
    )
    state = (0, sel0, kv_cache, done0, tokens0)
    start = 0
    for end_step, w in phases:
        def cond(state, end_step=end_step):
            step, _, _, done, _ = state
            return (step < end_step) & ~jnp.all(done)

        unroll = 2 if (end_step - start) % 2 == 0 else 1
        state = jax.lax.while_loop(cond, make_body(w, unroll), state)
        start = end_step

    step, sel, _, done, tokens = state
    last = sel if fused_head else jnp.argmax(sel, axis=0).astype(jnp.int32)
    last = jnp.where(done, pad_token_id, last)
    # step == n_steps unless every sequence finished early, in which case
    # the write lands on an already-padded column with a pad value
    tokens = jax.lax.dynamic_update_slice(tokens, last[:, None], (0, step))
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
    if max_new_tokens == 0:
        return jnp.zeros((B, 0), jnp.int32)
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
        return (step < max_new_tokens - 1) & ~jnp.all(done)

    def body(state):
        step, logits, caches, done, tokens = state
        next_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        next_tok = jnp.where(done, pad_token_id, next_tok)
        tokens = jax.lax.dynamic_update_slice(tokens, next_tok[:, None], (0, step))
        done = done | jnp.isin(next_tok, eos)
        embeds = llama.embed_tokens(cfg, params, next_tok)[:, None, :]
        logits, caches = decode_step(cfg, params, embeds, caches, T + step)
        return step + 1, logits, caches, done, tokens

    step, logits, _, done, tokens = jax.lax.while_loop(
        cond, body, (0, logits, caches, done0, tokens0)
    )
    # final token needs no decode_step (see greedy_generate_bl)
    last = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    last = jnp.where(done, pad_token_id, last)
    tokens = jax.lax.dynamic_update_slice(tokens, last[:, None], (0, step))
    return tokens
