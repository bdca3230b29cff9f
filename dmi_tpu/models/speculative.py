"""Speculative (draft-verify) greedy decode — batch-last.

The decode loop is HBM-bandwidth bound below pool saturation (BASELINE.md
binding-limit analysis: the per-step weight stream costs the same bytes
at B=32 as at B=256).  Speculative decoding attacks exactly that term: a
cheap DRAFT model proposes k tokens, then the target verifies all k in
ONE forward over k+1 positions — one loop weight-stream read per
accepted run instead of one per token.  Greedy rejection sampling makes
every emitted token the argmax of a TARGET forward given its prefix:
a proposal is accepted iff it equals the target's own argmax at that
position, and the first mismatch is replaced by the target's argmax
(which the verify forward already computed).

Exactness contract (measured, scripts/diag_spec_exact.py + BASELINE.md
round-5): under identical forward numerics (f32; CPU bf16 on this
stack) the output is BIT-IDENTICAL to plain greedy decode for ANY
draft — pinned in tests/test_speculative.py.  On TPU bf16 the
k+1-position verify forward and the 1-position step forward are
bit-equal GIVEN the same cache content (measured max|dlogit| = 0 at the
1B shape), but cache rows written inside a verify round drift ~1.4% of
logit scale through downstream layers vs rows written by single steps,
so an argmax whose top-2 margin is below that noise may resolve
differently.  Both outputs are valid target-greedy decodes; they can
differ at near-tie positions.  Trained checkpoints hold margins far
above this noise (random-init 1B weights sit AT it, which is why
random-weight chip profiles under-accept; see the profiler notes).

The reference decodes greedily through HF generate with no speculation
(dmi/model/mmmodel.py:149-169); this is framework serving surface, like
the continuous-batching engine (dmi_tpu/streaming.py).

TPU-first shape discipline (all static):

  * Per-sequence acceptance counts differ, so slot positions diverge —
    the same problem the streaming engine solves with its row->position
    bookkeeping.  Same solution here: every round writes k+1 PHYSICAL
    cache rows shared by the whole batch (one contiguous
    dynamic_update_slice per layer, no scatter); per-slot LOGICAL
    positions live in a row_pos [S, B] map and rejected proposals are
    simply re-masked in a valid [S, B] bitmap.  The attention bias is
    rebuilt per query from (valid, row_pos), so staggered slots are
    token-exact.
  * Cache rows are never compacted or reused: S = T + (k+1) * (budget-1)
    worst case (a slot that accepts nothing).  High acceptance writes
    few rounds and stays near the greedy cache footprint; the memory
    trade (vs the batch loop's T + budget) is the price of scatter-free
    verification.
  * The verify forward flattens the (position, slot) grid into one
    batch-last lane axis [H, (k+1)*B] for every matmul — the weight
    stream is read ONCE for all k+1 positions, which is the entire
    point.  Attention vmaps the single-position batch-last kernel
    (dec._decode_attention_bl, f32-accumulated) over the k+1 queries.
  * The draft runs k+1 ordinary single-token batch-last steps
    (dec._decode_step_bl with per-slot rope + [S, B] bias — the
    streaming engine's calling convention), maintaining its own
    row_pos/valid cache of the same design.

Acceptance economics (what to measure, scripts/profile_speculative.py):
a verify round costs ~1 weight-stream read + (k+1)x the per-token MXU
compute + (k+1)x the VPU attention, and emits between 1 and k+1 tokens.
Speculation therefore pays in the bandwidth-bound regime (small/medium
batch, weight stream >> compute) with a draft whose acceptance is high,
and cannot pay at MXU-saturated batch sizes where decode is already
compute-bound.  The oracle entry point below measures the verify-side
ceiling as a function of acceptance without needing a trained draft.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dmi_tpu.models import decode as dec
from dmi_tpu.models import llama
from dmi_tpu.models.llama import LlamaConfig

NEG = jnp.finfo(jnp.float32).min


def _rotate_half_ax(x, axis):
    """_rotate_half over an arbitrary axis."""
    half = x.shape[axis] // 2
    lo = jax.lax.slice_in_dim(x, 0, half, axis=axis)
    hi = jax.lax.slice_in_dim(x, half, None, axis=axis)
    return jnp.concatenate([-hi, lo], axis=axis)


def _rope_pb(x, cos, sin):
    """Rope with the head dim at axis -3: x [..., hd, P, B];
    cos/sin [hd, P, B]."""
    c = cos.astype(jnp.float32)
    s = sin.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    return (xf * c + _rotate_half_ax(xf, -3) * s).astype(x.dtype)


def _rms_norm_head_pb(x, scale, eps):
    """Per-head RMSNorm over axis -3 of [..., hd, P, B] (qwen3 q/k norm)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-3, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * scale.astype(jnp.float32)[:, None, None]).astype(x.dtype)


def _verify_step_bl(cfg, params, h, kv_cache, qpos, bias, rt, bias_sw=None):
    """Target forward over P = k+1 speculative positions, batch-last.

    h [H, P, B] (embeds of [last_emitted, d_1..d_k]); kv_cache
    [L, 2, nkv, S, hd, B]; qpos [P, B] logical query positions;
    bias/bias_sw [S, P, B]; rt: physical row where this round's P cache
    rows land (shared by the batch).  Returns (logits [V, P, B],
    kv_cache).  Mirrors dec._decode_step_bl's layer body exactly (same
    _mm_bl weight dispatch incl. W8A8/W4A8, same f32-accumulated
    attention via a vmap of dec._decode_attention_bl, same family
    branches), with the (position, slot) grid flattened to one lane axis
    for every matmul so the per-layer weight stream is read once for all
    P positions.  Skips final_logit_softcap like the greedy loop (tanh
    rescaling is argmax-invariant); DISTRIBUTION consumers (speculative
    sampling acceptance) must cap via llama.final_softcap themselves."""
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    g = nh // nkv
    H, P, B = h.shape
    N = P * B
    hn_flat = h.reshape(H, N)

    cos, sin = llama.rope_tables(cfg, qpos.reshape(-1))  # [P*B, hd]
    cos = cos.T.reshape(hd, P, B)
    sin = sin.T.reshape(hd, P, B)
    dual = llama.rope_dual(cfg)
    if dual:  # gemma-3: sliding layers rope at the local theta
        cos_l, sin_l = llama.rope_tables(cfg, qpos.reshape(-1), local=True)
        cos_l = cos_l.T.reshape(hd, P, B)
        sin_l = sin_l.T.reshape(hd, P, B)
    else:
        cos_l, sin_l = cos, sin
    a_scale = llama.attn_score_scale(cfg)
    a_cap = cfg.attn_logit_softcap

    attend = jax.vmap(
        partial(dec._decode_attention_bl, scale=a_scale, softcap=a_cap),
        in_axes=(3, None, None, 1), out_axes=3,
    )  # q [nkv,g,hd,P,B], kc/vc [nkv,S,hd,B], bias [S,P,B] -> [nkv,g,hd,P,B]

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
        hn = x if cfg.norm_after else dec._rms_norm_bl(
            x, lw["ln_attn"], cfg.rms_norm_eps
        )
        if "w_qkv" in lw:
            qkv = dec._mm_bl(lw["w_qkv"], hn)
            if "b_qkv" in lw:
                qkv = qkv + lw["b_qkv"][:, None]
            q, k, v = jnp.split(qkv, [nh * hd, nh * hd + nkv * hd], axis=0)
        else:
            q = dec._mm_bl(lw["wq"], hn)
            k = dec._mm_bl(lw["wk"], hn)
            v = dec._mm_bl(lw["wv"], hn)
            if "bq" in lw:
                q = q + lw["bq"][:, None]
                k = k + lw["bk"][:, None]
                v = v + lw["bv"][:, None]
        if cfg.qk_norm_wide:  # olmo2: RMSNorm over the FULL projection
            q = dec._rms_norm_bl(q, lw["q_norm"], cfg.rms_norm_eps)
            k = dec._rms_norm_bl(k, lw["k_norm"], cfg.rms_norm_eps)
        q = q.reshape(nkv, g, hd, P, B)
        k = k.reshape(nkv, hd, P, B)
        if cfg.qk_norm:  # qwen3: per-head RMSNorm before rope
            q = _rms_norm_head_pb(q, lw["q_norm"], cfg.rms_norm_eps)
            k = _rms_norm_head_pb(k, lw["k_norm"], cfg.rms_norm_eps)
        q = _rope_pb(q, c, s)
        k = _rope_pb(k, c, s)
        v = v.reshape(nkv, hd, P, B)
        # write this round's P rows contiguously at the shared physical rt
        kvcache = jax.lax.dynamic_update_slice(
            kvcache,
            jnp.stack(
                [k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)]
            )[None],  # [1, 2, nkv, P, hd, B]
            (li, 0, 0, rt, 0, 0),
        )
        kvc = jax.lax.dynamic_slice(
            kvcache, (li, 0, 0, 0, 0, 0), (1,) + kvcache.shape[1:]
        )[0]
        attn = attend(q, kvc[0], kvc[1], b).reshape(nh * hd, N)
        attn_out = dec._mm_bl(lw["wo"], attn)
        if cfg.post_block_norms:
            attn_out = dec._rms_norm_bl(
                attn_out, lw["ln_post_attn"], cfg.rms_norm_eps
            )
        if cfg.norm_after:  # olmo2: ln_attn norms the block OUTPUT
            attn_out = dec._rms_norm_bl(attn_out, lw["ln_attn"], cfg.rms_norm_eps)
        if cfg.residual_multiplier is not None:  # granite
            attn_out = attn_out * cfg.residual_multiplier
        x = x + attn_out
        hn = x if cfg.norm_after else dec._rms_norm_bl(
            x, lw["ln_mlp"], cfg.rms_norm_eps
        )
        if cfg.num_experts:  # mixtral sparse MoE (dense-evaluated)
            mlp_out = dec._moe_mlp_bl(cfg, lw, hn)
        elif "w_gu" in lw:
            gu = dec._mm_bl(lw["w_gu"], hn)
            gate, up = jnp.split(gu, 2, axis=0)
            mlp_out = dec._mm_bl(lw["w_down"], llama.mlp_activation(cfg, gate) * up)
        else:
            gate = llama.mlp_activation(cfg, dec._mm_bl(lw["w_gate"], hn))
            mlp_out = dec._mm_bl(lw["w_down"], gate * dec._mm_bl(lw["w_up"], hn))
        if cfg.post_block_norms:
            mlp_out = dec._rms_norm_bl(mlp_out, lw["ln_post_mlp"], cfg.rms_norm_eps)
        if cfg.norm_after:
            mlp_out = dec._rms_norm_bl(mlp_out, lw["ln_mlp"], cfg.rms_norm_eps)
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
    (hf, kv_cache), _ = jax.lax.scan(body, (hn_flat, kv_cache), xs)
    hf = dec._rms_norm_bl(hf, params["final_norm"], cfg.rms_norm_eps)
    embed = params["embed"]
    if cfg.tie_word_embeddings:
        if isinstance(embed, dict) and "q8" in embed:
            from dmi_tpu.models.quant import quantize_act

            hq, a = quantize_act(hf, axis=0)
            logits = (
                jax.lax.dot_general(
                    embed["q8"], hq, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                * embed["s"][:, 0][:, None]
                * a
            ).astype(hf.dtype)
        elif isinstance(embed, dict) and "q" in embed:
            logits = jax.lax.dot_general(
                embed["q"].astype(hf.dtype), hf, (((1,), (0,)), ((), ()))
            ) * embed["s"].astype(hf.dtype)[:, 0][:, None]
        else:
            logits = jax.lax.dot_general(embed, hf, (((1,), (0,)), ((), ())))
    else:
        logits = dec._mm_bl(params["lm_head"], hf)
    return logits.reshape(logits.shape[0], P, B), kv_cache


def _stamp_rows(valid, row_pos, r0, count, live, positions):
    """Mark `count` rows starting at physical row r0 as provisionally
    valid (live slots only) and stamp their logical positions.
    positions: [count, B]."""
    valid = jax.lax.dynamic_update_slice(
        valid, jnp.broadcast_to(live[None, :], (count, live.shape[0])), (r0, 0)
    )
    row_pos = jax.lax.dynamic_update_slice(
        row_pos, positions.astype(jnp.int32), (r0, 0)
    )
    return valid, row_pos


def _retract_rows(valid, r0, k, n_acc):
    """After acceptance, rows r0+1+n_acc_b .. r0+k (this round's rejected
    proposals) become invalid for slot b; row r0 (the consumed emitted
    token) stays."""
    S = valid.shape[0]
    j_of = jnp.arange(S)[:, None] - r0  # row -> in-round index
    this_round = (j_of >= 1) & (j_of <= k)
    keep = j_of <= n_acc[None, :]
    return valid & jnp.where(this_round, keep, True)


def _bias_from(valid, row_pos, qpos, cfg, sliding_on):
    """[S, P, B] additive biases from the row bookkeeping: a key row is
    attendable by query (p, b) iff it is valid for slot b and holds a
    logical position <= qpos[p, b].  Sliding families additionally
    require qpos - row_pos < window on flagged layers."""
    ok = valid[:, None, :] & (row_pos[:, None, :] <= qpos[None, :, :])
    bias = jnp.where(ok, 0.0, NEG)
    bias_sw = None
    if sliding_on:
        in_win = (qpos[None, :, :] - row_pos[:, None, :]) < cfg.sliding_window
        bias_sw = jnp.where(ok & in_win, 0.0, NEG)
    return bias, bias_sw


class _SpecCore(NamedTuple):
    """Round-invariant target-side state threaded through the while loop."""

    done: jax.Array      # [B]
    last: jax.Array      # [B] last emitted token (KV not yet written)
    out_pos: jax.Array   # [B] tokens emitted so far
    tokens: jax.Array    # [B, budget]
    kv: jax.Array        # [L, 2, nkv, S, hd, B]
    valid: jax.Array     # [S, B]
    row_pos: jax.Array   # [S, B]


def _advance(cfg, core: _SpecCore, props, a_ids, k, T, budget, pad_token_id,
             eos, n_acc=None):
    """Acceptance + bookkeeping for one round.

    props [k, B] draft proposals; a_ids [k+1, B] correction tokens (a_i =
    the token to emit if the first rejection lands at in-round index i —
    greedy: the target's argmax after consuming prefix + d_1..d_i;
    sampling: the residual/bonus draw).  n_acc [B]: accepted-proposal
    counts; None (greedy) derives them from argmax equality d_i == a_{i-1}.
    Returns (core', n_acc) where core' has tokens/out_pos/done/last/valid
    advanced; the caller retracts its own draft rows with the same
    n_acc."""
    B = core.last.shape[0]
    live = ~core.done

    if n_acc is None:
        # greedy rejection: d_i accepted iff d_i == a_{i-1} and all
        # previous accepted
        if k > 0:
            matches = (props == a_ids[:-1]).astype(jnp.int32)  # [k, B]
            acc = jnp.cumprod(matches, axis=0)
            n_acc = jnp.sum(acc, axis=0)  # [B] in [0, k]
        else:
            n_acc = jnp.zeros((B,), jnp.int32)

    # emitted stream m_0..m_k: accepted drafts then the correction/bonus
    i_idx = jnp.arange(k + 1)[:, None]
    d_pad = (
        jnp.concatenate([props, jnp.zeros((1, B), jnp.int32)], axis=0)
        if k > 0
        else jnp.zeros((1, B), jnp.int32)
    )
    a_at = jnp.take_along_axis(a_ids, n_acc[None, :], axis=0)  # [1, B]
    m = jnp.where(i_idx < n_acc[None, :], d_pad, a_at)  # [k+1, B]

    # truncate at the first EOS (inclusive) and at the budget
    is_eos = jnp.isin(m, eos)
    eos_before = jnp.cumsum(is_eos.astype(jnp.int32), axis=0) - is_eos.astype(
        jnp.int32
    )  # EOS strictly earlier in the stream
    can_emit = (
        (i_idx <= n_acc[None, :])
        & (eos_before == 0)
        & ((core.out_pos[None, :] + i_idx) < budget)
        & live[None, :]
    )
    n_emit = jnp.sum(can_emit.astype(jnp.int32), axis=0)  # [B]

    # scatter the emitted tokens into the output buffer
    cols = core.out_pos[None, :] + i_idx  # [k+1, B]
    onehot = (
        (cols[:, :, None] == jnp.arange(budget)[None, None, :]) & can_emit[:, :, None]
    )  # [k+1, B, budget]
    upd = jnp.max(
        jnp.where(onehot, m[:, :, None], jnp.iinfo(jnp.int32).min), axis=0
    )
    covered = jnp.any(onehot, axis=0)
    tokens = jnp.where(covered, upd, core.tokens)

    out_pos = core.out_pos + n_emit
    emitted_eos = jnp.any(is_eos & can_emit, axis=0)
    done = core.done | emitted_eos | (out_pos >= budget)
    # next round consumes the newest emitted token
    m_last = jnp.take_along_axis(
        m, jnp.maximum(n_emit - 1, 0)[None, :], axis=0
    )[0]
    last = jnp.where(live & (n_emit > 0), m_last, core.last)

    return (
        core._replace(
            done=done, last=last, out_pos=out_pos, tokens=tokens
        ),
        n_acc,
    )


def _draft_setup(draft_cfg, draft_params, draft_prefill_params,
                 draft_inputs_embeds, k, max_rounds, from_target=None):
    """Draft-side prefill + row bookkeeping init, shared by the greedy and
    sampling batch loops: Sd = Td + (k+1)*max_rounds monotone rows.
    Returns (kv_d, valid_d, rp_d, Td).

    from_target: the target's freshly-prefilled kv [L, 2, nkv, S, hd, B]
    (share_prefill): the SELF-draft prefills the same inputs with the
    same weights/config, so its cache IS the target's — skip the second
    prefill entirely (zero copies: jnp arrays are immutable, the buffers
    diverge on first write)."""
    Bd, Td, _ = draft_inputs_embeds.shape
    Sd = Td + (k + 1) * max_rounds
    if from_target is not None:
        if from_target.shape[0] != draft_cfg.num_hidden_layers or (
            from_target.shape[2] != draft_cfg.num_key_value_heads
        ) or from_target.shape[3] != Sd or (
            from_target.shape[4] != draft_cfg.head_dim
        ):
            raise ValueError(
                "share_prefill needs the draft's cache layout to equal the "
                f"target's; got target {from_target.shape} vs draft "
                f"(L={draft_cfg.num_hidden_layers}, "
                f"nkv={draft_cfg.num_key_value_heads}, S={Sd}, "
                f"hd={draft_cfg.head_dim})"
            )
        kv_d = from_target
    else:
        d_caches = dec.init_cache(draft_cfg, Bd, Sd)
        _, d_caches = dec.prefill(
            draft_cfg,
            draft_params if draft_prefill_params is None
            else draft_prefill_params,
            draft_inputs_embeds, d_caches,
        )
        kv_d = jnp.stack(
            [d_caches[0].transpose(0, 2, 3, 4, 1),
             d_caches[1].transpose(0, 2, 3, 4, 1)],
            axis=1,
        )
    valid_d = jnp.concatenate(
        [jnp.ones((Td, Bd), bool), jnp.zeros((Sd - Td, Bd), bool)], axis=0
    )
    rp_d = jnp.broadcast_to(
        jnp.minimum(jnp.arange(Sd), Td - 1)[:, None].astype(jnp.int32),
        (Sd, Bd),
    )
    return kv_d, valid_d, rp_d, Td


def _spec_setup(cfg, params, prefill_params, inputs_embeds, max_new_tokens,
                pad_token_id, k, pick0=None):
    """Shared prefill + state init for all draft flavors.  pick0 maps the
    prefill logits [B, V] (already final_softcap'd by dec.prefill) to the
    first token [B]; None = greedy argmax."""
    if cfg.kv_lora_rank is not None:
        raise NotImplementedError(
            "speculative decoding does not support MLA (deepseek-v2) "
            "targets/drafts yet — the verify forward uses the expanded "
            "per-head KV layout; use the plain batch/engine decode paths "
            "(greedy_generate_bl / streaming), which run MLA on the "
            "compressed-latent cache"
        )
    B, T, _ = inputs_embeds.shape
    max_rounds = max(max_new_tokens - 1, 0)
    S = T + (k + 1) * max_rounds
    eos = jnp.asarray(cfg.eos_token_ids)

    caches = dec.init_cache(cfg, B, S)
    logits0, caches = dec.prefill(
        cfg, params if prefill_params is None else prefill_params,
        inputs_embeds, caches,
    )
    kv = jnp.stack(
        [caches[0].transpose(0, 2, 3, 4, 1), caches[1].transpose(0, 2, 3, 4, 1)],
        axis=1,
    )
    if pick0 is None:
        tok0 = jnp.argmax(logits0, axis=-1).astype(jnp.int32)
    else:
        tok0 = pick0(logits0)
    tokens = jnp.full((B, max_new_tokens), pad_token_id, jnp.int32)
    tokens = tokens.at[:, 0].set(tok0)
    done0 = jnp.isin(tok0, eos) | (max_new_tokens <= 1)
    valid = jnp.concatenate(
        [jnp.ones((T, B), bool), jnp.zeros((S - T, B), bool)], axis=0
    )
    row_pos = jnp.broadcast_to(
        jnp.minimum(jnp.arange(S), T - 1)[:, None].astype(jnp.int32), (S, B)
    )
    core = _SpecCore(
        done=done0,
        last=tok0,
        out_pos=jnp.ones((B,), jnp.int32),
        tokens=tokens,
        kv=kv,
        valid=valid,
        row_pos=row_pos,
    )
    return core, eos, T, max_rounds


def _draft_steps_greedy(draft_cfg, draft_params, last, done, out_pos, kv_d,
                        valid_d, rp_d, rd, Td, k, d_sliding):
    """k+1 greedy single-token draft steps: consume [last, p_1..p_k], write
    their KVs at physical rows rd..rd+k, emit proposals p_1..p_k [k, B].
    Shared by the batch loop (monotone rd) and the slot engine (ring rd)."""
    live = ~done
    dpos0 = Td + out_pos - 1  # [B]
    B = last.shape[0]
    props0 = jnp.zeros((k, B), jnp.int32)

    def step(j, carry):
        cur, kv_d, valid_d, rp_d, props = carry
        pos = dpos0 + j
        row = rd + j
        valid_d, rp_d = _stamp_rows(
            valid_d, rp_d, row, 1, live, pos[None, :]
        )
        bias = jnp.where(
            valid_d & (rp_d <= pos[None, :]), 0.0, NEG
        )  # [Sd, B]
        bias_sw = None
        if d_sliding:
            in_win = (pos[None, :] - rp_d) < draft_cfg.sliding_window
            bias_sw = jnp.where(
                valid_d & (rp_d <= pos[None, :]) & in_win, 0.0, NEG
            )
        h = llama.scale_embeds(
            draft_cfg,
            llama.embed_tokens(draft_cfg, draft_params, cur)
            .T.astype(draft_cfg.dtype),
        )
        cos, sin = llama.rope_tables(draft_cfg, pos)  # [B, hd]
        rl = None
        if llama.rope_dual(draft_cfg):
            cl, sl = llama.rope_tables(draft_cfg, pos, local=True)
            rl = (cl.T, sl.T)
        logits, kv_d = dec._decode_step_bl(
            draft_cfg, draft_params, h, kv_d, pos, bias,
            rope=(cos.T, sin.T), write_row=row, bias_sw=bias_sw,
            rope_local=rl,
        )
        nxt = jnp.argmax(logits, axis=0).astype(jnp.int32)
        props = jnp.where(
            (jnp.arange(k)[:, None] == j), nxt[None, :], props
        ) if k > 0 else props
        return nxt, kv_d, valid_d, rp_d, props

    _, kv_d, valid_d, rp_d, props = jax.lax.fori_loop(
        0, k + 1, step, (last, kv_d, valid_d, rp_d, props0)
    )
    return props, kv_d, valid_d, rp_d


def _verify_target(cfg, params, core, props, k, T, sliding_on, rt):
    """Shared target-side preamble for both acceptance flavors: embed
    [last, props], stamp this round's k+1 rows at physical rt, build the
    (valid, row_pos)-derived biases, run the verify forward.  Returns
    (core' with kv/valid/row_pos advanced, v_logits [V, P, B])."""
    B = core.last.shape[0]
    live = ~core.done
    pos = T + core.out_pos - 1  # [B] logical position of `last`
    qpos = pos[None, :] + jnp.arange(k + 1)[:, None]  # [P, B]

    in_tokens = jnp.concatenate([core.last[None, :], props], axis=0)  # [P, B]
    h = llama.scale_embeds(
        cfg,
        llama.embed_tokens(cfg, params, in_tokens.reshape(-1))
        .T.astype(cfg.dtype)
        .reshape(-1, k + 1, B),
    )  # [H, P, B]

    valid, row_pos = _stamp_rows(core.valid, core.row_pos, rt, k + 1, live, qpos)
    bias, bias_sw = _bias_from(valid, row_pos, qpos, cfg, sliding_on)
    v_logits, kv = _verify_step_bl(
        cfg, params, h, core.kv, qpos, bias, rt, bias_sw=bias_sw
    )
    return core._replace(kv=kv, valid=valid, row_pos=row_pos), v_logits


def _verify_round(cfg, params, core, props, rnd, k, T, budget, pad_token_id,
                  eos, sliding_on, rt=None):
    """Target side of one round: verify [last, props] and advance.

    rt: physical row for this round's k+1 cache rows; defaults to the
    batch loop's monotone layout T + rnd*(k+1).  The slot engine passes a
    RING row instead (rnd mod (budget-1) slots of width k+1 — a tenant
    lives at most budget-1 rounds, so the wrap never lands on its own
    still-valid rows)."""
    if rt is None:
        rt = T + rnd * (k + 1)
    core, v_logits = _verify_target(cfg, params, core, props, k, T,
                                    sliding_on, rt)
    a_ids = jnp.argmax(v_logits, axis=0).astype(jnp.int32)  # [P, B]
    core, n_acc = _advance(
        cfg, core, props, a_ids, k, T, budget, pad_token_id, eos
    )
    core = core._replace(valid=_retract_rows(core.valid, rt, k, n_acc))
    return core, n_acc


@partial(jax.jit, static_argnames=(
    "cfg", "draft_cfg", "max_new_tokens", "pad_token_id", "k",
    "share_prefill"))
def speculative_generate_bl(
    cfg: LlamaConfig,
    params: dict,
    draft_cfg: LlamaConfig,
    draft_params: dict,
    inputs_embeds: jax.Array,
    draft_inputs_embeds: jax.Array,
    max_new_tokens: int,
    pad_token_id: int,
    k: int = 4,
    prefill_params: Optional[dict] = None,
    draft_prefill_params: Optional[dict] = None,
    share_prefill: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Draft-model speculative greedy decode.

    Token-identical to dec.greedy_generate_bl(cfg, params, ...) for ANY
    draft model (the draft only steers which prefix lengths get verified
    per round, never what is emitted) — pinned by
    tests/test_speculative.py against random drafts — UNDER IDENTICAL
    FORWARD NUMERICS.  On TPU bf16, near-tie argmaxes may resolve
    differently between the verify and step forwards (see the module
    docstring's exactness contract); the output is then a valid
    target-greedy decode that can differ from the plain loop's at
    positions whose top-2 margin is below ~1.4% of logit scale.

    draft_inputs_embeds: the prompt in the DRAFT model's embedding space
    (the draft conditions on its own projection of the prompt; caption
    prompts are soft-token + chat prefix, so callers typically embed the
    prefix ids with the draft's table).  The draft must share the
    target's tokenizer/vocab ids.

    share_prefill: SELF-draft fast path — when the draft prefills the
    SAME inputs with the SAME weights/config as the target (the
    production W4A8 self-draft: both prefill the bf16 tree), its prefill
    cache is bit-identical to the target's, so the second prefill is
    skipped and the draft starts from the target's cache.  Exact; only
    valid under that precondition (the caller asserts it).

    Returns (tokens [B, max_new_tokens], rounds []) — `rounds` is the
    number of verify forwards executed, the quantity acceptance buys
    down (rounds == budget-1 means the draft never helped; rounds ~=
    budget/(k+1) at full acceptance).
    """
    B, T_, _ = inputs_embeds.shape
    if max_new_tokens == 0:
        return jnp.zeros((B, 0), jnp.int32), jnp.zeros((), jnp.int32)
    budget = max_new_tokens
    core, eos, T, max_rounds = _spec_setup(
        cfg, params, prefill_params, inputs_embeds, max_new_tokens,
        pad_token_id, k,
    )
    if max_rounds == 0:  # budget 1: token0 is the whole output
        return core.tokens, jnp.zeros((), jnp.int32)
    sliding_on = llama.sliding_effective(cfg, T + budget)

    # draft-side state (same bookkeeping design, single-token steps)
    kv_d, valid_d, rp_d, Td = _draft_setup(
        draft_cfg, draft_params, draft_prefill_params, draft_inputs_embeds,
        k, max_rounds, from_target=core.kv if share_prefill else None,
    )
    d_sliding = llama.sliding_effective(draft_cfg, Td + budget)

    def draft_propose(core, kv_d, valid_d, rp_d, rnd):
        rd = Td + rnd * (k + 1)
        props, kv_d, valid_d, rp_d = _draft_steps_greedy(
            draft_cfg, draft_params, core.last, core.done, core.out_pos,
            kv_d, valid_d, rp_d, rd, Td, k, d_sliding,
        )
        return props, kv_d, valid_d, rp_d, rd

    def cond(state):
        rnd, core, _, _, _ = state
        return (rnd < max_rounds) & ~jnp.all(core.done)

    def body(state):
        rnd, core, kv_d, valid_d, rp_d = state
        props, kv_d, valid_d, rp_d, rd = draft_propose(
            core, kv_d, valid_d, rp_d, rnd
        )
        core, n_acc = _verify_round(
            cfg, params, core, props, rnd, k, T, budget, pad_token_id, eos,
            sliding_on,
        )
        valid_d = _retract_rows(valid_d, rd, k, n_acc)
        return rnd + 1, core, kv_d, valid_d, rp_d

    rnd, core, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), core, kv_d, valid_d, rp_d)
    )
    return core.tokens, rnd


@partial(jax.jit, static_argnames=(
    "cfg", "max_new_tokens", "pad_token_id", "k", "wrong_period"))
def speculative_generate_oracle_bl(
    cfg: LlamaConfig,
    params: dict,
    inputs_embeds: jax.Array,
    oracle_tokens: jax.Array,
    max_new_tokens: int,
    pad_token_id: int,
    k: int = 4,
    wrong_period: int = 0,
    prefill_params: Optional[dict] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Speculative decode with a free ORACLE draft, for measurement and
    adversarial testing.

    oracle_tokens [B, max_new_tokens]: a token stream to propose from
    (e.g. a prior greedy run's output).  Proposal i for a slot at output
    position q is oracle_tokens[b, q + i]; when wrong_period = m > 0,
    every proposal whose absolute output index is a multiple of m is
    corrupted (+1 mod vocab), forcing a rejection — sweeping m maps
    throughput as a function of acceptance with ZERO draft cost, which
    isolates the verify-side economics (the ceiling any real draft can
    reach).  Output is token-identical to greedy decode REGARDLESS of
    oracle content (the greedy-rejection invariant), which is exactly
    what the tests exploit with garbage oracles — under identical
    forward numerics (see the module docstring's exactness contract for
    the TPU bf16 near-tie caveat).  NOTE on bf16 chips the fixed oracle
    stream CASCADES after the first near-tie flip (every later proposal
    comes from a stale prefix), so long-budget oracle acceptance
    understates what a re-drafting real draft achieves.

    Returns (tokens [B, max_new_tokens], rounds [])."""
    B, T_, _ = inputs_embeds.shape
    if max_new_tokens == 0:
        return jnp.zeros((B, 0), jnp.int32), jnp.zeros((), jnp.int32)
    budget = max_new_tokens
    core, eos, T, max_rounds = _spec_setup(
        cfg, params, prefill_params, inputs_embeds, max_new_tokens,
        pad_token_id, k,
    )
    if max_rounds == 0:  # budget 1: token0 is the whole output
        return core.tokens, jnp.zeros((), jnp.int32)
    sliding_on = llama.sliding_effective(cfg, T + budget)
    V = cfg.vocab_size

    def propose(core):
        # proposal i continues from output position out_pos + i - 1; the
        # oracle stream is indexed by absolute output position
        idx = jnp.clip(
            core.out_pos[None, :] + jnp.arange(k)[:, None], 0, budget - 1
        )  # [k, B]
        props = jnp.take_along_axis(oracle_tokens.T, idx, axis=0)
        if wrong_period > 0:
            corrupt = (core.out_pos[None, :] + jnp.arange(k)[:, None]) \
                % wrong_period == 0
            props = jnp.where(corrupt, (props + 1) % V, props)
        return props.astype(jnp.int32)

    def cond(state):
        rnd, core = state
        return (rnd < max_rounds) & ~jnp.all(core.done)

    def body(state):
        rnd, core = state
        props = propose(core)
        core, _ = _verify_round(
            cfg, params, core, props, rnd, k, T, budget, pad_token_id, eos,
            sliding_on,
        )
        return rnd + 1, core

    rnd, core = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), core)
    )
    return core.tokens, rnd


# ---------------------------------------------------------------------------
# Controlled-acceptance measurement harness (full pipeline cost, cascade-
# free).  The chip economics problem (BASELINE.md round-5): the oracle
# measures verify cost with ZERO draft cost, the real random-init draft
# measures full cost at ZERO acceptance, and trained-checkpoint acceptance
# is unmeasurable offline — so every ">1x" cell so far is ARITHMETIC from
# component costs, not a wall-clock.  This harness closes that gap: both
# models run their genuine forwards every round (target verify + k+1 draft
# steps — byte-identical streams, identical shapes/ops to the production
# loop), but the target's greedy argmax is margin-forced onto a
# deterministic token chain and the draft's proposals are overridden with
# that same chain, corrupted every `wrong_period`-th output position.
# Acceptance is then exact and cascade-free (a rejection re-derives the
# chain from the accepted token, so bf16 near-tie noise cannot poison
# later rounds), and the measured speedup at each wrong_period is the TRUE
# full-pipeline wall-clock at that acceptance — what a trained draft with
# that agreement rate would deliver.


def _excl_shift(c, excl):
    """Map c in [0, V-len(excl)) injectively into [0, V) \\ excl (sorted
    static exclusion list): c + #{i: excl_i - i <= c}, thresholds applied
    to the ORIGINAL value (sequential updates overshoot into excluded ids
    when exclusions are close together)."""
    shift = jnp.zeros((), jnp.int32)
    for i, e in enumerate(sorted(excl)):
        shift = shift + (c >= (e - i)).astype(jnp.int32)
    return c + shift


def _chain_next(tok, V, eos_ids, wrong=False):
    """Deterministic successor token: an affine (LCG) step in the eos-free
    sub-vocab, shifted past the static eos ids so forced rows never
    terminate early.  wrong=True yields a token GUARANTEED != the clean
    successor (distinct in the reduced domain; the shift is injective)."""
    Vr = V - len(eos_ids)
    # multiplier kept small: 262k vocab * 7919 stays inside int32
    c = (tok * 7919 + 104729) % Vr
    if wrong:
        c = (c + 1) % Vr
    return _excl_shift(c, eos_ids)


def _verify_round_forced(cfg, params, core, props, rnd, k, T, budget,
                         pad_token_id, eos, sliding_on, margin):
    """_verify_round with the target's argmax margin-forced onto the
    chain: a_ids = argmax(v_logits + margin * onehot(chain(in_token))).
    The verify forward runs unchanged (same cost) and the argmax still
    consumes every logit (the bias is one finite add, not a bypass — XLA
    cannot DCE the head matmul)."""
    rt = T + rnd * (k + 1)
    core, v_logits = _verify_target(cfg, params, core, props, k, T,
                                    sliding_on, rt)
    V = v_logits.shape[0]
    in_tokens = jnp.concatenate([core.last[None, :], props], axis=0)  # [P,B]
    tgt = _chain_next(in_tokens, V, cfg.eos_token_ids)  # [P, B]
    bias = jnp.where(
        jnp.arange(V)[:, None, None] == tgt[None, :, :], margin, 0.0
    ).astype(v_logits.dtype)
    a_ids = jnp.argmax(v_logits + bias, axis=0).astype(jnp.int32)
    core, n_acc = _advance(
        cfg, core, props, a_ids, k, T, budget, pad_token_id, eos
    )
    core = core._replace(valid=_retract_rows(core.valid, rt, k, n_acc))
    return core, n_acc


@partial(jax.jit, static_argnames=(
    "cfg", "draft_cfg", "max_new_tokens", "pad_token_id", "k", "margin"))
def speculative_generate_forced_bl(
    cfg: LlamaConfig,
    params: dict,
    draft_cfg: LlamaConfig,
    draft_params: dict,
    inputs_embeds: jax.Array,
    draft_inputs_embeds: jax.Array,
    max_new_tokens: int,
    pad_token_id: int,
    wrong_period: jax.Array,
    k: int = 4,
    margin: float = 1e4,
    prefill_params: Optional[dict] = None,
    draft_prefill_params: Optional[dict] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Full-cost speculative decode at a CONTROLLED acceptance rate (a
    measurement harness, not a serving path — see the block comment
    above).

    Identical round structure and compute to speculative_generate_bl
    (real target verify + real k+1-step draft forwards, same retraction
    bookkeeping), except: the target's per-slot argmax is margin-forced
    onto the deterministic chain tok -> _chain_next(tok), and the draft's
    proposals are overridden with that chain, corrupted (guaranteed
    mismatch) at every output position that is a multiple of
    `wrong_period` (a DYNAMIC scalar — one compile serves the whole
    acceptance sweep; 0 = never corrupt = full acceptance).  The draft's
    real argmaxes are consumed by the override select so XLA cannot
    dead-code the draft forwards; the wrong_period=1 (all-reject) cell
    must reproduce the random-draft cost floor, which pins that.

    Emitted tokens are the pure chain from token0 regardless of
    wrong_period (corrections land back on the chain) — the CPU tests pin
    both the stream and the closed-form round counts.

    Returns (tokens [B, max_new_tokens], rounds [])."""
    B, T_, _ = inputs_embeds.shape
    if max_new_tokens == 0:
        return jnp.zeros((B, 0), jnp.int32), jnp.zeros((), jnp.int32)
    budget = max_new_tokens
    core, eos, T, max_rounds = _spec_setup(
        cfg, params, prefill_params, inputs_embeds, max_new_tokens,
        pad_token_id, k,
    )
    # token0 comes from the prefill argmax; force it onto the chain too so
    # rows can't go done at round 0 (eos-free domain).
    V = cfg.vocab_size
    tok0 = _chain_next(core.last, V, cfg.eos_token_ids)
    core = core._replace(
        last=tok0, tokens=core.tokens.at[:, 0].set(tok0),
        done=jnp.zeros_like(core.done) | (max_new_tokens <= 1),
    )
    if max_rounds == 0:
        return core.tokens, jnp.zeros((), jnp.int32)
    sliding_on = llama.sliding_effective(cfg, T + budget)
    wp = jnp.asarray(wrong_period, jnp.int32)

    kv_d, valid_d, rp_d, Td = _draft_setup(
        draft_cfg, draft_params, draft_prefill_params, draft_inputs_embeds,
        k, max_rounds,
    )
    d_sliding = llama.sliding_effective(draft_cfg, Td + budget)

    def forced_props(core):
        # clean chain continuation p_1..p_k from `last`, then pointwise
        # corruption at absolute output positions divisible by wp
        # (mirrors the oracle's wrong_period accounting).
        def one(p, _):
            nxt = _chain_next(p, V, cfg.eos_token_ids)
            return nxt, nxt

        _, chain = jax.lax.scan(one, core.last, None, length=k)  # [k, B]
        idx = core.out_pos[None, :] + jnp.arange(k)[:, None]  # [k, B]
        corrupt = ((idx % jnp.maximum(wp, 1)) == 0) & (wp > 0)
        wrongs = _chain_next(
            jnp.concatenate([core.last[None, :], chain[:-1]], axis=0)
            if k > 1 else core.last[None, :],
            V, cfg.eos_token_ids, wrong=True,
        )
        return jnp.where(corrupt, wrongs, chain)

    def cond(state):
        rnd, core, _, _, _ = state
        return (rnd < max_rounds) & ~jnp.all(core.done)

    def body(state):
        rnd, core, kv_d, valid_d, rp_d = state
        rd = Td + rnd * (k + 1)
        props_real, kv_d, valid_d, rp_d = _draft_steps_greedy(
            draft_cfg, draft_params, core.last, core.done, core.out_pos,
            kv_d, valid_d, rp_d, rd, Td, k, d_sliding,
        )
        # override with the forced chain; the select consumes props_real
        # (argmax outputs never equal -1) so the draft forwards survive.
        props = jnp.where(props_real == jnp.int32(-1), props_real,
                          forced_props(core))
        core, n_acc = _verify_round_forced(
            cfg, params, core, props, rnd, k, T, budget, pad_token_id, eos,
            sliding_on, margin,
        )
        valid_d = _retract_rows(valid_d, rd, k, n_acc)
        return rnd + 1, core, kv_d, valid_d, rp_d

    rnd, core, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), core, kv_d, valid_d, rp_d)
    )
    return core.tokens, rnd


# ---------------------------------------------------------------------------
# Stochastic speculative sampling (draft-verify for the temperature/top-k/
# top-p serving path).
#
# Classic speculative sampling (Leviathan et al. / Chen et al. 2023):
# proposal d_i ~ q_i is accepted with probability min(1, p_i(d_i)/q_i(d_i));
# the first rejection is replaced by a draw from the residual
# norm(max(p_i - q_i, 0)), and full acceptance earns a bonus draw from
# p_{k+1}.  The emitted marginal is EXACTLY the target distribution p for
# any draft q — same theorem the greedy path instantiates with point-mass
# p, q.  Both p and q here are the WARPED distributions (temperature ->
# top-k -> top-p, dec._warp_bl, HF order), matching how HF's assisted
# generation applies its logits processors to both models.
#
# RNG discipline (the serving invariant): every draw is keyed by
# (request, output age) exactly like dec.sample_generate_bl —
#   K(age)              = fold_in(base, req*budget + age)
#   proposal draw       = K(age)              (the plain path's own key)
#   acceptance uniform  = fold_in(K(age), 1)
#   residual draw       = fold_in(K(age), 2)
#   bonus draw          = K(age)              (no other draw at that age)
# Consequence: with draft == target (p == q), every proposal is the plain
# path's own draw and min(1, p/q) = 1, so the output is BIT-IDENTICAL to
# dec.sample_generate_bl — pinned in tests/test_speculative.py.  With a
# real (cheaper) draft the per-seed tokens differ but the distribution is
# preserved (statistically pinned there too).
# ---------------------------------------------------------------------------


def _spec_keys(base_key, req_ids, budget, ages):
    """K(age) over an [*, B] age grid: fold_in(base, req*budget + age) —
    dec._req_keys broadcast over the in-round index."""
    flat_age = ages.reshape(-1)
    flat_req = jnp.broadcast_to(
        req_ids[None, :], ages.shape
    ).reshape(-1)
    return jax.vmap(
        lambda r, n: jax.random.fold_in(base_key, r * budget + n)
    )(flat_req, flat_age)


def _draft_steps_sample(draft_cfg, draft_params, last, done, out_pos, kv_d,
                        valid_d, rp_d, rd, Td, k, d_sliding, base_key,
                        req_ids, budget, temperature, top_k, top_p):
    """k+1 stochastic single-token draft steps at physical rows rd..rd+k;
    proposal j is SAMPLED from the draft's warped distribution with the
    plain path's own key K(out_pos + j); the full warped q vectors are
    recorded for the verify side's acceptance/residual math.  Returns
    (props [k, B], q_w [V, k, B], kv_d, valid_d, rp_d).  Shared by the
    batch loop (monotone rd) and the slot engine (ring rd)."""
    live = ~done
    dpos0 = Td + out_pos - 1
    B = last.shape[0]
    Vd = draft_cfg.vocab_size
    props0 = jnp.zeros((k, B), jnp.int32)
    q0 = jnp.zeros((k, Vd, B), jnp.float32)

    def step(j, carry):
        cur, kv_d, valid_d, rp_d, props, q_buf = carry
        pos = dpos0 + j
        row = rd + j
        valid_d, rp_d = _stamp_rows(
            valid_d, rp_d, row, 1, live, pos[None, :]
        )
        bias = jnp.where(valid_d & (rp_d <= pos[None, :]), 0.0, NEG)
        bias_sw = None
        if d_sliding:
            in_win = (pos[None, :] - rp_d) < draft_cfg.sliding_window
            bias_sw = jnp.where(
                valid_d & (rp_d <= pos[None, :]) & in_win, 0.0, NEG
            )
        h = llama.scale_embeds(
            draft_cfg,
            llama.embed_tokens(draft_cfg, draft_params, cur)
            .T.astype(draft_cfg.dtype),
        )
        cos, sin = llama.rope_tables(draft_cfg, pos)
        rl = None
        if llama.rope_dual(draft_cfg):
            cl, sl = llama.rope_tables(draft_cfg, pos, local=True)
            rl = (cl.T, sl.T)
        logits, kv_d = dec._decode_step_bl(
            draft_cfg, draft_params, h, kv_d, pos, bias,
            rope=(cos.T, sin.T), write_row=row, bias_sw=bias_sw,
            rope_local=rl,
        )
        w_d = dec._warp_bl(
            llama.final_softcap(draft_cfg, logits), temperature, top_k,
            top_p,
        )  # [Vd, B] f32
        # proposal j lands at output age out_pos + j; the j == k step
        # only writes KV (its draw is discarded — clamp the age so no
        # fresh key is consumed)
        age = out_pos + jnp.minimum(j, k - 1)
        keys = _spec_keys(base_key, req_ids, budget, age[None, :])
        nxt = jax.vmap(jax.random.categorical)(keys, w_d.T).astype(
            jnp.int32
        )
        q_w = jax.nn.softmax(w_d, axis=0)
        props = jnp.where(jnp.arange(k)[:, None] == j, nxt[None, :],
                          props)
        q_buf = jnp.where(
            (jnp.arange(k)[:, None, None] == j), q_w[None], q_buf
        )
        return nxt, kv_d, valid_d, rp_d, props, q_buf

    _, kv_d, valid_d, rp_d, props, q_buf = jax.lax.fori_loop(
        0, k + 1, step, (last, kv_d, valid_d, rp_d, props0, q0)
    )
    return props, jnp.moveaxis(q_buf, 1, 0), kv_d, valid_d, rp_d


def _verify_round_sample(cfg, params, core, props, q_w, rnd, k, T, budget,
                         pad_token_id, eos, sliding_on, base_key, req_ids,
                         temperature, top_k, top_p, rt=None):
    """Target side of one stochastic round: verify [last, props], accept
    by p/q rejection, emit residual/bonus draws.  q_w [V, k, B]: the
    draft's warped probability vectors for its k proposals.  rt as in
    _verify_round (None = the batch loop's monotone row layout)."""
    B = core.last.shape[0]
    if rt is None:
        rt = T + rnd * (k + 1)
    core, v_logits = _verify_target(cfg, params, core, props, k, T,
                                    sliding_on, rt)

    V = v_logits.shape[0]
    capped = llama.final_softcap(cfg, v_logits.reshape(V, (k + 1) * B))
    w = dec._warp_bl(capped, temperature, top_k, top_p)  # [V, (k+1)*B] f32
    p_w = jax.nn.softmax(w, axis=0).reshape(V, k + 1, B)
    w = w.reshape(V, k + 1, B)

    ages = core.out_pos[None, :] + jnp.arange(k + 1)[:, None]  # [k+1, B]
    keys = _spec_keys(base_key, req_ids, budget, ages)  # [(k+1)*B]
    keys = keys.reshape(k + 1, B)

    # acceptance: u * q(d) < p(d)  (u ~ U[0,1); strict < makes p == q
    # accept with probability 1 — the bit-parity invariant)
    p_sel = jnp.take_along_axis(p_w[:, :k, :], props[None], axis=0)[0]
    q_sel = jnp.take_along_axis(q_w, props[None], axis=0)[0]  # [k, B]
    u_keys = jax.vmap(jax.vmap(lambda kk: jax.random.fold_in(kk, 1)))(
        keys[:k]
    )
    u = jax.vmap(jax.vmap(jax.random.uniform))(u_keys)  # [k, B]
    accept = (u * q_sel < p_sel).astype(jnp.int32)
    acc = jnp.cumprod(accept, axis=0)
    n_acc = jnp.sum(acc, axis=0)  # [B]

    # corrections: residual draw at each possible rejection index, bonus
    # draw (from the warped logits, = the plain path's pick computation)
    # at full acceptance
    res = jnp.maximum(p_w[:, :k, :] - q_w, 0.0)  # [V, k, B]
    logres = jnp.where(res > 0, jnp.log(res), -jnp.inf)
    r_keys = jax.vmap(jax.vmap(lambda kk: jax.random.fold_in(kk, 2)))(
        keys[:k]
    )
    corr_res = jax.vmap(jax.vmap(jax.random.categorical))(
        r_keys, jnp.moveaxis(logres, 0, -1)
    ).astype(jnp.int32)  # [k, B] (keys [k, B] x logres' [k, B, V])
    corr_bonus = jax.vmap(jax.random.categorical)(
        keys[k], w[:, k, :].T
    ).astype(jnp.int32)[None]  # [1, B]
    corr = jnp.concatenate([corr_res, corr_bonus], axis=0) if k > 0 \
        else corr_bonus

    core, n_acc = _advance(
        cfg, core, props, corr, k, T, budget, pad_token_id, eos, n_acc=n_acc
    )
    core = core._replace(valid=_retract_rows(core.valid, rt, k, n_acc))
    return core, n_acc


@partial(jax.jit, static_argnames=(
    "cfg", "draft_cfg", "max_new_tokens", "pad_token_id", "k",
    "temperature", "top_k", "top_p", "share_prefill"))
def speculative_sample_bl(
    cfg: LlamaConfig,
    params: dict,
    draft_cfg: LlamaConfig,
    draft_params: dict,
    inputs_embeds: jax.Array,
    draft_inputs_embeds: jax.Array,
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
    share_prefill: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Stochastic speculative decode: the emitted tokens are distributed
    exactly as dec.sample_generate_bl's (warped-target marginal preserved
    for ANY draft), and are BIT-IDENTICAL to it when draft == target (see
    the RNG-discipline note above).  EOS/pad/budget semantics as the
    plain sampler.  share_prefill as in speculative_generate_bl (exact
    self-draft fast path).  Returns (tokens [B, max_new_tokens], verify
    rounds).
    """
    if k < 1:
        raise ValueError("speculative sampling needs k >= 1")
    if draft_cfg.vocab_size != cfg.vocab_size:
        raise ValueError(
            "speculative sampling compares p/q over one vocab: draft "
            f"vocab {draft_cfg.vocab_size} != target {cfg.vocab_size}"
        )
    B, T_, _ = inputs_embeds.shape
    if req_ids is None:
        req_ids = jnp.arange(B, dtype=jnp.int32)
    if max_new_tokens == 0:
        return jnp.zeros((B, 0), jnp.int32), jnp.zeros((), jnp.int32)
    budget = max_new_tokens

    def pick0(logits0):
        keys0 = dec._req_keys(base_key, req_ids, budget, 0)
        return dec._sample_pick_bl(logits0.T, keys0, temperature, top_k,
                                   top_p)

    core, eos, T, max_rounds = _spec_setup(
        cfg, params, prefill_params, inputs_embeds, max_new_tokens,
        pad_token_id, k, pick0=pick0,
    )
    if max_rounds == 0:
        return core.tokens, jnp.zeros((), jnp.int32)
    sliding_on = llama.sliding_effective(cfg, T + budget)

    kv_d, valid_d, rp_d, Td = _draft_setup(
        draft_cfg, draft_params, draft_prefill_params, draft_inputs_embeds,
        k, max_rounds, from_target=core.kv if share_prefill else None,
    )
    d_sliding = llama.sliding_effective(draft_cfg, Td + budget)

    def draft_propose(core, kv_d, valid_d, rp_d, rnd):
        rd = Td + rnd * (k + 1)
        props, q_w, kv_d, valid_d, rp_d = _draft_steps_sample(
            draft_cfg, draft_params, core.last, core.done, core.out_pos,
            kv_d, valid_d, rp_d, rd, Td, k, d_sliding, base_key, req_ids,
            budget, temperature, top_k, top_p,
        )
        return props, q_w, kv_d, valid_d, rp_d, rd

    def cond(state):
        rnd, core, _, _, _ = state
        return (rnd < max_rounds) & ~jnp.all(core.done)

    def body(state):
        rnd, core, kv_d, valid_d, rp_d = state
        props, q_w, kv_d, valid_d, rp_d, rd = draft_propose(
            core, kv_d, valid_d, rp_d, rnd
        )
        core, n_acc = _verify_round_sample(
            cfg, params, core, props, q_w, rnd, k, T, budget, pad_token_id,
            eos, sliding_on, base_key, req_ids, temperature, top_k, top_p,
        )
        valid_d = _retract_rows(valid_d, rd, k, n_acc)
        return rnd + 1, core, kv_d, valid_d, rp_d

    rnd, core, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), core, kv_d, valid_d, rp_d)
    )
    return core.tokens, rnd


# ---------------------------------------------------------------------------
# Speculative continuous batching: the bulk slot engine (streaming.py's
# on-device admission skeleton) running draft-verify rounds instead of
# single-token steps.  Fully on-device: a lax.while_loop advances every
# slot one ROUND (k drafts + one k+1-position verify) per iteration;
# whenever >= `chunk` slots are free and requests remain, a lax.cond
# branch flushes the outgoing tenants and prefills + installs the next
# chunk into both the target and draft pools.  Greedy rejection keeps the
# engine TOKEN-IDENTICAL to the batch captioner for any draft.
#
# Cache rows ride a ring of budget-1 round-slots of width k+1: a tenant
# lives at most budget-1 rounds (every round emits >= 1 token), so by the
# time the ring wraps onto a row the tenant that stamped it is done, and
# the wrap's _stamp_rows overwrites the stale valid bits for every lane.
# ---------------------------------------------------------------------------


class _SpecPool(NamedTuple):
    """while_loop carry for the speculative bulk engine."""

    core: _SpecCore      # target-side pool (done doubles as slot-free)
    kv_d: jax.Array      # draft cache [Ld, 2, nkvd, Sd, hdd, B]
    valid_d: jax.Array   # [Sd, B]
    rp_d: jax.Array      # [Sd, B]
    out: jax.Array       # [Nq + 1, budget] (row Nq = trash for padding)
    slot_req: jax.Array  # [B] output row each slot flushes to
    qptr: jax.Array      # [] next queue row to admit
    rnd: jax.Array       # [] global round counter (ring index source)


def _pin_spec_pool(mesh, pool: "_SpecPool") -> "_SpecPool":
    """Shard every per-slot lane axis over the mesh's 'data' axis (the
    same layout streaming.constrain_state pins for the plain engine); the
    output buffer and scalars replicate.  No-op for mesh=None."""
    if mesh is None:
        return pool
    from jax.sharding import NamedSharding, PartitionSpec as P

    def pin(x, spec):
        s = NamedSharding(mesh, spec)
        if isinstance(x, jax.core.Tracer):
            return jax.lax.with_sharding_constraint(x, s)
        return jax.device_put(x, s)

    core = pool.core
    core = _SpecCore(
        done=pin(core.done, P("data")),
        last=pin(core.last, P("data")),
        out_pos=pin(core.out_pos, P("data")),
        tokens=pin(core.tokens, P("data", None)),
        kv=pin(core.kv, P(None, None, None, None, None, "data")),
        valid=pin(core.valid, P(None, "data")),
        row_pos=pin(core.row_pos, P(None, "data")),
    )
    return pool._replace(
        core=core,
        kv_d=pin(pool.kv_d, P(None, None, None, None, None, "data")),
        valid_d=pin(pool.valid_d, P(None, "data")),
        rp_d=pin(pool.rp_d, P(None, "data")),
        slot_req=pin(pool.slot_req, P("data")),
    )


def _admit_install(cfg, draft_cfg, params, draft_params, pspec, pparams,
                   state, embs, prefix_ids, slots, fresh, req, T, Td,
                   budget, pad_token_id, k, eos, sample, sample_key,
                   req_base, prefill_params=None, draft_prefill_params=None,
                   share_prefill=False):
    """Prefill one chunk of prompts (target + draft) and install it into
    `slots` of a _SpecPool: rows with fresh[i]=False keep the (dead)
    slot's state.  Shared by the on-device bulk admission branch and the
    host-driven online engine (which passes explicit slots/req from its
    own occupancy bookkeeping).  Leaves out/qptr untouched.
    share_prefill: the SELF-draft prefills the same inputs with the same
    weights/config, so its chunk cache IS the target's (exact; skips the
    second prefill)."""
    from dmi_tpu.models import mmmodel
    from dmi_tpu.models import projector as proj

    pp = params if prefill_params is None else prefill_params
    dpp = (draft_params if draft_prefill_params is None
           else draft_prefill_params)
    chunk = slots.shape[0]
    S = state.core.valid.shape[0]
    Sd = state.valid_d.shape[0]
    core = state.core

    soft = proj.apply(pspec, pparams, embs, train=False)
    inputs = mmmodel.assemble_prompt(cfg, pp, soft, prefix_ids)
    caches = dec.init_cache(cfg, chunk, T)
    logits0, caches = dec.prefill(cfg, pp, inputs, caches)
    chunk_kv = jnp.stack(
        [caches[0].transpose(0, 2, 3, 4, 1),
         caches[1].transpose(0, 2, 3, 4, 1)], axis=1,
    )
    if share_prefill:
        if state.kv_d.shape[:3] != core.kv.shape[:3] or (
            state.kv_d.shape[4] != core.kv.shape[4]
        ) or Td != T:
            raise ValueError(
                "share_prefill needs the draft's cache layout to equal "
                f"the target's; got draft {state.kv_d.shape} vs target "
                f"{core.kv.shape}"
            )
        chunk_kv_d = chunk_kv
    else:
        d_caches = dec.init_cache(draft_cfg, chunk, Td)
        _, d_caches = dec.prefill(draft_cfg, dpp, inputs, d_caches)
        chunk_kv_d = jnp.stack(
            [d_caches[0].transpose(0, 2, 3, 4, 1),
             d_caches[1].transpose(0, 2, 3, 4, 1)], axis=1,
        )

    if sample is None:
        tok0 = jnp.argmax(logits0, axis=-1).astype(jnp.int32)
    else:
        # token 0 (age 0) draws with the batch sampler's own
        # (request, age) keys; trash rows burn keys no real request uses
        temperature, top_k, top_p = sample
        keys0 = dec._req_keys(sample_key, req_base + req, budget, 0)
        tok0 = dec._sample_pick_bl(logits0.T, keys0, temperature,
                                   top_k, top_p)
    done0 = ~fresh | jnp.isin(tok0, eos)
    fresh_tokens = jnp.full((chunk, budget), pad_token_id, jnp.int32)
    fresh_tokens = fresh_tokens.at[:, 0].set(
        jnp.where(fresh, tok0, pad_token_id)
    )
    col = jnp.concatenate(
        [jnp.ones((T, chunk), bool), jnp.zeros((S - T, chunk), bool)],
        axis=0,
    )
    col_d = jnp.concatenate(
        [jnp.ones((Td, chunk), bool), jnp.zeros((Sd - Td, chunk), bool)],
        axis=0,
    )
    keep = ~fresh  # padding rows keep the (already dead) slot's state
    core = _SpecCore(
        done=core.done.at[slots].set(jnp.where(keep, core.done[slots],
                                               done0)),
        last=core.last.at[slots].set(jnp.where(keep, core.last[slots],
                                               tok0)),
        out_pos=core.out_pos.at[slots].set(
            jnp.where(keep, core.out_pos[slots], 1)
        ),
        tokens=core.tokens.at[slots].set(
            jnp.where(keep[:, None], core.tokens[slots], fresh_tokens)
        ),
        kv=core.kv.at[:, :, :, :T, :, slots].set(chunk_kv),
        valid=core.valid.at[:, slots].set(
            jnp.where(fresh[None, :], col, core.valid[:, slots])
        ),
        # row_pos untouched: prompt rows are position-identical for
        # every tenant; generated rows are stamped at write time
        row_pos=core.row_pos,
    )
    return state._replace(
        core=core,
        kv_d=state.kv_d.at[:, :, :, :Td, :, slots].set(chunk_kv_d),
        valid_d=state.valid_d.at[:, slots].set(
            jnp.where(fresh[None, :], col_d, state.valid_d[:, slots])
        ),
        slot_req=state.slot_req.at[slots].set(req),
    )


@partial(jax.jit, static_argnames=(
    "cfg", "draft_cfg", "pspec", "T", "budget", "pad_token_id", "chunk",
    "pool", "k", "mesh", "sample", "share_prefill"))
def speculative_bulk_caption(
    cfg: LlamaConfig,
    params: dict,
    draft_cfg: LlamaConfig,
    draft_params: dict,
    pspec,
    pparams,
    queue: jax.Array,
    prefix_ids: jax.Array,
    n_real: jax.Array,
    T: int,
    budget: int,
    pad_token_id: int,
    chunk: int,
    pool: int,
    k: int = 4,
    prefill_params: Optional[dict] = None,
    draft_prefill_params: Optional[dict] = None,
    mesh=None,
    sample=None,
    sample_key: Optional[jax.Array] = None,
    req_base=0,
    share_prefill: bool = False,
) -> jax.Array:
    """Speculative continuous batching over a whole caption workload.

    queue [Nq, mm_dim] (Nq a multiple of `chunk`; pad rows arbitrary);
    prefix_ids [chunk, T-1]; n_real: actual request count.  Returns
    [Nq + 1, budget] tokens (row Nq is the padding tenants' trash row;
    callers slice [:n_real]).  Greedy by default — tokens are IDENTICAL
    to the batch captioner's for ANY draft (greedy rejection), so slot
    refill composes freely with speculation.  sample=(temperature, top_k,
    top_p) switches every round to stochastic speculative sampling: all
    draws (proposals, acceptance uniforms, residual/bonus picks) are
    keyed by (req_base + workload row, output age), so the output is
    BIT-IDENTICAL to the batch speculative sampler
    (speculative_sample_bl on the same request ids) regardless of slot
    assignment, admission order or pool size — and therefore identical
    to the PLAIN sampler when draft == target.  The draft consumes the
    same assembled prompt as the target (the production self-draft
    shares the target's embedding space, serve.Captioner(speculative=k))."""
    from dmi_tpu.models import mmmodel
    from dmi_tpu.models import projector as proj

    if k < 1:
        raise ValueError("speculative bulk engine needs k >= 1")
    if budget < 2:
        raise ValueError("speculative bulk engine needs budget >= 2")
    if not 1 <= chunk <= pool:
        # chunk > pool would leave the admission condition (free >= chunk)
        # forever false: an UNTERMINATING on-device while_loop
        raise ValueError(f"chunk must be in [1, pool], got {chunk}")
    if sample is not None:
        if draft_cfg.vocab_size != cfg.vocab_size:
            raise ValueError(
                "speculative sampling compares p/q over one vocab: draft "
                f"vocab {draft_cfg.vocab_size} != target {cfg.vocab_size}"
            )
        if sample_key is None:
            sample_key = jax.random.key(0)
        temperature, top_k, top_p = sample
    Nq, mm_dim = queue.shape
    eos = jnp.asarray(cfg.eos_token_ids)
    ring = budget - 1
    S = T + (k + 1) * ring
    Td, Sd = T, T + (k + 1) * ring
    sliding_on = llama.sliding_effective(cfg, T + budget)
    d_sliding = llama.sliding_effective(draft_cfg, Td + budget)
    pp = params if prefill_params is None else prefill_params
    dpp = draft_params if draft_prefill_params is None else draft_prefill_params

    def kv_shape(c, s):
        return (c.num_hidden_layers, 2, c.num_key_value_heads, s,
                c.head_dim, pool)

    core0 = _SpecCore(
        done=jnp.ones((pool,), bool),  # free slots
        last=jnp.zeros((pool,), jnp.int32),
        out_pos=jnp.zeros((pool,), jnp.int32),
        tokens=jnp.full((pool, budget), pad_token_id, jnp.int32),
        kv=jnp.zeros(kv_shape(cfg, S), cfg.dtype),
        valid=jnp.zeros((S, pool), bool),
        row_pos=jnp.broadcast_to(
            jnp.minimum(jnp.arange(S), T - 1)[:, None].astype(jnp.int32),
            (S, pool),
        ),
    )
    state0 = _SpecPool(
        core=core0,
        kv_d=jnp.zeros(kv_shape(draft_cfg, Sd), draft_cfg.dtype),
        valid_d=jnp.zeros((Sd, pool), bool),
        rp_d=jnp.broadcast_to(
            jnp.minimum(jnp.arange(Sd), Td - 1)[:, None].astype(jnp.int32),
            (Sd, pool),
        ),
        out=jnp.full((Nq + 1, budget), pad_token_id, jnp.int32),
        slot_req=jnp.full((pool,), Nq, jnp.int32),
        qptr=jnp.zeros((), jnp.int32),
        rnd=jnp.zeros((), jnp.int32),
    )
    # pin the dp sharding on the INITIAL carry; GSPMD propagates it
    state0 = _pin_spec_pool(mesh, state0)

    def admit(state):
        core = state.core
        order = jnp.argsort(~core.done)  # free (done) slots first
        slots = order[:chunk]
        # flush outgoing tenants (never-used slots flush pad to trash)
        out = state.out.at[state.slot_req[slots]].set(core.tokens[slots])
        embs = jax.lax.dynamic_slice(queue, (state.qptr, 0), (chunk, mm_dim))
        fresh = (state.qptr + jnp.arange(chunk)) < n_real  # [chunk]
        req = jnp.where(
            fresh, state.qptr + jnp.arange(chunk), Nq
        ).astype(jnp.int32)
        state = _admit_install(
            cfg, draft_cfg, params, draft_params, pspec, pparams, state,
            embs, prefix_ids, slots, fresh, req, T, Td, budget,
            pad_token_id, k, eos, sample, sample_key, req_base,
            prefill_params=prefill_params,
            draft_prefill_params=draft_prefill_params,
            share_prefill=share_prefill,
        )
        return state._replace(out=out, qptr=state.qptr + chunk)

    def cond(state):
        return jnp.any(~state.core.done) | (state.qptr < n_real)

    def body(state):
        free = jnp.sum(state.core.done)
        do_admit = (free >= chunk) & (state.qptr < n_real)
        state = jax.lax.cond(do_admit, admit, lambda s: s, state)
        return _spec_round_step(
            cfg, params, draft_cfg, draft_params, state, T, Td, budget,
            pad_token_id, k, eos, sliding_on, d_sliding, ring, sample,
            sample_key, req_base,
        )

    state = jax.lax.while_loop(cond, body, state0)
    # final flush of every remaining tenant
    return state.out.at[state.slot_req].set(state.core.tokens)


def _spec_round_step(cfg, params, draft_cfg, draft_params, state, T, Td,
                     budget, pad_token_id, k, eos, sliding_on, d_sliding,
                     ring, sample, sample_key, req_base):
    """One engine round (k draft steps + one verify) for the whole pool,
    at the ring row for state.rnd — shared by the on-device bulk loop and
    the host-driven online engine."""
    rt = T + (state.rnd % ring) * (k + 1)
    rd = Td + (state.rnd % ring) * (k + 1)
    core = state.core
    if sample is None:
        props, kv_d, valid_d, rp_d = _draft_steps_greedy(
            draft_cfg, draft_params, core.last, core.done, core.out_pos,
            state.kv_d, state.valid_d, state.rp_d, rd, Td, k, d_sliding,
        )
        core, n_acc = _verify_round(
            cfg, params, core, props, state.rnd, k, T, budget,
            pad_token_id, eos, sliding_on, rt=rt,
        )
    else:
        temperature, top_k, top_p = sample
        req_ids = req_base + state.slot_req
        props, q_w, kv_d, valid_d, rp_d = _draft_steps_sample(
            draft_cfg, draft_params, core.last, core.done, core.out_pos,
            state.kv_d, state.valid_d, state.rp_d, rd, Td, k, d_sliding,
            sample_key, req_ids, budget, temperature, top_k, top_p,
        )
        core, n_acc = _verify_round_sample(
            cfg, params, core, props, q_w, state.rnd, k, T, budget,
            pad_token_id, eos, sliding_on, sample_key, req_ids,
            temperature, top_k, top_p, rt=rt,
        )
    valid_d = _retract_rows(valid_d, rd, k, n_acc)
    return state._replace(
        core=core, kv_d=kv_d, valid_d=valid_d, rp_d=rp_d,
        rnd=state.rnd + 1,
    )


# ---------------------------------------------------------------------------
# Online (host-loop) speculative continuous batching: requests arrive over
# time, so admission/harvest run from the host while the pool's
# draft-verify rounds run in amortized multi-round dispatches — the same
# relay discipline as streaming.StreamingCaptioner.run() (one packed
# occupancy fetch per iteration, token buffer fetched only on completions).
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=(
    "cfg", "draft_cfg", "pspec", "T", "budget", "pad_token_id", "k",
    "sample", "share_prefill"))
def spec_admit_chunk(cfg, params, draft_cfg, draft_params, pspec, pparams,
                     state, embs, prefix_ids, slots, fresh, req, T, budget,
                     pad_token_id, k, prefill_params=None,
                     draft_prefill_params=None, sample=None,
                     sample_key=None, req_base=0, share_prefill=False):
    """Host-loop admission entry: prefill + install one fixed-size chunk
    (rows with fresh=False install nothing — they point at the reserved
    scratch slot)."""
    eos = jnp.asarray(cfg.eos_token_ids)
    return _admit_install(
        cfg, draft_cfg, params, draft_params, pspec, pparams, state, embs,
        prefix_ids, slots, fresh, req, T, T, budget, pad_token_id, k, eos,
        sample, sample_key, req_base, prefill_params=prefill_params,
        draft_prefill_params=draft_prefill_params,
        share_prefill=share_prefill,
    )


@partial(jax.jit, static_argnames=(
    "cfg", "draft_cfg", "T", "budget", "pad_token_id", "k", "n_rounds",
    "sample"))
def spec_rounds(cfg, params, draft_cfg, draft_params, state, T, budget,
                pad_token_id, k, n_rounds, sample=None, sample_key=None,
                req_base=0):
    """n_rounds draft-verify rounds for the whole pool in one dispatch
    (amortizes the ~25 ms relay dispatch like stream_steps' k_steps)."""
    eos = jnp.asarray(cfg.eos_token_ids)
    ring = budget - 1
    sliding_on = llama.sliding_effective(cfg, T + budget)
    d_sliding = llama.sliding_effective(draft_cfg, T + budget)

    def body(_i, st):
        return _spec_round_step(
            cfg, params, draft_cfg, draft_params, st, T, T, budget,
            pad_token_id, k, eos, sliding_on, d_sliding, ring, sample,
            sample_key, req_base,
        )

    return jax.lax.fori_loop(0, n_rounds, body, state)


def _spec_pool_state(cfg, draft_cfg, pool, T, budget, k, pad_token_id,
                     mesh=None) -> _SpecPool:
    """Fresh all-free pool state (out is a 1-row stub: the host loop
    harvests from core.tokens directly; qptr is unused)."""
    ring = budget - 1
    S = T + (k + 1) * ring

    def kv_shape(c):
        return (c.num_hidden_layers, 2, c.num_key_value_heads, S,
                c.head_dim, pool)

    rp = jnp.broadcast_to(
        jnp.minimum(jnp.arange(S), T - 1)[:, None].astype(jnp.int32),
        (S, pool),
    )
    state = _SpecPool(
        core=_SpecCore(
            done=jnp.ones((pool,), bool),
            last=jnp.zeros((pool,), jnp.int32),
            out_pos=jnp.zeros((pool,), jnp.int32),
            tokens=jnp.full((pool, budget), pad_token_id, jnp.int32),
            kv=jnp.zeros(kv_shape(cfg), cfg.dtype),
            valid=jnp.zeros((S, pool), bool),
            row_pos=rp,
        ),
        kv_d=jnp.zeros(kv_shape(draft_cfg), draft_cfg.dtype),
        valid_d=jnp.zeros((S, pool), bool),
        rp_d=rp,
        out=jnp.full((1, budget), pad_token_id, jnp.int32),
        slot_req=jnp.full((pool,), -1, jnp.int32),
        qptr=jnp.zeros((), jnp.int32),
        rnd=jnp.zeros((), jnp.int32),
    )
    return _pin_spec_pool(mesh, state)


class SpeculativeStreamingCaptioner:
    """Online speculative continuous batching over a fixed slot pool.

    The host loop admits arrivals in fixed-size chunks, dispatches
    `rounds` draft-verify rounds at a time, and harvests finished slots —
    greedy tokens are IDENTICAL to the batch captioner's for any draft
    and sampling draws with (request, age) keys (engine-invariant, equal
    to the batch speculative sampler row-for-row).  Prefer run_bulk-style
    speculative_bulk_caption when the whole workload is known upfront
    (one dispatch instead of a host loop)."""

    def __init__(self, cfg: LlamaConfig, llm_params: dict,
                 draft_cfg: LlamaConfig, draft_params: dict, pspec, pparams,
                 prefix_ids, budget: int, pad_token_id: int, pool: int = 64,
                 admit: int = 16, rounds: int = 2, k: int = 4,
                 prefill_params: Optional[dict] = None,
                 draft_prefill_params: Optional[dict] = None, mesh=None,
                 temperature: Optional[float] = None, top_k: int = 0,
                 top_p: float = 1.0,
                 sample_key: Optional[jax.Array] = None, req_base: int = 0,
                 share_prefill: bool = False):
        import numpy as np

        if budget < 2:
            raise ValueError("speculative engine needs budget >= 2")
        if k < 1:
            raise ValueError("speculative engine needs k >= 1")
        if pool < 2:
            raise ValueError("pool must be >= 2 (one slot is scratch)")
        if not 1 <= admit <= pool - 1:
            # the LAST slot is reserved scratch for padded admission rows
            # (duplicate scatter indices need a never-live target)
            raise ValueError(f"admit must be in [1, pool-1], got {admit}")
        self.cfg, self.params = cfg, llm_params
        self.draft_cfg, self.draft_params = draft_cfg, draft_params
        self.pspec, self.pparams = pspec, pparams
        self.prefix = jnp.asarray(prefix_ids, jnp.int32)
        self.T = 1 + int(self.prefix.shape[0])
        self.budget, self.pad = int(budget), int(pad_token_id)
        self.pool, self.admit, self.rounds = int(pool), int(admit), int(rounds)
        self.k = int(k)
        self.prefill_params = prefill_params
        self.draft_prefill_params = draft_prefill_params
        self.mesh = mesh
        self.sample = (
            (float(temperature), int(top_k), float(top_p))
            if temperature is not None else None
        )
        self.sample_key = (
            sample_key if sample_key is not None else jax.random.key(0)
        )
        self.req_base = int(req_base)
        self.share_prefill = bool(share_prefill)
        self.scratch = self.pool - 1
        self.state = None
        self._occupied = np.zeros(self.pool, bool)
        self._slot_req = np.full(self.pool, -1, np.int64)
        self.dispatches = 0

    def run(self, embeddings) -> "np.ndarray":
        import numpy as np

        N = embeddings.shape[0]
        if self.state is None:
            self.state = _spec_pool_state(
                self.cfg, self.draft_cfg, self.pool, self.T, self.budget,
                self.k, self.pad, mesh=self.mesh,
            )
        out = np.full((N, self.budget), self.pad, np.int32)
        next_req = 0
        prefix_chunk = jnp.tile(self.prefix[None, :], (self.admit, 1))

        def fetch_and_harvest():
            nonlocal out
            core = self.state.core
            packed = np.asarray(jnp.concatenate(
                [core.done.astype(jnp.int32), core.out_pos]
            ))  # one transfer
            done = packed[: self.pool].astype(bool)
            n = packed[self.pool:]
            finished = self._occupied & done & (n > 0)
            finished[self.scratch] = False
            if finished.any():
                toks = np.asarray(core.tokens)
                for b in np.nonzero(finished)[0]:
                    out[self._slot_req[b]] = toks[b]
                    self._occupied[b] = False
                    self._slot_req[b] = -1

        while next_req < N or self._occupied[: self.scratch].any():
            while next_req < N:
                free = np.nonzero(~self._occupied[: self.scratch])[0][
                    : self.admit]
                take = min(len(free), N - next_req)
                if take == 0:
                    break
                slots = np.full(self.admit, self.scratch, np.int32)
                slots[:take] = free[:take]
                fresh = np.zeros(self.admit, bool)
                fresh[:take] = True
                chunk = np.zeros((self.admit, embeddings.shape[1]),
                                 np.float32)
                chunk[:take] = embeddings[next_req: next_req + take]
                req = np.full(self.admit, -1, np.int32)
                req[:take] = np.arange(next_req, next_req + take)
                self.state = spec_admit_chunk(
                    self.cfg, self.params, self.draft_cfg, self.draft_params,
                    self.pspec, self.pparams, self.state, jnp.asarray(chunk),
                    prefix_chunk, jnp.asarray(slots), jnp.asarray(fresh),
                    jnp.asarray(req), self.T, self.budget, self.pad, self.k,
                    prefill_params=self.prefill_params,
                    draft_prefill_params=self.draft_prefill_params,
                    sample=self.sample, sample_key=self.sample_key,
                    req_base=self.req_base,
                    share_prefill=self.share_prefill,
                )
                self.dispatches += 1
                self._occupied[free[:take]] = True
                self._slot_req[free[:take]] = np.arange(
                    next_req, next_req + take
                )
                next_req += take
            if self._occupied[: self.scratch].any():
                self.state = spec_rounds(
                    self.cfg, self.params, self.draft_cfg, self.draft_params,
                    self.state, self.T, self.budget, self.pad, self.k,
                    self.rounds, sample=self.sample,
                    sample_key=self.sample_key, req_base=self.req_base,
                )
                self.dispatches += 1
            fetch_and_harvest()
        return out
