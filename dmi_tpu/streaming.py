"""Continuous-batching (slot-based) caption serving engine.

The batch captioner (serve.Captioner) decodes fixed batches: a sequence
that emits EOS at token 3 still occupies its lane until the whole batch
exhausts the budget.  Under real workloads (caption lengths well below
the per-dataset budget) that idles a large fraction of the chip.  This
engine keeps a fixed pool of B slots and REFILLS finished slots with new
requests while the others keep decoding — vLLM-style continuous
batching, shaped for XLA:

  * all shapes static: slot pool [B], admission chunks of fixed size M,
    K decode steps per dispatch (host harvest/admit between dispatches —
    K amortizes the ~25 ms relay dispatch overhead; on directly-attached
    TPU K can be 1)
  * every prompt is the same length T (soft token + chat prefix), so
    slots differ only in decode AGE: per-slot positions enter as a
    gathered rope table [hd, B] and a [S, B] validity bias
  * cache writes are RING-UNIFORM: attention is permutation-invariant
    over keys (rope bakes the absolute position into K before caching),
    so every slot writes its step's K/V at the SAME shared cursor row
    T + (global_step mod budget) — one cheap dynamic_update_slice per
    layer exactly like the batch loop, no scatter.  A per-slot [S, B]
    validity mask (rows written during this slot's tenure) doubles as
    the causal mask; a slot lives at most `budget` steps, so the cursor
    never wraps onto a tenant's own rows.  (A first implementation
    scattered at per-slot positions; on chip the layer slice/set around
    the scatter copied ~1.3 GB/step of cache and ran 2.8x slower than
    the batch loop.)
  * per-slot early-exit: a slot is live until EOS or budget; dead slots
    compute masked pad work until harvested (lanes are not resized)
  * sliding-window families (gemma-2): ring rows don't map to positions,
    so SlotState.row_pos stamps each written row with its absolute
    position and the per-layer lookback mask is rebuilt from it —
    token-exact vs the batch path even when prompt+budget > window
  * multi-chip: constrain_state shards the pool over a mesh's 'data'
    axis (weights over 'model' via parallel.shard_llm_params) — dp x tp
    serving on the same (data, model) mesh as the batch decode
  * sampling (temperature/top-k) with REQUEST-INDEXED rng: every token
    is drawn with fold_in(key, request*budget + age), so outputs are a
    pure function of (key, request) — reproducible under continuous
    batching regardless of slot assignment, admission order or pool
    size, and bit-identical to the batch oracle mmmodel.caption_sample

Decode math is shared with dmi_tpu/models/decode.py (same _mm_bl /
_rms_norm_bl / _decode_attention_bl contract, f32-accumulated attention)
— greedy tokens are IDENTICAL to serve.Captioner's for the same weights,
pinned by tests/test_streaming.py.

Reference replaced: the reference has no serving engine at all (captions
are produced by fixed eval batches, dmi/model/mmmodel.py:149-169); this
is framework surface for production deployment.
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from dmi_tpu.models import decode as dec
from dmi_tpu.models import llama
from dmi_tpu.models import projector as proj
from dmi_tpu.models.llama import LlamaConfig


def bucket_queue_len(n: int, chunk: int) -> int:
    """Padded queue length for on-device bulk workloads: chunks rounded up
    to powers of two so the jitted engine compiles O(log N) variants, not
    one per workload size (relay compiles cost 4-480 s and would dwarf the
    decode).  Shared by run_bulk and the speculative bulk path."""
    chunks = max(1, -(-n // chunk))
    return chunk * (1 << (chunks - 1).bit_length() if chunks > 1 else 1)


class SlotState(NamedTuple):
    """Device-resident slot pool (all arrays fixed-shape)."""

    kv: jax.Array        # [L, 2, nkv, S, hd, B]; S = T + budget ring rows
    valid: jax.Array     # [S, B] bool: rows holding THIS tenant's entries
    cursor: jax.Array    # [] i32: next generated-region ring row offset
    last: jax.Array      # [B] i32: most recent token (KV not yet written)
    n: jax.Array         # [B] i32: tokens generated so far
    live: jax.Array      # [B] bool
    tokens: jax.Array    # [B, budget] i32 output buffer (pad-filled)
    req: jax.Array       # [B] i32: tenant's REQUEST id (sampling rng is
    #   keyed by (request, age) — dec._req_keys — so drawn tokens are
    #   independent of slot assignment; -1 on never-used slots)
    row_pos: jax.Array   # [S, B] i32: ABSOLUTE position held by each row
    #   (per slot).  Prompt rows are always 0..T-1 (uniform prompts, set
    #   once at init); generated ring rows are stamped at write time.
    #   Read only by sliding-window models — ring rows don't correspond
    #   to positions, so the lookback mask (q_pos - k_pos < window) needs
    #   this row->position map.  Invalid rows are masked before it's read.


def init_state(cfg: LlamaConfig, pool: int, prompt_len: int, budget: int,
               pad_token_id: int) -> SlotState:
    total = prompt_len + budget
    if cfg.kv_lora_rank is not None:
        # deepseek-v2 MLA: compressed-latent rows (dec._mla_attn_bl) —
        # one [kv latent | roped shared key] row per token, all heads
        kv = jnp.zeros(
            (cfg.num_hidden_layers, 1, 1, total,
             cfg.kv_lora_rank + cfg.qk_rope_head_dim, pool),
            cfg.dtype,
        )
    else:
        kv = jnp.zeros(
            (cfg.num_hidden_layers, 2, cfg.num_key_value_heads, total,
             cfg.head_dim, pool),
            cfg.dtype,
        )
    # prompt rows hold positions 0..T-1 for EVERY tenant (uniform-length
    # prompts); the generated-region init value is arbitrary (rows are
    # invalid until their first write stamps them)
    row_pos = jnp.broadcast_to(
        jnp.minimum(jnp.arange(total), prompt_len - 1)[:, None].astype(jnp.int32),
        (total, pool),
    )
    return SlotState(
        kv=kv,
        valid=jnp.zeros((total, pool), bool),
        cursor=jnp.asarray(0, jnp.int32),
        last=jnp.zeros((pool,), jnp.int32),
        n=jnp.zeros((pool,), jnp.int32),
        live=jnp.zeros((pool,), bool),
        tokens=jnp.full((pool, budget), pad_token_id, jnp.int32),
        req=jnp.full((pool,), -1, jnp.int32),
        row_pos=row_pos,
    )


def constrain_state(state: SlotState, mesh) -> SlotState:
    """Pin the slot pool's sharding on a (data, model) mesh: every per-slot
    axis (the LAST dim of kv/valid/row_pos, the batch dims of the small
    bookkeeping arrays) shards over 'data'; the scalar cursor replicates.
    With the LLM weights sharded over 'model' (parallel.shard_llm_params),
    the engine then runs dp x tp exactly like the batch decode.  No-op for
    mesh=None.  Works both eagerly (device_put, the host-loop engine) and
    inside jit (with_sharding_constraint, bulk_caption)."""
    if mesh is None:
        return state
    from jax.sharding import NamedSharding, PartitionSpec as P

    def pin(x, spec):
        s = NamedSharding(mesh, spec)
        if isinstance(x, jax.core.Tracer):
            return jax.lax.with_sharding_constraint(x, s)
        return jax.device_put(x, s)

    return SlotState(
        kv=pin(state.kv, P(None, None, None, None, None, "data")),
        valid=pin(state.valid, P(None, "data")),
        cursor=pin(state.cursor, P()),
        last=pin(state.last, P("data")),
        n=pin(state.n, P("data")),
        live=pin(state.live, P("data")),
        tokens=pin(state.tokens, P("data", None)),
        req=pin(state.req, P("data")),
        row_pos=pin(state.row_pos, P(None, "data")),
    )


def _stream_one_step(cfg, params, state: SlotState, T: int, budget: int,
                     pad_token_id: int, eos: jax.Array, sample=None,
                     sample_key=None) -> SlotState:
    """One decode step for every live slot (dead slots do masked pad work).

    Mirrors the batch loop's semantics: the step writes the KV of token
    n-1 (rope'd with its ABSOLUTE position T+n-1) at the shared ring row
    T+cursor, computes token n, appends it (EOS itself is written before
    the slot goes dead — HF semantics).  The layer stack and vocab head
    are dec._decode_step_bl itself (per-slot rope tables + the ring
    write_row + an [S, B] validity bias are passed in), so the math can
    never drift from the batch path."""
    B = state.last.shape[0]

    h = llama.scale_embeds(
        cfg, llama.embed_tokens(cfg, params, state.last).T.astype(cfg.dtype)
    )  # [H, B]
    # per-slot absolute position (rope only; storage row is the ring row)
    pos = T + jnp.clip(state.n - 1, 0, budget - 1)  # [B]
    cos, sin = llama.rope_tables(cfg, pos)  # [B, hd]
    rope_local = None
    if llama.rope_dual(cfg):  # gemma-3: sliding layers rope locally
        cos_l, sin_l = llama.rope_tables(cfg, pos, local=True)
        rope_local = (cos_l.T, sin_l.T)
    row = T + state.cursor  # shared write row
    # the row written this step is attendable by its own (live) slot
    valid = jax.lax.dynamic_update_slice(
        state.valid, state.live[None, :], (row, 0)
    )
    bias = jnp.where(valid, 0.0, jnp.finfo(jnp.float32).min)  # [S, B]

    row_pos = state.row_pos
    bias_sw = None
    if llama.sliding_effective(cfg, T + budget):  # trace-time static
        # stamp the written row with its absolute position (dead slots
        # stamp garbage under an invalid row — never read), then build the
        # lookback mask exactly like the batch loop's
        # (key_pos <= pos) & (pos - key_pos < window), with `valid`
        # standing in for causality and row_pos for key_pos
        row_pos = jax.lax.dynamic_update_slice(
            row_pos, pos[None, :].astype(jnp.int32), (row, 0)
        )
        in_win = (pos[None, :] - row_pos) < cfg.sliding_window
        bias_sw = jnp.where(valid & in_win, 0.0, jnp.finfo(jnp.float32).min)

    logits, kv = dec._decode_step_bl(
        cfg, params, h, state.kv, pos, bias,
        rope=(cos.T, sin.T), write_row=row, bias_sw=bias_sw,
        rope_local=rope_local,
    )

    batch_iota = jnp.arange(B)
    if sample is None:
        tok = jnp.argmax(logits, axis=0).astype(jnp.int32)
    else:
        # request-indexed sampling: this step draws each live slot's token
        # number `n` (its age) with fold_in(key, req*budget + n) — the
        # exact keys the batch oracle (dec.sample_generate_bl) uses
        temperature, top_k, top_p = sample
        keys = dec._req_keys(sample_key, state.req, budget, state.n)
        # _decode_step_bl skips final_logit_softcap (argmax-invariant for
        # the greedy branch above); sampling draws from the distribution,
        # so cap like HF before the warpers (identity for non-gemma-2).
        # Admission draws (run_bulk tok0) use prefill logits, already
        # capped — don't cap those again.
        tok = dec._sample_pick_bl(
            llama.final_softcap(cfg, logits), keys, temperature, top_k, top_p
        )
    tok = jnp.where(state.live, tok, pad_token_id)
    idx = jnp.clip(state.n, 0, budget - 1)
    # fully-decoded (n == budget) slots must not overwrite their last real
    # token with pad: rewrite the current value instead
    cur = state.tokens[batch_iota, idx]
    val = jnp.where(state.n < budget, tok, cur)
    tokens = state.tokens.at[batch_iota, idx].set(val)
    n = jnp.where(state.live, state.n + 1, state.n)
    live = state.live & ~jnp.isin(tok, eos) & (n < budget)
    last = jnp.where(state.live, tok, state.last)
    cursor = jnp.asarray((state.cursor + 1) % budget, jnp.int32)
    return SlotState(kv=kv, valid=valid, cursor=cursor, last=last, n=n,
                     live=live, tokens=tokens, req=state.req, row_pos=row_pos)


@partial(jax.jit, static_argnames=("cfg", "T", "budget", "pad_token_id",
                                   "k_steps", "sample"))
def stream_steps(cfg: LlamaConfig, params: dict, state: SlotState, T: int,
                 budget: int, pad_token_id: int, k_steps: int, sample=None,
                 sample_key=None) -> SlotState:
    """K decode steps for the whole pool in one dispatch."""
    eos = jnp.asarray(cfg.eos_token_ids)

    def body(i, st):
        return _stream_one_step(cfg, params, st, T, budget, pad_token_id,
                                eos, sample, sample_key)

    return jax.lax.fori_loop(0, k_steps, body, state)


def _admit_core(cfg, params, prefill_params, pspec, pparams, state, embs,
                prefix_ids, slots, valid, T, budget, pad_token_id,
                req=None, sample=None, sample_key=None):
    """Prefill a fixed-size chunk of new prompts and install them into
    `slots` (invalid rows — final-chunk padding — install dead slots).

    embs [M, mm_dim]; prefix_ids [M, T-1]; slots [M] i32; valid [M] bool;
    req [M] i32 request ids (None -> -1; required when sampling).
    """
    from dmi_tpu.models import mmmodel

    pp = params if prefill_params is None else prefill_params
    eos = jnp.asarray(cfg.eos_token_ids)
    soft = proj.apply(pspec, pparams, embs, train=False)
    inputs = mmmodel.assemble_prompt(cfg, pp, soft, prefix_ids)  # [M, T, H]
    M = inputs.shape[0]
    if cfg.kv_lora_rank is not None:
        # deepseek-v2: compressed-latent rows, already batch-last
        logits0, chunk_kv = dec._mla_prefill_compressed(cfg, pp, inputs, T)
    else:
        caches = dec.init_cache(cfg, M, T)
        logits0, caches = dec.prefill(cfg, pp, inputs, caches)
    if req is None:
        req = jnp.full((M,), -1, jnp.int32)
    if sample is None:
        tok0 = jnp.argmax(logits0, axis=-1).astype(jnp.int32)
    else:
        # token 0 (age 0) draws with the same (request, age) keys the
        # batch oracle uses
        temperature, top_k, top_p = sample
        keys0 = dec._req_keys(sample_key, req, budget, 0)
        tok0 = dec._sample_pick_bl(logits0.T, keys0, temperature, top_k, top_p)

    if cfg.kv_lora_rank is None:
        # [L, M, nkv, T, hd] x2 -> [L, 2, nkv, T, hd, M]
        chunk_kv = jnp.stack(
            [caches[0].transpose(0, 2, 3, 4, 1),
             caches[1].transpose(0, 2, 3, 4, 1)],
            axis=1,
        )
    kv = state.kv.at[:, :, :, :T, :, slots].set(chunk_kv)
    pool, budget_ = state.tokens.shape
    fresh_row = jnp.full((M, budget_), pad_token_id, jnp.int32)
    tokens = state.tokens.at[slots].set(
        jnp.where(valid[:, None], fresh_row.at[:, 0].set(tok0), state.tokens[slots])
    )
    live0 = valid & ~jnp.isin(tok0, eos) & (budget > 1)
    # new tenants: prompt rows valid, generated ring region invalidated
    # (clears the previous occupant's entries)
    S_total = state.valid.shape[0]
    col = jnp.concatenate(
        [jnp.ones((T, M), bool), jnp.zeros((S_total - T, M), bool)], axis=0
    )
    vcols = jnp.where(valid[None, :], col, state.valid[:, slots])
    new_valid = state.valid.at[:, slots].set(vcols)
    return SlotState(
        kv=kv,
        valid=new_valid,
        # row_pos untouched: prompt rows are position-identical for every
        # tenant and generated rows are stamped (under `valid`) at write
        row_pos=state.row_pos,
        cursor=state.cursor,
        last=state.last.at[slots].set(jnp.where(valid, tok0, state.last[slots])),
        n=state.n.at[slots].set(jnp.where(valid, 1, state.n[slots])),
        live=state.live.at[slots].set(live0),
        tokens=tokens,
        req=state.req.at[slots].set(jnp.where(valid, req, state.req[slots])),
    )


@partial(jax.jit,
         static_argnames=("cfg", "pspec", "T", "budget", "pad_token_id",
                          "sample"))
def admit_chunk(cfg, params, prefill_params, pspec, pparams, state, embs,
                prefix_ids, slots, valid, T, budget, pad_token_id,
                req=None, sample=None, sample_key=None):
    """Host-loop entry for _admit_core (see StreamingCaptioner.run)."""
    return _admit_core(cfg, params, prefill_params, pspec, pparams, state,
                       embs, prefix_ids, slots, valid, T, budget, pad_token_id,
                       req, sample, sample_key)


@partial(jax.jit, static_argnames=("cfg", "pspec", "T", "budget",
                                   "pad_token_id", "chunk", "pool", "mesh",
                                   "sample"))
def bulk_caption(cfg, params, prefill_params, pspec, pparams, queue,
                 prefix_ids, n_real, T, budget, pad_token_id, chunk, pool,
                 mesh=None, sample=None, sample_key=None, req_base=0):
    """FULLY ON-DEVICE continuous batching for offline bulk captioning —
    the reference's actual serving shape (caption a whole eval split).

    One dispatch processes the entire queue: a lax.while_loop steps every
    slot; whenever >= `chunk` slots are free and requests remain, a
    lax.cond branch flushes the outgoing tenants' tokens to the output
    buffer, prefills the next chunk, and installs it — no host round-trip
    anywhere.  On the TPU relay (~25 ms per dispatch/fetch) the host-loop
    engine pays hundreds of round-trips per workload; this pays ONE.

    queue [Nq, mm_dim] (Nq a multiple of `chunk`; pad rows arbitrary),
    n_real: actual request count; prefix_ids [chunk, T-1].
    Returns [Nq + 1, budget] tokens — row Nq is a trash row for padding
    tenants; callers slice [:n_real].
    """
    Nq, mm_dim = queue.shape
    eos = jnp.asarray(cfg.eos_token_ids)
    # pin the pool's dp sharding on the INITIAL carry: GSPMD propagates it
    # through the while_loop, so the whole engine runs sharded
    state = constrain_state(init_state(cfg, pool, T, budget, pad_token_id), mesh)
    out = jnp.full((Nq + 1, budget), pad_token_id, jnp.int32)
    slot_req = jnp.full((pool,), Nq, jnp.int32)  # trash row until assigned

    def admit(carry):
        state, out, slot_req, qptr = carry
        order = jnp.argsort(state.live)  # stable: dead slots first
        slots = order[:chunk]
        # flush outgoing tenants (never-used slots flush garbage to trash)
        out2 = out.at[slot_req[slots]].set(state.tokens[slots])
        embs = jax.lax.dynamic_slice(queue, (qptr, 0), (chunk, mm_dim))
        valid = (qptr + jnp.arange(chunk)) < n_real
        req = jnp.where(valid, qptr + jnp.arange(chunk), Nq).astype(jnp.int32)
        st2 = _admit_core(cfg, params, prefill_params, pspec, pparams, state,
                          embs, prefix_ids, slots, valid, T, budget,
                          pad_token_id, req_base + req, sample, sample_key)
        slot_req2 = slot_req.at[slots].set(req)
        return st2, out2, slot_req2, qptr + chunk

    def cond(carry):
        state, _, _, qptr = carry
        return jnp.any(state.live) | (qptr < n_real)

    def body(carry):
        state, out, slot_req, qptr = carry
        free = jnp.sum(~state.live)
        do_admit = (free >= chunk) & (qptr < n_real)
        state, out, slot_req, qptr = jax.lax.cond(
            do_admit, admit, lambda c: c, (state, out, slot_req, qptr)
        )
        state = _stream_one_step(cfg, params, state, T, budget,
                                 pad_token_id, eos, sample, sample_key)
        return state, out, slot_req, qptr

    state, out, slot_req, qptr = jax.lax.while_loop(
        cond, body, (state, out, slot_req, 0)
    )
    # final flush of every remaining tenant
    out = out.at[slot_req].set(state.tokens)
    return out


class StreamingCaptioner:
    """Continuous-batching greedy captioner over a fixed slot pool.

    Produces tokens identical to serve.Captioner's batch path for the
    same weights (greedy decode is deterministic; the slot engine runs
    the same math with per-slot positions)."""

    def __init__(self, cfg: LlamaConfig, llm_params: dict, pspec, pparams,
                 prefix_ids: np.ndarray, budget: int, pad_token_id: int,
                 pool: int = 256, admit: int = 64, k_steps: int = 8,
                 prefill_params: Optional[dict] = None, mesh=None,
                 temperature: Optional[float] = None, top_k: int = 0,
                 top_p: float = 1.0,
                 sample_key: Optional[jax.Array] = None, req_base: int = 0):
        # mesh: optional (data, model) jax.sharding.Mesh — the slot pool
        # shards over 'data' (constrain_state); pass weights already
        # sharded over 'model' for full dp x tp serving
        self.mesh = mesh
        # temperature=None -> greedy (the reference's only mode).  A float
        # enables request-indexed sampling: tokens are a pure function of
        # (sample_key, request index, age) — bit-identical to
        # mmmodel.caption_sample on the same requests, regardless of slot
        # assignment / admission order / pool size
        self.sample = (
            (float(temperature), int(top_k), float(top_p))
            if temperature is not None else None
        )
        self.sample_key = (
            sample_key if sample_key is not None else jax.random.key(0)
        )
        # request ids used for sampling keys = req_base + workload row —
        # lets a caller splitting one workload across engines keep ids global
        self.req_base = int(req_base)
        self.cfg = cfg
        self.params = llm_params
        self.prefill_params = prefill_params
        self.pspec, self.pparams = pspec, pparams
        self.prefix = jnp.asarray(prefix_ids, jnp.int32)  # [P]
        self.T = 1 + int(self.prefix.shape[0])
        self.budget = int(budget)
        self.pad = int(pad_token_id)
        self.pool, self.admit, self.k = int(pool), int(admit), int(k_steps)
        # the LAST slot is a reserved scratch target: a final admission
        # chunk with fewer requests than `admit` pads its slot vector, and
        # duplicate scatter indices have undefined write order — padding
        # rows must never alias a REAL slot, so they all point at the
        # scratch slot (its garbage is never live, never harvested)
        self.scratch = self.pool - 1
        if self.pool < 2:
            raise ValueError("pool must be >= 2 (one slot is scratch)")
        if not 1 <= self.admit <= self.pool:
            # admit > pool would leave bulk_caption's admission condition
            # (free >= chunk) forever false: an UNTERMINATING on-device
            # while_loop, which wedges the TPU relay for minutes
            raise ValueError(f"admit must be in [1, pool], got {self.admit}")
        # the slot-pool device state is only used by the host-loop run();
        # run_bulk builds its own state inside the jitted program — don't
        # allocate ~hundreds of MB of kv cache it would never touch
        self.state = None
        self._occupied = np.zeros(self.pool, bool)
        self._slot_req = np.full(self.pool, -1, np.int64)
        self.dispatches = 0

    def run(self, embeddings: np.ndarray) -> np.ndarray:
        """Caption every row; returns [N, budget] int32 token ids (the
        same rows serve.Captioner.caption would detokenize).

        Host loop discipline for the TPU relay (~25 ms per dispatch/fetch
        round-trip): ONE packed [live, n] fetch per iteration, the token
        buffer fetched only when some slot actually finished, admissions
        driven off host-tracked occupancy."""
        N = embeddings.shape[0]
        if self.state is None:
            self.state = constrain_state(
                init_state(self.cfg, self.pool, self.T, self.budget, self.pad),
                self.mesh,
            )
        out = np.full((N, self.budget), self.pad, np.int32)
        next_req = 0
        prefix_chunk = jnp.tile(self.prefix[None, :], (self.admit, 1))

        def fetch_and_harvest():
            nonlocal out
            packed = np.asarray(
                jnp.concatenate(
                    [self.state.live.astype(jnp.int32), self.state.n]
                )
            )  # one transfer
            live = packed[: self.pool].astype(bool)
            n = packed[self.pool :]
            done = self._occupied & ~live & (n > 0)
            done[self.scratch] = False
            if done.any():
                toks = np.asarray(self.state.tokens)
                for b in np.nonzero(done)[0]:
                    out[self._slot_req[b]] = toks[b]
                    self._occupied[b] = False
                    self._slot_req[b] = -1
            return live

        live = np.zeros(self.pool, bool)
        while next_req < N or self._occupied[: self.scratch].any():
            # admit in fixed-size chunks while there's room and demand
            admitted = False
            while next_req < N:
                free = np.nonzero(~self._occupied[: self.scratch])[0][: self.admit]
                take = min(len(free), N - next_req)
                if take == 0:
                    break
                slots = np.full(self.admit, self.scratch, np.int32)
                slots[:take] = free[:take]
                valid = np.zeros(self.admit, bool)
                valid[:take] = True
                chunk = np.zeros((self.admit, embeddings.shape[1]), np.float32)
                chunk[:take] = embeddings[next_req : next_req + take]
                req = np.full(self.admit, -1, np.int32)
                req[:take] = self.req_base + np.arange(next_req, next_req + take)
                self.state = admit_chunk(
                    self.cfg, self.params, self.prefill_params, self.pspec,
                    self.pparams, self.state, jnp.asarray(chunk), prefix_chunk,
                    jnp.asarray(slots), jnp.asarray(valid),
                    self.T, self.budget, self.pad,
                    req=jnp.asarray(req), sample=self.sample,
                    sample_key=self.sample_key,
                )
                self.dispatches += 1
                self._occupied[free[:take]] = True
                self._slot_req[free[:take]] = np.arange(next_req, next_req + take)
                next_req += take
                admitted = True
            if self._occupied[: self.scratch].any() and (admitted or live.any()):
                self.state = stream_steps(
                    self.cfg, self.params, self.state, self.T, self.budget,
                    self.pad, self.k, sample=self.sample,
                    sample_key=self.sample_key,
                )
                self.dispatches += 1
            live = fetch_and_harvest()
        return out

    def run_bulk(self, embeddings: np.ndarray) -> np.ndarray:
        """Offline bulk captioning: the ENTIRE workload in one device
        dispatch (on-device admission; see bulk_caption).  Prefer this
        over run() whenever all inputs are known upfront."""
        N = embeddings.shape[0]
        if N == 0:
            return np.zeros((0, self.budget), np.int32)
        M = self.admit
        Nq = bucket_queue_len(N, M)
        q = np.zeros((Nq, embeddings.shape[1]), np.float32)
        q[:N] = embeddings
        prefix_chunk = jnp.tile(self.prefix[None, :], (M, 1))
        out = bulk_caption(
            self.cfg, self.params, self.prefill_params, self.pspec,
            self.pparams, jnp.asarray(q), prefix_chunk,
            jnp.asarray(N, jnp.int32), self.T, self.budget, self.pad,
            M, self.pool, mesh=self.mesh, sample=self.sample,
            sample_key=self.sample_key,
            req_base=jnp.asarray(self.req_base, jnp.int32),
        )
        self.dispatches += 1
        return np.asarray(out)[:N]
