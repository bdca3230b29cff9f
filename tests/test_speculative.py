"""Speculative (draft-verify) decode: token-exactness vs the greedy
batch-last engine for ANY draft — the greedy-rejection invariant — plus
round-count accounting (what acceptance actually buys).

The reference decodes greedily with no speculation
(dmi/model/mmmodel.py:149-169); dmi_tpu/models/speculative.py is serving
surface whose only correctness contract is "identical tokens to
dec.greedy_generate_bl, fewer target forwards".
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dmi_tpu.models import decode as dec
from dmi_tpu.models import llama
from dmi_tpu.models.speculative import (
    speculative_generate_bl,
    speculative_generate_oracle_bl,
)

PAD = 0


def make_model(seed=0, eos=(5,), vocab=64, hidden=32, layers=2, heads=4,
               kv=2, inter=64, cfg_fn=llama.tiny_config, **extra):
    cfg = cfg_fn(vocab_size=vocab, hidden_size=hidden, n_layers=layers,
                 n_heads=heads, n_kv=kv, intermediate=inter, **extra)
    cfg = dataclasses.replace(cfg, eos_token_ids=tuple(eos))
    params = llama.init(jax.random.key(seed), cfg)
    return cfg, params


def prompt_embeds(cfg, B, T, seed=0):
    scale = 1.0 / np.sqrt(cfg.hidden_size)
    return scale * jax.random.normal(
        jax.random.key(seed), (B, T, cfg.hidden_size), jnp.float32
    )


def greedy(cfg, params, embeds, budget):
    return np.asarray(
        dec.greedy_generate_bl(cfg, params, embeds, budget, PAD)
    )


@pytest.mark.parametrize("k,budget,wrong_period", [
    (3, 7, 0),    # perfect oracle
    (3, 7, 1),    # every proposal wrong
    (2, 8, 3),    # 2/3 acceptance
    (4, 5, 2),
    (1, 6, 0),
])
def test_oracle_draft_token_exact(k, budget, wrong_period):
    """Oracle drafts of any quality produce exactly the greedy tokens."""
    cfg, params = make_model(seed=1)
    embeds = prompt_embeds(cfg, B=4, T=5, seed=2)
    want = greedy(cfg, params, embeds, budget)
    got, rounds = speculative_generate_oracle_bl(
        cfg, params, embeds, jnp.asarray(want), budget, PAD, k=k,
        wrong_period=wrong_period,
    )
    np.testing.assert_array_equal(np.asarray(got), want)
    assert int(rounds) <= budget - 1


def test_oracle_round_accounting():
    """With EOS disabled: a perfect oracle needs ceil((budget-1)/(k+1))
    verify rounds; an always-wrong oracle needs budget-1 (one emitted
    token per round) — the quantity acceptance buys down."""
    cfg, params = make_model(seed=3, eos=())
    budget, k = 9, 3
    embeds = prompt_embeds(cfg, B=3, T=4, seed=4)
    want = greedy(cfg, params, embeds, budget)

    got, rounds = speculative_generate_oracle_bl(
        cfg, params, embeds, jnp.asarray(want), budget, PAD, k=k,
        wrong_period=0,
    )
    np.testing.assert_array_equal(np.asarray(got), want)
    assert int(rounds) == -(-(budget - 1) // (k + 1))  # 2

    got, rounds = speculative_generate_oracle_bl(
        cfg, params, embeds, jnp.asarray(want), budget, PAD, k=k,
        wrong_period=1,
    )
    np.testing.assert_array_equal(np.asarray(got), want)
    assert int(rounds) == budget - 1


def test_oracle_garbage_stream():
    """A garbage oracle (tokens unrelated to the model) still yields the
    greedy output — only the round count suffers."""
    cfg, params = make_model(seed=5)
    budget, k = 6, 2
    embeds = prompt_embeds(cfg, B=4, T=3, seed=6)
    want = greedy(cfg, params, embeds, budget)
    garbage = jax.random.randint(
        jax.random.key(7), (4, budget), 0, cfg.vocab_size, jnp.int32
    )
    got, _ = speculative_generate_oracle_bl(
        cfg, params, embeds, garbage, budget, PAD, k=k,
    )
    np.testing.assert_array_equal(np.asarray(got), want)


def _sim_forced_rounds(budget, k, wp):
    """Closed-form round count for the forced harness: proposals at
    absolute output index idx are corrupted iff wp > 0 and idx % wp == 0;
    a round emits (leading-clean count + 1) tokens."""
    out_pos, rounds = 1, 0
    while out_pos < budget:
        n_acc = 0
        for i in range(k):
            if wp > 0 and (out_pos + i) % wp == 0:
                break
            n_acc += 1
        out_pos = min(out_pos + n_acc + 1, budget)
        rounds += 1
    return rounds


@pytest.mark.parametrize("k,budget,wp", [
    (4, 9, 0),   # full acceptance: ceil(8/5) = 2 rounds
    (4, 9, 1),   # all-reject: 8 rounds
    (3, 10, 3),  # mixed
    (2, 8, 5),
])
def test_forced_harness_rounds_and_chain(k, budget, wp):
    """The controlled-acceptance harness runs BOTH real forwards but
    emits the deterministic chain with exactly the closed-form round
    count — acceptance is set by wrong_period, cascade-free."""
    from dmi_tpu.models.speculative import (
        _chain_next,
        speculative_generate_forced_bl,
    )

    eos = (5, 7)
    cfg, params = make_model(seed=11, eos=eos)
    dcfg, dparams = make_model(seed=12, eos=eos, hidden=16, layers=1,
                               heads=2, kv=1, inter=32)
    B, T = 3, 4
    embeds = prompt_embeds(cfg, B, T, seed=13)
    dembeds = prompt_embeds(dcfg, B, T, seed=14)

    got, rounds = speculative_generate_forced_bl(
        cfg, params, dcfg, dparams, embeds, dembeds, budget, PAD,
        jnp.int32(wp), k=k,
    )
    got = np.asarray(got)
    # emitted stream is the pure chain from token0, never an EOS id
    assert not np.isin(got, eos).any()
    want_next = np.asarray(_chain_next(jnp.asarray(got[:, :-1]),
                                       cfg.vocab_size, eos))
    np.testing.assert_array_equal(got[:, 1:], want_next)
    assert int(rounds) == _sim_forced_rounds(budget, k, wp)


def test_forced_harness_one_compile_serves_all_wp():
    """wrong_period is a dynamic scalar: sweeping acceptance re-uses ONE
    compiled program (the chip sweep depends on this)."""
    from dmi_tpu.models.speculative import speculative_generate_forced_bl

    cfg, params = make_model(seed=15, eos=())
    dcfg, dparams = make_model(seed=16, eos=(), hidden=16, layers=1,
                               heads=2, kv=1, inter=32)
    embeds = prompt_embeds(cfg, 2, 3, seed=17)
    dembeds = prompt_embeds(dcfg, 2, 3, seed=18)
    budget, k = 7, 3

    rs = {}
    for wp in (0, 1, 2):
        _, rounds = speculative_generate_forced_bl(
            cfg, params, dcfg, dparams, embeds, dembeds, budget, PAD,
            jnp.int32(wp), k=k,
        )
        rs[wp] = int(rounds)
    assert rs[0] == _sim_forced_rounds(budget, k, 0)
    assert rs[1] == budget - 1
    assert rs[2] == _sim_forced_rounds(budget, k, 2)
    assert rs[0] < rs[2] < rs[1]


def test_eos_staggering():
    """Small vocab => EOS fires at staggered ages across the batch; pad
    fill after EOS must match the greedy path exactly (HF semantics: the
    EOS itself is written, then pads)."""
    cfg, params = make_model(seed=2, vocab=11, eos=(5, 7))
    budget, k = 8, 3
    embeds = prompt_embeds(cfg, B=6, T=4, seed=102)
    want = greedy(cfg, params, embeds, budget)
    assert np.isin(want, (5, 7)).any(), "fixture should hit EOS somewhere"
    got, _ = speculative_generate_oracle_bl(
        cfg, params, embeds, jnp.asarray(want), budget, PAD, k=k,
    )
    np.testing.assert_array_equal(np.asarray(got), want)
    # and with a hostile oracle
    got, _ = speculative_generate_oracle_bl(
        cfg, params, embeds, jnp.asarray(want), budget, PAD, k=k,
        wrong_period=2,
    )
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize("budget", [1, 2])
def test_tiny_budgets(budget):
    cfg, params = make_model(seed=10)
    embeds = prompt_embeds(cfg, B=2, T=3, seed=11)
    want = greedy(cfg, params, embeds, budget)
    got, rounds = speculative_generate_oracle_bl(
        cfg, params, embeds, jnp.asarray(want), budget, PAD, k=3,
    )
    np.testing.assert_array_equal(np.asarray(got), want)
    assert int(rounds) <= max(budget - 1, 0)


def test_model_draft_random():
    """A random unrelated draft model: proposals are junk, output is
    still exactly greedy."""
    cfg, params = make_model(seed=12)
    dcfg, dparams = make_model(seed=99, hidden=16, layers=1, heads=2, kv=1,
                               inter=32, vocab=cfg.vocab_size)
    budget, k = 7, 3
    embeds = prompt_embeds(cfg, B=4, T=5, seed=13)
    dembeds = prompt_embeds(dcfg, B=4, T=3, seed=14)
    want = greedy(cfg, params, embeds, budget)
    got, rounds = speculative_generate_bl(
        cfg, params, dcfg, dparams, embeds, dembeds, budget, PAD, k=k,
    )
    np.testing.assert_array_equal(np.asarray(got), want)
    assert int(rounds) <= budget - 1


def test_model_draft_is_target():
    """Draft == target on the same prompt accepts everything: the round
    count collapses to ceil((budget-1)/(k+1))."""
    cfg, params = make_model(seed=15, eos=())
    budget, k = 9, 3
    embeds = prompt_embeds(cfg, B=3, T=4, seed=16)
    want = greedy(cfg, params, embeds, budget)
    got, rounds = speculative_generate_bl(
        cfg, params, cfg, params, embeds, embeds, budget, PAD, k=k,
    )
    np.testing.assert_array_equal(np.asarray(got), want)
    assert int(rounds) == -(-(budget - 1) // (k + 1))


@pytest.mark.parametrize("cfg_fn,extra", [
    (llama.tiny_qwen2_config, {}),
    (llama.tiny_qwen3_config, {}),
    (llama.tiny_olmo2_config, {}),
    (llama.tiny_granite_config, {}),
    (llama.tiny_gemma3_config, {}),
    (llama.tiny_mixtral_config, {}),
    (llama.tiny_olmoe_config, {}),
])
def test_families(cfg_fn, extra):
    cfg, params = make_model(seed=17, cfg_fn=cfg_fn, **extra)
    budget, k = 6, 2
    embeds = prompt_embeds(cfg, B=3, T=4, seed=18)
    want = greedy(cfg, params, embeds, budget)
    got, _ = speculative_generate_oracle_bl(
        cfg, params, embeds, jnp.asarray(want), budget, PAD, k=k,
        wrong_period=3,
    )
    np.testing.assert_array_equal(np.asarray(got), want)


def test_gemma2_sliding_window():
    """Sliding-window family with prompt+budget > window: the row_pos
    lookback masks must reproduce the batch loop's per-layer sliding
    bias at per-slot positions."""
    cfg, params = make_model(
        seed=19, cfg_fn=llama.tiny_gemma2_config, sliding_window=4,
    )
    budget, k = 8, 3
    embeds = prompt_embeds(cfg, B=3, T=5, seed=20)
    assert llama.sliding_effective(cfg, 5 + budget)
    want = greedy(cfg, params, embeds, budget)
    got, _ = speculative_generate_oracle_bl(
        cfg, params, embeds, jnp.asarray(want), budget, PAD, k=k,
        wrong_period=2,
    )
    np.testing.assert_array_equal(np.asarray(got), want)
    # model draft over the sliding family too (draft bookkeeping path)
    dcfg, dparams = make_model(seed=21, hidden=16, layers=1, heads=2, kv=1,
                               inter=32, vocab=cfg.vocab_size)
    dembeds = prompt_embeds(dcfg, B=3, T=3, seed=22)
    got, _ = speculative_generate_bl(
        cfg, params, dcfg, dparams, embeds, dembeds, budget, PAD, k=k,
    )
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.slow
def test_quantized_weights():
    """W8A8 loop weights + bf16 prefill shadow: speculative matches the
    quantized greedy path (same weights both sides)."""
    from dmi_tpu.models.quant import quantize_llama

    cfg, params = make_model(seed=23)
    qp = quantize_llama(params, native=True)
    budget, k = 6, 2
    embeds = prompt_embeds(cfg, B=3, T=4, seed=24)
    want = np.asarray(
        dec.greedy_generate_bl(cfg, qp, embeds, budget, PAD,
                               prefill_params=params)
    )
    got, _ = speculative_generate_oracle_bl(
        cfg, qp, embeds, jnp.asarray(want), budget, PAD, k=k,
        wrong_period=3, prefill_params=params,
    )
    np.testing.assert_array_equal(np.asarray(got), want)


def test_caption_level_speculative_self_draft():
    """caption_generate_speculative with the production W4A8 self-draft
    (serve.Captioner(speculative=k)'s configuration: bf16/f32 target,
    W4A8 copy of the same weights as draft, shared prompt embeds, bf16
    draft prefill) is token-identical to caption_generate."""
    from dmi_tpu.models import mmmodel
    from dmi_tpu.models.quant import quantize_llama

    cfg, params = make_model(seed=31, vocab=96, hidden=64, inter=96)
    draft_params = quantize_llama(params, bits=4)
    B, budget, k = 3, 9, 3
    soft = jax.random.normal(jax.random.key(32), (B, cfg.hidden_size),
                             jnp.float32) / np.sqrt(cfg.hidden_size)
    prefix = jnp.asarray(
        np.tile(np.arange(1, 6, dtype=np.int32)[None], (B, 1)))
    want = np.asarray(mmmodel.caption_generate(
        cfg, params, soft, prefix, budget, PAD, batch_first=False))
    got = np.asarray(mmmodel.caption_generate_speculative(
        cfg, params, cfg, draft_params, soft, prefix, budget, PAD, k=k,
        draft_prefill_params=params))
    np.testing.assert_array_equal(got, want)


# --------------------------- stochastic speculative -------------------------

from dmi_tpu.models.speculative import speculative_sample_bl  # noqa: E402


@pytest.mark.parametrize("temperature,top_k,top_p", [
    (1.0, 0, 1.0),
    (1.7, 5, 1.0),
    (0.8, 0, 0.85),
])
def test_sample_self_draft_bit_identical(temperature, top_k, top_p):
    """With draft == target the p/q ratio is 1 everywhere, every proposal
    is accepted, and — because proposals are drawn with the plain
    sampler's own (request, age) keys — the output is BIT-IDENTICAL to
    dec.sample_generate_bl (the RNG-discipline invariant)."""
    cfg, params = make_model(seed=41, vocab=96, hidden=64, inter=96)
    B, T, budget, k = 4, 5, 9, 3
    embeds = prompt_embeds(cfg, B=B, T=T, seed=42)
    key = jax.random.key(17)
    want = np.asarray(dec.sample_generate_bl(
        cfg, params, embeds, budget, PAD, key, temperature=temperature,
        top_k=top_k, top_p=top_p,
    ))
    got, rounds = speculative_sample_bl(
        cfg, params, cfg, params, embeds, embeds, budget, PAD, key,
        temperature=temperature, top_k=top_k, top_p=top_p, k=k,
    )
    np.testing.assert_array_equal(np.asarray(got), want)
    # full acceptance: rounds == ceil((budget-1)/(k+1)) (unless EOS ended
    # everything earlier)
    assert int(np.asarray(rounds)) <= -(-(budget - 1) // (k + 1))


def test_sample_req_ids_and_eos():
    """Request-indexed keying: the same request draws the same caption at
    any batch slot; EOS truncates with pad-fill like the plain sampler."""
    cfg, params = make_model(seed=43, eos=(5,))
    B, T, budget = 6, 4, 8
    embeds = prompt_embeds(cfg, B=B, T=T, seed=44)
    key = jax.random.key(3)
    req = jnp.asarray([7, 3, 11, 0, 2, 9], jnp.int32)
    t1, _ = speculative_sample_bl(
        cfg, params, cfg, params, embeds, embeds, budget, PAD, key,
        temperature=1.3, k=2, req_ids=req,
    )
    perm = jnp.asarray([3, 0, 5, 1, 4, 2])
    t2, _ = speculative_sample_bl(
        cfg, params, cfg, params, embeds[perm], embeds[perm], budget, PAD,
        key, temperature=1.3, k=2, req_ids=req[perm],
    )
    np.testing.assert_array_equal(np.asarray(t1)[np.asarray(perm)],
                                  np.asarray(t2))
    toks = np.asarray(t1)
    for row in toks:
        hits = np.where(row == 5)[0]
        if hits.size:  # everything after the first EOS is pad
            assert (row[hits[0] + 1:] == PAD).all()


@pytest.mark.slow
def test_sample_quantized_draft_distribution():
    """Distribution preservation with a REAL (different) draft: the W4A8
    self-draft proposes from q != p, rejection resamples from the
    residual — the emitted marginal must remain the plain sampler's.
    Three arms over disjoint key sets: TV(spec, plain_A) must sit within
    the key-noise band calibrated by TV(plain_B, plain_A)."""
    from dmi_tpu.models.quant import quantize_llama

    cfg, params = make_model(seed=45, vocab=16, hidden=32, layers=2,
                             eos=(15,))
    draft = quantize_llama(params, bits=4)
    B, T, budget, k = 256, 3, 3, 2
    embeds = jnp.tile(prompt_embeds(cfg, B=1, T=T, seed=46), (B, 1, 1))
    M = 12  # runs per arm -> 3072 sequences each

    def run_arm(spec, key_base):
        outs = []
        for m in range(M):
            key = jax.random.key(key_base + m)
            if spec:
                t, _ = speculative_sample_bl(
                    cfg, params, cfg, draft, embeds, embeds, budget, PAD,
                    key, temperature=1.4, k=k,
                )
            else:
                t = dec.sample_generate_bl(
                    cfg, params, embeds, budget, PAD, key, temperature=1.4)
            outs.append(np.asarray(t))
        return np.concatenate(outs, axis=0)  # [M*B, budget]

    plain_a = run_arm(False, 10_000)
    plain_b = run_arm(False, 20_000)
    spec = run_arm(True, 30_000)

    def tv(x, y, vocab=17):
        # per-position total variation (PAD folded into id 16)
        out = []
        for t in range(budget):
            hx = np.bincount(np.where(x[:, t] == PAD, 16, x[:, t]),
                             minlength=vocab) / len(x)
            hy = np.bincount(np.where(y[:, t] == PAD, 16, y[:, t]),
                             minlength=vocab) / len(y)
            out.append(0.5 * np.abs(hx - hy).sum())
        return max(out)

    cal = tv(plain_b, plain_a)
    got = tv(spec, plain_a)
    # key-noise at n=3072, support 17 is ~0.02-0.04; a wrong acceptance
    # rule shifts mass by O(0.1+)
    assert got <= max(2.0 * cal, 0.02) + 0.02, (got, cal)


# --------------------------- speculative bulk engine ------------------------

from dmi_tpu.models import mmmodel  # noqa: E402
from dmi_tpu.models import projector as proj  # noqa: E402
from dmi_tpu.models.speculative import speculative_bulk_caption  # noqa: E402


def _pool_setup(seed=0, eos=(5,), cfg_fn=llama.tiny_config, **extra):
    cfg = cfg_fn(vocab_size=64, hidden_size=32, n_layers=2, n_heads=4,
                 n_kv=2, intermediate=64, **extra)
    cfg = dataclasses.replace(cfg, eos_token_ids=tuple(eos))
    params = llama.init(jax.random.key(seed), cfg)
    pspec = proj.ProjectorSpec(mm_dim=16, lm_dim=32, n_layers=2, dropout=0.0)
    pparams = proj.init(jax.random.key(seed + 1), pspec)
    prefix = np.asarray([3, 7, 9], np.int32)
    return cfg, params, pspec, pparams, prefix


def _batch_oracle(cfg, params, pspec, pparams, prefix, embs, budget):
    soft = proj.apply(pspec, pparams, jnp.asarray(embs), train=False)
    prefix_ids = jnp.tile(jnp.asarray(prefix)[None, :], (embs.shape[0], 1))
    return np.asarray(
        mmmodel.caption_generate(cfg, params, soft, prefix_ids, budget, PAD)
    )


def _run_spec_bulk(cfg, params, draft_cfg, draft_params, pspec, pparams,
                   prefix, embs, budget, chunk, pool, k, **kw):
    N = embs.shape[0]
    Nq = chunk * max(1, -(-N // chunk))
    q = np.zeros((Nq, embs.shape[1]), np.float32)
    q[:N] = embs
    prefix_chunk = jnp.tile(jnp.asarray(prefix)[None, :], (chunk, 1))
    toks = speculative_bulk_caption(
        cfg, params, draft_cfg, draft_params, pspec, pparams,
        jnp.asarray(q), prefix_chunk, jnp.asarray(N, jnp.int32),
        1 + len(prefix), budget, PAD, chunk, pool, k=k, **kw,
    )
    return np.asarray(toks)[:N]


@pytest.mark.slow
@pytest.mark.parametrize("pool,chunk,k,budget", [
    (5, 2, 3, 7),   # refills + staggered EOS
    (9, 4, 2, 5),   # ring = 4: ~6 generations of tenants wrap it repeatedly
    (4, 4, 1, 6),
])
def test_spec_bulk_matches_batch_path(pool, chunk, k, budget):
    """The speculative slot engine (draft-verify rounds + slot refill over
    the row ring) is token-identical to the batch captioner: self-draft
    (full acceptance) and a W4A8 draft (partial acceptance, greedy
    rejection) both reproduce plain greedy for every request."""
    from dmi_tpu.models.quant import quantize_llama

    cfg, params, pspec, pparams, prefix = _pool_setup(seed=21)
    N = 23
    embs = np.random.default_rng(22).normal(size=(N, 16)).astype(np.float32)
    want = _batch_oracle(cfg, params, pspec, pparams, prefix, embs, budget)

    got_self = _run_spec_bulk(cfg, params, cfg, params, pspec, pparams,
                              prefix, embs, budget, chunk, pool, k)
    np.testing.assert_array_equal(got_self, want)

    draft = quantize_llama(params, bits=4)
    got_q = _run_spec_bulk(cfg, params, cfg, draft, pspec, pparams, prefix,
                           embs, budget, chunk, pool, k,
                           draft_prefill_params=params)
    np.testing.assert_array_equal(got_q, want)


@pytest.mark.slow
def test_spec_bulk_sliding_family():
    """gemma-2 with a BINDING window (T=4 + budget 8 > window 4): the
    engine's ring row_pos lookback masks must reproduce the batch path."""
    cfg, params, pspec, pparams, prefix = _pool_setup(
        seed=23, cfg_fn=llama.tiny_gemma2_config, sliding_window=4,
    )
    budget = 8
    assert llama.sliding_effective(cfg, 4 + budget)
    N, chunk, pool, k = 11, 2, 5, 2
    embs = np.random.default_rng(24).normal(size=(N, 16)).astype(np.float32)
    want = _batch_oracle(cfg, params, pspec, pparams, prefix, embs, budget)
    got = _run_spec_bulk(cfg, params, cfg, params, pspec, pparams, prefix,
                         embs, budget, chunk, pool, k)
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_spec_bulk_no_eos_and_empty():
    """EOS disabled: every tenant runs the full budget (maximum ring
    pressure); zero-request workloads return the trash row only."""
    cfg, params, pspec, pparams, prefix = _pool_setup(seed=25, eos=())
    budget = 5
    N, chunk, pool, k = 9, 3, 3, 2
    embs = np.random.default_rng(26).normal(size=(N, 16)).astype(np.float32)
    want = _batch_oracle(cfg, params, pspec, pparams, prefix, embs, budget)
    got = _run_spec_bulk(cfg, params, cfg, params, pspec, pparams, prefix,
                         embs, budget, chunk, pool, k)
    np.testing.assert_array_equal(got, want)

    got0 = _run_spec_bulk(cfg, params, cfg, params, pspec, pparams, prefix,
                          embs[:0], budget, chunk, pool, k)
    assert got0.shape == (0, budget)


def test_spec_bulk_guards():
    cfg, params, pspec, pparams, prefix = _pool_setup(seed=27)
    embs = np.zeros((4, 16), np.float32)
    with pytest.raises(ValueError, match="chunk"):
        _run_spec_bulk(cfg, params, cfg, params, pspec, pparams, prefix,
                       embs, 6, chunk=5, pool=4, k=2)
    with pytest.raises(ValueError, match="budget"):
        _run_spec_bulk(cfg, params, cfg, params, pspec, pparams, prefix,
                       embs, 1, chunk=2, pool=4, k=2)


@pytest.mark.slow
@pytest.mark.parametrize("temperature,top_k,top_p", [
    (1.3, 0, 1.0),
    (0.9, 6, 0.9),
])
def test_spec_bulk_sampling_matches_batch_sampler(temperature, top_k, top_p):
    """Stochastic speculative in the SLOT ENGINE: every draw is keyed by
    (request, age), so the engine is BIT-IDENTICAL to the batch
    speculative sampler on the same request ids regardless of slot
    assignment, admission order or pool size — including with a real
    (quantized) draft whose acceptances differ per slot."""
    from dmi_tpu.models.quant import quantize_llama

    cfg, params, pspec, pparams, prefix = _pool_setup(seed=30)
    budget, chunk, pool, k = 7, 3, 5, 2
    N = 13
    embs = np.random.default_rng(31).normal(size=(N, 16)).astype(np.float32)
    key = jax.random.key(9)
    draft = quantize_llama(params, bits=4)

    # batch oracle: the whole workload in one speculative_sample_bl call
    # with req_ids = workload rows (exactly the keys the engine derives)
    soft = proj.apply(pspec, pparams, jnp.asarray(embs), train=False)
    prefix_ids = jnp.tile(jnp.asarray(prefix)[None, :], (N, 1))
    inputs = mmmodel.assemble_prompt(cfg, params, soft, prefix_ids)
    from dmi_tpu.models.speculative import speculative_sample_bl
    want, _ = speculative_sample_bl(
        cfg, params, cfg, draft, inputs, inputs, budget, PAD, key,
        temperature=temperature, top_k=top_k, top_p=top_p, k=k,
        draft_prefill_params=params,
    )

    got = _run_spec_bulk(cfg, params, cfg, draft, pspec, pparams, prefix,
                         embs, budget, chunk, pool, k,
                         draft_prefill_params=params,
                         sample=(temperature, top_k, top_p),
                         sample_key=key)
    np.testing.assert_array_equal(got, np.asarray(want))


# --------------------------- online (host-loop) spec engine -----------------

from dmi_tpu.models.speculative import SpeculativeStreamingCaptioner  # noqa: E402


@pytest.mark.slow
@pytest.mark.parametrize("pool,admit,rounds,k,budget", [
    (5, 2, 2, 3, 7),   # refills + staggered EOS; scratch slot exercised
    (9, 4, 1, 2, 5),   # ring wraps repeatedly across tenant generations
])
def test_spec_online_matches_batch_path(pool, admit, rounds, k, budget):
    """The HOST-LOOP speculative engine (online arrivals: host admission/
    harvest around multi-round dispatches) is token-identical to the batch
    captioner — self-draft AND a W4A8 draft (greedy rejection)."""
    from dmi_tpu.models.quant import quantize_llama

    cfg, params, pspec, pparams, prefix = _pool_setup(seed=33)
    N = 17
    embs = np.random.default_rng(34).normal(size=(N, 16)).astype(np.float32)
    want = _batch_oracle(cfg, params, pspec, pparams, prefix, embs, budget)

    for draft, dpp in [(params, None),
                       (quantize_llama(params, bits=4), params)]:
        eng = SpeculativeStreamingCaptioner(
            cfg, params, cfg, draft, pspec, pparams, prefix, budget, PAD,
            pool=pool, admit=admit, rounds=rounds, k=k,
            draft_prefill_params=dpp,
        )
        got = eng.run(embs)
        np.testing.assert_array_equal(got, want)
        assert not eng._occupied[: eng.scratch].any()


@pytest.mark.slow
def test_spec_online_sampling_matches_batch_sampler():
    """Sampling through the online engine: (request, age)-keyed draws make
    it bit-identical to the batch speculative sampler on the same rows —
    and therefore to the bulk spec engine too (engine-invariance)."""
    from dmi_tpu.models.quant import quantize_llama
    from dmi_tpu.models.speculative import speculative_sample_bl

    cfg, params, pspec, pparams, prefix = _pool_setup(seed=35)
    budget, k = 6, 2
    N = 11
    embs = np.random.default_rng(36).normal(size=(N, 16)).astype(np.float32)
    key = jax.random.key(13)
    draft = quantize_llama(params, bits=4)

    soft = proj.apply(pspec, pparams, jnp.asarray(embs), train=False)
    prefix_ids = jnp.tile(jnp.asarray(prefix)[None, :], (N, 1))
    inputs = mmmodel.assemble_prompt(cfg, params, soft, prefix_ids)
    want, _ = speculative_sample_bl(
        cfg, params, cfg, draft, inputs, inputs, budget, PAD, key,
        temperature=1.2, top_k=8, k=k, draft_prefill_params=params,
    )

    eng = SpeculativeStreamingCaptioner(
        cfg, params, cfg, draft, pspec, pparams, prefix, budget, PAD,
        pool=5, admit=2, rounds=2, k=k, draft_prefill_params=params,
        temperature=1.2, top_k=8, sample_key=key,
    )
    got = eng.run(embs)
    np.testing.assert_array_equal(got, np.asarray(want))


def test_share_prefill_exact():
    """share_prefill (self-draft fast path: the draft starts from the
    target's prefill cache instead of prefilling again) is EXACT — tokens
    and round counts are bit-equal with and without it, for greedy,
    sampling, and the bulk engine."""
    from dmi_tpu.models.quant import quantize_llama
    from dmi_tpu.models.speculative import speculative_sample_bl

    cfg, params = make_model(seed=50)
    draft = quantize_llama(params, bits=4)
    budget, k = 8, 3
    embeds = prompt_embeds(cfg, B=4, T=5, seed=51)

    t0, r0 = speculative_generate_bl(
        cfg, params, cfg, draft, embeds, embeds, budget, PAD, k=k,
        draft_prefill_params=params,
    )
    t1, r1 = speculative_generate_bl(
        cfg, params, cfg, draft, embeds, embeds, budget, PAD, k=k,
        draft_prefill_params=params, share_prefill=True,
    )
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    assert int(np.asarray(r0)) == int(np.asarray(r1))

    key = jax.random.key(5)
    s0, _ = speculative_sample_bl(
        cfg, params, cfg, draft, embeds, embeds, budget, PAD, key,
        temperature=1.3, top_k=8, k=k, draft_prefill_params=params,
    )
    s1, _ = speculative_sample_bl(
        cfg, params, cfg, draft, embeds, embeds, budget, PAD, key,
        temperature=1.3, top_k=8, k=k, draft_prefill_params=params,
        share_prefill=True,
    )
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))

    cfgp, paramsp, pspec, pparams, prefix = _pool_setup(seed=52)
    draftp = quantize_llama(paramsp, bits=4)
    embs = np.random.default_rng(53).normal(size=(11, 16)).astype(np.float32)
    b0 = _run_spec_bulk(cfgp, paramsp, cfgp, draftp, pspec, pparams, prefix,
                        embs, 6, 2, 5, 2, draft_prefill_params=paramsp)
    b1 = _run_spec_bulk(cfgp, paramsp, cfgp, draftp, pspec, pparams, prefix,
                        embs, 6, 2, 5, 2, draft_prefill_params=paramsp,
                        share_prefill=True)
    np.testing.assert_array_equal(b0, b1)
