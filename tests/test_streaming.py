"""Continuous-batching engine (dmi_tpu/streaming.py): greedy-token parity
with the batch captioner path, slot recycling, and scratch-slot safety."""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dmi_tpu.models import llama, mmmodel
from dmi_tpu.models import projector as proj
from dmi_tpu.streaming import StreamingCaptioner

PAD = 0


def make_setup(seed=0, eos=(5,), vocab=64):
    cfg = llama.tiny_config(vocab_size=vocab, hidden_size=32, n_layers=2,
                            n_heads=4, n_kv=2, intermediate=64)
    import dataclasses

    cfg = dataclasses.replace(cfg, eos_token_ids=tuple(eos))
    llm_params = llama.init(jax.random.key(seed), cfg)
    pspec = proj.ProjectorSpec(mm_dim=16, lm_dim=32, n_layers=2, dropout=0.0)
    pparams = proj.init(jax.random.key(seed + 1), pspec)
    prefix = np.asarray([3, 7, 9], np.int32)
    return cfg, llm_params, pspec, pparams, prefix


def batch_reference(cfg, llm_params, pspec, pparams, prefix, embs, budget):
    soft = proj.apply(pspec, pparams, jnp.asarray(embs), train=False)
    prefix_ids = jnp.tile(jnp.asarray(prefix)[None, :], (embs.shape[0], 1))
    return np.asarray(
        mmmodel.caption_generate(cfg, llm_params, soft, prefix_ids, budget, PAD)
    )


@pytest.mark.parametrize("pool,admit,k", [(5, 2, 3), (9, 4, 1), (17, 8, 4)])
def test_streaming_matches_batch_path(pool, admit, k):
    """N requests > pool forces slot recycling; small vocab makes EOS (id
    5) fire at staggered ages; tokens must equal the batch path row for
    row."""
    cfg, llm_params, pspec, pparams, prefix = make_setup(seed=2)
    budget = 7
    N = 23
    embs = np.random.default_rng(3).normal(size=(N, 16)).astype(np.float32)

    want = batch_reference(cfg, llm_params, pspec, pparams, prefix, embs, budget)

    eng = StreamingCaptioner(cfg, llm_params, pspec, pparams, prefix, budget,
                             PAD, pool=pool, admit=admit, k_steps=k)
    got = eng.run(embs)
    np.testing.assert_array_equal(got, want)


def test_streaming_no_eos_full_budget():
    """With EOS disabled every request decodes the full budget (no early
    recycling) — engine still matches."""
    cfg, llm_params, pspec, pparams, prefix = make_setup(seed=4, eos=())
    budget = 5
    embs = np.random.default_rng(5).normal(size=(6, 16)).astype(np.float32)
    want = batch_reference(cfg, llm_params, pspec, pparams, prefix, embs, budget)
    eng = StreamingCaptioner(cfg, llm_params, pspec, pparams, prefix, budget,
                             PAD, pool=4, admit=3, k_steps=2)
    got = eng.run(embs)
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_streaming_quantized_weights():
    """W8A8 slot engine with bf16-prefill shadow matches the quantized
    batch path (quantized decode tokens differ from fp, so compare
    against the SAME quantized configuration)."""
    from dmi_tpu.models.quant import quantize_llama

    cfg, llm_params, pspec, pparams, prefix = make_setup(seed=6)
    qp = quantize_llama(llm_params, native=True)
    budget = 6
    embs = np.random.default_rng(7).normal(size=(9, 16)).astype(np.float32)

    soft = proj.apply(pspec, pparams, jnp.asarray(embs), train=False)
    prefix_ids = jnp.tile(jnp.asarray(prefix)[None, :], (9, 1))
    want = np.asarray(
        mmmodel.caption_generate(cfg, qp, soft, prefix_ids, budget, PAD,
                                 prefill_params=llm_params)
    )
    eng = StreamingCaptioner(cfg, qp, pspec, pparams, prefix, budget, PAD,
                             pool=5, admit=2, k_steps=3,
                             prefill_params=llm_params)
    got = eng.run(embs)
    np.testing.assert_array_equal(got, want)


def test_streaming_single_request_and_empty():
    cfg, llm_params, pspec, pparams, prefix = make_setup(seed=8)
    eng = StreamingCaptioner(cfg, llm_params, pspec, pparams, prefix, 4, PAD,
                             pool=3, admit=2, k_steps=2)
    one = np.random.default_rng(9).normal(size=(1, 16)).astype(np.float32)
    want = batch_reference(cfg, llm_params, pspec, pparams, prefix, one, 4)
    np.testing.assert_array_equal(eng.run(one), want)
    # empty input: no dispatches beyond none, empty result
    eng2 = StreamingCaptioner(cfg, llm_params, pspec, pparams, prefix, 4, PAD,
                              pool=3, admit=2, k_steps=2)
    assert eng2.run(np.zeros((0, 16), np.float32)).shape == (0, 4)


@pytest.mark.parametrize("pool,admit", [(5, 2), (9, 4)])
def test_bulk_on_device_matches_batch_path(pool, admit):
    """The fully-on-device engine (one dispatch, lax.cond admission)
    must also match the batch path row for row."""
    cfg, llm_params, pspec, pparams, prefix = make_setup(seed=12)
    budget = 7
    N = 21
    embs = np.random.default_rng(13).normal(size=(N, 16)).astype(np.float32)
    want = batch_reference(cfg, llm_params, pspec, pparams, prefix, embs, budget)
    eng = StreamingCaptioner(cfg, llm_params, pspec, pparams, prefix, budget,
                             PAD, pool=pool, admit=admit, k_steps=2)
    got = eng.run_bulk(embs)
    np.testing.assert_array_equal(got, want)
    assert eng.dispatches == 1


def test_bulk_on_device_no_eos():
    cfg, llm_params, pspec, pparams, prefix = make_setup(seed=14, eos=())
    budget = 5
    embs = np.random.default_rng(15).normal(size=(7, 16)).astype(np.float32)
    want = batch_reference(cfg, llm_params, pspec, pparams, prefix, embs, budget)
    eng = StreamingCaptioner(cfg, llm_params, pspec, pparams, prefix, budget,
                             PAD, pool=4, admit=2, k_steps=2)
    np.testing.assert_array_equal(eng.run_bulk(embs), want)


def test_bulk_on_device_quantized():
    from dmi_tpu.models.quant import quantize_llama

    cfg, llm_params, pspec, pparams, prefix = make_setup(seed=16)
    qp = quantize_llama(llm_params, native=True)
    budget = 6
    embs = np.random.default_rng(17).normal(size=(9, 16)).astype(np.float32)
    soft = proj.apply(pspec, pparams, jnp.asarray(embs), train=False)
    prefix_ids = jnp.tile(jnp.asarray(prefix)[None, :], (9, 1))
    want = np.asarray(
        mmmodel.caption_generate(cfg, qp, soft, prefix_ids, budget, PAD,
                                 prefill_params=llm_params)
    )
    eng = StreamingCaptioner(cfg, qp, pspec, pparams, prefix, budget, PAD,
                             pool=5, admit=2, k_steps=2,
                             prefill_params=llm_params)
    np.testing.assert_array_equal(eng.run_bulk(embs), want)


def test_bulk_on_device_under_tp_mesh():
    """bulk_caption with tensor-parallel-sharded LLM weights on the
    virtual 8-device mesh AND the slot pool sharded over 'data'
    (mesh= -> constrain_state): full dp x tp serving, tokens match the
    single-device run."""
    from dmi_tpu.parallel import make_mesh, shard_llm_params

    cfg, llm_params, pspec, pparams, prefix = make_setup(seed=20)
    budget = 6
    embs = np.random.default_rng(21).normal(size=(7, 16)).astype(np.float32)
    eng0 = StreamingCaptioner(cfg, llm_params, pspec, pparams, prefix, budget,
                              PAD, pool=4, admit=2, k_steps=2)
    want = eng0.run_bulk(embs)

    mesh = make_mesh((2, 4))  # (data, model): 4-way tensor parallel
    sharded = shard_llm_params(mesh, llm_params)
    eng = StreamingCaptioner(cfg, sharded, pspec, pparams, prefix, budget,
                             PAD, pool=4, admit=2, k_steps=2, mesh=mesh)
    got = eng.run_bulk(embs)
    np.testing.assert_array_equal(got, want)
    # the host-loop engine under the same mesh (eager state device_put)
    eng2 = StreamingCaptioner(cfg, sharded, pspec, pparams, prefix, budget,
                              PAD, pool=4, admit=2, k_steps=2, mesh=mesh)
    np.testing.assert_array_equal(eng2.run(embs), want)


@pytest.mark.parametrize("family", ["qwen2", "gemma2", "qwen3", "olmo2",
                                    "granite", "gemma3", "mixtral", "olmoe",
                                    "deepseek", "deepseekmoe"])
def test_streaming_families_match_batch_path(family):
    """The engine shares _decode_step_bl with the batch path, so family
    features (qwen2 qkv biases; gemma-2 GeGLU/post-block norms/softcap/
    embed scale; olmo2 post-norm blocks + full-width qk-norm; granite
    multipliers) must flow through the ring identically."""
    import dataclasses

    maker = {"qwen2": llama.tiny_qwen2_config, "gemma2": llama.tiny_gemma2_config,
             "qwen3": llama.tiny_qwen3_config, "olmo2": llama.tiny_olmo2_config,
             "granite": llama.tiny_granite_config,
             # gemma3's default window 8 BINDS here (T=4 + budget 6): the
             # ring engine exercises dual rope AND per-slot lookback masks
             "gemma3": llama.tiny_gemma3_config,
             "mixtral": llama.tiny_mixtral_config,
             "olmoe": llama.tiny_olmoe_config,
             # deepseek: the engine runs the COMPRESSED-latent MLA ring
             # (dec._mla_attn_bl) against the expanded-oracle batch path
             "deepseek": partial(llama.tiny_deepseek_config, q_lora_rank=12),
             "deepseekmoe": partial(llama.tiny_deepseek_config, n_experts=4,
                                    top_k=2, n_shared=1, routed_scale=1.7)}
    cfg = maker[family](vocab_size=64, hidden_size=32, n_layers=2,
                        n_heads=4, n_kv=2, intermediate=64)
    cfg = dataclasses.replace(cfg, eos_token_ids=(5,))
    llm_params = llama.init(jax.random.key(31), cfg)
    pspec = proj.ProjectorSpec(mm_dim=16, lm_dim=32, n_layers=2, dropout=0.0)
    pparams = proj.init(jax.random.key(32), pspec)
    prefix = np.asarray([3, 7, 9], np.int32)
    budget = 6
    embs = np.random.default_rng(33).normal(size=(11, 16)).astype(np.float32)

    want = batch_reference(cfg, llm_params, pspec, pparams, prefix, embs, budget)
    eng = StreamingCaptioner(cfg, llm_params, pspec, pparams, prefix, budget,
                             PAD, pool=5, admit=2, k_steps=2)
    np.testing.assert_array_equal(eng.run(embs), want)
    np.testing.assert_array_equal(eng.run_bulk(embs), want)


@pytest.mark.parametrize("eos", [(), (5,)])
def test_streaming_sliding_window_binds(eos):
    """prompt+budget (4+8) > window (4) with interleaved sliding/full
    layers: the ring's row->position bookkeeping (SlotState.row_pos) must
    reproduce the batch path's lookback mask token for token — including
    slot RECYCLING (N > pool re-tenants rows whose stale positions would
    poison the window mask if not re-stamped/invalidated).  EOS on makes
    tenures staggered so ring phase differs per slot."""
    cfg = llama.tiny_gemma2_config(vocab_size=64, hidden_size=32, n_layers=2,
                                   n_heads=4, n_kv=2, intermediate=64,
                                   sliding_window=4)
    import dataclasses

    cfg = dataclasses.replace(cfg, eos_token_ids=eos)
    llm_params = llama.init(jax.random.key(41), cfg)
    pspec = proj.ProjectorSpec(mm_dim=16, lm_dim=32, n_layers=2, dropout=0.0)
    pparams = proj.init(jax.random.key(42), pspec)
    prefix = np.asarray([3, 7, 9], np.int32)
    budget = 8
    embs = np.random.default_rng(43).normal(size=(11, 16)).astype(np.float32)

    want = batch_reference(cfg, llm_params, pspec, pparams, prefix, embs, budget)
    eng = StreamingCaptioner(cfg, llm_params, pspec, pparams, prefix, budget,
                             PAD, pool=4, admit=2, k_steps=2)
    np.testing.assert_array_equal(eng.run(embs), want)
    np.testing.assert_array_equal(eng.run_bulk(embs), want)
    if eos == ():  # sliding + dp x tp mesh combo (one extra compile)
        from dmi_tpu.parallel import make_mesh, shard_llm_params

        mesh = make_mesh((2, 4))
        eng_m = StreamingCaptioner(
            cfg, shard_llm_params(mesh, llm_params), pspec, pparams, prefix,
            budget, PAD, pool=4, admit=2, k_steps=2, mesh=mesh,
        )
        np.testing.assert_array_equal(eng_m.run_bulk(embs), want)


def test_streaming_sliding_window_wide_no_overhead():
    """A window larger than prompt+budget never binds: sliding_effective
    is False at trace time, so the engine takes the plain-causal path and
    still matches the batch decode."""
    cfg = llama.tiny_gemma2_config(vocab_size=64, hidden_size=32, n_layers=2,
                                   n_heads=4, n_kv=2, intermediate=64,
                                   sliding_window=64)
    import dataclasses

    cfg = dataclasses.replace(cfg, eos_token_ids=())
    llm_params = llama.init(jax.random.key(41), cfg)
    pspec = proj.ProjectorSpec(mm_dim=16, lm_dim=32, n_layers=2, dropout=0.0)
    pparams = proj.init(jax.random.key(42), pspec)
    prefix = np.asarray([3, 7, 9], np.int32)
    embs = np.random.default_rng(43).normal(size=(5, 16)).astype(np.float32)
    want = batch_reference(cfg, llm_params, pspec, pparams, prefix, embs, 4)
    eng = StreamingCaptioner(cfg, llm_params, pspec, pparams, prefix, 4, PAD,
                             pool=4, admit=2, k_steps=2)
    np.testing.assert_array_equal(eng.run(embs), want)


def test_streaming_sampling_matches_batch_oracle():
    """Request-indexed sampling: the engine's drawn tokens equal
    mmmodel.caption_sample's for the same requests — bit-identical keys
    (fold_in(base, req*budget + age)) and bit-identical logits (shared
    _decode_step_bl) — across slot recycling and for BOTH engine modes."""
    cfg, llm_params, pspec, pparams, prefix = make_setup(seed=24, vocab=64)
    budget = 7
    N = 13
    embs = np.random.default_rng(25).normal(size=(N, 16)).astype(np.float32)
    key = jax.random.key(42)
    temperature, top_k = 0.8, 8

    soft = proj.apply(pspec, pparams, jnp.asarray(embs), train=False)
    prefix_ids = jnp.tile(jnp.asarray(prefix)[None, :], (N, 1))
    want = np.asarray(mmmodel.caption_sample(
        cfg, llm_params, soft, prefix_ids, budget, PAD, key,
        temperature=temperature, top_k=top_k,
    ))
    # sampling actually happened (a greedy run differs)
    greedy = batch_reference(cfg, llm_params, pspec, pparams, prefix, embs, budget)
    assert (want != greedy).any()

    eng = StreamingCaptioner(cfg, llm_params, pspec, pparams, prefix, budget,
                             PAD, pool=4, admit=2, k_steps=3,
                             temperature=temperature, top_k=top_k,
                             sample_key=key)
    np.testing.assert_array_equal(eng.run(embs), want)
    np.testing.assert_array_equal(eng.run_bulk(embs), want)

    # slot-assignment independence: a different pool/admit shape draws the
    # SAME tokens (the rng is keyed by request, not slot)
    eng2 = StreamingCaptioner(cfg, llm_params, pspec, pparams, prefix, budget,
                              PAD, pool=9, admit=4, k_steps=1,
                              temperature=temperature, top_k=top_k,
                              sample_key=key)
    np.testing.assert_array_equal(eng2.run(embs), want)


def test_nucleus_filter_matches_hf_warper():
    """_sample_pick_bl's temperature->top_k->top_p filter chain keeps
    exactly the token set HF's logits warpers keep (the published
    semantics our sampling claims)."""
    import torch
    from transformers.generation.logits_process import (
        TemperatureLogitsWarper, TopKLogitsWarper, TopPLogitsWarper,
    )

    from dmi_tpu.models import decode as dec

    rng = np.random.default_rng(7)
    for temperature, top_k, top_p in [(0.7, 0, 0.9), (1.3, 5, 0.8),
                                      (1.0, 0, 0.5), (0.9, 3, 1.0)]:
        logits = rng.normal(size=(4, 32)).astype(np.float32) * 2.0  # [B, V]
        t = torch.tensor(logits)
        t = TemperatureLogitsWarper(temperature)(None, t)
        if top_k > 0:
            t = TopKLogitsWarper(top_k)(None, t)
        if top_p < 1.0:
            t = TopPLogitsWarper(top_p)(None, t)
        hf_kept = torch.isfinite(t).numpy()

        # replicate the filter via the pick helper: a kept token must be
        # drawable, a filtered one never — recover the mask by reading the
        # scaled logits the helper would sample from
        scaled = jnp.asarray(logits.T, jnp.float32) / max(temperature, 1e-6)
        if top_k > 0:
            kth = jnp.sort(scaled, axis=0)[-top_k, :][None, :]
            scaled = jnp.where(scaled < kth, -jnp.inf, scaled)
        if top_p < 1.0:
            desc = jnp.sort(scaled, axis=0)[::-1, :]
            probs = jax.nn.softmax(desc, axis=0)
            exceeded = jnp.cumsum(probs, axis=0) > top_p
            keep = jnp.concatenate(
                [jnp.ones_like(exceeded[:1]), ~exceeded[:-1]], axis=0
            )
            kth_p = jnp.min(jnp.where(keep, desc, jnp.inf), axis=0)[None, :]
            scaled = jnp.where(scaled < kth_p, -jnp.inf, scaled)
        ours_kept = np.isfinite(np.asarray(scaled).T)
        np.testing.assert_array_equal(
            ours_kept, hf_kept, err_msg=f"{temperature},{top_k},{top_p}"
        )
        # and the real helper draws only kept tokens
        keys = dec._req_keys(jax.random.key(0), jnp.arange(4), 8, 0)
        toks = np.asarray(dec._sample_pick_bl(
            jnp.asarray(logits.T), keys, temperature, top_k, top_p
        ))
        assert all(hf_kept[b, toks[b]] for b in range(4))


def test_streaming_sampling_top_p_matches_oracle():
    """Engine sampling with nucleus filtering still equals the batch
    oracle (the filter runs on bit-identical logits both sides)."""
    cfg, llm_params, pspec, pparams, prefix = make_setup(seed=28, vocab=64)
    budget = 5
    embs = np.random.default_rng(29).normal(size=(7, 16)).astype(np.float32)
    key = jax.random.key(11)
    soft = proj.apply(pspec, pparams, jnp.asarray(embs), train=False)
    prefix_ids = jnp.tile(jnp.asarray(prefix)[None, :], (7, 1))
    want = np.asarray(mmmodel.caption_sample(
        cfg, llm_params, soft, prefix_ids, budget, PAD, key,
        temperature=1.1, top_p=0.85,
    ))
    eng = StreamingCaptioner(cfg, llm_params, pspec, pparams, prefix, budget,
                             PAD, pool=3, admit=2, k_steps=2,
                             temperature=1.1, top_p=0.85, sample_key=key)
    np.testing.assert_array_equal(eng.run(embs), want)
    np.testing.assert_array_equal(eng.run_bulk(embs), want)
