"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from dmi_tpu.models import llama, mmmodel
from dmi_tpu.models import projector as proj
from dmi_tpu.parallel import (
    make_mesh,
    shard_batch,
    shard_llm_params,
    shard_params,
)


@pytest.fixture(scope="module")
def setup():
    cfg = llama.tiny_config(vocab_size=256, hidden_size=64, n_layers=2, n_heads=4, n_kv=2)
    llm_params = llama.init(jax.random.key(0), cfg)
    pspec = proj.ProjectorSpec(mm_dim=32, lm_dim=64, n_layers=2)
    pparams = proj.init(jax.random.key(1), pspec)
    rng = np.random.default_rng(0)
    B, T = 8, 16
    batch = {
        "embs": rng.normal(size=(B, 32)).astype(np.float32),
        "input_ids": rng.integers(1, 256, size=(B, T)).astype(np.int32),
        "attention_mask": np.ones((B, T), np.int32),
        "labels": rng.integers(1, 256, size=(B, T)).astype(np.int64),
    }
    return cfg, llm_params, pspec, pparams, batch


def _loss_fn(cfg, pspec):
    def loss(pparams, llm_params, embs, ids, mask, labels):
        soft = proj.apply(pspec, pparams, embs, train=False)
        return mmmodel.caption_loss(cfg, llm_params, soft, ids, mask, labels)

    return loss


def test_mesh_shapes():
    mesh = make_mesh(platform="cpu")
    assert mesh.devices.shape == (8, 1)
    mesh = make_mesh((4, 2), platform="cpu")
    assert mesh.axis_names == ("data", "model")
    with pytest.raises(ValueError):
        make_mesh((16, 2), platform="cpu")


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4)])
def test_sharded_loss_matches_single_device(setup, shape):
    cfg, llm_params, pspec, pparams, batch = setup
    loss = _loss_fn(cfg, pspec)

    single = float(
        jax.jit(loss)(
            pparams, llm_params, batch["embs"], batch["input_ids"],
            batch["attention_mask"], batch["labels"],
        )
    )

    mesh = make_mesh(shape, platform="cpu")
    llm_s = shard_llm_params(mesh, llm_params)
    p_s = shard_params(mesh, pparams)
    b_s = shard_batch(mesh, batch)
    sharded = float(
        jax.jit(loss)(
            p_s, llm_s, b_s["embs"], b_s["input_ids"],
            b_s["attention_mask"], b_s["labels"],
        )
    )
    assert abs(single - sharded) < 1e-4, (single, sharded)


def test_sharded_train_step_runs_and_matches(setup):
    """Full dp x tp train step (grads + AdamW update) on a (4,2) mesh must
    reproduce the single-device update."""
    cfg, llm_params, pspec, pparams, batch = setup
    loss = _loss_fn(cfg, pspec)
    opt = optax.adamw(1e-3)

    def step(pparams, opt_state, llm_params, b):
        l, g = jax.value_and_grad(loss)(
            pparams, llm_params, b["embs"], b["input_ids"],
            b["attention_mask"], b["labels"],
        )
        updates, opt_state = opt.update(g, opt_state, pparams)
        return optax.apply_updates(pparams, updates), opt_state, l

    opt_state = opt.init(pparams)
    ref_params, _, ref_loss = jax.jit(step)(pparams, opt_state, llm_params, batch)

    mesh = make_mesh((4, 2), platform="cpu")
    llm_s = shard_llm_params(mesh, llm_params)
    p_s = shard_params(mesh, pparams)
    b_s = shard_batch(mesh, batch)
    opt_s = shard_params(mesh, opt.init(p_s))
    new_params, _, l = jax.jit(step)(p_s, opt_s, llm_s, b_s)

    assert abs(float(l) - float(ref_loss)) < 1e-4
    for a, b in zip(jax.tree.leaves(ref_params), jax.tree.leaves(new_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sharded_decode_runs(setup):
    cfg, llm_params, pspec, pparams, batch = setup
    mesh = make_mesh((4, 2), platform="cpu")
    llm_s = shard_llm_params(mesh, llm_params)
    embs = shard_batch(mesh, {"e": batch["embs"]})["e"]
    soft = proj.apply(pspec, pparams, embs, train=False)
    toks = mmmodel.caption_generate(cfg, llm_s, soft, None, 4, 5)
    assert toks.shape == (8, 4)
    # matches the unsharded decode
    soft1 = proj.apply(pspec, pparams, jnp.asarray(batch["embs"]), train=False)
    toks1 = mmmodel.caption_generate(cfg, llm_params, soft1, None, 4, 5)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks1))


@pytest.mark.parametrize("family", ["qwen2", "gemma2", "qwen3", "olmo2",
                                    "granite", "gemma3", "mixtral", "olmoe"])
def test_sharded_family_loss_and_decode_match(family):
    """Tensor-parallel shardings cover the family param extensions: qwen2
    qkv biases shard with their matmul's output column, gemma-2/3
    post-block norms and qwen3/gemma3 per-head q/k norms replicate, olmo2's
    FULL-WIDTH q/k norms reduce across the sharded projection (GSPMD
    inserts the collective), granite's scalar multipliers are config-only,
    mixtral's expert axis shards as EXPERT PARALLELISM (each shard
    dense-evaluates its experts; the combine psums) — loss and greedy
    tokens must match single-device."""
    maker = {"qwen2": llama.tiny_qwen2_config, "gemma2": llama.tiny_gemma2_config,
             "qwen3": llama.tiny_qwen3_config, "olmo2": llama.tiny_olmo2_config,
             "granite": llama.tiny_granite_config,
             "gemma3": llama.tiny_gemma3_config,
             "mixtral": llama.tiny_mixtral_config,
             "olmoe": llama.tiny_olmoe_config}
    cfg = maker[family](vocab_size=256, hidden_size=64, n_layers=2,
                        n_heads=4, n_kv=2)
    llm_params = llama.init(jax.random.key(10), cfg)
    pspec = proj.ProjectorSpec(mm_dim=32, lm_dim=64, n_layers=2)
    pparams = proj.init(jax.random.key(11), pspec)
    rng = np.random.default_rng(12)
    B, T = 8, 16
    embs = rng.normal(size=(B, 32)).astype(np.float32)
    ids = rng.integers(1, 256, size=(B, T)).astype(np.int32)
    mask = np.ones((B, T), np.int32)
    labels = rng.integers(1, 256, size=(B, T)).astype(np.int64)

    loss = _loss_fn(cfg, pspec)
    single = float(jax.jit(loss)(pparams, llm_params, embs, ids, mask, labels))
    soft1 = proj.apply(pspec, pparams, jnp.asarray(embs), train=False)
    toks1 = mmmodel.caption_generate(cfg, llm_params, soft1, None, 4, 5)

    mesh = make_mesh((2, 4), platform="cpu")
    llm_s = shard_llm_params(mesh, llm_params)
    p_s = shard_params(mesh, pparams)
    b_s = shard_batch(mesh, {"embs": embs, "ids": ids, "mask": mask,
                             "labels": labels})
    sharded = float(jax.jit(loss)(p_s, llm_s, b_s["embs"], b_s["ids"],
                                  b_s["mask"], b_s["labels"]))
    assert abs(single - sharded) < 1e-4, (single, sharded)

    soft = proj.apply(pspec, p_s, b_s["embs"], train=False)
    toks = mmmodel.caption_generate(cfg, llm_s, soft, None, 4, 5)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks1))


def test_sharded_w8a8_decode_matches_single_device(setup):
    """Quantized {q8, s} leaves shard with their weight's layout (scales
    drop size-1 axes); tp + W8A8 greedy decode must match single-device."""
    from dmi_tpu.models.quant import quantize_llama

    cfg, llm_params, pspec, pparams, batch = setup
    qp = quantize_llama(llm_params, native=True)
    soft1 = proj.apply(pspec, pparams, jnp.asarray(batch["embs"]), train=False)
    toks1 = mmmodel.caption_generate(cfg, qp, soft1, None, 4, 5,
                                     prefill_params=llm_params)

    mesh = make_mesh((2, 4), platform="cpu")
    qp_s = shard_llm_params(mesh, qp)
    pre_s = shard_llm_params(mesh, llm_params)
    b_s = shard_batch(mesh, {"embs": batch["embs"]})
    soft = proj.apply(pspec, pparams, b_s["embs"], train=False)
    toks = mmmodel.caption_generate(cfg, qp_s, soft, None, 4, 5,
                                    prefill_params=pre_s)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks1))


@pytest.mark.parametrize("group_size", [None, 16])
def test_sharded_w4a8_decode_matches_single_device(setup, group_size):
    """Packed-int4 {qp, s | s4g} leaves shard via shard_llm_params (the
    packed K/2 axis takes the weight's spec — sharding is placement-only,
    SPMD keeps the global unpack+dot semantics; grouped scales replicate
    their group axis); tp + W4A8 greedy decode must match single-device."""
    from dmi_tpu.models.quant import quantize_llama

    cfg, llm_params, pspec, pparams, batch = setup
    qp4 = quantize_llama(llm_params, bits=4, group_size=group_size)
    soft1 = proj.apply(pspec, pparams, jnp.asarray(batch["embs"]), train=False)
    toks1 = mmmodel.caption_generate(cfg, qp4, soft1, None, 4, 5,
                                     prefill_params=llm_params)

    mesh = make_mesh((2, 4), platform="cpu")
    qp_s = shard_llm_params(mesh, qp4)
    pre_s = shard_llm_params(mesh, llm_params)
    b_s = shard_batch(mesh, {"embs": batch["embs"]})
    soft = proj.apply(pspec, pparams, b_s["embs"], train=False)
    toks = mmmodel.caption_generate(cfg, qp_s, soft, None, 4, 5,
                                    prefill_params=pre_s)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks1))
