"""Soft-prefix captioner parity vs HF composition (ProjectorMMModel
semantics, dmi/model/mmmodel.py:112-169)."""

import numpy as np
import torch

import jax.numpy as jnp

from dmi_tpu.models import llama, mmmodel
from tests.test_llama import EOS, PAD, make_pair


def test_caption_loss_matches_hf_composition():
    hf, cfg, params = make_pair(seed=10)
    rng = np.random.default_rng(10)
    B, T = 2, 8
    soft = rng.normal(size=(B, 64)).astype(np.float32) * 0.1
    ids = rng.integers(1, 256, size=(B, T))
    mask = np.ones((B, T), np.int64)
    labels = ids.copy()
    labels[:, :4] = -100

    ours = float(
        mmmodel.caption_loss(
            cfg, params, jnp.asarray(soft), jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(labels)
        )
    )

    with torch.no_grad():
        text_emb = hf.get_input_embeddings()(torch.tensor(ids))
        emb = torch.cat([torch.tensor(soft)[:, None, :], text_emb], dim=1)
        m = torch.cat([torch.ones(B, 1, dtype=torch.long), torch.tensor(mask)], dim=1)
        lab = torch.cat([torch.full((B, 1), -100, dtype=torch.long), torch.tensor(labels)], dim=1)
        theirs = float(hf(inputs_embeds=emb, attention_mask=m, labels=lab).loss)
    assert abs(ours - theirs) < 3e-4, (ours, theirs)


def test_caption_generate_matches_hf_composition():
    hf, cfg, params = make_pair(seed=11)
    rng = np.random.default_rng(11)
    B, P = 2, 5
    soft = rng.normal(size=(B, 64)).astype(np.float32) * 0.1
    prefix = rng.integers(1, 256, size=(B, P))

    max_new = 10
    ours = np.asarray(
        mmmodel.caption_generate(
            cfg, params, jnp.asarray(soft), jnp.asarray(prefix), max_new, PAD
        )
    )
    with torch.no_grad():
        pre_emb = hf.get_input_embeddings()(torch.tensor(prefix))
        emb = torch.cat([torch.tensor(soft)[:, None, :], pre_emb], dim=1)
        theirs = hf.generate(
            inputs_embeds=emb, max_new_tokens=max_new, do_sample=False,
            pad_token_id=PAD, eos_token_id=list(EOS),
        ).numpy()
    W = theirs.shape[1]
    np.testing.assert_array_equal(ours[:, :W], theirs)


def test_caption_generate_without_prefix():
    _, cfg, params = make_pair(seed=12)
    soft = jnp.asarray(np.random.default_rng(12).normal(size=(2, 64)).astype(np.float32))
    out = mmmodel.caption_generate(cfg, params, soft, None, 4, PAD)
    assert out.shape == (2, 4)


def test_caption_loss_grouped_matches_solo_runs():
    """caption_loss_grouped: each group's loss equals its SOLO caption_loss
    run, including groups padded past their own micro-batch length with
    labels=-100 / mask=0 (the grad-accum coalescing contract — extension
    positions are causally invisible and loss-excluded)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dmi_tpu.models import mmmodel

    _, cfg, params = make_pair(seed=13)
    rng = np.random.default_rng(0)
    B, H = 3, cfg.hidden_size
    lens = [6, 9, 4]  # per-group true (already collator-padded) lengths
    T = max(lens)
    G = len(lens)

    solo, ids_k, mask_k, labels_k, soft_k = [], [], [], [], []
    for g, L in enumerate(lens):
        soft = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
        ids = rng.integers(1, cfg.vocab_size, size=(B, L)).astype(np.int32)
        mask = np.ones((B, L), np.int32)
        labels = ids.astype(np.int64)  # pad labels count (reference quirk)
        solo.append(
            float(mmmodel.caption_loss(cfg, params, soft, jnp.asarray(ids),
                                       jnp.asarray(mask), jnp.asarray(labels)))
        )
        ext = T - L
        ids_k.append(np.concatenate([ids, np.zeros((B, ext), np.int32)], 1))
        mask_k.append(np.concatenate([mask, np.zeros((B, ext), np.int32)], 1))
        labels_k.append(
            np.concatenate([labels, np.full((B, ext), -100, np.int64)], 1)
        )
        soft_k.append(soft)

    losses = mmmodel.caption_loss_grouped(
        cfg, params,
        jnp.concatenate(soft_k, axis=0),
        jnp.asarray(np.concatenate(ids_k, axis=0)),
        jnp.asarray(np.concatenate(mask_k, axis=0)),
        jnp.asarray(np.concatenate(labels_k, axis=0)),
        G,
    )
    np.testing.assert_allclose(np.asarray(losses), np.asarray(solo), rtol=2e-6)
