"""Data-layer tests: tokenizer fixture, collator, sampler, InfFS, loader."""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from dmi_tpu.config import TrainArgs
from dmi_tpu.data.collator import collate_chat_batch, pad_batch_dim
from dmi_tpu.data.fixtures import generate_dataset
from dmi_tpu.data.inffs import inf_fs
from dmi_tpu.data.loader import DatasetLoader
from dmi_tpu.data.sampler import InfiniteSampler
from dmi_tpu.data.tok_fixture import build_test_tokenizer
from dmi_tpu.models import llama
from dmi_tpu.registry import dataset_spec
from tests.conftest import REFERENCE_ROOT, requires_reference


@pytest.fixture(scope="module")
def tok():
    return build_test_tokenizer()


def test_chat_template_assistant_mask(tok):
    chats = [
        [
            {"role": "user", "content": "Caption the image"},
            {"role": "assistant", "content": "a dog runs on green grass"},
        ]
    ]
    out = tok.apply_chat_template(
        chats, tokenize=True, return_dict=True,
        return_assistant_tokens_mask=True, add_generation_prompt=False,
    )
    ids = out["input_ids"][0]
    mask = out["assistant_masks"][0]
    assert len(ids) == len(mask)
    assert 0 < sum(mask) < len(mask)
    # the assistant span decodes back to the caption (+ eot)
    span = [t for t, m in zip(ids, mask) if m]
    text = tok.decode(span, skip_special_tokens=True)
    assert text.strip() == "a dog runs on green grass"


def test_generation_prompt_tokens(tok):
    ids = tok.apply_chat_template(
        [{"role": "user", "content": "Caption the image"}],
        tokenize=True, add_generation_prompt=True,
    )
    text = tok.decode(ids)
    assert text.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")


def test_collator_reference_semantics(tok):
    chats = [
        [
            {"role": "user", "content": "Caption the image"},
            {"role": "assistant", "content": "a dog"},
        ],
        [
            {"role": "user", "content": "Caption the image"},
            {"role": "assistant", "content": "two people walk along a sandy beach"},
        ],
    ]
    t = tok.apply_chat_template(
        chats, tokenize=True, return_dict=True,
        return_assistant_tokens_mask=True, add_generation_prompt=False,
    )
    batch = collate_chat_batch(
        t, eos_token_id=tok.eos_token_id, pad_token_id=tok.pad_token_id, bucket=1
    )
    ids, mask, labels = batch["input_ids"], batch["attention_mask"], batch["labels"]
    n0 = len(t["input_ids"][0]) + 1  # +eos
    n1 = len(t["input_ids"][1]) + 1
    assert ids.shape[1] == max(n0, n1)
    # eos appended and supervised (assistant mask extended with 1)
    assert ids[0, n0 - 1] == tok.eos_token_id
    assert labels[0, n0 - 1] == tok.eos_token_id
    # non-assistant prompt region is -100
    assert (labels[0, : n0 - 1] == -100).sum() > 0
    # reference quirk: pad region labels are pad_token_id, not -100
    assert (labels[0, n0:] == tok.pad_token_id).all()
    assert (mask[0, n0:] == 0).all()


def test_bucketing_preserves_loss(tok):
    """Bucket-extension (-100 labels) must not change the HF token-mean loss."""
    chats = [
        [
            {"role": "user", "content": "Caption the image"},
            {"role": "assistant", "content": "an industrial area with many buildings"},
        ]
    ]
    t = tok.apply_chat_template(
        chats, tokenize=True, return_dict=True,
        return_assistant_tokens_mask=True, add_generation_prompt=False,
    )
    b1 = collate_chat_batch(t, tok.eos_token_id, tok.pad_token_id, bucket=1)
    b16 = collate_chat_batch(t, tok.eos_token_id, tok.pad_token_id, bucket=16)
    assert b16["input_ids"].shape[1] % 16 == 0

    cfg = llama.tiny_config(vocab_size=tok.vocab_size + 10)
    import jax

    params = llama.init(jax.random.key(0), cfg)

    def loss(b):
        emb = llama.embed_tokens(cfg, params, jnp.asarray(b["input_ids"]))
        logits = llama.forward(cfg, params, emb, jnp.asarray(b["attention_mask"]))
        return float(llama.causal_lm_loss(logits, jnp.asarray(b["labels"])))

    assert abs(loss(b1) - loss(b16)) < 1e-5

    # batch-dim padding is inert too
    b_pad = pad_batch_dim(b16, 4)
    assert b_pad["input_ids"].shape[0] == 4
    assert abs(loss(b16) - loss(b_pad)) < 1e-5


def test_sampler_stateless_and_sized():
    s = InfiniteSampler(length=10, epochs=3, seed=7)
    assert len(s) == 30
    a = s.batch_indices(5, 4)
    b = InfiniteSampler(length=10, epochs=3, seed=7).batch_indices(5, 4)
    np.testing.assert_array_equal(a, b)
    assert (a >= 0).all() and (a < 10).all()
    assert not np.array_equal(s.batch_indices(5, 4), s.batch_indices(6, 4))

    p = InfiniteSampler(length=6, epochs=2, seed=1, replacement=False)
    epoch0 = np.concatenate([p.batch_indices(i, 3) for i in range(2)])
    assert sorted(epoch0.tolist()) == list(range(6))


def test_pick_loader_stateless_and_weighted():
    from dmi_tpu.training.trainer import pick_loader

    picks = [pick_loader(3, s, 3) for s in range(300)]
    assert picks == [pick_loader(3, s, 3) for s in range(300)]  # stateless
    assert set(picks) == {0, 1, 2}  # uniform default touches every loader

    # weighted: a zero-weight loader is never picked, normalization implicit
    w = [pick_loader(3, s, 3, weights=[5.0, 0.0, 1.0]) for s in range(300)]
    assert 1 not in w
    assert w.count(0) > w.count(2) > 0


@requires_reference
def test_inffs_matches_reference():
    # load the reference module directly (its package __init__ pulls heavy
    # optional deps like timm)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_inffs", os.path.join(REFERENCE_ROOT, "dmi", "data", "inffs.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    RefInfFS = mod.InfFS
    x = np.random.default_rng(0).normal(size=(40, 12))
    x[:, 3] *= 5.0  # give features distinct energies
    ranked_ref, w_ref = RefInfFS().infFS(x.copy(), None, 0.2, False, False)
    ranked_ours, w_ours = inf_fs(x.copy(), alpha=0.2)
    np.testing.assert_allclose(w_ours, w_ref, rtol=1e-8)
    np.testing.assert_array_equal(ranked_ours, ranked_ref)


@pytest.fixture(scope="module")
def sydney_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data"))
    generate_dataset(root, "sydney", "RemoteCLIP-RN50-Unchanged", mm_dim=32,
                     n_train=8, n_eval=3, seed=0)
    return root


def _targs(**kw):
    base = dict(
        output_dir="x", train_batch_size=4, eval_batch_size=4,
        subset_batch_size=6, epochs=2, dataset_size="full", seed=11,
        pad_to_multiple_of=8,
    )
    base.update(kw)
    return TrainArgs(**base)


def test_loader_end_to_end(tok, sydney_root):
    spec = dataset_spec("sydney")
    args = _targs()
    ld = DatasetLoader(spec, tok, args, "RemoteCLIP-RN50-Unchanged", True, sydney_root)
    assert len(ld.train) == 8 * 5  # caps_per_image=5
    # total steps = ceil(samples*epochs / batch) — torch DataLoader length
    # semantics the reference derives its step count from (dmi/train.py:75)
    assert ld.total_train_steps() == -(-len(ld.train) * 2 // args.train_batch_size)

    b = ld.train_batch(0)
    assert b["input_ids"].shape[0] == 4
    assert b["input_ids"].shape[1] % 8 == 0
    assert b["embs"].shape == (4, 32)
    # deterministic: same step -> same batch
    b2 = ld.train_batch(0)
    np.testing.assert_array_equal(b["embs"], b2["embs"])

    evs = list(ld.eval_batches("validation"))
    assert len(evs) == ld.n_eval_batches("validation")
    assert "ids" in evs[0]
    total = sum(e["input_ids"].shape[0] for e in evs)
    assert total == len(ld.eval)


def test_loader_baseid_subsample(tok, sydney_root):
    args = _targs(dataset_size="10")
    ld = DatasetLoader(
        dataset_spec("sydney"), tok, args, "RemoteCLIP-RN50-Unchanged", True, sydney_root
    )
    assert len(ld.train) == 10
    # whole caption groups: base ids span at most 10//5 + 1 groups
    bases = {i.split("_")[0] for i in ld.train.ids}
    assert len(bases) <= 3


def test_loader_feed_txt_embs_subset(tok, sydney_root):
    args = _targs(feed_txt_embs=True)
    ld = DatasetLoader(
        dataset_spec("sydney"), tok, args, "RemoteCLIP-RN50-Unchanged", True, sydney_root
    )
    out = ld.subset_batch(0)
    embs, text_embs, prefix_emb = out
    assert embs.shape == (6, 32)
    assert text_embs.shape == (6, 64)
    assert prefix_emb.shape == (1, 64)


def test_loader_inffs_selection(tok, sydney_root):
    args = _targs(n_components=16)
    ld = DatasetLoader(
        dataset_spec("sydney"), tok, args, "RemoteCLIP-RN50-Unchanged", True, sydney_root
    )
    assert ld.selected_features is not None and len(ld.selected_features) == 16
    b = ld.train_batch(0)
    assert b["embs"].shape == (4, 16)


def test_chebi20_smiles_in_user_turn(tok, tmp_path):
    root = str(tmp_path)
    generate_dataset(root, "chebi20", "MolCA", mm_dim=16, n_train=6, n_eval=2)
    args = _targs(train_batch_size=2)
    ld = DatasetLoader(dataset_spec("chebi20"), tok, args, "MolCA", True, root)
    assert ld.train.smiles is not None
    b = ld.train_batch(0)
    text = tok.decode(b["input_ids"][0])
    assert "O<|eot_id|>" in text or "O" in text  # smiles embedded in user turn


def test_coco_family_pretokenized(tok, tmp_path):
    root = str(tmp_path)
    generate_dataset(root, "coco", "clip-vit-large-patch14", mm_dim=16, n_train=8, n_eval=4)
    args = _targs(train_batch_size=2)
    ld = DatasetLoader(dataset_spec("coco"), tok, args, "clip-vit-large-patch14", True, root)
    assert ld._pretok is not None
    b = ld.train_batch(0)
    assert b["embs"].shape == (2, 16)
    text = tok.decode(b["input_ids"][0])
    assert "Caption the image" in text


def test_emb_index_family(tok, tmp_path):
    """audiocaps-style datasets store a leading axis and take [0]."""
    root = str(tmp_path)
    generate_dataset(root, "audiocaps", "clap-htsat-fused", mm_dim=16, n_train=6, n_eval=2)
    args = _targs(train_batch_size=2)
    ld = DatasetLoader(dataset_spec("audiocaps"), tok, args, "clap-htsat-fused", True, root)
    assert ld.train.embs.shape[1] == 16  # [0] applied at load


def test_coco_family_subset_two_tuple(tok, tmp_path):
    """coco-family subset collate with feed_txt_embs yields (embs, text) —
    no prefix embedding (dmi/data/coco.py:166-182) — and the hypernet
    conditioning pipeline consumes it."""
    root = str(tmp_path)
    generate_dataset(root, "coco", "clip-vit-large-patch14", mm_dim=16,
                     n_train=8, n_eval=4, text_dim=16)
    args = _targs(train_batch_size=2, feed_txt_embs=True)
    ld = DatasetLoader(dataset_spec("coco"), tok, args, "clip-vit-large-patch14", True, root)
    out = ld.subset_batch(0)
    assert isinstance(out, tuple) and len(out) == 2

    from dmi_tpu.training.embeddings import EmbeddingManager
    from dmi_tpu.training.hypernet_trainer import process_embeddings

    mgr = EmbeddingManager("x/clip-vit-large-patch14")
    normed = mgr.get_embeddings(out)
    assert len(normed) == 2
    mm = mgr.get_embeddings(ld.train_batch(0)["embs"])
    import jax

    mm2, z = process_embeddings(
        mm, normed, feed_txt_embs=True, augment=True,
        rotate_key=jax.random.key(0), pad_to=None,
    )
    assert z.shape == (2 * args.subset_batch_size, 16)
    assert bool(jnp.isfinite(z).all())


def test_prefetcher_order_and_values():
    from dmi_tpu.data.prefetch import Prefetcher

    seen = []
    pf = Prefetcher(lambda s: s * 10, depth=2)
    for step, batch in pf.run(3, 9):
        seen.append((step, batch))
    assert seen == [(s, s * 10) for s in range(3, 9)]


def test_prefetcher_propagates_worker_exception():
    from dmi_tpu.data.prefetch import Prefetcher

    def bad(step):
        if step == 2:
            raise ValueError("boom at 2")
        return step

    pf = Prefetcher(bad, depth=2)
    out = []
    import pytest as _pytest

    with _pytest.raises(ValueError, match="boom at 2"):
        for step, batch in pf.run(0, 5):
            out.append(step)
    assert out == [0, 1]


def test_columnar_cache_roundtrip(tok, tmp_path):
    """Second construction loads the .npz sidecar, identical columns."""
    import os as _os

    root = str(tmp_path)
    generate_dataset(root, "sydney", "E2", mm_dim=16, n_train=4, n_eval=2, seed=0)
    args = _targs()
    ld1 = DatasetLoader(dataset_spec("sydney"), tok, args, "E2", True, root)
    cache = ld1._columnar_cache_path("train")
    assert _os.path.exists(cache)
    ld2 = DatasetLoader(dataset_spec("sydney"), tok, args, "E2", True, root)
    assert ld2.train.ids == ld1.train.ids
    assert ld2.train.captions == ld1.train.captions
    np.testing.assert_array_equal(ld2.train.embs, ld1.train.embs)

    # stale cache invalidation: touching the pkl forces a re-parse
    pkl = _os.path.join(root, "sydney", "train_embs_E2.pkl")
    _os.utime(pkl, None)
    ld3 = DatasetLoader(dataset_spec("sydney"), tok, args, "E2", True, root)
    assert ld3.train.ids == ld1.train.ids
