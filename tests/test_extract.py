"""Offline extraction utility: written pkls must round-trip through the
real loader (schema parity with the reference archives, SURVEY.md §2 row
20's extract_features path)."""

import os.path as osp
import pickle

import numpy as np
import pytest

from dmi_tpu.config import TrainArgs
from dmi_tpu.data.extract import extract_split, read_manifest
from dmi_tpu.data.fixtures import generate_dataset
from dmi_tpu.data.loader import DatasetLoader
from dmi_tpu.data.tok_fixture import build_test_tokenizer
from dmi_tpu.registry import dataset_spec


@pytest.fixture(scope="module")
def tok():
    return build_test_tokenizer()


def _fake_encoder(dim):
    # payload "anything#<j>" -> constant row of j (batch-invariant, so the
    # test also proves batching/ordering in extract_split)
    def encode(payloads):
        return np.stack(
            [np.full(dim, float(str(p).split("#")[1]), np.float32) for p in payloads]
        )

    return encode


def test_extract_roundtrip_through_loader(tok, tmp_path):
    root = str(tmp_path)
    generate_dataset(root, "sydney", "FakeEnc", mm_dim=32, n_train=8, n_eval=4)
    spec = dataset_spec("sydney")
    ddir = osp.join(root, spec.path)

    n_train = None
    for split in ["train", "validation", "test"]:
        with open(osp.join(ddir, f"{split}_embs_FakeEnc.pkl"), "rb") as f:
            d = pickle.load(f)
        items = [(k, v["caption"], f"img#{j}") for j, (k, v) in enumerate(d.items())]
        if split == "train":
            n_train = len(items)
        out = extract_split(
            "sydney", "FakeEnc", split, items, _fake_encoder(32), root, batch_size=3
        )
        assert out == osp.join(ddir, f"{split}_embs_FakeEnc.pkl")

    args = TrainArgs(
        output_dir="x", train_batch_size=4, eval_batch_size=4, epochs=1,
        dataset_size="full", seed=0, pad_to_multiple_of=8,
    )
    ld = DatasetLoader(spec, tok, args, "FakeEnc", True, root)
    embs = np.asarray(ld.train.embs)
    assert embs.shape == (n_train, 32)
    # every row is the constant vector the fake encoder produced, and all
    # item indices survive (no row lost/duplicated by batching)
    assert np.all(embs == embs[:, :1])
    assert sorted(embs[:, 0].tolist()) == list(map(float, range(n_train)))


def test_extract_leading_axis_and_smiles(tmp_path):
    root = str(tmp_path)
    # audiocaps stores embs under a leading axis the loader strips via [0]
    ac = dataset_spec("audiocaps")
    assert ac.emb_index is not None
    extract_split(
        "audiocaps", "FakeEnc", "train",
        [("id0", "a dog barks", "x#7")], _fake_encoder(16), root,
    )
    with open(osp.join(root, ac.path, "train_embs_FakeEnc.pkl"), "rb") as f:
        d = pickle.load(f)
    assert d["id0"][ac.emb_key].shape == (1, 16)
    assert d["id0"]["caption"] == "a dog barks"

    chebi = dataset_spec("chebi20")
    extract_split(
        "chebi20", "FakeEnc", "train",
        [("5", "a molecule", "CCO#3")], _fake_encoder(16), root,
    )
    with open(osp.join(root, chebi.path, "train_embs_FakeEnc.pkl"), "rb") as f:
        d = pickle.load(f)
    assert d["5"]["smiles"] == "CCO#3"  # payload doubles as the SMILES field


def test_read_manifest(tmp_path):
    p = tmp_path / "m.tsv"
    p.write_text("id1\ta cap\t/x/a.jpg\n\nid2\tcap\twith\ttabs\n")
    items = read_manifest(str(p))
    assert items == [
        ("id1", "a cap", "/x/a.jpg"),
        ("id2", "cap", "with\ttabs"),  # payload keeps embedded tabs
    ]
