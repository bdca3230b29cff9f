"""Non-instruct tokenization path and debug-mode overrides."""

import numpy as np

from dmi_tpu.config import TrainArgs, apply_debug_overrides
from dmi_tpu.data.collator import collate_chat_batch
from dmi_tpu.data.fixtures import generate_dataset
from dmi_tpu.data.loader import DatasetLoader
from dmi_tpu.data.tok_fixture import build_test_tokenizer
from dmi_tpu.registry import dataset_spec


def test_non_instruct_collation(tmp_path, monkeypatch):
    """is_instruct=False: plain tokenizer(captions), every token supervised
    (reference: dmi/data/base.py:95-98,23-31 skips masking)."""
    monkeypatch.chdir(tmp_path)
    generate_dataset("data", "sydney", "E", mm_dim=16, n_train=4, n_eval=2, seed=0)
    tok = build_test_tokenizer()
    args = TrainArgs(output_dir="x", train_batch_size=4, eval_batch_size=4,
                     epochs=1, dataset_size="full", seed=1)
    ld = DatasetLoader(dataset_spec("sydney"), tok, args, "E", False, "data")
    b = ld.train_batch(0)
    # non-instruct: labels == input_ids wherever attention==1 (no -100 mask
    # except bucket padding)
    m = b["attention_mask"] == 1
    np.testing.assert_array_equal(b["labels"][m], b["input_ids"][m])


def test_collator_left_padding():
    tok = build_test_tokenizer()
    t = tok(["a dog", "two people walk along a sandy beach"])
    batch = collate_chat_batch(
        {"input_ids": t["input_ids"]}, tok.eos_token_id, tok.pad_token_id,
        is_instruct=False, padding_side="left",
    )
    # short row is left-padded: padding at the start, content at the end
    row = batch["input_ids"][0]
    n = len(t["input_ids"][0]) + 1
    assert (row[: len(row) - n] == tok.pad_token_id).all()
    assert row[-1] == tok.eos_token_id
    assert (batch["attention_mask"][0][: len(row) - n] == 0).all()


def test_debug_overrides():
    t = TrainArgs(output_dir="x", train_batch_size=128, subset_batch_size=128,
                  eval_batch_size=128, debug=True)
    apply_debug_overrides(t, "projector")
    assert t.train_batch_size == 4 and t.eval_steps == 1 and t.generate_steps == 4

    t2 = TrainArgs(output_dir="x", train_batch_size=64, subset_batch_size=64,
                   eval_batch_size=64, debug=True)
    apply_debug_overrides(t2, "hypernet")
    # hypernet debug pins subset bsz to 128 (dmi/train_hypernet.py:480-489)
    assert t2.train_batch_size == 4 and t2.subset_batch_size == 128

    t3 = TrainArgs(output_dir="x", debug=False, eval_steps=5000)
    apply_debug_overrides(t3, "projector")
    assert t3.eval_steps == 5000  # untouched


def test_debug_truncates_datasets(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    generate_dataset("data", "sydney", "E", mm_dim=16, n_train=16, n_eval=8, seed=0)
    tok = build_test_tokenizer()
    args = TrainArgs(output_dir="x", train_batch_size=2, eval_batch_size=2,
                     epochs=1, dataset_size="full", seed=1, debug=True)
    ld = DatasetLoader(dataset_spec("sydney"), tok, args, "E", True, "data")
    assert len(ld.train) == 8  # 4 * train_batch_size
    assert len(ld.eval) == 8
