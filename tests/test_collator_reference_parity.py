"""Bit-for-bit collator parity against the REFERENCE datacollator.

Loads dmi/data/base.py's `datacollator` function from the mounted reference
source (executed in isolation — its module pulls heavy deps) and fuzzes both
collators with random chat batches through the same tokenizer.  Our TPU
bucket extension is additional -100/pad columns, so parity is checked on
the reference's [batch, max_len] prefix.
"""

import ast
import copy
import os.path as osp
import random

import numpy as np
import pytest

from dmi_tpu.data.collator import collate_chat_batch
from dmi_tpu.data.tok_fixture import build_test_tokenizer
from tests.conftest import REFERENCE_ROOT, requires_reference

WORDS = "a dog runs two people walk sandy beach galaxy bright area water near the on".split()


def _load_reference_datacollator():
    src = open(osp.join(REFERENCE_ROOT, "dmi", "data", "base.py")).read()
    tree = ast.parse(src)
    fn = next(
        n for n in tree.body if isinstance(n, ast.FunctionDef) and n.name == "datacollator"
    )
    module = ast.Module(body=[fn], type_ignores=[])
    ns = {}
    import torch

    ns.update({"torch": torch, "deepcopy": copy.deepcopy})
    exec(compile(module, "<ref-datacollator>", "exec"), ns)
    return ns["datacollator"]


@requires_reference
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_collator_bit_parity_with_reference(seed):
    tok = build_test_tokenizer()
    ref_collator = _load_reference_datacollator()
    rng = random.Random(seed)

    chats = []
    for _ in range(rng.randint(2, 6)):
        cap = " ".join(rng.choices(WORDS, k=rng.randint(2, 9)))
        chats.append(
            [
                {"role": "user", "content": "Caption the image"},
                {"role": "assistant", "content": cap},
            ]
        )
    tokenized = tok.apply_chat_template(
        chats, tokenize=True, return_dict=True,
        return_assistant_tokens_mask=True, add_generation_prompt=False,
    )

    ours = collate_chat_batch(
        {k: [list(x) for x in v] for k, v in tokenized.items()},
        eos_token_id=tok.eos_token_id,
        pad_token_id=tok.pad_token_id,
        is_instruct=True,
        padding_side=tok.padding_side,
        bucket=8,
    )

    ref_inputs = {
        "input_ids": [list(x) for x in tokenized["input_ids"]],
        "attention_mask": [list(x) for x in tokenized["attention_mask"]],
        "assistant_masks": [list(x) for x in tokenized["assistant_masks"]],
    }
    theirs = ref_collator(tok, True, ref_inputs)
    W = theirs["input_ids"].shape[1]

    np.testing.assert_array_equal(ours["input_ids"][:, :W], theirs["input_ids"].numpy())
    np.testing.assert_array_equal(
        ours["attention_mask"][:, :W], theirs["attention_mask"].numpy()
    )
    np.testing.assert_array_equal(ours["labels"][:, :W], theirs["labels"].numpy())
    # bucket extension beyond the reference width is inert: -100 labels, 0 mask
    assert (ours["labels"][:, W:] == -100).all()
    assert (ours["attention_mask"][:, W:] == 0).all()
