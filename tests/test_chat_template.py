"""Chat-template parity: our compact template must tokenize identically to
the reference template (dmi/model/__init__.py:134-357) for the conversation
shapes the framework uses (system? + user/assistant turns, no tools).

Parity is checked through the REAL HF renderer (`apply_chat_template` with
``return_assistant_tokens_mask=True``), not a hand-rolled jinja environment:
the reference template's sloppy indentation around its ``{% generation %}``
tags emits real whitespace tokens under HF's trim_blocks/lstrip_blocks env
(an unmasked '\\n' before assistant content and a masked '\\n' after
<|eot_id|>), which a tag-stripping text comparison silently erases — that
erasure hid a tokenization mismatch until the end-to-end equivalence run
(scripts/ref_equivalence.py) caught it.
"""

import pytest

from dmi_tpu.chat_templates import LLAMA31_CHAT_TEMPLATE, LLAMA32_CHAT_TEMPLATE  # noqa: E402
from tests.conftest import REFERENCE_ROOT, requires_reference  # noqa: E402


def _load_reference_templates():
    # The reference module imports its data loaders at module import time;
    # extract only the template string literals instead.
    src = open(f"{REFERENCE_ROOT}/dmi/model/__init__.py").read()
    ns: dict = {}
    lines = src.split("\n")
    keep = []
    recording = False
    for line in lines:
        if line.startswith("LLAMA31_CHAT_TEMPLATE") or line.startswith("LLAMA32_CHAT_TEMPLATE"):
            recording = True
        if recording:
            keep.append(line)
        if recording and line.rstrip().endswith('"""') and len(keep) > 1:
            recording = False
    exec("\n".join(keep), ns)
    return ns["LLAMA31_CHAT_TEMPLATE"], ns["LLAMA32_CHAT_TEMPLATE"]


@pytest.fixture(scope="module")
def tok():
    from dmi_tpu.data.tok_fixture import build_test_tokenizer

    return build_test_tokenizer()


CASES = [
    ([{"role": "user", "content": "Caption the image"},
      {"role": "assistant", "content": "a dog on grass "}], False),
    ([{"role": "system", "content": "You are terse."},
      {"role": "user", "content": "Describe the video"},
      {"role": "assistant", "content": "two people dance"}], False),
    ([{"role": "user", "content": "Caption the audio"}], True),
    ([{"role": "user", "content": "u1"}, {"role": "assistant", "content": "a1"},
      {"role": "user", "content": "u2"}, {"role": "assistant", "content": "a2"}], False),
]


def _apply(tok, template, messages, gen_prompt):
    tok.chat_template = template
    out = tok.apply_chat_template(
        messages,
        return_dict=True,
        return_assistant_tokens_mask=True,
        add_generation_prompt=gen_prompt,
    )
    return out["input_ids"], out["assistant_masks"]


@requires_reference
@pytest.mark.parametrize("messages,gen_prompt", CASES)
def test_token_and_mask_parity_with_reference(tok, messages, gen_prompt):
    ref31, ref32 = _load_reference_templates()
    for ours, theirs in ((LLAMA31_CHAT_TEMPLATE, ref31), (LLAMA32_CHAT_TEMPLATE, ref32)):
        ref_ids, ref_mask = _apply(tok, theirs, messages, gen_prompt)
        our_ids, our_mask = _apply(tok, ours, messages, gen_prompt)
        assert our_ids == ref_ids, (
            tok.convert_ids_to_tokens(our_ids),
            tok.convert_ids_to_tokens(ref_ids),
        )
        assert our_mask == ref_mask


@requires_reference
def test_decoded_text_splits_on_assistant_marker(tok):
    # The reference strips gts with gt.split('assistant\n\n\n')[-1]
    # (dmi/train.py:194) — only possible because of the extra unmasked
    # newline the template emits before assistant content.
    msgs = [{"role": "user", "content": "Caption the satellite image"},
            {"role": "assistant", "content": "a spiral galaxy"}]
    ids, _ = _apply(tok, LLAMA32_CHAT_TEMPLATE, msgs, False)
    txt = tok.decode(ids, skip_special_tokens=True)
    assert "assistant\n\n\n" in txt
    assert txt.split("assistant\n\n\n")[-1].strip() == "a spiral galaxy"


def test_generation_tags_wrap_assistant_only():
    # The generation block must cover exactly the assistant content + eot +
    # the reference's trailing masked newline.
    assert LLAMA32_CHAT_TEMPLATE.count("{% generation %}") == 1
    assert LLAMA32_CHAT_TEMPLATE.count("{% endgeneration %}") == 1
    start = LLAMA32_CHAT_TEMPLATE.index("{% generation %}")
    end = LLAMA32_CHAT_TEMPLATE.index("{% endgeneration %}")
    inner = LLAMA32_CHAT_TEMPLATE[start:end]
    assert "message['content'] | trim + '<|eot_id|>' + '\\n'" in inner
