"""Chat-template parity: our compact template must render byte-identically to
the reference template (dmi/model/__init__.py:134-357) for the conversation
shapes the framework uses (system? + user/assistant turns, no tools)."""

import re

import pytest

jinja2 = pytest.importorskip("jinja2")
from jinja2.sandbox import ImmutableSandboxedEnvironment  # noqa: E402

from dmi_tpu.chat_templates import LLAMA31_CHAT_TEMPLATE, LLAMA32_CHAT_TEMPLATE  # noqa: E402
from tests.conftest import REFERENCE_ROOT, requires_reference  # noqa: E402

GEN_TAG = re.compile(r"\{%-?\s*(end)?generation\s*-?%\}")


def render(template: str, messages, add_generation_prompt=False):
    # Replicates HF's jinja environment (trim_blocks/lstrip_blocks and a
    # strftime_now callable); generation tags are HF extensions, strip them.
    env = ImmutableSandboxedEnvironment(
        trim_blocks=True, lstrip_blocks=True, keep_trailing_newline=True
    )

    def raise_exception(msg):
        raise ValueError(msg)

    def strftime_now(fmt):
        return "16 Aug 2026"

    tpl = env.from_string(GEN_TAG.sub("", template))
    return tpl.render(
        messages=messages,
        bos_token="<|begin_of_text|>",
        add_generation_prompt=add_generation_prompt,
        raise_exception=raise_exception,
        strftime_now=strftime_now,
    )


def _load_reference_templates():
    import importlib.util
    import sys
    import types

    # The reference module imports its data loaders at module import time;
    # extract only the template string literals instead.
    src = open(f"{REFERENCE_ROOT}/dmi/model/__init__.py").read()
    ns: dict = {}
    # Execute just the template assignments (they are self-contained literals).
    lines = src.split("\n")
    keep = []
    recording = False
    for i, line in enumerate(lines):
        if line.startswith("LLAMA31_CHAT_TEMPLATE") or line.startswith("LLAMA32_CHAT_TEMPLATE"):
            recording = True
        if recording:
            keep.append(line)
        if recording and line.rstrip().endswith('"""') and len(keep) > 1:
            recording = False
    exec("\n".join(keep), ns)
    return ns["LLAMA31_CHAT_TEMPLATE"], ns["LLAMA32_CHAT_TEMPLATE"]


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


@requires_reference
@pytest.mark.parametrize("messages,gen_prompt", CASES)
def test_render_parity_with_reference(messages, gen_prompt):
    ref31, ref32 = _load_reference_templates()
    for ours, theirs in ((LLAMA31_CHAT_TEMPLATE, ref31), (LLAMA32_CHAT_TEMPLATE, ref32)):
        ours_out = render(ours, messages, gen_prompt)
        ref_out = render(theirs, messages, gen_prompt)
        assert ours_out == ref_out


def test_generation_tags_wrap_assistant_only():
    # The generation block must cover exactly the assistant content + eot.
    assert LLAMA32_CHAT_TEMPLATE.count("{% generation %}") == 1
    assert LLAMA32_CHAT_TEMPLATE.count("{% endgeneration %}") == 1
    start = LLAMA32_CHAT_TEMPLATE.index("{% generation %}")
    end = LLAMA32_CHAT_TEMPLATE.index("{% endgeneration %}")
    inner = LLAMA32_CHAT_TEMPLATE[start:end]
    assert "message['content'] | trim + '<|eot_id|>'" in inner
