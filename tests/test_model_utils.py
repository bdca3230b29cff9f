"""LM/tokenizer builder tests, including the real HF-from-disk path."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from dmi_tpu.config import LMArgs
from dmi_tpu.models import llama
from dmi_tpu.training.model_utils import build_lm, build_tokenizer, is_instruct_lm

transformers = pytest.importorskip("transformers")


def test_test_tiny_resolution():
    args = LMArgs(lm_name_or_path="test:tiny", lm_dtype="float32")
    tok = build_tokenizer(args)
    cfg, params = build_lm(args, tok)
    assert cfg.vocab_size >= tok.vocab_size
    assert is_instruct_lm("test:tiny")
    # chat template installed on the fixture tokenizer
    out = tok.apply_chat_template(
        [{"role": "user", "content": "hi"}], tokenize=False, add_generation_prompt=True
    )
    assert out.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")


def test_build_lm_from_local_hf_directory(tmp_path):
    """Exercise the production path: AutoModelForCausalLM.from_pretrained on
    a local directory -> stacked-pytree conversion -> logits parity."""
    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        head_dim=16, rope_theta=10000.0, tie_word_embeddings=True,
        attn_implementation="eager", bos_token_id=0, eos_token_id=5,
        pad_token_id=5,
    )
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(hf_cfg)
    hf.eval()
    model_dir = tmp_path / "tiny_llama"
    hf.save_pretrained(model_dir)

    from dmi_tpu.data.tok_fixture import build_test_tokenizer

    tok = build_test_tokenizer()
    args = LMArgs(lm_name_or_path=str(model_dir), lm_dtype="float32")
    cfg, params = build_lm(args, tok)
    assert cfg.vocab_size == 128 and cfg.num_hidden_layers == 2
    assert cfg.rope_scaling_factor is None  # no llama3 scaling block
    assert cfg.eos_token_ids == (5,)

    rng = np.random.default_rng(0)
    embeds = rng.normal(size=(2, 7, 32)).astype(np.float32) * 0.1
    ours = np.asarray(llama.forward(cfg, params, jnp.asarray(embeds)))
    with torch.no_grad():
        theirs = hf(inputs_embeds=torch.tensor(embeds)).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-3, rtol=1e-3)


def test_tokenizer_from_local_dir(tmp_path):
    from dmi_tpu.data.tok_fixture import build_test_tokenizer

    src = build_test_tokenizer()
    tok_dir = tmp_path / "tok"
    src.save_pretrained(tok_dir)
    args = LMArgs(lm_name_or_path=str(tok_dir))
    tok = build_tokenizer(args)
    assert tok.pad_token == tok.eos_token
    ids = tok("a dog runs")["input_ids"]
    assert tok.decode(ids) == src.decode(src("a dog runs")["input_ids"])
