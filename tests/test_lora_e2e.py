"""End-to-end LoRA-baseline slice on fixture data."""

import json
import os.path as osp

import pytest

from dmi_tpu.data.fixtures import generate_dataset
from dmi_tpu.train_lora import run as run_lora
from dmi_tpu.train_projector import run as run_projector
from tests.test_projector_e2e import make_config


@pytest.fixture()
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    generate_dataset("data", "sydney", "RemoteCLIP-RN50-Unchanged", mm_dim=32,
                     n_train=4, n_eval=2, seed=0)
    return tmp_path


def test_lora_end_to_end(workdir):
    # stage 1: pretrain a projector to freeze
    run_projector(make_config(workdir))
    proj_ckpt = osp.join(
        "checkpoints", "cfg_projector_smoke-dszfull-seed7-checkpoint-projector-best.pt"
    )
    assert osp.exists(proj_ckpt)

    cfg = {
        "output_dir": "lora_1",
        "train_batch_size": 4,
        "eval_batch_size": 4,
        "learning_rate": 1e-3,
        "epochs_l": [1],
        "dataset_size_l": ["full"],
        "warmup_steps": 2,
        "scheduler": "cosine_warmup",
        "logging_steps": 8,
        "save_steps": 8,
        "eval_steps": 8,
        "generate_steps": 8,
        "seeds": [7],
        "pad_to_multiple_of": 8,
        "menc_names_or_paths": ["chendelong/RemoteCLIP-RN50-Unchanged"],
        "mm_dim": 32,
        "load_extracted_features": [True],
        "lm_name_or_path": "test:tiny",
        "lm_dtype": "float32",
        "dataset_names_or_paths": ["sydney"],
        "proj_name_or_path": proj_ckpt,
        "proj_arch": "mlp",
        "proj_n_layers": 2,
        "proj_dropout": 0.1,
        "lora_rank": 4,
        "lora_alpha": 4,
        "output_root": "outputs",
    }
    path = workdir / "cfg_lora_smoke.json"
    path.write_text(json.dumps(cfg))
    run_lora(str(path))

    rf = osp.join("outputs", "lora:cfg_lora_smoke-dszfull-seed7-results.json")
    assert osp.exists(rf)
    results = json.load(open(rf))
    assert "coco_cider" in results["metrics"]["RemoteCLIP-RN50-Unchanged"]
