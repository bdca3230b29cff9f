"""End-to-end projector slice: config JSON -> train -> decode -> CIDEr ->
results JSON -> seed averaging, all offline on fixture data (the TPU
analogue of the reference's debug-mode smoke, SURVEY.md §4)."""

import json
import os
import os.path as osp

import pytest

from dmi_tpu.data.fixtures import generate_dataset
from dmi_tpu.train_projector import run


@pytest.fixture()
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    generate_dataset("data", "sydney", "RemoteCLIP-RN50-Unchanged", mm_dim=32,
                     n_train=4, n_eval=2, seed=0)
    return tmp_path


def make_config(tmp_path, **overrides):
    cfg = {
        "output_dir": "proj_1",
        "train_batch_size": 4,
        "eval_batch_size": 4,
        "learning_rate": 1e-3,
        "epochs_l": [2],
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
        "proj_name_or_path": "proj_1",
        "proj_arch": "mlp",
        "proj_n_layers": 2,
        "proj_dropout": 0.1,
        "output_root": "outputs",
    }
    cfg.update(overrides)
    path = tmp_path / "cfg_projector_smoke.json"
    path.write_text(json.dumps(cfg))
    return str(path)


def test_projector_end_to_end(workdir):
    cfg_path = make_config(workdir)
    run(cfg_path)

    # per-run results JSON (reference contract dmi/train.py:99-101)
    run_file = osp.join("outputs", "projector:cfg_projector_smoke-dsz" "full-seed7-results.json")
    assert osp.exists(run_file), os.listdir("outputs")
    results = json.load(open(run_file))
    assert set(results) == {"metrics", "gts", "preds", "ids", "eval_env"}
    # offline-fallback annotation (VERDICT r1 weak #4): which scorer
    # implementations/stages actually produced these numbers
    assert results["eval_env"]["coco_meteor_stages"] == ["exact", "stem"]
    m = results["metrics"]["RemoteCLIP-RN50-Unchanged"]
    assert "coco_cider" in m and "bleu" in m
    assert len(results["preds"]["RemoteCLIP-RN50-Unchanged"]) == 10  # 2 imgs x 5 caps

    # seed-averaged per-dataset aggregate (dmi/train.py:257-283)
    agg = json.load(open(osp.join("outputs", "sydney-results.json")))
    assert "projector:cfg_projector_smoke-dszfull" in agg

    # best checkpoint retained
    assert osp.exists(
        osp.join("checkpoints", "cfg_projector_smoke-dszfull-seed7-checkpoint-projector-best.pt")
    )

    # idempotent skip: second invocation must not retrain (fast no-op)
    run(cfg_path)


def test_ft_projector_from_checkpoint(workdir):
    cfg_path = make_config(workdir)
    run(cfg_path)
    best = osp.join(
        "checkpoints", "cfg_projector_smoke-dszfull-seed7-checkpoint-projector-best.pt"
    )
    ft_cfg = make_config(
        workdir,
        finetune_from_checkpoint=best,
        epochs_l=[1],
        dataset_size_l=["10"],
    )
    # rename so results files don't collide
    new_path = str(workdir / "cfg_ft_smoke.json")
    os.rename(ft_cfg, new_path)
    run(new_path)
    ft_file = osp.join("outputs", "ft_projector:cfg_ft_smoke-dsz10-seed7-results.json")
    assert osp.exists(ft_file)


def test_v1_style_multi_dataset_pretrain(workdir):
    """Stage-1 pretrain mixes several dataset/encoder pairs with
    length-weighted sampling (v1 config shape, dmi/train.py:76)."""
    from dmi_tpu.data.fixtures import generate_dataset as gen

    gen("data", "coco", "clip-vit-large-patch14", mm_dim=32, n_train=12, n_eval=4, seed=3)
    gen("data", "audiocaps", "clap-htsat-fused", mm_dim=32, n_train=6, n_eval=2, seed=4)

    cfg = make_config(
        workdir,
        menc_names_or_paths=["openai/clip-vit-large-patch14", "clap-htsat-fused"],
        load_extracted_features=[True, True],
        dataset_names_or_paths=["coco", "audiocaps"],
        epochs_l=[2],
        dataset_size_l=["full"],
    )
    new = str(workdir / "cfg_v1_multi.json")
    os.rename(cfg, new)
    run(new)
    rf = osp.join("outputs", "projector:cfg_v1_multi-dszfull-seed7-results.json")
    assert osp.exists(rf)
    results = json.load(open(rf))
    # one metrics entry per embedding manager
    assert set(results["metrics"]) == {"clip-vit-large-patch14", "clap-htsat-fused"}


@pytest.mark.slow
@pytest.mark.parametrize("lm", ["test:tiny-qwen2", "test:tiny-gemma2"])
def test_projector_end_to_end_families(workdir, lm):
    """The full stage-1 pipeline (train -> decode -> CIDEr -> results JSON)
    on the non-Llama decoder families: the reference's LM slot is any
    AutoModelForCausalLM (dmi/utils/model_utils.py:17-20)."""
    cfg_path = make_config(workdir, lm_name_or_path=lm, output_dir=f"proj_{lm[-5:]}")
    run(cfg_path)
    run_file = osp.join(
        "outputs", "projector:cfg_projector_smoke-dszfull-seed7-results.json"
    )
    assert osp.exists(run_file), os.listdir("outputs")
    results = json.load(open(run_file))
    m = results["metrics"]["RemoteCLIP-RN50-Unchanged"]
    assert "coco_cider" in m and "bleu" in m
