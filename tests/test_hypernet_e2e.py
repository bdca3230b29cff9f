"""Three-stage end-to-end: projector pretrain -> hypernet train (with
on-device isometric augmentation + text-interleaved conditioning) ->
32-shot-style fewshot integration of an unseen modality. All offline."""

import json
import os.path as osp

import pytest

from dmi_tpu.data.fixtures import generate_dataset
from dmi_tpu.train_hypernet import run as run_hypernet
from dmi_tpu.train_projector import run as run_projector
from tests.test_projector_e2e import make_config

MM = 32


@pytest.fixture()
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    generate_dataset("data", "sydney", "RemoteCLIP-RN50-Unchanged", mm_dim=MM,
                     n_train=4, n_eval=2, text_dim=MM, seed=0)
    generate_dataset("data", "sharegpt4v", "ViT-L-16-SigLIP2-384", mm_dim=MM,
                     n_train=12, n_eval=4, text_dim=MM, seed=1)
    generate_dataset("data", "candels", "zoobot-encoder-convnext_base", mm_dim=MM,
                     n_train=4, n_eval=2, text_dim=MM, seed=2)
    return tmp_path


def hypernet_config(tmp_path, proj_ckpt, mode, resume=None, **overrides):
    cfg = {
        "mode": mode,
        "output_dir": "hn_1",
        "train_batch_size": 4,
        "subset_batch_size": 4,
        "eval_batch_size": 4,
        "learning_rate": 1e-3,
        "epochs": 2,
        "dataset_size": "full",
        "warmup_steps": 2,
        "scheduler": "cosine_warmup",
        "logging_steps": 8,
        "save_steps": 8,
        "eval_steps": 8,
        "generate_steps": 1000,
        "seeds": [7],
        "gradient_accumulation_steps": 2,
        "pad_to_multiple_of": 8,
        "feed_txt_embs": True,
        "augment_emb_space": True,
        "menc_names_or_paths": ["timm/ViT-L-16-SigLIP2-384"],
        "fewshot_menc_names_or_paths": ["mwalmsley/zoobot-encoder-convnext_base"],
        "fewshot_load_extracted_features": [True],
        "mm_dim": MM,
        "load_extracted_features": [True],
        "lm_name_or_path": "test:tiny",
        "lm_dtype": "float32",
        "dataset_names_or_paths": ["sharegpt4v"],
        "fewshot_dataset_names_or_paths": ["candels"],
        "proj_name_or_path": proj_ckpt,
        "proj_arch": "mlp",
        "proj_n_layers": 2,
        "proj_dropout": 0.1,
        "hn_arch": "attention",
        "hn_hypnet_dim": MM,
        "hn_rank": 4,
        "hn_alpha": 4,
        "hn_predict_bias": True,
        "hn_use_pos_encs": True,
        "finetune_generated_projector": True,
        "fewshot_weight_decay": 1e-3,
        "output_root": "outputs",
    }
    if resume:
        cfg["resume_from_checkpoint"] = resume
    if mode == "fewshot":
        cfg["fewshot_dataset_sizes"] = ["10"]
        cfg["fewshot_epochs"] = [2]
    cfg.update(overrides)
    path = tmp_path / f"cfg_hypernet_{mode}.json"
    path.write_text(json.dumps(cfg))
    return str(path)


def test_three_stage_pipeline(workdir):
    # stage 1: projector pretrain (sydney stands in for the hr mix)
    run_projector(make_config(workdir, mm_dim=MM))
    proj_ckpt = osp.join(
        "checkpoints", "cfg_projector_smoke-dszfull-seed7-checkpoint-projector-best.pt"
    )
    assert osp.exists(proj_ckpt)

    # stage 2: hypernet training with rotation augmentation + text interleave
    run_hypernet(hypernet_config(workdir, proj_ckpt, "train"))
    hn_ckpt = osp.join("checkpoints", "cfg_hypernet_train-checkpoint-hypernet-best.pt")
    assert osp.exists(hn_ckpt)

    # stage 3: fewshot integration of the unseen galaxy modality
    run_hypernet(hypernet_config(workdir, proj_ckpt, "fewshot", resume=hn_ckpt))
    rf = osp.join("outputs", "hypernet:cfg_hypernet_fewshot-dsz10-seed7-results.json")
    assert osp.exists(rf)
    results = json.load(open(rf))
    m = results["metrics"]["zoobot-encoder-convnext_base"]
    assert "coco_cider" in m
    # aggregate JSON present
    agg = json.load(open(osp.join("outputs", "candels-results.json")))
    assert "hypernet:cfg_hypernet_fewshot-dsz10" in agg


def test_stage2_multi_dataset_training(workdir):
    """The v4 headline config trains on THREE hr datasets with uniform
    per-step loader choice (dmi/train_hypernet.py:125) — exercise the
    multi-loader path with two."""
    from dmi_tpu.data.fixtures import generate_dataset as gen

    gen("data", "clothodetail", "Cacophony", mm_dim=MM, n_train=10, n_eval=4,
        text_dim=MM, seed=5)

    run_projector(make_config(workdir, mm_dim=MM))
    proj_ckpt = osp.join(
        "checkpoints", "cfg_projector_smoke-dszfull-seed7-checkpoint-projector-best.pt"
    )
    cfg = hypernet_config(
        workdir, proj_ckpt, "train",
        menc_names_or_paths=["timm/ViT-L-16-SigLIP2-384", "Cacophony"],
        load_extracted_features=[True, True],
        dataset_names_or_paths=["sharegpt4v", "clothodetail"],
    )
    import os

    new = str(workdir / "cfg_hn_multi.json")
    os.rename(cfg, new)
    run_hypernet(new)
    assert osp.exists(
        osp.join("checkpoints", "cfg_hn_multi-checkpoint-hypernet-best.pt")
    )


def test_coalesced_micro_steps_match_sequential(workdir):
    """micro_batch_coalesce (the stage-2 MFU lever): identical config run
    with sequential accumulation vs 2-way coalescing must land on the same
    trained hypernet — same step-indexed batches, rotation keys and dropout
    rngs; only gradient summation order differs (fp-reassociation drift
    bound pinned here)."""
    import os

    import numpy as np

    from dmi_tpu.training.checkpoint import load_pytree

    run_projector(make_config(workdir, mm_dim=MM))
    proj_ckpt = osp.join(
        "checkpoints", "cfg_projector_smoke-dszfull-seed7-checkpoint-projector-best.pt"
    )

    paths = {}
    for name, coalesce in (("cfg_hn_seq", 1), ("cfg_hn_coal", 2)):
        cfg = hypernet_config(
            workdir, proj_ckpt, "train",
            gradient_accumulation_steps=4,
            micro_batch_coalesce=coalesce,
        )
        new = str(workdir / f"{name}.json")
        os.rename(cfg, new)
        run_hypernet(new)
        paths[name] = osp.join(
            "checkpoints", f"{name}-checkpoint-hypernet-best.pt"
        )
        assert osp.exists(paths[name])

    seq = load_pytree(paths["cfg_hn_seq"])["hypernet_state_dict"]
    coal = load_pytree(paths["cfg_hn_coal"])["hypernet_state_dict"]
    import jax

    leaves_s = jax.tree.leaves(seq)
    leaves_c = jax.tree.leaves(coal)
    assert len(leaves_s) == len(leaves_c) and len(leaves_s) > 0
    for a, b in zip(leaves_s, leaves_c):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6
        )
