"""Gradient-summary logging (the wandb.watch analogue, dmi/train.py:70)."""

import numpy as np

import jax
import jax.numpy as jnp

from dmi_tpu.utils.grad_stats import HIST_EDGES, grad_summary, host_grad_summary


def test_grad_summary_norms_and_hist():
    grads = {
        "layers": [
            {"w": jnp.asarray([[3.0, 4.0]]), "b": jnp.asarray([0.0])},
        ]
    }
    s = grad_summary(grads)
    assert float(s["grad_global_norm"]) == 5.0
    assert float(s["grad_norm/layers.0.w"]) == 5.0
    assert float(s["grad_norm/layers.0.b"]) == 0.0
    hist = np.asarray(s["grad_hist"])
    assert hist.sum() == 3  # three leaf elements
    assert hist.shape == (len(HIST_EDGES) + 1,)

    host = host_grad_summary(s)
    assert isinstance(host["grad_hist"], list)
    assert isinstance(host["grad_global_norm"], float)


def test_grad_summary_inside_jit():
    @jax.jit
    def f(g):
        return grad_summary(g)["grad_global_norm"]

    assert float(f({"a": jnp.ones((4,))})) == 2.0


def test_projector_trainer_logs_grad_stats(tmp_path, monkeypatch):
    """End-to-end: the projector train loop writes grad_global_norm into
    the JSONL metric stream."""
    import json
    import os.path as osp

    from dmi_tpu.data.fixtures import generate_dataset
    from dmi_tpu.train_projector import run

    monkeypatch.chdir(tmp_path)
    generate_dataset("data", "sydney", "RemoteCLIP-RN50-Unchanged", mm_dim=32,
                     n_train=4, n_eval=2, seed=0)
    cfg = {
        "output_dir": "p", "train_batch_size": 4, "eval_batch_size": 4,
        "learning_rate": 1e-3, "epochs_l": [2], "dataset_size_l": ["full"],
        "warmup_steps": 1, "scheduler": "cosine_warmup", "logging_steps": 2,
        "save_steps": 8, "eval_steps": 8, "generate_steps": 8, "seeds": [7],
        "pad_to_multiple_of": 8,
        "menc_names_or_paths": ["chendelong/RemoteCLIP-RN50-Unchanged"],
        "mm_dim": 32, "load_extracted_features": [True],
        "lm_name_or_path": "test:tiny", "lm_dtype": "float32",
        "dataset_names_or_paths": ["sydney"], "proj_name_or_path": "p",
        "proj_arch": "mlp", "proj_n_layers": 2, "proj_dropout": 0.1,
        "output_root": "outputs",
    }
    json.dump(cfg, open("cfg_gs.json", "w"))
    run("cfg_gs.json")
    lines = [
        json.loads(l)
        for l in open(osp.join("logs", "cfg_gs-dszfull-seed7.metrics.jsonl"))
    ]
    with_grads = [l for l in lines if "grad_global_norm" in l]
    assert with_grads, [sorted(l) for l in lines]
    assert with_grads[0]["grad_global_norm"] > 0
    assert any(k.startswith("grad_norm/layers.0.w") for k in with_grads[0])
    assert len(with_grads[0]["grad_hist"]) == len(HIST_EDGES) + 1
