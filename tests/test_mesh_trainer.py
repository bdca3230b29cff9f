"""mesh_shape config wiring: a trainer on a (4,2) mesh reproduces the
single-device loss trajectory."""

import numpy as np
import pytest

import jax

from dmi_tpu.config import TrainArgs
from dmi_tpu.data.fixtures import generate_dataset
from dmi_tpu.data.loader import DatasetLoader
from dmi_tpu.data.tok_fixture import build_test_tokenizer
from dmi_tpu.models import llama
from dmi_tpu.models import projector as proj
from dmi_tpu.registry import dataset_spec
from dmi_tpu.training.embeddings import EmbeddingManager
from dmi_tpu.training.projector_trainer import ProjectorTrainer


def test_mesh_trainer_matches_single_device(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    generate_dataset("data", "sydney", "E", mm_dim=32, n_train=4, n_eval=2, seed=0)
    tok = build_test_tokenizer()

    def make(mesh_shape):
        args = TrainArgs(
            output_dir="x", train_batch_size=8, eval_batch_size=8, epochs=1,
            dataset_size="full", seed=5, learning_rate=1e-3, warmup_steps=2,
            save_steps=1000, eval_steps=1000, generate_steps=1000,
            mesh_shape=mesh_shape,
        )
        cfg = llama.tiny_config(vocab_size=tok.vocab_size + 8, hidden_size=64)
        llm = llama.init(jax.random.key(0), cfg)
        pspec = proj.ProjectorSpec(mm_dim=32, lm_dim=64, n_layers=2)
        pparams = proj.init(jax.random.key(1), pspec)
        loader = DatasetLoader(dataset_spec("sydney"), tok, args, "E", True, "data")
        return ProjectorTrainer(
            name="mesh_test", llm_cfg=cfg, llm_params=llm, proj_spec=pspec,
            proj_params=pparams, loaders=[loader],
            emb_mgrs=[EmbeddingManager("x/E")], tokenizer=tok, train_args=args,
        )

    t_single = make(None)
    t_mesh = make([4, 2])
    assert t_mesh.mesh is not None and t_mesh.mesh.devices.shape == (4, 2)

    for step in range(4):
        l1, _ = t_single.train_step(step, 8)
        l2, _ = t_mesh.train_step(step, 8)
        assert abs(l1 - l2) < 1e-4, (step, l1, l2)

    for a, b in zip(jax.tree.leaves(t_single.state.params), jax.tree.leaves(t_mesh.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
