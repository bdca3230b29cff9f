"""Exact checkpoint resume: params + optimizer state + step restore."""

import os.path as osp

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmi_tpu.config import TrainArgs
from dmi_tpu.data.fixtures import generate_dataset
from dmi_tpu.data.loader import DatasetLoader
from dmi_tpu.data.tok_fixture import build_test_tokenizer
from dmi_tpu.models import llama
from dmi_tpu.models import projector as proj
from dmi_tpu.registry import dataset_spec
from dmi_tpu.training.embeddings import EmbeddingManager
from dmi_tpu.training.projector_trainer import ProjectorTrainer


@pytest.fixture()
def pieces(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    generate_dataset("data", "sydney", "RemoteCLIP-RN50-Unchanged", mm_dim=32,
                     n_train=4, n_eval=2, seed=0)
    tok = build_test_tokenizer()
    args = TrainArgs(
        output_dir="x", train_batch_size=4, eval_batch_size=4, epochs=2,
        dataset_size="full", seed=3, learning_rate=1e-3, warmup_steps=2,
        save_steps=1000, eval_steps=1000, generate_steps=1000,
    )
    cfg = llama.tiny_config(vocab_size=tok.vocab_size + 8, hidden_size=64)
    llm = llama.init(jax.random.key(0), cfg)
    pspec = proj.ProjectorSpec(mm_dim=32, lm_dim=64, n_layers=2)
    pparams = proj.init(jax.random.key(1), pspec)
    loader = DatasetLoader(dataset_spec("sydney"), tok, args, "RemoteCLIP-RN50-Unchanged", True, "data")
    mgr = EmbeddingManager("chendelong/RemoteCLIP-RN50-Unchanged")

    def make():
        return ProjectorTrainer(
            name="resume_test", llm_cfg=cfg, llm_params=llm, proj_spec=pspec,
            proj_params=pparams, loaders=[loader], emb_mgrs=[mgr],
            tokenizer=tok, train_args=args,
        )

    return make


def test_resume_reproduces_uninterrupted_run(pieces):
    make = pieces
    total = 8

    # uninterrupted: 8 steps
    t1 = make()
    for step in range(total):
        t1.train_step(step, total)
    ref = t1.state.params

    # interrupted at 4, checkpointed with optimizer state, resumed
    t2 = make()
    for step in range(4):
        t2.train_step(step, total)
    t2.ckpt.save(3, 0.0, "coco_cider", t2.state.params, optimizer_state=t2.state.opt_state)

    t3 = make()
    start = t3.resume()
    assert start == 4
    for step in range(start, total):
        t3.train_step(step, total)

    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(t3.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_resume_without_checkpoint_starts_at_zero(pieces):
    t = pieces()
    assert t.resume() == 0


def test_orbax_backend_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from dmi_tpu.models import projector as proj
    from dmi_tpu.training.checkpoint import load_pytree_orbax, save_pytree_orbax

    pspec = proj.ProjectorSpec(mm_dim=16, lm_dim=32, n_layers=2)
    params = proj.init(jax.random.key(0), pspec)
    path = str(tmp_path / "orbax_ckpt")
    save_pytree_orbax(path, params)
    restored = load_pytree_orbax(path, like=params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_sharded_restore_into_mesh_shardings(tmp_path):
    """Per-process sharded orbax path (VERDICT r2 #10): save sharded
    state, restore via the abstract sharded_like target, and get the
    original shardings back without a host gather."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dmi_tpu.parallel import make_mesh
    from dmi_tpu.training.checkpoint import (
        load_pytree_orbax, save_pytree_orbax, sharded_like,
    )

    mesh = make_mesh((4, 2))
    tree = {
        "w": jax.device_put(
            jnp.arange(64, dtype=jnp.float32).reshape(8, 8),
            NamedSharding(mesh, P(None, "model")),
        ),
        "b": jax.device_put(
            jnp.arange(8, dtype=jnp.float32), NamedSharding(mesh, P())
        ),
        "step": 7,
    }
    path = str(tmp_path / "sharded_ckpt")
    save_pytree_orbax(path, tree)
    restored = load_pytree_orbax(path, like=sharded_like(tree))
    assert restored["w"].sharding == tree["w"].sharding
    assert restored["b"].sharding == tree["b"].sharding
    assert restored["step"] == 7
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.asarray(tree["w"]))


def test_resume_from_torch_checkpoint_restores_adamw_moments(pieces, tmp_path):
    """resume(path) on a reference torch checkpoint must splice the AdamW
    moments into the optax chain (count + transposed mu/nu), not silently
    reinitialize them (exactness vs executed torch is pinned in
    test_optimizer_interop.py; this covers the trainer wiring)."""
    import torch

    rng = np.random.default_rng(7)
    shapes = [(64, 32), (64,), (64, 64), (64,)]  # torch (out, in) layout
    names = ["net.0.weight", "net.0.bias", "net.3.weight", "net.3.bias"]
    sd = {n: torch.tensor(rng.normal(size=s).astype(np.float32))
          for n, s in zip(names, shapes)}
    opt_state = {
        "state": {
            i: {
                "step": torch.tensor(5.0),
                "exp_avg": torch.tensor(
                    rng.normal(size=s).astype(np.float32)),
                "exp_avg_sq": torch.tensor(
                    np.abs(rng.normal(size=s)).astype(np.float32)),
            }
            for i, s in enumerate(shapes)
        },
        "param_groups": [{"lr": 1e-3, "params": [0, 1, 2, 3]}],
    }
    path = str(tmp_path / "ref-checkpoint-projector-best.pt")
    torch.save({"step_idx": 5, "projector_state_dict": sd,
                "optimizer_state_dict": opt_state, "loss": 0.1}, path)

    tr = pieces()
    start = tr.resume(path)
    assert start == 6

    def find_adam(node):
        if hasattr(node, "mu") and hasattr(node, "nu"):
            return node
        if isinstance(node, tuple):
            for v in node:
                r = find_adam(v)
                if r is not None:
                    return r
        return None

    adam = find_adam(tr.state.opt_state)
    assert int(adam.count) == 5
    np.testing.assert_allclose(
        np.asarray(adam.mu["layers"][0]["w"]),
        opt_state["state"][0]["exp_avg"].numpy().T,
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(adam.nu["layers"][1]["b"]),
        opt_state["state"][3]["exp_avg_sq"].numpy(),
        rtol=1e-6,
    )
    # params restored too (transposed into (in, out))
    np.testing.assert_allclose(
        np.asarray(tr.state.params["layers"][0]["w"]),
        sd["net.0.weight"].numpy().T,
        rtol=1e-6,
    )


def test_hypernet_load_checkpoint_restores_torch_adamw_moments(tmp_path, monkeypatch):
    """HypernetTrainer.load_checkpoint on a reference torch checkpoint must
    splice the hypernet param set's AdamW moments (the wrapper's frozen
    projector is not in the optimizer, dmi/train_hypernet.py:220-221)."""
    import torch

    from dmi_tpu.config import FewshotArgs
    from dmi_tpu.models import hypernet as hn
    from dmi_tpu.models import torch_import as ti
    from dmi_tpu.training.hypernet_trainer import HypernetTrainer

    monkeypatch.chdir(tmp_path)
    generate_dataset("data", "sharegpt4v", "ViT-L-16-SigLIP2-384", mm_dim=32,
                     n_train=8, n_eval=2, seed=0)
    tok = build_test_tokenizer()
    args = TrainArgs(
        output_dir="x", train_batch_size=4, eval_batch_size=4,
        subset_batch_size=4, epochs=1, dataset_size="full", seed=3,
        learning_rate=1e-3, warmup_steps=2, save_steps=1000, eval_steps=1000,
        generate_steps=1000,
    )
    cfg = llama.tiny_config(vocab_size=tok.vocab_size + 8, hidden_size=64)
    llm = llama.init(jax.random.key(0), cfg)
    pspec = proj.ProjectorSpec(mm_dim=32, lm_dim=64, n_layers=2)
    pparams = proj.init(jax.random.key(1), pspec)
    hspec = hn.HypnetSpec(lm_dim=64, mm_dim=32, n_tokens=4, arch="attention",
                          n_heads=4, hypnet_dim=32, rank=4, alpha=4,
                          n_proj_layers=2, use_pos_encs=True)
    hparams = hn.init(jax.random.key(2), hspec)
    loader = DatasetLoader(dataset_spec("sharegpt4v"), tok, args,
                           "ViT-L-16-SigLIP2-384", True, "data")
    mgr = EmbeddingManager("timm/ViT-L-16-SigLIP2-384")
    trainer = HypernetTrainer(
        name="hn_resume_test", llm_cfg=cfg, llm_params=llm, proj_spec=pspec,
        frozen_proj_params=pparams, hn_spec=hspec, hn_params=hparams,
        loaders=[loader], emb_mgrs=[mgr], fewshot_loaders=[],
        fewshot_emb_mgrs=[], tokenizer=tok, train_args=args,
        fewshot_args=FewshotArgs(finetune_generated_projector=True),
    )

    # reference-envelope checkpoint: wrapper sd + AdamW moments over the
    # hypernet params (indexing = sd key order minus the pe buffer)
    hn_sd = ti.export_hypernet_state_dict(hparams, hspec)
    rng = np.random.default_rng(8)
    names = [k for k in hn_sd if k != "pos_encs.pe"]
    opt_state = {
        "state": {
            i: {
                "step": torch.tensor(9.0),
                "exp_avg": torch.tensor(
                    rng.normal(size=hn_sd[n].shape).astype(np.float32)),
                "exp_avg_sq": torch.tensor(
                    np.abs(rng.normal(size=hn_sd[n].shape)).astype(np.float32)),
            }
            for i, n in enumerate(names)
        },
        "param_groups": [{"lr": 1e-3, "params": list(range(len(names)))}],
    }
    path = str(tmp_path / "ref-checkpoint-hypernet-best.pt")
    torch.save({
        "step_idx": 9,
        "hypernet_state_dict": {
            f"hypernet.{k}": torch.tensor(np.array(v)) for k, v in hn_sd.items()
        },
        "optimizer_state_dict": opt_state,
        "loss": 0.5,
    }, path)

    out = trainer.load_checkpoint(path)
    assert out["step_idx"] == 9

    def find_adam(node):
        if hasattr(node, "mu") and hasattr(node, "nu"):
            return node
        if isinstance(node, tuple):
            for v in node:
                r = find_adam(v)
                if r is not None:
                    return r
        return None

    adam = find_adam(trainer.state.opt_state)
    assert int(adam.count) == 9
    # a generator-head moment: exported (out, in) torch layout -> our (in, out)
    gi = names.index("generators.0.weight")
    np.testing.assert_allclose(
        np.asarray(adam.mu["generators"][0]["w"]),
        opt_state["state"][gi]["exp_avg"].numpy().T,
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(adam.mu["prefix_tokens"]),
        opt_state["state"][names.index("prefix_tokens")]["exp_avg"].numpy(),
        rtol=1e-6,
    )


def test_lora_trainer_resume_restores_torch_adamw_moments(pieces, tmp_path):
    """LoraTrainer inherits resume(); a reference torch LoRA checkpoint
    (loras.{i}.A|B + torch AdamW state) must restore adapters AND splice
    the moments (converter exactness pinned in test_optimizer_interop;
    this covers the lora_model trainer wiring end to end)."""
    import torch

    from dmi_tpu.config import TrainArgs
    from dmi_tpu.data.loader import DatasetLoader
    from dmi_tpu.data.tok_fixture import build_test_tokenizer
    from dmi_tpu.models import lora
    from dmi_tpu.registry import dataset_spec
    from dmi_tpu.training.embeddings import EmbeddingManager
    from dmi_tpu.training.lora_trainer import LoraTrainer

    tok = build_test_tokenizer()
    args = TrainArgs(
        output_dir="x", train_batch_size=4, eval_batch_size=4, epochs=2,
        dataset_size="full", seed=3, learning_rate=1e-3, warmup_steps=2,
        save_steps=1000, eval_steps=1000, generate_steps=1000,
    )
    cfg = llama.tiny_config(vocab_size=tok.vocab_size + 8, hidden_size=64)
    llm = llama.init(jax.random.key(0), cfg)
    pspec = proj.ProjectorSpec(mm_dim=32, lm_dim=64, n_layers=2)
    pparams = proj.init(jax.random.key(1), pspec)
    lspec = lora.LoraSpec(rank=4, alpha=4, n_proj_layers=2)
    lparams = lora.init(jax.random.key(2), lspec, pspec)
    loader = DatasetLoader(dataset_spec("sydney"), tok, args,
                           "RemoteCLIP-RN50-Unchanged", True, "data")
    mgr = EmbeddingManager("chendelong/RemoteCLIP-RN50-Unchanged")
    tr = LoraTrainer(
        name="lora_resume_test", llm_cfg=cfg, llm_params=llm, proj_spec=pspec,
        lora_spec=lspec, lora_params=lparams, frozen_proj_params=pparams,
        loaders=[loader], emb_mgrs=[mgr], tokenizer=tok, train_args=args,
    )

    # a reference-layout torch checkpoint: ParameterList order A0,B0,A1,B1
    rng = np.random.default_rng(17)
    flat = []
    sd = {}
    for i, ad in enumerate(lparams):
        for tkey, okey in (("A", "a"), ("B", "b")):
            arr = rng.normal(size=np.asarray(ad[okey]).shape).astype(np.float32)
            sd[f"loras.{i}.{tkey}"] = torch.tensor(arr)
            flat.append(arr)
    opt_state = {
        "state": {
            j: {
                "step": torch.tensor(5.0),
                "exp_avg": torch.tensor(rng.normal(size=a.shape).astype(np.float32)),
                "exp_avg_sq": torch.tensor(np.abs(rng.normal(size=a.shape)).astype(np.float32)),
            }
            for j, a in enumerate(flat)
        },
        "param_groups": [{"lr": 1e-3, "params": list(range(len(flat)))}],
    }
    path = str(tmp_path / "ref-checkpoint-lora_model-best.pt")
    torch.save({"step_idx": 5, "lora_model_state_dict": sd,
                "optimizer_state_dict": opt_state, "loss": 0.1}, path)

    start = tr.resume(path)
    assert start == 6

    def find_adam(node):
        if hasattr(node, "mu") and hasattr(node, "nu"):
            return node
        if isinstance(node, tuple):
            for v in node:
                r = find_adam(v)
                if r is not None:
                    return r
        return None

    adam = find_adam(tr.state.opt_state)
    assert int(adam.count) == 5
    # lora A/B carry no transpose: mu mirrors exp_avg directly, in
    # ParameterList order
    np.testing.assert_allclose(
        np.asarray(adam.mu[0]["a"]), opt_state["state"][0]["exp_avg"].numpy(),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(adam.nu[1]["b"]),
        opt_state["state"][3]["exp_avg_sq"].numpy(), rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(tr.state.params[0]["a"]), sd["loras.0.A"].numpy(), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(tr.state.params[1]["b"]), sd["loras.1.B"].numpy(), rtol=1e-6
    )
