"""AdamW optimizer-moment interop, pinned against EXECUTED torch.optim.

Both directions of mid-run migration:
  torch -> optax: a reference checkpoint's AdamW moments resume our
    trainer exactly (dmi/train.py:243-247 reads optimizer_state_dict);
  optax -> torch: our exported moments load into torch.optim.AdamW via
    ``load_state_dict`` and continue identically.

"Exactly" is tested end-to-end: k real torch steps -> transfer -> one
more step on BOTH stacks from the same gradients -> parameters equal to
f32 tolerance.  This closes the importer's former "torch moments cannot
restore into optax" limitation.
"""

import numpy as np
import pytest

from tests.conftest import requires_reference
from tests.test_reference_model_parity import (
    LM_DIM,
    MM_DIM,
    N_PROJ_LAYERS,
    _import_reference_models,
)

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from dmi_tpu.config import TrainArgs  # noqa: E402
from dmi_tpu.models import projector as proj  # noqa: E402
from dmi_tpu.models import torch_import as ti  # noqa: E402
from dmi_tpu.training.optim import make_optimizer, set_adamw_moments, set_lr  # noqa: E402

pytestmark = [requires_reference]

LR = 1e-3
WD = 0.01
K_STEPS = 3


@pytest.fixture(scope="module")
def ref():
    return _import_reference_models()


def _build_ref_projector(ref, seed=0):
    args = ref.ProjectorArgs(
        proj_arch="mlp", proj_n_layers=N_PROJ_LAYERS, proj_dropout=0.0
    )
    torch.manual_seed(seed)
    p = ref.projector.Projector(args, LM_DIM, MM_DIM, "cpu")
    p.eval()  # dropout=0 anyway; keep forwards deterministic
    return p


def _torch_loss(p, x):
    return p(x).square().mean()


def _our_optimizer():
    targs = TrainArgs(output_dir="x", max_grad_norm=1e9, weight_decay=WD)
    return make_optimizer(targs, lr=LR)


def _our_loss(spec):
    def loss(params, x):
        return jnp.square(proj.apply(spec, params, x, train=False)).mean()

    return loss


def _torch_step(p, opt, x):
    opt.zero_grad()
    _torch_loss(p, torch.tensor(x)).backward()
    opt.step()


def test_torch_moments_resume_optax_exactly(ref, tmp_path):
    """k torch AdamW steps -> reference envelope -> our resume path
    (optax_moments_from_checkpoint + set_adamw_moments) -> one more step
    on each stack from the same data -> identical parameters."""
    rp = _build_ref_projector(ref, seed=30)
    t_opt = torch.optim.AdamW(rp.parameters(), lr=LR, weight_decay=WD)
    rng = np.random.default_rng(31)
    for _ in range(K_STEPS):
        _torch_step(rp, t_opt, rng.normal(size=(8, MM_DIM)).astype(np.float32))

    path = str(tmp_path / "checkpoint-projector-best.pt")
    torch.save(
        {
            "step_idx": K_STEPS,
            "projector_state_dict": rp.state_dict(),
            "optimizer_state_dict": t_opt.state_dict(),
            "loss": 0.0,
        },
        path,
    )

    # our side: params + moments from the checkpoint
    out = ti.load_torch_checkpoint(path)
    params = jax.tree.map(jnp.asarray, out["projector"])
    spec = proj.ProjectorSpec(
        mm_dim=MM_DIM, lm_dim=LM_DIM, n_layers=N_PROJ_LAYERS, dropout=0.0
    )
    opt = _our_optimizer()
    opt_state = opt.init(params)
    m = ti.optax_moments_from_checkpoint(path, "projector")
    assert m is not None and m["count"] == K_STEPS
    opt_state = set_adamw_moments(opt_state, m["mu"], m["nu"], m["count"])
    opt_state = set_lr(opt_state, LR)

    x_next = rng.normal(size=(8, MM_DIM)).astype(np.float32)
    g = jax.grad(_our_loss(spec))(params, jnp.asarray(x_next))
    updates, opt_state = opt.update(g, opt_state, params)
    ours = optax.apply_updates(params, updates)

    _torch_step(rp, t_opt, x_next)

    want = ti.projector_from_state_dict(ti._numpy_state_dict(rp.state_dict()))
    for got_l, want_l in zip(ours["layers"], want["layers"]):
        np.testing.assert_allclose(
            np.asarray(got_l["w"]), want_l["w"], rtol=1e-5, atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(got_l["b"]), want_l["b"], rtol=1e-5, atol=1e-7
        )


def test_optax_moments_load_into_torch_exactly(ref, tmp_path):
    """k optax AdamW steps -> export_adamw_state -> torch
    AdamW.load_state_dict -> one more step each -> identical parameters."""
    rp = _build_ref_projector(ref, seed=40)
    params = jax.tree.map(
        jnp.asarray,
        ti.projector_from_state_dict(ti._numpy_state_dict(rp.state_dict())),
    )
    spec = proj.ProjectorSpec(
        mm_dim=MM_DIM, lm_dim=LM_DIM, n_layers=N_PROJ_LAYERS, dropout=0.0
    )
    opt = _our_optimizer()
    opt_state = set_lr(opt.init(params), LR)
    loss = _our_loss(spec)
    rng = np.random.default_rng(41)
    for _ in range(K_STEPS):
        x = jnp.asarray(rng.normal(size=(8, MM_DIM)).astype(np.float32))
        g = jax.grad(loss)(params, x)
        updates, opt_state = opt.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)

    # pull (mu, nu) back out of the chain state and export
    def find_adam(node):
        if hasattr(node, "mu") and hasattr(node, "nu"):
            return node
        if isinstance(node, tuple):
            for v in node:
                r = find_adam(v)
                if r is not None:
                    return r
        return None

    adam = find_adam(opt_state)
    names = list(rp.state_dict())
    t_state = ti.export_adamw_state(
        names,
        ti.export_projector_state_dict(adam.mu),
        ti.export_projector_state_dict(adam.nu),
        int(adam.count),
        lr=LR,
        weight_decay=WD,
    )

    # load params + optimizer into torch and continue
    rp.load_state_dict(
        {
            k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in ti.export_projector_state_dict(params).items()
        },
        strict=True,
    )
    t_opt = torch.optim.AdamW(rp.parameters(), lr=LR, weight_decay=WD)
    t_opt.load_state_dict(t_state)

    x_next = rng.normal(size=(8, MM_DIM)).astype(np.float32)
    g = jax.grad(loss)(params, jnp.asarray(x_next))
    updates, opt_state = opt.update(g, opt_state, params)
    ours = optax.apply_updates(params, updates)

    _torch_step(rp, t_opt, x_next)

    want = ti.projector_from_state_dict(ti._numpy_state_dict(rp.state_dict()))
    for got_l, want_l in zip(ours["layers"], want["layers"]):
        np.testing.assert_allclose(
            np.asarray(got_l["w"]), want_l["w"], rtol=1e-5, atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(got_l["b"]), want_l["b"], rtol=1e-5, atol=1e-7
        )


def test_lora_and_hypernet_moment_layouts(ref, tmp_path):
    """Layout coverage for the other two optimizer param sets: the
    converted moment pytrees mirror the param pytrees exactly (same
    transposes), for LoraAdapters.parameters() and
    HyperNetwork.parameters() (attention arch + pos-encs buffer excluded)."""
    # --- lora ---
    largs = ref.LoraArgs(lora_rank=4, lora_alpha=4, lora_n_proj_layers=2)
    torch.manual_seed(50)
    rad = ref.lora.LoraAdapters(largs, LM_DIM, MM_DIM, "cpu")
    t_opt = torch.optim.AdamW(rad.parameters(), lr=LR)
    s = sum(p.square().sum() for p in rad.parameters())
    s.backward()
    t_opt.step()
    path = str(tmp_path / "checkpoint-lora_model-best.pt")
    torch.save(
        {
            "step_idx": 1,
            "lora_model_state_dict": rad.state_dict(),
            "optimizer_state_dict": t_opt.state_dict(),
            "loss": 0.0,
        },
        path,
    )
    m = ti.optax_moments_from_checkpoint(path, "lora_model")
    assert m is not None and m["count"] == 1
    want = ti.lora_from_state_dict(ti._numpy_state_dict(rad.state_dict()))
    assert jax.tree.structure(m["mu"]) == jax.tree.structure(want)
    for mom, p in zip(jax.tree.leaves(m["nu"]), jax.tree.leaves(want)):
        assert mom.shape == np.asarray(p).shape

    # --- hypernet (attention arch, pos encs on: buffer must be skipped) ---
    hargs = ref.HypnetArgs(
        hn_arch="attention",
        hn_n_layers=1,
        hn_n_heads=4,
        hn_hypnet_dim=MM_DIM,
        hn_rank=4,
        hn_alpha=4,
        hn_predict_bias=True,
        hn_n_proj_layers=2,
        hn_use_pos_encs=True,
    )
    torch.manual_seed(51)
    net = ref.hypernet.HyperNetwork(hargs, LM_DIM, MM_DIM, 5, "cpu")
    t_opt = torch.optim.AdamW(net.parameters(), lr=LR)
    s = sum(p.square().sum() for p in net.parameters())
    s.backward()
    t_opt.step()
    path = str(tmp_path / "checkpoint-hypernet-best.pt")
    torch.save(
        {
            "step_idx": 1,
            # trainer envelope holds the WRAPPER sd; the optimizer covers
            # only the hypernet.* params — emulate with the prefix
            "hypernet_state_dict": {
                f"hypernet.{k}": v for k, v in net.state_dict().items()
            },
            "optimizer_state_dict": t_opt.state_dict(),
            "loss": 0.0,
        },
        path,
    )
    m = ti.optax_moments_from_checkpoint(path, "hypernet", arch="attention")
    assert m is not None and m["count"] == 1
    sd = ti._numpy_state_dict(net.state_dict())
    sd.pop("pos_encs.pe")
    want = ti.hypernet_from_state_dict(sd, arch="attention")
    assert jax.tree.structure(m["mu"]) == jax.tree.structure(want)
    for mom, p in zip(jax.tree.leaves(m["mu"]), jax.tree.leaves(want)):
        assert mom.shape == np.asarray(p).shape


def test_missing_torch_state_slots_fill_zero_moments(ref, tmp_path):
    """torch AdamW creates state slots LAZILY: params whose grad stayed
    None have none.  Genuine reference stage-2 checkpoints hit this — the
    lora_forward zip truncation (dmi/model/projector.py:124) never uses
    generator head 1, so its params get no moments.  Conversion must fill
    zeros (the init state) instead of crashing."""
    hargs = ref.HypnetArgs(
        hn_arch="attention",
        hn_n_layers=1,
        hn_n_heads=4,
        hn_hypnet_dim=MM_DIM,
        hn_rank=4,
        hn_alpha=4,
        hn_predict_bias=True,
        hn_n_proj_layers=2,
        hn_use_pos_encs=False,
    )
    torch.manual_seed(60)
    net = ref.hypernet.HyperNetwork(hargs, LM_DIM, MM_DIM, 5, "cpu")
    t_opt = torch.optim.AdamW(net.parameters(), lr=LR)
    # loss touches everything EXCEPT generator head 1 (the truncated head)
    s = sum(
        p.square().sum()
        for n, p in net.named_parameters()
        if not n.startswith("generators.1.")
    )
    s.backward()
    t_opt.step()
    assert len(t_opt.state_dict()["state"]) == len(list(net.parameters())) - 2

    path = str(tmp_path / "checkpoint-hypernet-best.pt")
    torch.save(
        {
            "step_idx": 1,
            "hypernet_state_dict": {
                f"hypernet.{k}": v for k, v in net.state_dict().items()
            },
            "optimizer_state_dict": t_opt.state_dict(),
            "loss": 0.0,
        },
        path,
    )
    m = ti.optax_moments_from_checkpoint(path, "hypernet", arch="attention")
    assert m is not None and m["count"] == 1
    # untouched head: zero moments; touched head 0: real moments
    assert float(np.abs(np.asarray(m["mu"]["generators"][1]["w"])).max()) == 0.0
    assert float(np.abs(np.asarray(m["nu"]["generators"][1]["b"])).max()) == 0.0
    assert float(np.abs(np.asarray(m["mu"]["generators"][0]["w"])).max()) > 0.0
