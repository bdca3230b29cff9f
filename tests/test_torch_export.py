"""Export interop: dmi_tpu-trained pytrees -> reference-loadable ``.pt``
checkpoints, verified by EXECUTING the actual reference modules.

The inverse of test_reference_model_parity's import direction: our params
are exported with torch_import.export_* / save_reference_checkpoint, the
real /root/reference modules load them with strict ``load_state_dict``,
and the reference forward must match ours on the same inputs.  Together
the two directions prove a user can move checkpoints both ways
(dmi/train.py:230-234, train_hypernet.py:408-412, model/lora.py:20-38).
"""

import numpy as np
import pytest

from tests.conftest import requires_reference
from tests.test_reference_model_parity import (
    ALPHA,
    HYPNET_DIM,
    LM_DIM,
    MM_DIM,
    N_PROJ_LAYERS,
    N_TOKENS,
    RANK,
    _import_reference_models,
)

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dmi_tpu.models import hypernet as hn  # noqa: E402
from dmi_tpu.models import lora as lora_mod  # noqa: E402
from dmi_tpu.models import projector as proj  # noqa: E402
from dmi_tpu.models import torch_import as ti  # noqa: E402
from dmi_tpu.training.checkpoint import load_pytree  # noqa: E402

pytestmark = [requires_reference]


@pytest.fixture(scope="module")
def ref():
    return _import_reference_models()


def _our_projector(seed=0, n_layers=N_PROJ_LAYERS):
    spec = proj.ProjectorSpec(mm_dim=MM_DIM, lm_dim=LM_DIM, n_layers=n_layers)
    params = proj.init(jax.random.key(seed), spec)
    return spec, params


def _ref_projector_from_export(ref, params, n_layers=N_PROJ_LAYERS):
    args = ref.ProjectorArgs(
        proj_arch="mlp", proj_n_layers=n_layers, proj_dropout=0.1
    )
    p = ref.projector.Projector(args, LM_DIM, MM_DIM, "cpu")
    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in ti.export_projector_state_dict(params).items()
    }
    p.load_state_dict(sd, strict=True)
    p.eval()
    return p


def test_export_projector_reference_executes(ref):
    spec, params = _our_projector(seed=1)
    rp = _ref_projector_from_export(ref, params)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(6, MM_DIM)).astype(np.float32)
    with torch.no_grad():
        want = rp(torch.tensor(x)).numpy()
    got = np.asarray(proj.apply(spec, params, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("arch", ["attention", "transformer"])
@pytest.mark.parametrize("use_pos_encs", [False, True])
def test_export_hypernet_reference_executes(ref, arch, use_pos_encs):
    """Our hn.init params exported -> strict-loaded into the reference
    HyperNetwork (incl. the pos_encs.pe buffer) -> identical adapters."""
    spec = hn.HypnetSpec(
        lm_dim=LM_DIM,
        mm_dim=HYPNET_DIM,
        n_tokens=N_TOKENS,
        arch=arch,
        n_layers=1,
        n_heads=4,
        hypnet_dim=HYPNET_DIM,
        rank=RANK,
        alpha=ALPHA,
        predict_bias=True,
        n_proj_layers=N_PROJ_LAYERS,
        use_pos_encs=use_pos_encs,
    )
    params = hn.init(jax.random.key(7), spec)

    args = ref.HypnetArgs(
        hn_arch=arch,
        hn_n_layers=1,
        hn_n_heads=4,
        hn_hypnet_dim=HYPNET_DIM,
        hn_rank=RANK,
        hn_alpha=ALPHA,
        hn_predict_bias=True,
        hn_n_proj_layers=N_PROJ_LAYERS,
        hn_use_pos_encs=use_pos_encs,
    )
    net = ref.hypernet.HyperNetwork(args, LM_DIM, HYPNET_DIM, N_TOKENS, "cpu")
    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in ti.export_hypernet_state_dict(params, spec).items()
    }
    if use_pos_encs:
        # the exported buffer must equal the reference's OWN table —
        # strict-load would otherwise overwrite a correct table with a
        # wrong one and the forward comparison below couldn't tell
        np.testing.assert_allclose(
            sd["pos_encs.pe"].numpy(),
            net.pos_encs.pe.detach().numpy(),
            rtol=1e-6,
            atol=1e-7,
        )
    net.load_state_dict(sd, strict=True)
    net.eval()

    rng = np.random.default_rng(8)
    z = rng.normal(size=(2 * N_TOKENS + 1, HYPNET_DIM)).astype(np.float32)
    with torch.no_grad():
        a_ref, b_ref, bias_ref = net(torch.tensor(z))
    a_ours, b_ours, bias_ours = hn.apply(spec, params, jnp.asarray(z), train=False)
    for got, want in zip(a_ours, a_ref):
        np.testing.assert_allclose(
            np.asarray(got), want.detach().numpy(), rtol=5e-5, atol=5e-6
        )
    for got, want in zip(b_ours, b_ref):
        np.testing.assert_allclose(
            np.asarray(got), want.detach().numpy(), rtol=5e-5, atol=5e-6
        )
    for got, want in zip(bias_ours, bias_ref):
        np.testing.assert_allclose(
            np.asarray(got), want.detach().numpy(), rtol=5e-5, atol=5e-6
        )


def test_export_lora_reference_executes(ref):
    """Our trained-shape adapters exported -> reference LoraAdapters
    strict-load -> reference only_lora_forward matches module_lora_apply."""
    pspec, pparams = _our_projector(seed=3)
    lspec = lora_mod.LoraSpec(rank=RANK, alpha=ALPHA, n_proj_layers=N_PROJ_LAYERS)
    adapters = lora_mod.init(jax.random.key(9), lspec, pspec)
    # B=0 at init would hide orientation bugs; randomize it
    adapters = [
        {"a": ad["a"], "b": jnp.asarray(
            np.random.default_rng(10 + i).normal(size=ad["b"].shape),
            jnp.float32)}
        for i, ad in enumerate(adapters)
    ]

    largs = ref.LoraArgs(
        lora_rank=RANK, lora_alpha=ALPHA, lora_n_proj_layers=N_PROJ_LAYERS
    )
    rad = ref.lora.LoraAdapters(largs, LM_DIM, MM_DIM, "cpu")
    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in ti.export_lora_state_dict(adapters).items()
    }
    rad.load_state_dict(sd, strict=True)
    rp = _ref_projector_from_export(ref, pparams)

    rng = np.random.default_rng(11)
    x = rng.normal(size=(5, MM_DIM)).astype(np.float32)
    with torch.no_grad():
        want = rp.only_lora_forward(torch.tensor(x), rad.loras).numpy()
    got = np.asarray(
        proj.module_lora_apply(
            pspec, pparams, jnp.asarray(x), adapters, ALPHA, RANK
        )
    )
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=5e-6)


def test_reference_checkpoint_envelope_roundtrip(ref, tmp_path):
    """save_reference_checkpoint writes the HyperNetWrapper-layout ``.pt``;
    (a) our own load_pytree re-imports it bit-exactly, (b) the envelope
    keys match the reference's save_state layout."""
    pspec, pparams = _our_projector(seed=5)
    hspec = hn.HypnetSpec(
        lm_dim=LM_DIM,
        mm_dim=HYPNET_DIM,
        n_tokens=N_TOKENS,
        arch="attention",
        n_heads=4,
        hypnet_dim=HYPNET_DIM,
        rank=RANK,
        alpha=ALPHA,
        n_proj_layers=N_PROJ_LAYERS,
        use_pos_encs=True,
    )
    hparams = hn.init(jax.random.key(6), hspec)

    path = str(tmp_path / "checkpoint-hypernet-best.pt")
    ti.save_reference_checkpoint(
        path,
        save_type="hypernet",
        state_dict={
            **ti._prefixed(ti.export_hypernet_state_dict(hparams, hspec),
                           "hypernet."),
            **ti._prefixed(ti.export_projector_state_dict(pparams),
                           "projector."),
        },
        step_idx=120,
        metric_name="loss",
        metric=0.25,
    )

    raw = ti.load_torch_file(path)
    assert set(raw) == {"step_idx", "hypernet_state_dict",
                        "optimizer_state_dict", "loss"}
    assert raw["step_idx"] == 120 and raw["loss"] == 0.25

    env = load_pytree(path)  # transparent .pt read-back
    assert env["step_idx"] == 120
    back_h = env["hypernet_state_dict"]
    back_p = env["projector_state_dict"]
    for got, want in zip(back_h["generators"], hparams["generators"]):
        np.testing.assert_array_equal(got["w"], np.asarray(want["w"]))
        np.testing.assert_array_equal(got["b"], np.asarray(want["b"]))
    np.testing.assert_array_equal(
        back_h["prefix_tokens"], np.asarray(hparams["prefix_tokens"])
    )
    for name in ("q", "k", "v"):
        np.testing.assert_array_equal(
            back_h["attn"][name]["w"], np.asarray(hparams["attn"][name]["w"])
        )
    for got, want in zip(back_p["layers"], pparams["layers"]):
        np.testing.assert_array_equal(got["w"], np.asarray(want["w"]))
        np.testing.assert_array_equal(got["b"], np.asarray(want["b"]))
