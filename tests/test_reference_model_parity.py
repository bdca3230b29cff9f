"""Module-level parity against the EXECUTED reference model code.

Unlike test_torch_import.py (which pins dmi_tpu against in-test torch
mimics), this suite imports the actual reference modules from
/root/reference and uses them as the oracle:

  * dmi/model/projector.py  — Projector.forward / lora_forward (the zip
    truncation, :118-159) / only_lora_forward (:61-74) / combine_lora
    (:76-116) / load_model prune (:46-54)
  * dmi/model/hypernet.py   — HyperNetwork.forward across all three archs,
    the padding branch (:140-163), pos-encs on/off (:132-135,166-167), the
    hypnet_dim > mm_emb_dim first-layer truncation (:187-188), and
    HyperNetWrapper.forward / generate_projector* (:228-274)
  * dmi/model/lora.py       — LoRALayer / LoraAdapters / LoraWrapper

Weights flow reference -> dmi_tpu through the production importer
(dmi_tpu.models.torch_import), so the importer's layout contract is
exercised on every assertion.  All modules run in eval mode (dropout
inert) — the only stochastic op — so outputs must agree to f32 matmul
tolerance.

The reference package pulls its data loaders at import time
(dmi/model/__init__.py); only `timm` is missing in this image and is
stubbed before import.
"""

import importlib.machinery
import sys
import types

import numpy as np
import pytest

from tests.conftest import REFERENCE_ROOT, requires_reference

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from dmi_tpu.models import hypernet as hn  # noqa: E402
from dmi_tpu.models import projector as proj  # noqa: E402
from dmi_tpu.models.torch_import import (  # noqa: E402
    _numpy_state_dict,
    hypernet_from_state_dict,
    load_torch_checkpoint,
    projector_from_state_dict,
)

pytestmark = [requires_reference]


def _import_reference_models():
    """Import dmi.model.{projector,hypernet,lora,mmmodel} from
    /root/reference.

    dmi/model/__init__.py imports every data loader; dmi/data/coco.py does
    `import timm` at module level and timm is absent here — stub it (the
    model modules never touch it)."""
    if "timm" not in sys.modules:
        stub = types.ModuleType("timm")
        stub.__spec__ = importlib.machinery.ModuleSpec("timm", None)
        sys.modules["timm"] = stub
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import dmi.model.hypernet as ref_hypernet
    import dmi.model.lora as ref_lora
    import dmi.model.mmmodel as ref_mmmodel
    import dmi.model.projector as ref_projector
    from dmi.utils.args import HypnetArgs, LoraArgs, ProjectorArgs

    return types.SimpleNamespace(
        projector=ref_projector,
        hypernet=ref_hypernet,
        lora=ref_lora,
        mmmodel=ref_mmmodel,
        ProjectorArgs=ProjectorArgs,
        HypnetArgs=HypnetArgs,
        LoraArgs=LoraArgs,
    )


@pytest.fixture(scope="module")
def ref():
    return _import_reference_models()


# Small dims keep the CPU suite fast while exercising every shape rule.
LM_DIM = 24
MM_DIM = 16
HYPNET_DIM = 16
RANK = 4
ALPHA = 4
N_TOKENS = 5
N_PROJ_LAYERS = 2


def _t(rng, *shape):
    return torch.tensor(rng.normal(size=shape).astype(np.float32))


def _build_ref_projector(ref, mm_dim=MM_DIM, n_layers=2, arch="mlp"):
    args = ref.ProjectorArgs(
        proj_arch=arch, proj_n_layers=n_layers, proj_dropout=0.1
    )
    torch.manual_seed(0)
    p = ref.projector.Projector(args, LM_DIM, mm_dim, "cpu")
    p.eval()
    return p


def _ours_from_ref_projector(ref_proj, arch="mlp", n_layers=2, mm_dim=MM_DIM):
    params = projector_from_state_dict(_numpy_state_dict(ref_proj.state_dict()))
    spec = proj.ProjectorSpec(
        mm_dim=mm_dim, lm_dim=LM_DIM, arch=arch, n_layers=n_layers
    )
    return spec, params


@pytest.mark.parametrize("arch,n_layers", [("mlp", 2), ("mlp", 3), ("linear", 1)])
def test_projector_forward_parity(ref, arch, n_layers):
    """Projector.forward (dmi/model/projector.py:56-59), eval mode."""
    rp = _build_ref_projector(ref, arch=arch, n_layers=n_layers)
    spec, params = _ours_from_ref_projector(rp, arch=arch, n_layers=n_layers)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(7, MM_DIM)).astype(np.float32)
    with torch.no_grad():
        want = rp(torch.tensor(x)).numpy()
    got = np.asarray(proj.apply(spec, params, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("with_bias", [True, False])
@pytest.mark.parametrize("n_layers", [2, 3])
def test_lora_forward_zip_truncation_parity(ref, with_bias, n_layers):
    """Projector.lora_forward (dmi/model/projector.py:118-159): the zip over
    the 4-module net truncates at len(a_weights) modules, so only
    [Linear0+adapter, GELU] execute — pinned against the real code."""
    rp = _build_ref_projector(ref, n_layers=n_layers)
    spec, params = _ours_from_ref_projector(rp, n_layers=n_layers)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(5, MM_DIM)).astype(np.float32)
    a_flats = [
        _t(rng, MM_DIM * RANK) if i == 0 else _t(rng, LM_DIM * RANK)
        for i in range(N_PROJ_LAYERS)
    ]
    b_flats = [_t(rng, RANK * LM_DIM) for _ in range(N_PROJ_LAYERS)]
    biases = (
        [_t(rng, LM_DIM) for _ in range(N_PROJ_LAYERS)] if with_bias else None
    )
    with torch.no_grad():
        want = rp.lora_forward(torch.tensor(x), a_flats, b_flats, biases).numpy()
    got = np.asarray(
        proj.lora_apply(
            spec,
            params,
            jnp.asarray(x),
            [jnp.asarray(t.numpy()) for t in a_flats],
            [jnp.asarray(t.numpy()) for t in b_flats],
            None if biases is None else [jnp.asarray(t.numpy()) for t in biases],
            truncate_like_reference=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_only_lora_forward_parity(ref):
    """Projector.only_lora_forward (dmi/model/projector.py:61-74) with real
    LoRALayer modules (dmi/model/lora.py:6-17): full net traversal."""
    rp = _build_ref_projector(ref)
    spec, params = _ours_from_ref_projector(rp)
    lora_args = ref.LoraArgs(lora_rank=RANK, lora_alpha=ALPHA,
                             lora_n_proj_layers=N_PROJ_LAYERS)
    torch.manual_seed(3)
    adapters = ref.lora.LoraAdapters(lora_args, LM_DIM, MM_DIM, "cpu")
    rng = np.random.default_rng(3)
    # B inits to zero (delta would vanish) — randomize so the test bites
    for lora in adapters.loras:
        lora.B.data = _t(rng, RANK, LM_DIM)
    x = rng.normal(size=(6, MM_DIM)).astype(np.float32)
    with torch.no_grad():
        want = rp.only_lora_forward(torch.tensor(x), adapters.loras).numpy()
    lora_params = [
        {"a": jnp.asarray(l.A.detach().numpy()), "b": jnp.asarray(l.B.detach().numpy())}
        for l in adapters.loras
    ]
    got = np.asarray(
        proj.module_lora_apply(spec, params, jnp.asarray(x), lora_params,
                               alpha=ALPHA, rank=RANK)
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("with_bias", [True, False])
def test_combine_lora_parity(ref, with_bias):
    """Projector.combine_lora (dmi/model/projector.py:76-116): the baked
    generated projector matches our pytree both in weights and forward."""
    rp = _build_ref_projector(ref)
    spec, params = _ours_from_ref_projector(rp)
    rng = np.random.default_rng(4)
    a_flats = [_t(rng, MM_DIM * RANK), _t(rng, LM_DIM * RANK)]
    b_flats = [_t(rng, RANK * LM_DIM), _t(rng, RANK * LM_DIM)]
    biases = [_t(rng, LM_DIM), _t(rng, LM_DIM)] if with_bias else None
    with torch.no_grad():
        generated = rp.combine_lora(a_flats, b_flats, biases)
    generated.eval()
    ours = proj.combine_lora(
        spec,
        params,
        [jnp.asarray(t.numpy()) for t in a_flats],
        [jnp.asarray(t.numpy()) for t in b_flats],
        None if biases is None else [jnp.asarray(t.numpy()) for t in biases],
    )
    # weight-level: reference Linear.weight holds (w_a@w_b).T + W, i.e. the
    # transpose of our (in, out) layout
    ref_linears = [m for m in generated if m.__class__.__name__ == "Linear"]
    for ref_lin, layer in zip(ref_linears, ours["layers"]):
        np.testing.assert_allclose(
            np.asarray(layer["w"]).T, ref_lin.weight.detach().numpy(),
            rtol=2e-5, atol=2e-6,
        )
        np.testing.assert_allclose(
            np.asarray(layer["b"]), ref_lin.bias.detach().numpy(),
            rtol=2e-5, atol=2e-6,
        )
    # forward-level through the whole generated nn.Sequential
    x = rng.normal(size=(5, MM_DIM)).astype(np.float32)
    with torch.no_grad():
        want = generated(torch.tensor(x)).numpy()
    got = np.asarray(proj.apply(spec, ours, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


# ---------------------------------------------------------------------------
# HyperNetwork
# ---------------------------------------------------------------------------

def _build_ref_hypernet(ref, arch, use_pos_encs, mm_dim=HYPNET_DIM,
                        predict_bias=True, seed=10):
    args = ref.HypnetArgs(
        hn_arch=arch,
        hn_n_layers=1,
        hn_n_heads=4,
        hn_hypnet_dim=HYPNET_DIM,
        hn_rank=RANK,
        hn_alpha=ALPHA,
        hn_predict_bias=predict_bias,
        hn_n_proj_layers=N_PROJ_LAYERS,
        hn_use_pos_encs=use_pos_encs,
    )
    torch.manual_seed(seed)
    net = ref.hypernet.HyperNetwork(args, LM_DIM, mm_dim, N_TOKENS, "cpu")
    net.eval()
    return net


def _ours_from_ref_hypernet(ref_net, arch, use_pos_encs, mm_dim=HYPNET_DIM,
                            predict_bias=True):
    sd = _numpy_state_dict(ref_net.state_dict())
    sd.pop("pos_encs.pe", None)  # deterministic buffer, recomputed
    params = hypernet_from_state_dict(sd, arch=arch)
    spec = hn.HypnetSpec(
        lm_dim=LM_DIM,
        mm_dim=mm_dim,
        n_tokens=N_TOKENS,
        arch=arch,
        n_layers=1,
        n_heads=4,
        hypnet_dim=HYPNET_DIM,
        rank=RANK,
        alpha=ALPHA,
        predict_bias=predict_bias,
        n_proj_layers=N_PROJ_LAYERS,
        use_pos_encs=use_pos_encs,
    )
    return spec, params


def _assert_adapters_match(ours, theirs, rtol=5e-5, atol=5e-6):
    a_ours, b_ours, bias_ours = ours
    a_ref, b_ref, bias_ref = theirs
    assert len(a_ours) == len(a_ref)
    for got, want in zip(a_ours, a_ref):
        np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                                   rtol=rtol, atol=atol)
    for got, want in zip(b_ours, b_ref):
        np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                                   rtol=rtol, atol=atol)
    if bias_ref is None:
        assert bias_ours is None
    else:
        for got, want in zip(bias_ours, bias_ref):
            np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                                       rtol=rtol, atol=atol)


@pytest.mark.parametrize("arch", ["attention", "transformer"])
@pytest.mark.parametrize("use_pos_encs", [False, True])
@pytest.mark.parametrize("padded", [False, True])
def test_hypernet_forward_parity(ref, arch, use_pos_encs, padded):
    """HyperNetwork.forward (dmi/model/hypernet.py:140-196) across archs,
    pos-encs, and the padding branch (z shorter than the fixed context).

    arch='att_w_nonlinear' is covered separately: it is DEAD CODE in the
    reference (see test_att_w_nonlinear_is_dead_code_in_reference)."""
    ref_net = _build_ref_hypernet(ref, arch, use_pos_encs)
    spec, params = _ours_from_ref_hypernet(ref_net, arch, use_pos_encs)
    rng = np.random.default_rng(11)
    # full context: n_z = 2*n_tokens+1 rows (mm ⊕ text interleave + prefix
    # emb); padded branch: just the n_tokens subset rows
    n_z = N_TOKENS if padded else 2 * N_TOKENS + 1
    z = rng.normal(size=(n_z, HYPNET_DIM)).astype(np.float32)
    with torch.no_grad():
        want = ref_net(torch.tensor(z))
    got = hn.apply(spec, params, jnp.asarray(z), train=False)
    _assert_adapters_match(got, want)


def test_att_w_nonlinear_is_dead_code_in_reference(ref):
    """The reference's arch='att_w_nonlinear' CANNOT execute: the padding
    branch (dmi/model/hypernet.py:144-159) handles only 'attention' and
    'transformer', so a short z hits `self.hypnet(z, mask)` with `mask`
    unbound (UnboundLocalError); a full-length z gets mask=None but the
    hypnet is an nn.Sequential (:102-105) whose forward takes a single
    input, so the 2-arg call raises TypeError.  (No shipped config uses
    this arch; all drive 'attention'.)  Pin both breakages, then pin our
    implementation of the *intended* semantics — GELU(MHSA(z, mask)) —
    against the reference's submodules composed by hand."""
    ref_net = _build_ref_hypernet(ref, "att_w_nonlinear", False)
    spec, params = _ours_from_ref_hypernet(ref_net, "att_w_nonlinear", False)
    rng = np.random.default_rng(14)
    z = rng.normal(size=(N_TOKENS, HYPNET_DIM)).astype(np.float32)
    with pytest.raises(UnboundLocalError):
        with torch.no_grad():
            ref_net(torch.tensor(z))
    z_full = rng.normal(size=(2 * N_TOKENS + 1, HYPNET_DIM)).astype(np.float32)
    with pytest.raises(TypeError):
        with torch.no_grad():
            ref_net(torch.tensor(z_full))

    # hand-composed oracle replicating forward with the Sequential unrolled
    with torch.no_grad():
        seq_len = N_PROJ_LAYERS + N_TOKENS
        context_len = 2 * N_TOKENS + N_PROJ_LAYERS + 1
        mask = torch.ones(1, context_len)
        mask[:, seq_len:] = 0
        mask = mask.unsqueeze(1).unsqueeze(2).expand(-1, 4, context_len, -1)
        padding = torch.zeros(context_len - seq_len, HYPNET_DIM)
        zt = torch.cat(
            [ref_net.prefix_tokens, torch.tensor(z), padding], dim=0
        ).unsqueeze(0)
        mhsa, gelu = ref_net.hypnet[0], ref_net.hypnet[1]
        encodings = gelu(mhsa(zt, mask)).squeeze(0)
        prefix_enc = encodings[: N_PROJ_LAYERS]
        want_a, want_b, want_bias = [], [], []
        for idx, gen in enumerate(ref_net.generators):
            w = (ALPHA / RANK) * gen(prefix_enc[idx])
            want_a.append(w[: ref_net.a_dims[idx]])
            want_b.append(
                w[ref_net.a_dims[idx]: ref_net.a_dims[idx] + ref_net.b_dims[idx]]
            )
            want_bias.append(w[ref_net.a_dims[idx] + ref_net.b_dims[idx]:])
    got = hn.apply(spec, params, jnp.asarray(z), train=False)
    _assert_adapters_match(got, (want_a, want_b, want_bias))


def test_hypernet_first_layer_truncation_parity(ref):
    """hypnet_dim > mm_emb_dim truncates layer-0 `a` to mm_dim*rank
    (dmi/model/hypernet.py:187-188)."""
    mm_dim = 12  # < HYPNET_DIM
    ref_net = _build_ref_hypernet(ref, "attention", True, mm_dim=mm_dim)
    spec, params = _ours_from_ref_hypernet(ref_net, "attention", True,
                                           mm_dim=mm_dim)
    rng = np.random.default_rng(12)
    z = rng.normal(size=(N_TOKENS, HYPNET_DIM)).astype(np.float32)
    with torch.no_grad():
        want = ref_net(torch.tensor(z))
    assert want[0][0].shape[0] == mm_dim * RANK  # truncation active
    got = hn.apply(spec, params, jnp.asarray(z), train=False)
    _assert_adapters_match(got, want)


def test_hypernet_no_bias_parity(ref):
    """predict_bias=False: biases is None and generator heads shrink."""
    ref_net = _build_ref_hypernet(ref, "attention", False, predict_bias=False)
    spec, params = _ours_from_ref_hypernet(ref_net, "attention", False,
                                           predict_bias=False)
    rng = np.random.default_rng(13)
    z = rng.normal(size=(2 * N_TOKENS + 1, HYPNET_DIM)).astype(np.float32)
    with torch.no_grad():
        want = ref_net(torch.tensor(z))
    got = hn.apply(spec, params, jnp.asarray(z), train=False)
    _assert_adapters_match(got, want)


# ---------------------------------------------------------------------------
# HyperNetWrapper end-to-end (hypernet -> lora_forward / combine_lora),
# including Projector.load_model prune via a real .pt checkpoint
# ---------------------------------------------------------------------------

def _build_wrapper(ref, tmp_path, mm_dim=HYPNET_DIM, ckpt_mm_dim=None,
                   prune=None):
    """HyperNetWrapper whose frozen projector loads from a real .pt file
    (exercises Projector.load_model's prune slice, projector.py:46-54)."""
    torch.manual_seed(20)
    donor = ref.projector.Projector(
        ref.ProjectorArgs(proj_n_layers=N_PROJ_LAYERS), LM_DIM,
        ckpt_mm_dim or mm_dim, "cpu",
    )
    path = str(tmp_path / "proj.pt")
    torch.save({"projector_state_dict": donor.state_dict()}, path)
    proj_args = ref.ProjectorArgs(
        proj_name_or_path=path, proj_n_layers=N_PROJ_LAYERS, proj_prune=prune
    )
    hn_args = ref.HypnetArgs(
        hn_arch="attention", hn_n_heads=4, hn_hypnet_dim=HYPNET_DIM,
        hn_rank=RANK, hn_alpha=ALPHA, hn_predict_bias=True,
        hn_n_proj_layers=N_PROJ_LAYERS, hn_use_pos_encs=True,
    )
    torch.manual_seed(21)
    wrapper = ref.hypernet.HyperNetWrapper(
        hn_args, proj_args, LM_DIM, mm_dim, N_TOKENS, "cpu"
    )
    wrapper.eval()
    return wrapper, path


def _ours_from_wrapper(wrapper, path, mm_dim=HYPNET_DIM, prune=None):
    imported = load_torch_checkpoint(path, prune=prune)
    pspec = proj.ProjectorSpec(mm_dim=mm_dim, lm_dim=LM_DIM,
                               n_layers=N_PROJ_LAYERS)
    hspec, hparams = _ours_from_ref_hypernet(
        wrapper.hypernet, "attention", True, mm_dim=mm_dim
    )
    return pspec, imported["projector"], hspec, hparams


@pytest.mark.parametrize("prune_case", [False, True])
def test_wrapper_forward_parity(ref, tmp_path, prune_case):
    """HyperNetWrapper.forward hypernet path (dmi/model/hypernet.py:268-274):
    hypernet(z) -> projector.lora_forward(x) with the zip truncation, over a
    projector loaded (optionally pruned) from a real checkpoint."""
    mm_dim = 12 if prune_case else HYPNET_DIM
    ckpt_mm = 20 if prune_case else None
    prune = mm_dim if prune_case else None
    wrapper, path = _build_wrapper(ref, tmp_path, mm_dim=mm_dim,
                                   ckpt_mm_dim=ckpt_mm, prune=prune)
    pspec, pparams, hspec, hparams = _ours_from_wrapper(
        wrapper, path, mm_dim=mm_dim, prune=prune
    )
    rng = np.random.default_rng(22)
    x = rng.normal(size=(6, mm_dim)).astype(np.float32)
    z = rng.normal(size=(N_TOKENS, HYPNET_DIM)).astype(np.float32)
    with torch.no_grad():
        want = wrapper(torch.tensor(x), torch.tensor(z)).numpy()
    a_w, b_w, biases = hn.apply(hspec, hparams, jnp.asarray(z), train=False)
    got = np.asarray(
        proj.lora_apply(pspec, pparams, jnp.asarray(x), a_w, b_w, biases,
                        truncate_like_reference=True)
    )
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=5e-6)


def test_wrapper_generated_projector_parity(ref, tmp_path):
    """generate_projector_from_multiple_adapters (dmi/model/hypernet.py:
    234-266): average adapters over subsets, bake, and route forward through
    the generated projector (:269-270)."""
    wrapper, path = _build_wrapper(ref, tmp_path)
    pspec, pparams, hspec, hparams = _ours_from_wrapper(wrapper, path)
    rng = np.random.default_rng(23)
    zs = [
        rng.normal(size=(N_TOKENS, HYPNET_DIM)).astype(np.float32)
        for _ in range(3)
    ]
    x = rng.normal(size=(4, HYPNET_DIM)).astype(np.float32)
    with torch.no_grad():
        wrapper.generate_projector_from_multiple_adapters(
            [torch.tensor(z) for z in zs]
        )
        wrapper.generated_projector.eval()
        want = wrapper(torch.tensor(x), None).numpy()
    adapters = [hn.apply(hspec, hparams, jnp.asarray(z), train=False) for z in zs]
    avg_a, avg_b, avg_bias = hn.average_adapters(adapters)
    generated = proj.combine_lora(pspec, pparams, avg_a, avg_b, avg_bias)
    got = np.asarray(proj.apply(pspec, generated, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=5e-6)


def test_projector_mmmodel_loss_parity_ragged(ref):
    """ProjectorMMModel.forward loss (dmi/model/mmmodel.py:112-147) on a
    RAGGED right-padded batch, against the executed reference.

    This pins the dead-mask quirk: the reference concatenates the extended
    attention mask (:131-132) but never passes it to the LLM (:139-147), so
    pad columns — whose labels are pad_token_id, not -100
    (dmi/data/base.py:40-50) — are scored under full causal attention.
    caption_loss replicates that by default (mask_padding=False)."""
    from dmi_tpu.models import mmmodel
    from tests.test_llama import PAD, make_pair

    hf, cfg, params = make_pair(seed=30)
    lm_dim = hf.config.hidden_size
    args = ref.ProjectorArgs(proj_n_layers=2, proj_dropout=0.1)
    torch.manual_seed(0)
    rp = ref.projector.Projector(args, lm_dim, MM_DIM, "cpu")
    rp.eval()
    pparams = projector_from_state_dict(_numpy_state_dict(rp.state_dict()))
    spec = proj.ProjectorSpec(mm_dim=MM_DIM, lm_dim=lm_dim, n_layers=2)

    rng = np.random.default_rng(30)
    B, T = 3, 10
    mm = rng.normal(size=(B, MM_DIM)).astype(np.float32)
    ids = rng.integers(1, 256, size=(B, T))
    mask = np.ones((B, T), np.int64)
    labels = ids.copy()
    labels[:, :3] = -100
    # ragged: right-pad rows 1 and 2 (labels keep pad_token_id there — the
    # collator quirk — so the pad positions carry loss)
    for row, pad_from in ((1, 7), (2, 5)):
        ids[row, pad_from:] = PAD
        mask[row, pad_from:] = 0
        labels[row, pad_from:] = PAD

    torch.manual_seed(31)
    ref_model = ref.mmmodel.ProjectorMMModel(
        llm=hf, projector=rp, device="cpu", mm_emb_dim=MM_DIM,
        name="parity", pad_token_id=PAD,
    )
    ref_model.eval()
    with torch.no_grad():
        want = float(
            ref_model(
                torch.tensor(mm), torch.tensor(ids), torch.tensor(mask),
                torch.tensor(labels),
            )
        )

    soft = proj.apply(spec, pparams, jnp.asarray(mm), train=False)
    got = float(
        mmmodel.caption_loss(
            cfg, params, soft, jnp.asarray(ids), jnp.asarray(mask),
            jnp.asarray(labels),
        )
    )
    assert abs(got - want) < 3e-4, (got, want)

    # sanity: the pad-masked ("fixed") objective must DIFFER on this batch,
    # proving the quirk is load-bearing
    masked = float(
        mmmodel.caption_loss(
            cfg, params, soft, jnp.asarray(ids), jnp.asarray(mask),
            jnp.asarray(labels), mask_padding=True,
        )
    )
    assert abs(masked - want) > 1e-4, (masked, want)


def test_wrapper_single_generate_projector_parity(ref, tmp_path):
    """generate_projector single-subset path (dmi/model/hypernet.py:228-232)."""
    wrapper, path = _build_wrapper(ref, tmp_path)
    pspec, pparams, hspec, hparams = _ours_from_wrapper(wrapper, path)
    rng = np.random.default_rng(24)
    z = rng.normal(size=(2 * N_TOKENS + 1, HYPNET_DIM)).astype(np.float32)
    x = rng.normal(size=(4, HYPNET_DIM)).astype(np.float32)
    with torch.no_grad():
        wrapper.generate_projector(torch.tensor(z))
        wrapper.generated_projector.eval()
        want = wrapper(torch.tensor(x), None).numpy()
    a_w, b_w, biases = hn.apply(hspec, hparams, jnp.asarray(z), train=False)
    generated = proj.combine_lora(pspec, pparams, a_w, b_w, biases)
    got = np.asarray(proj.apply(pspec, generated, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=5e-6)
