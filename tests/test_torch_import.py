"""Round-trip tests for the reference .pt checkpoint importer.

Each test constructs a real torch module whose state-dict KEY LAYOUT matches
the reference exactly (Projector: nn.ModuleList 'net' of Linear/GELU/Dropout,
/root/reference/dmi/model/projector.py:25-44; HyperNetWrapper: 'hypernet.*' +
'projector.net.*', dmi/model/hypernet.py:207-215; LoraWrapper:
'lora_adapters.loras.{i}.A|B' + 'projector.net.*', dmi/model/lora.py:20-47),
saves it with torch.save in the reference checkpoint envelope
(dmi/train.py:229-238), imports it, and pins dmi_tpu forward outputs against
the torch module's.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from dmi_tpu.models import hypernet as hn
from dmi_tpu.models import projector as proj
from dmi_tpu.models import torch_import as ti


def make_torch_projector(mm_dim, lm_dim, n_layers=2, arch="mlp"):
    mods = []
    if arch == "linear":
        mods = [nn.Linear(mm_dim, lm_dim), nn.Dropout(0.1)]
    else:
        mods = [nn.Linear(mm_dim, lm_dim), nn.GELU(approximate="tanh"), nn.Dropout(0.1)]
        for _ in range(n_layers - 2):
            mods += [nn.Linear(lm_dim, lm_dim), nn.GELU(approximate="tanh"), nn.Dropout(0.1)]
        mods.append(nn.Linear(lm_dim, lm_dim))

    class P(nn.Module):
        def __init__(self):
            super().__init__()
            self.net = nn.ModuleList(mods)

        def forward(self, x):
            for m in self.net:
                x = m(x)
            return x

    return P().eval()


def save_ckpt(tmp_path, key, module, step=7, metric=0.5, with_opt=False):
    path = tmp_path / "ckpt.pt"
    state = {"step_idx": step, f"{key}_state_dict": module.state_dict(), "metric": metric}
    if with_opt:
        opt = torch.optim.AdamW(module.parameters(), lr=1e-3)
        x = torch.randn(4, next(module.parameters()).shape[-1])
        try:
            module(x).sum().backward()
            opt.step()
        except Exception:
            pass
        state["optimizer_state_dict"] = opt.state_dict()
    torch.save(state, path)
    return str(path)


def test_projector_mlp2_roundtrip(tmp_path):
    tp = make_torch_projector(12, 16)
    path = save_ckpt(tmp_path, "projector", tp)
    out = ti.load_torch_checkpoint(path)
    assert out["step_idx"] == 7 and out["metric"] == 0.5
    spec = proj.ProjectorSpec(mm_dim=12, lm_dim=16, n_layers=2)
    params = {"layers": [{k: jnp.asarray(v) for k, v in l.items()} for l in out["projector"]["layers"]]}
    x = np.random.default_rng(0).normal(size=(5, 12)).astype(np.float32)
    ours = np.asarray(proj.apply(spec, params, jnp.asarray(x)))
    theirs = tp(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_projector_mlp3_and_linear_roundtrip(tmp_path):
    for arch, n_layers, mm in [("mlp", 3, 10), ("linear", 1, 10)]:
        tp = make_torch_projector(mm, 16, n_layers=n_layers, arch=arch)
        path = save_ckpt(tmp_path, "projector", tp)
        out = ti.load_torch_checkpoint(path)
        spec = proj.ProjectorSpec(mm_dim=mm, lm_dim=16, n_layers=n_layers, arch=arch)
        params = {"layers": [{k: jnp.asarray(v) for k, v in l.items()} for l in out["projector"]["layers"]]}
        x = np.random.default_rng(1).normal(size=(4, mm)).astype(np.float32)
        ours = np.asarray(proj.apply(spec, params, jnp.asarray(x)))
        theirs = tp(torch.tensor(x)).detach().numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_projector_prune_matches_reference_slice(tmp_path):
    """prune slices torch (out, in) columns == our (in, out) rows
    (/root/reference/dmi/model/projector.py:49-54)."""
    tp = make_torch_projector(12, 16)
    path = save_ckpt(tmp_path, "projector", tp)
    out = ti.load_torch_checkpoint(path, prune=8)
    w0 = out["projector"]["layers"][0]["w"]
    assert w0.shape == (8, 16)
    np.testing.assert_allclose(
        w0, tp.net[0].weight.detach().numpy()[:, :8].T, atol=0
    )


class TorchHyperNetwork(nn.Module):
    """Reference HyperNetwork key layout, arch='attention'
    (dmi/model/hypernet.py:46-135)."""

    def __init__(self, d, n_proj_layers, gen_dims):
        super().__init__()

        class MHSA(nn.Module):
            def __init__(self):
                super().__init__()
                self.q = nn.Linear(d, d)
                self.k = nn.Linear(d, d)
                self.v = nn.Linear(d, d)

        self.hypnet = MHSA()
        self.generators = nn.ModuleList([nn.Linear(d, gd) for gd in gen_dims])
        self.prefix_tokens = nn.Parameter(torch.randn(n_proj_layers, d))


class TorchWrapper(nn.Module):
    def __init__(self, hypernet, projector):
        super().__init__()
        self.hypernet = hypernet
        self.projector = projector


def test_hypernet_wrapper_roundtrip(tmp_path):
    spec = hn.HypnetSpec(
        lm_dim=16, mm_dim=12, n_tokens=2, arch="attention", n_heads=2,
        hypnet_dim=12, rank=2, alpha=2, predict_bias=True, n_proj_layers=2,
        use_pos_encs=False,
    )
    gen_dims = [spec.gen_out_dim(i) for i in range(2)]
    thn = TorchHyperNetwork(12, 2, gen_dims)
    tp = make_torch_projector(12, 16)
    wrapper = TorchWrapper(thn, tp)
    path = save_ckpt(tmp_path, "hypernet", wrapper, with_opt=False)

    out = ti.load_torch_checkpoint(path, arch="attention")
    assert "projector" in out and "hypernet" in out
    params = {
        "prefix_tokens": jnp.asarray(out["hypernet"]["prefix_tokens"]),
        "generators": [
            {k: jnp.asarray(v) for k, v in g.items()} for g in out["hypernet"]["generators"]
        ],
        "attn": {
            n: {k: jnp.asarray(v) for k, v in l.items()}
            for n, l in out["hypernet"]["attn"].items()
        },
    }

    # full-context z (2*n_tokens + 1 = 5) -> no padding branch in either impl
    z = np.random.default_rng(2).normal(size=(5, 12)).astype(np.float32)
    a_ours, b_ours, d_ours = hn.apply(spec, params, jnp.asarray(z))

    # torch oracle: MHSA (scores/sqrt(d_model), no out-proj) + generators
    x = torch.cat([thn.prefix_tokens, torch.tensor(z)], dim=0)
    L, d, h = x.shape[0], 12, 2
    q = thn.hypnet.q(x).view(L, h, d // h).transpose(0, 1)
    k = thn.hypnet.k(x).view(L, h, d // h).transpose(0, 1)
    v = thn.hypnet.v(x).view(L, h, d // h).transpose(0, 1)
    enc = (torch.softmax(q @ k.transpose(-2, -1) / np.sqrt(d), dim=-1) @ v)
    enc = enc.transpose(0, 1).contiguous().view(L, d)
    for idx in range(2):
        w = (spec.alpha / spec.rank) * thn.generators[idx](enc[idx])
        a_dim, b_dim = spec.a_dim(idx), spec.b_dim(idx)
        np.testing.assert_allclose(
            np.asarray(a_ours[idx]), w[:a_dim].detach().numpy(), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(b_ours[idx]), w[a_dim : a_dim + b_dim].detach().numpy(), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(d_ours[idx]), w[a_dim + b_dim :].detach().numpy(), atol=1e-5
        )


def test_hypernet_transformer_arch_roundtrip(tmp_path):
    d, heads = 8, 2

    class THN(nn.Module):
        def __init__(self):
            super().__init__()
            layer = nn.TransformerEncoderLayer(
                d_model=d, nhead=heads, dim_feedforward=4 * d,
                batch_first=True, activation="gelu",
            )
            self.hypnet = nn.TransformerEncoder(layer, num_layers=1)
            self.generators = nn.ModuleList([nn.Linear(d, 4)])
            self.prefix_tokens = nn.Parameter(torch.randn(1, d))

    thn = THN().eval()
    path = save_ckpt(tmp_path, "hypernet", TorchWrapper(thn, make_torch_projector(8, 16)))
    out = ti.load_torch_checkpoint(path, arch="transformer")
    blk = {
        k: (
            jnp.asarray(v)
            if not isinstance(v, dict)
            else {k2: jnp.asarray(v2) for k2, v2 in v.items()}
        )
        for k, v in out["hypernet"]["blocks"][0].items()
    }
    spec = hn.HypnetSpec(
        lm_dim=16, mm_dim=8, n_tokens=2, arch="transformer", n_layers=1,
        n_heads=heads, hypnet_dim=d, rank=2, alpha=2, n_proj_layers=1,
    )
    x = np.random.default_rng(3).normal(size=(6, d)).astype(np.float32)
    ours = np.asarray(
        hn._transformer_block(spec, blk, jnp.asarray(x), jnp.ones(6, bool), train=False, rng=None)
    )
    theirs = thn.hypnet(torch.tensor(x)[None])[0].detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


class TorchLoraWrapper(nn.Module):
    def __init__(self, projector, dims, rank=2):
        super().__init__()

        class Adapters(nn.Module):
            def __init__(self):
                super().__init__()

                class L(nn.Module):
                    def __init__(self, i, o):
                        super().__init__()
                        self.A = nn.Parameter(torch.randn(i, rank) / np.sqrt(rank))
                        self.B = nn.Parameter(torch.zeros(rank, o) + 0.3)

                self.loras = nn.ModuleList([L(i, o) for i, o in dims])

        self.lora_adapters = Adapters()
        self.projector = projector


def test_lora_wrapper_roundtrip(tmp_path):
    tp = make_torch_projector(12, 16)
    wrapper = TorchLoraWrapper(tp, [(12, 16), (16, 16)])
    path = save_ckpt(tmp_path, "lora_model", wrapper)
    out = ti.load_torch_checkpoint(path)
    assert "projector" in out
    adapters = out["lora_adapters"]
    assert len(adapters) == 2
    np.testing.assert_allclose(
        adapters[0]["a"], wrapper.lora_adapters.loras[0].A.detach().numpy(), atol=0
    )
    np.testing.assert_allclose(
        adapters[1]["b"], wrapper.lora_adapters.loras[1].B.detach().numpy(), atol=0
    )

    # forward parity through module_lora_apply (only_lora_forward semantics)
    spec = proj.ProjectorSpec(mm_dim=12, lm_dim=16, n_layers=2)
    pparams = {"layers": [{k: jnp.asarray(v) for k, v in l.items()} for l in out["projector"]["layers"]]}
    lparams = [{k: jnp.asarray(v) for k, v in a.items()} for a in adapters]
    x = np.random.default_rng(4).normal(size=(3, 12)).astype(np.float32)
    ours = np.asarray(proj.module_lora_apply(spec, pparams, jnp.asarray(x), lparams, alpha=2, rank=2))

    xt = torch.tensor(x)
    h = xt
    li = 0
    for m in tp.net:
        y = m(h)
        if isinstance(m, nn.Linear):
            lor = wrapper.lora_adapters.loras[li]
            li += 1
            y = y + (2 / 2) * (h @ lor.A @ lor.B)
        h = y
    np.testing.assert_allclose(ours, h.detach().numpy(), atol=1e-5)


def test_optimizer_moments_imported(tmp_path):
    tp = make_torch_projector(12, 16)
    path = save_ckpt(tmp_path, "projector", tp, with_opt=True)
    out = ti.load_torch_checkpoint(path)
    opt = out["optimizer_state"]
    assert set(opt) == {0, 1, 2, 3}  # two linears x (weight, bias)
    assert opt[0]["exp_avg"].shape == (16, 12)  # torch layout preserved (raw)
    assert opt[0]["step"] == 1


def test_export_projector_state_dict_roundtrip(tmp_path):
    spec = proj.ProjectorSpec(mm_dim=12, lm_dim=16, n_layers=2)
    import jax

    params = proj.init(jax.random.key(0), spec)
    sd = ti.export_projector_state_dict(params)
    assert set(sd) == {"net.0.weight", "net.0.bias", "net.3.weight", "net.3.bias"}
    back = ti.projector_from_state_dict(sd)
    for ours, theirs in zip(params["layers"], back["layers"]):
        np.testing.assert_allclose(np.asarray(ours["w"]), theirs["w"], atol=0)


def test_missing_state_dict_raises(tmp_path):
    path = tmp_path / "bad.pt"
    torch.save({"nothing": 1}, path)
    with pytest.raises(KeyError):
        ti.load_torch_checkpoint(str(path))


def test_load_pytree_transparently_reads_torch_files(tmp_path):
    """Trainers call checkpoint.load_pytree everywhere; a reference .pt file
    must come back in the same envelope our own pickles use."""
    from dmi_tpu.training.checkpoint import load_pytree

    tp = make_torch_projector(12, 16)
    path = save_ckpt(tmp_path, "projector", tp, with_opt=True)
    env = load_pytree(path)
    assert env["step_idx"] == 7
    assert env["optimizer_state_dict"] is None  # torch moments don't map to optax
    assert [l["w"].shape for l in env["projector_state_dict"]["layers"]] == [
        (12, 16),
        (16, 16),
    ]

    # our own pickle format still round-trips through the same entry point
    from dmi_tpu.training.checkpoint import save_pytree

    own = tmp_path / "own.pt"
    save_pytree(str(own), {"step_idx": 3, "projector_state_dict": {"layers": []}})
    assert load_pytree(str(own))["step_idx"] == 3
