"""finetune_mm_dim routing e2e: prune (encoder narrower than the shared
interface) and InfFS top-k (encoder wider), through the real fewshot CLI.

Reference semantics: dmi/train_hypernet.py:465-472 + dmi/model/projector.py:
46-54 (prune), dmi/data/base.py:100-104 (InfFS), dmi/train_hypernet.py:99-100
(zero-pad the conditioning subset back to the interface dim)."""

import json
import os.path as osp

import pytest

from dmi_tpu.data.fixtures import generate_dataset
from dmi_tpu.train_hypernet import run as run_hypernet
from dmi_tpu.train_projector import run as run_projector
from tests.test_hypernet_e2e import hypernet_config
from tests.test_projector_e2e import make_config

IFACE = 32  # shared interface dim (stands in for the reference's 768)


@pytest.fixture()
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    # stage-1 projector trained at the interface dim
    generate_dataset("data", "sydney", "RemoteCLIP-RN50-Unchanged", mm_dim=IFACE,
                     n_train=4, n_eval=2, text_dim=IFACE, seed=0)
    # narrow unseen encoder (24 < 32 -> prune + pad)
    generate_dataset("data", "candels", "zoobot-encoder-convnext_nano", mm_dim=24,
                     n_train=4, n_eval=2, text_dim=IFACE, seed=2)
    # wide unseen encoder (48 > 32 -> InfFS top-32)
    generate_dataset("data", "chebi20", "MolCA", mm_dim=48,
                     n_train=6, n_eval=2, text_dim=IFACE, seed=3)
    run_projector(make_config(tmp_path, mm_dim=IFACE))
    return tmp_path


PROJ_CKPT = osp.join(
    "checkpoints", "cfg_projector_smoke-dszfull-seed7-checkpoint-projector-best.pt"
)


def test_prune_branch_narrow_encoder(workdir):
    cfg = hypernet_config(
        workdir, PROJ_CKPT, "fewshot",
        mm_dim=24,
        finetune_mm_dim=IFACE,
        hn_hypnet_dim=IFACE,
        fewshot_menc_names_or_paths=["mwalmsley/zoobot-encoder-convnext_nano"],
        fewshot_dataset_names_or_paths=["candels"],
        fewshot_dataset_sizes=["full"],
        fewshot_epochs=[1],
    )
    new = str(workdir / "cfg_prune.json")
    import os

    os.rename(cfg, new)
    run_hypernet(new)
    rf = osp.join("outputs", "hypernet:cfg_prune-dszfull-seed7-results.json")
    assert osp.exists(rf)
    m = json.load(open(rf))["metrics"]["zoobot-encoder-convnext_nano"]
    assert "coco_cider" in m


@pytest.mark.slow
def test_inffs_branch_wide_encoder(workdir):
    cfg = hypernet_config(
        workdir, PROJ_CKPT, "fewshot",
        mm_dim=48,
        finetune_mm_dim=IFACE,
        hn_hypnet_dim=IFACE,
        fewshot_menc_names_or_paths=["acharkq/MolCA"],
        fewshot_dataset_names_or_paths=["chebi20"],
        fewshot_dataset_sizes=["full"],
        fewshot_epochs=[1],
    )
    new = str(workdir / "cfg_inffs.json")
    import os

    os.rename(cfg, new)
    run_hypernet(new)
    rf = osp.join("outputs", "hypernet:cfg_inffs-dszfull-seed7-results.json")
    assert osp.exists(rf)
    m = json.load(open(rf))["metrics"]["MolCA"]
    assert "bleu" in m  # chebi20 metric suite
