"""Config-system tests: every reference experiment JSON must parse unchanged."""

import glob
import os

import pytest

from dmi_tpu.config import (
    ALL_GROUPS,
    DatasetArgs,
    FewshotArgs,
    HypnetArgs,
    LMArgs,
    LoraArgs,
    MEncArgs,
    ProjectorArgs,
    TrainArgs,
    hypernet_post_init,
    lora_post_init,
    parse_config,
    projector_post_init,
)
from tests.conftest import REFERENCE_ROOT, requires_reference

PROJECTOR_GROUPS = (DatasetArgs, LMArgs, MEncArgs, ProjectorArgs, TrainArgs)
HYPERNET_GROUPS = (DatasetArgs, HypnetArgs, LMArgs, MEncArgs, ProjectorArgs, TrainArgs, FewshotArgs)
LORA_GROUPS = (DatasetArgs, LoraArgs, LMArgs, MEncArgs, ProjectorArgs, TrainArgs)


@requires_reference
def test_all_reference_configs_parse():
    cfg_root = os.path.join(REFERENCE_ROOT, "dmi", "configs")
    paths = glob.glob(os.path.join(cfg_root, "**", "*.json"), recursive=True)
    paths = [p for p in paths if not p.endswith("config.json")]  # template file
    assert len(paths) >= 70
    for path in paths:
        if "/hypernet/" in path:
            groups = HYPERNET_GROUPS
        elif "/lora/" in path:
            groups = LORA_GROUPS
        else:
            groups = PROJECTOR_GROUPS
        parsed = parse_config(path, groups)
        assert len(parsed) == len(groups)


@requires_reference
def test_sydney_rn50_config_values():
    path = os.path.join(
        REFERENCE_ROOT, "dmi", "configs", "projector", "v2:llama1b_sydney_rn50_mlp2.json"
    )
    data_args, lm_args, menc_args, proj_args, train_args = parse_config(path, PROJECTOR_GROUPS)
    assert data_args.dataset_names_or_paths == ["sydney"]
    assert menc_args.mm_dim == 1024
    assert menc_args.menc_names_or_paths == ["chendelong/RemoteCLIP-RN50-Unchanged"]
    assert lm_args.lm_name_or_path == "meta-llama/Llama-3.2-1B-Instruct"
    assert train_args.epochs_l == [1152, 288, 72, 60]
    assert train_args.dataset_size_l == ["128", "512", "2048", "full"]
    assert train_args.learning_rate == 1e-4
    assert train_args.seeds == (55625, 66848, 92900, 5225, 71753)
    assert proj_args.proj_n_layers == 2


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXP_DIR = os.path.join(REPO, "configs", "experiments")


def _groups_for(path):
    if "/hypernet/" in path:
        return HYPERNET_GROUPS
    if "/lora/" in path:
        return LORA_GROUPS
    return PROJECTOR_GROUPS


def _exp_paths():
    paths = glob.glob(os.path.join(EXP_DIR, "**", "*.json"), recursive=True)
    return sorted(p for p in paths if not p.endswith("sweeps.json"))


def test_vendored_configs_parse_and_count():
    """The vendored experiment surface (configs/experiments) must parse
    through the config system with the reference unmounted — the sweeps
    are reproducible from this repo alone."""
    paths = _exp_paths()
    assert len(paths) == 74, len(paths)
    for path in paths:
        groups = _groups_for(path)
        parsed = parse_config(path, groups)
        assert len(parsed) == len(groups)


def test_vendored_configs_generator_idempotent():
    """scripts/gen_experiment_configs.py --check: checked-in JSONs are
    exactly the expansion of sweeps.json (no hand-edit drift)."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "gen_experiment_configs.py"),
         "--check"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stdout + r.stderr


@requires_reference
def test_vendored_configs_match_reference():
    """File-set and semantic (parsed-JSON) equality with the mounted
    reference sweep surface."""
    import json

    cfg_root = os.path.join(REFERENCE_ROOT, "dmi", "configs")
    ref_paths = glob.glob(os.path.join(cfg_root, "**", "*.json"), recursive=True)
    ref_rel = sorted(
        os.path.relpath(p, cfg_root) for p in ref_paths
        if not p.endswith("config.json")
    )
    exp_rel = sorted(os.path.relpath(p, EXP_DIR) for p in _exp_paths())
    assert ref_rel == exp_rel
    for rel in ref_rel:
        with open(os.path.join(cfg_root, rel)) as f:
            want = json.load(f)
        with open(os.path.join(EXP_DIR, rel)) as f:
            got = json.load(f)
        assert got == want, rel


def test_unknown_key_rejected():
    with pytest.raises(ValueError):
        parse_config({"output_dir": "x", "bogus_key": 1}, (TrainArgs,))


def test_projector_post_init_prune_vs_inffs():
    # mm_dim < target -> prune to mm_dim (zero-pad handled downstream)
    t = TrainArgs(output_dir="x", finetune_mm_dim=768)
    m = MEncArgs(menc_names_or_paths=["e"], load_extracted_features=[True], mm_dim=512)
    p = ProjectorArgs()
    projector_post_init(t, m, p)
    assert p.proj_prune == 512 and t.n_components is None

    # mm_dim > target -> InfFS top-k selection to target
    t = TrainArgs(output_dir="x", finetune_mm_dim=768)
    m = MEncArgs(menc_names_or_paths=["e"], load_extracted_features=[True], mm_dim=1024)
    p = ProjectorArgs()
    projector_post_init(t, m, p)
    assert t.n_components == 768 and m.mm_dim == 768 and p.proj_prune is None


def test_hypernet_post_init_sets_proj_layers():
    t = TrainArgs(output_dir="x")
    m = MEncArgs(menc_names_or_paths=["e"], load_extracted_features=[True])
    p = ProjectorArgs(proj_n_layers=3)
    h = HypnetArgs()
    hypernet_post_init(h, p, t, m)
    assert h.hn_n_proj_layers == 3


def test_lora_post_init_sets_proj_layers():
    t = TrainArgs(output_dir="x")
    m = MEncArgs(menc_names_or_paths=["e"], load_extracted_features=[True])
    p = ProjectorArgs(proj_n_layers=2)
    lo = LoraArgs()
    lora_post_init(t, m, lo, p)
    assert lo.lora_n_proj_layers == 2
