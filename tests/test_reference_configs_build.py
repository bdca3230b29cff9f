"""Dry-build the LITERAL reference experiment configs: parse them verbatim,
construct tokenizer/LM/loaders/trainer, and verify the training schedule —
the wiring a real run would use, minus the GPU-scale epochs."""

import copy
import os
import os.path as osp

import pytest

from dmi_tpu.config import parse_config
from dmi_tpu.data.fixtures import generate_dataset
from tests.conftest import REFERENCE_ROOT, requires_reference

CFG_ROOT = osp.join(REFERENCE_ROOT, "dmi", "configs")


@pytest.fixture(autouse=True)
def lm_override(monkeypatch):
    monkeypatch.setenv("DMI_LM_OVERRIDE", "test:tiny")


@requires_reference
def test_reference_v2_sydney_rn50_builds_and_schedules(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    generate_dataset("data", "sydney", "RemoteCLIP-RN50-Unchanged", mm_dim=1024,
                     n_train=8, n_eval=2, seed=0)

    from dmi_tpu.train_projector import GROUPS, main as proj_main
    from dmi_tpu.config import apply_debug_overrides, projector_post_init
    from dmi_tpu.data.loader import DatasetLoader
    from dmi_tpu.registry import dataset_spec
    from dmi_tpu.training.model_utils import build_lm, build_tokenizer

    path = osp.join(CFG_ROOT, "projector", "v2:llama1b_sydney_rn50_mlp2.json")
    data_args, lm_args, menc_args, proj_args, train_args = parse_config(path, GROUPS)

    # reference sweep: epochs_l=[1152,288,72,60] x sizes ["128",...,"full"];
    # verify the schedule arithmetic on the first sweep point
    train_args.epochs = train_args.epochs_l[0]
    train_args.dataset_size = train_args.dataset_size_l[0]
    train_args.seed = train_args.seeds[0]
    projector_post_init(train_args, menc_args, proj_args)

    tokenizer = build_tokenizer(lm_args)
    llm_cfg, llm_params = build_lm(lm_args, tokenizer, seed=1)
    loader = DatasetLoader(
        dataset_spec("sydney"), tokenizer, train_args,
        "RemoteCLIP-RN50-Unchanged", True, "data",
    )
    # dsz "128" > fixture size -> baseid subsample keeps all 40 rows
    assert len(loader.train) == 40
    # reference total steps = len(torch DataLoader) = ceil(n*epochs/bsz)
    # (dmi/train.py:75): ceil(40*1152/64) = 720
    assert loader.total_train_steps() == -(-40 * 1152 // train_args.train_batch_size)
    assert loader.total_train_steps() == 720
    b = loader.train_batch(0)
    assert b["embs"].shape == (train_args.train_batch_size, 1024)


@requires_reference
def test_reference_v6_fewshot_config_builds(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    generate_dataset("data", "candels", "zoobot-encoder-convnext_base",
                     mm_dim=1024, n_train=4, n_eval=2, text_dim=768, seed=1)

    from dmi_tpu.train_hypernet import GROUPS
    from dmi_tpu.config import hypernet_post_init

    path = osp.join(
        CFG_ROOT, "hypernet", "v6:llama1b_inst_all_only_fewshot_candels_base.json"
    )
    (data_args, hn_args, lm_args, menc_args, proj_args, train_args, fewshot_args) = (
        parse_config(path, GROUPS)
    )
    hypernet_post_init(hn_args, proj_args, train_args, menc_args)
    # zoobot-base is 1024-d > finetune_mm_dim 768 -> InfFS route
    assert train_args.n_components == 768
    assert menc_args.mm_dim == 768
    assert hn_args.hn_n_proj_layers == 2
    assert fewshot_args.fewshot_dataset_sizes == ["128", "512", "2048", "full"]

    from dmi_tpu.data.loader import DatasetLoader
    from dmi_tpu.registry import dataset_spec
    from dmi_tpu.training.model_utils import build_tokenizer

    train_args.epochs = fewshot_args.fewshot_epochs[0]
    train_args.dataset_size = fewshot_args.fewshot_dataset_sizes[0]
    tokenizer = build_tokenizer(lm_args)
    loader = DatasetLoader(
        dataset_spec("candels"), tokenizer, train_args,
        "zoobot-encoder-convnext_base", True, "data",
    )
    # InfFS selected 768 of 1024 dims
    assert loader.selected_features is not None
    assert loader.train_batch(0)["embs"].shape[1] == 768
