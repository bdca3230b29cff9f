"""Hypernetwork training / few-shot CLI (reference: dmi/train_hypernet.py).

Usage: python -m dmi_tpu.train_hypernet <config.json>
  mode=train   — stage 2: train the hypernetwork on high-resource datasets
  mode=fewshot — stage 3: few-shot integration sweeps over
                 (fewshot_epochs x fewshot_dataset_sizes) x seeds
"""

from __future__ import annotations

import copy
import logging
import os.path as osp
import sys

import jax

from dmi_tpu.config import (
    DatasetArgs,
    FewshotArgs,
    HypnetArgs,
    LMArgs,
    MEncArgs,
    ProjectorArgs,
    TrainArgs,
    apply_debug_overrides,
    hypernet_post_init,
    parse_config,
)
from dmi_tpu.data.loader import DatasetLoader
from dmi_tpu.models import hypernet as hn
from dmi_tpu.models import projector as proj
from dmi_tpu.registry import dataset_spec
from dmi_tpu.training.embeddings import (
    build_embedding_managers,
    build_fewshot_embedding_managers,
)
from dmi_tpu.training.hypernet_trainer import HypernetTrainer
from dmi_tpu.training.lora_trainer import load_frozen_projector
from dmi_tpu.training.model_utils import build_lm, build_tokenizer, is_instruct_lm
from dmi_tpu.training.results import average_seed_results, run_exists

log = logging.getLogger("dmi_tpu")

GROUPS = (DatasetArgs, HypnetArgs, LMArgs, MEncArgs, ProjectorArgs, TrainArgs, FewshotArgs)


def main(name, train_args, hn_args, projector_args, data_args, menc_args, lm_args, fewshot_args):
    is_instruct = is_instruct_lm(lm_args.lm_name_or_path)
    assert train_args.mode in ("train", "fewshot")
    apply_debug_overrides(train_args, "hypernet")

    from dmi_tpu.utils.logging import dump_config_snapshot

    dump_config_snapshot(
        name, data_args, hn_args, lm_args, menc_args, projector_args,
        train_args, fewshot_args,
    )
    tokenizer = build_tokenizer(lm_args)
    llm_cfg, llm_params = build_lm(lm_args, tokenizer, seed=train_args.seed)

    emb_mgrs = build_embedding_managers(menc_args)
    fewshot_emb_mgrs = (
        build_fewshot_embedding_managers(menc_args)
        if menc_args.fewshot_menc_names_or_paths
        else []
    )

    proj_spec = proj.ProjectorSpec(
        mm_dim=menc_args.mm_dim,
        lm_dim=llm_cfg.hidden_size,
        arch=projector_args.proj_arch,
        act=projector_args.proj_act,
        n_layers=projector_args.proj_n_layers,
        dropout=projector_args.proj_dropout,
    )
    frozen_proj = load_frozen_projector(projector_args.proj_name_or_path, proj_spec)

    n_tokens = (
        fewshot_args.fewshot_n_tokens
        if fewshot_args.fewshot_n_tokens is not None
        else train_args.subset_batch_size
    )
    hn_spec = hn.HypnetSpec(
        lm_dim=llm_cfg.hidden_size,
        mm_dim=menc_args.mm_dim,
        n_tokens=n_tokens,
        arch=hn_args.hn_arch,
        n_layers=hn_args.hn_n_layers,
        n_heads=hn_args.hn_n_heads,
        hypnet_dim=hn_args.hn_hypnet_dim,
        rank=hn_args.hn_rank,
        alpha=hn_args.hn_alpha,
        predict_bias=hn_args.hn_predict_bias,
        n_proj_layers=hn_args.hn_n_proj_layers,
        use_pos_encs=hn_args.hn_use_pos_encs,
        attn_dropout=hn_args.hn_attn_dropout,
        transformer_dropout=hn_args.hn_transformer_dropout,
    )
    hn_params = hn.init(jax.random.key(train_args.seed), hn_spec)

    def build(datasets, encoders):
        model_names = [m.split("/")[-1] for m in encoders]
        return [
            DatasetLoader(
                dataset_spec(ds), tokenizer, train_args, mn, is_instruct,
                data_args.data_root,
            )
            for ds, mn in zip(datasets, model_names)
        ]

    loaders = (
        build(data_args.dataset_names_or_paths, menc_args.menc_names_or_paths)
        if train_args.mode == "train"
        else []
    )
    fewshot_loaders = (
        build(data_args.fewshot_dataset_names_or_paths, menc_args.fewshot_menc_names_or_paths)
        if data_args.fewshot_dataset_names_or_paths
        else []
    )

    trainer = HypernetTrainer(
        name=name,
        llm_cfg=llm_cfg,
        llm_params=llm_params,
        proj_spec=proj_spec,
        frozen_proj_params=frozen_proj,
        hn_spec=hn_spec,
        hn_params=hn_params,
        loaders=loaders,
        emb_mgrs=emb_mgrs,
        fewshot_loaders=fewshot_loaders,
        fewshot_emb_mgrs=fewshot_emb_mgrs,
        tokenizer=tokenizer,
        train_args=train_args,
        fewshot_args=fewshot_args,
        data_root=data_args.data_root,
    )
    start_step = 0
    if train_args.resume_from_checkpoint:
        ck = trainer.load_checkpoint(train_args.resume_from_checkpoint)
        if train_args.mode == "train" and not train_args.resume_from_checkpoint_reset_steps:
            start_step = int(ck["step_idx"]) + 1
            log.info("Resuming hypernet training from step %d", start_step)

    if train_args.mode == "train":
        log.info("Starting hypernet training (%d steps)", trainer.total_steps)
        trainer.train(start_step)
    else:
        log.info("Starting fewshot integration")
        trainer.fewshot_generate()
    return trainer


def run(config_path: str) -> None:
    # DMI_PLATFORM=cpu pins the backend before first device use (the
    # image's sitecustomize ignores the JAX_PLATFORMS env var)
    from dmi_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    # multi-host entry: a no-op on single-process runs, initializes
    # jax.distributed when a coordinator is configured (pod/multi-slice)
    from dmi_tpu.parallel import init_distributed

    init_distributed()
    (data_args, hn_args, lm_args, menc_args, projector_args, train_args, fewshot_args) = (
        parse_config(config_path, GROUPS)
    )
    name = osp.splitext(osp.basename(config_path))[0]
    hypernet_post_init(hn_args, projector_args, train_args, menc_args)

    if train_args.mode == "train":
        main(
            name, train_args, hn_args, projector_args, data_args, menc_args,
            lm_args, fewshot_args,
        )
        return

    # fewshot sweep (dmi/train_hypernet.py:674-704)
    seeds = train_args.seeds
    train_args.seeds = None
    for epochs, dataset_size in zip(fewshot_args.fewshot_epochs, fewshot_args.fewshot_dataset_sizes):
        train_args.epochs = epochs
        train_args.dataset_size = dataset_size
        log.info("Fewshot: %s epochs, dataset size %s", epochs, dataset_size)
        for seed in seeds:
            train_args.seed = seed
            output_fname = f"{name}-dsz{dataset_size}-seed{seed}"
            if run_exists(train_args.output_root, "hypernet", output_fname):
                log.info("Skipping %s (results exist)", output_fname)
                continue
            main(
                output_fname,
                copy.deepcopy(train_args),
                copy.deepcopy(hn_args),
                copy.deepcopy(projector_args),
                copy.deepcopy(data_args),
                copy.deepcopy(menc_args),
                copy.deepcopy(lm_args),
                copy.deepcopy(fewshot_args),
            )
        if len(data_args.fewshot_dataset_names_or_paths) == 1:
            average_seed_results(
                seeds, name, dataset_size,
                data_args.fewshot_dataset_names_or_paths[0],
                "hypernet", train_args.output_root,
            )


def cli(argv=None):
    """Console entry point: ``%(prog)s <config.json>``."""
    import sys as _sys

    argv = _sys.argv[1:] if argv is None else argv
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s - %(levelname)s - %(message)s",
        datefmt="%d/%m/%Y %H:%M:%S",
    )
    from dmi_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    run(osp.abspath(argv[0]))


if __name__ == "__main__":
    cli()
