"""LoRA-baseline training CLI (reference: dmi/train_lora.py).

Usage: python -m dmi_tpu.train_lora <config.json>
"""

from __future__ import annotations

import copy
import logging
import os.path as osp
import sys

import jax

from dmi_tpu.config import (
    DatasetArgs,
    LMArgs,
    LoraArgs,
    MEncArgs,
    ProjectorArgs,
    TrainArgs,
    apply_debug_overrides,
    lora_post_init,
    parse_config,
)
from dmi_tpu.data.loader import DatasetLoader
from dmi_tpu.models import lora as lora_mod
from dmi_tpu.models import projector as proj
from dmi_tpu.registry import dataset_spec
from dmi_tpu.training.embeddings import build_embedding_managers
from dmi_tpu.training.lora_trainer import LoraTrainer, load_frozen_projector
from dmi_tpu.training.model_utils import build_lm, build_tokenizer, is_instruct_lm
from dmi_tpu.training.results import average_seed_results, run_exists

log = logging.getLogger("dmi_tpu")

GROUPS = (DatasetArgs, LoraArgs, LMArgs, MEncArgs, ProjectorArgs, TrainArgs)


def main(name, data_args, lora_args, lm_args, menc_args, projector_args, train_args):
    is_instruct = is_instruct_lm(lm_args.lm_name_or_path)
    apply_debug_overrides(train_args, "lora")
    lora_post_init(train_args, menc_args, lora_args, projector_args)

    from dmi_tpu.utils.logging import dump_config_snapshot

    dump_config_snapshot(name, data_args, lora_args, lm_args, menc_args, projector_args, train_args)
    tokenizer = build_tokenizer(lm_args)
    llm_cfg, llm_params = build_lm(lm_args, tokenizer, seed=train_args.seed)
    emb_mgrs = build_embedding_managers(menc_args)

    proj_spec = proj.ProjectorSpec(
        mm_dim=menc_args.mm_dim,
        lm_dim=llm_cfg.hidden_size,
        arch=projector_args.proj_arch,
        act=projector_args.proj_act,
        n_layers=projector_args.proj_n_layers,
        dropout=projector_args.proj_dropout,
    )
    frozen = load_frozen_projector(projector_args.proj_name_or_path, proj_spec)

    lora_spec = lora_mod.LoraSpec(
        rank=lora_args.lora_rank,
        alpha=lora_args.lora_alpha,
        n_proj_layers=lora_args.lora_n_proj_layers,
    )
    lora_params = lora_mod.init(jax.random.key(train_args.seed), lora_spec, proj_spec)

    model_names = [m.split("/")[-1] for m in menc_args.menc_names_or_paths]
    loaders = [
        DatasetLoader(
            dataset_spec(ds), tokenizer, train_args, mn, is_instruct, data_args.data_root
        )
        for ds, mn in zip(data_args.dataset_names_or_paths, model_names)
    ]

    trainer = LoraTrainer(
        lora_spec=lora_spec,
        lora_params=lora_params,
        frozen_proj_params=frozen,
        name=name,
        llm_cfg=llm_cfg,
        llm_params=llm_params,
        proj_spec=proj_spec,
        loaders=loaders,
        emb_mgrs=emb_mgrs,
        tokenizer=tokenizer,
        train_args=train_args,
        data_root=data_args.data_root,
    )
    start_step = 0
    if train_args.resume_from_checkpoint:
        # reference LoraTrainer loads resume_from_checkpoint at init
        # (dmi/train_lora.py:33-34); its start step stays 0 (the reference's
        # ckpt_state resume is broken by design — SURVEY.md quirks)
        start_step = trainer.resume(train_args.resume_from_checkpoint)
        if train_args.resume_from_checkpoint_reset_steps:
            start_step = 0
        log.info("Resuming LoRA training from step %d", start_step)
    log.info("Starting LoRA training (%d steps)", trainer.total_steps)
    return trainer.train(start_step)


def run(config_path: str) -> None:
    # DMI_PLATFORM=cpu pins the backend before first device use (the
    # image's sitecustomize ignores the JAX_PLATFORMS env var)
    from dmi_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    # multi-host entry: a no-op on single-process runs, initializes
    # jax.distributed when a coordinator is configured (pod/multi-slice)
    from dmi_tpu.parallel import init_distributed

    init_distributed()
    data_args, lora_args, lm_args, menc_args, projector_args, train_args = parse_config(
        config_path, GROUPS
    )
    name = osp.splitext(osp.basename(config_path))[0]

    seeds = train_args.seeds
    train_args.seeds = None
    epochs_l, dataset_size_l = train_args.epochs_l, train_args.dataset_size_l
    train_args.epochs_l = train_args.dataset_size_l = None
    if epochs_l is None:
        epochs_l, dataset_size_l = [train_args.epochs], [train_args.dataset_size]

    for epochs, dataset_size in zip(epochs_l, dataset_size_l):
        train_args.epochs = epochs
        train_args.dataset_size = dataset_size
        for seed in seeds:
            train_args.seed = seed
            output_fname = f"{name}-dsz{dataset_size}-seed{seed}"
            if run_exists(train_args.output_root, "lora", output_fname):
                log.info("Skipping %s (results exist)", output_fname)
                continue
            main(
                output_fname,
                copy.deepcopy(data_args),
                copy.deepcopy(lora_args),
                copy.deepcopy(lm_args),
                copy.deepcopy(menc_args),
                copy.deepcopy(projector_args),
                copy.deepcopy(train_args),
            )
        if len(data_args.dataset_names_or_paths) == 1:
            average_seed_results(
                seeds, name, dataset_size, data_args.dataset_names_or_paths[0],
                "lora", train_args.output_root,
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
