"""LoRA-baseline offline equivalence: the EXECUTED reference
`dmi/train_lora.py` vs dmi_tpu's LoraTrainer — the fourth and last
training entry point, completing the pipeline-equivalence set
(stages 1-3: scripts/ref_equivalence{,_hypernet,_fewshot}.py).

Both stacks train per-layer LoRA adapters over the SAME frozen
pretrained projector (a reference-built checkpoint both load from disk)
from the SAME random adapter init (the reference LoraWrapper's init is
dumped at construction and imported into our run through the production
torch_import path, exactly like stage 1 does for the projector).  Every
layer runs: module-LoRA forward (`only_lora_forward`, A@B with alpha/rank
scaling over the frozen net), frozen-LLM loss, grad-clip + AdamW +
warmup-cosine, eval loop, best-by-CIDEr selection, test generation,
results JSON.  Determinism comes from the stage-1 tricks (1-item train
split, single instruction prefix, dropout 0, f32) — see
ref_equivalence.py's docstring.

Usage:
    python scripts/ref_equivalence_lora.py [workdir]
prints one JSON verdict line and writes <workdir>/ref_equivalence_lora.json.
Also driven by tests/test_reference_pipeline_equivalence.py (slow).
"""

from __future__ import annotations

import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

import ref_equivalence as base  # noqa: E402  (shared builders + stubs)
import ref_equivalence_hypernet as hyp  # noqa: E402  (frozen projector)

ENC = base.ENC
ENC_SHORT = base.ENC_SHORT
MM_DIM = base.MM_DIM
SEED = base.SEED
RANK = 4


def _lora_kwargs():
    return dict(lora_rank=RANK, lora_alpha=8)


def run_reference(workdir, lm_dir, data_root, name, proj_ckpt) -> dict:
    """Execute the actual reference train_lora.main() in-process."""
    rec = base.install_reference_stubs()

    import torch
    import transformers

    import dmi.model as ref_model_pkg
    import dmi.model.lora as ref_lora_mod
    import dmi.train_lora as ref_tl
    from dmi.utils.args import (
        DatasetArgs as RDatasetArgs,
        LMArgs as RLMArgs,
        LoraArgs as RLoraArgs,
        MEncArgs as RMEncArgs,
        ProjectorArgs as RProjectorArgs,
        TrainArgs as RTrainArgs,
    )

    from dmi_tpu.evals.metrics import calc_metrics as our_calc_metrics

    ref_model_pkg.LLMS_CHATTEMPLATES[lm_dir] = ref_model_pkg.LLMS_CHATTEMPLATES[
        "meta-llama/Llama-3.2-1B-Instruct"
    ]
    ref_tl.LLMS_CHATTEMPLATES = ref_model_pkg.LLMS_CHATTEMPLATES

    abs_data_root = osp.abspath(data_root)
    ref_tl.calc_metrics = lambda preds, ids, ds, exp_id, mode: our_calc_metrics(
        preds, ids, ds, exp_id, mode, data_root=abs_data_root
    )

    # dump the wrapper's random adapter init (A=randn/sqrt(rank), B=zeros,
    # dmi/model/lora.py:10-11) in the production checkpoint schema
    init_dump = osp.join(workdir, "ref_init_lora.pt")

    class DumpingWrapper(ref_lora_mod.LoraWrapper):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            torch.save(
                {"step_idx": -1, "lora_model_state_dict": self.state_dict()},
                init_dump,
            )

    ref_tl.LoraWrapper = DumpingWrapper

    run_dir = osp.join(workdir, "ref", "run")
    os.makedirs(osp.join(workdir, "ref", "outputs"), exist_ok=True)
    os.makedirs(run_dir, exist_ok=True)
    data_link = osp.join(run_dir, "data")
    if not osp.exists(data_link):
        os.symlink(abs_data_root, data_link)

    train_args = RTrainArgs(**base._train_args_common())
    lora_args = RLoraArgs(**_lora_kwargs())
    data_args = RDatasetArgs(dataset_names_or_paths=["sydney"])
    lm_args = RLMArgs(lm_name_or_path=lm_dir, lm_dtype="float32")
    menc_args = RMEncArgs(
        menc_names_or_paths=[ENC],
        load_extracted_features=[True],
        mm_dim=MM_DIM,
        mm_dtype="float32",
    )
    proj_args = RProjectorArgs(
        proj_name_or_path=proj_ckpt, proj_dropout=0.0, proj_n_layers=2
    )

    with base.chdir(run_dir):
        transformers.set_seed(SEED)
        # reference signature: main(name, data, lora, lm, menc, proj, train)
        # with args_post_init inside (dmi/train_lora.py:171-186)
        ref_tl.main(
            name, data_args, lora_args, lm_args, menc_args, proj_args, train_args
        )

    results_path = osp.join(workdir, "ref", "outputs", f"lora:{name}-results.json")
    return {
        "train_loss": rec.series("train_loss"),
        "eval_loss": rec.series("eval_loss"),
        "results": json.load(open(results_path)),
        "init_dump": init_dump,
    }


def run_ours(workdir, lm_dir, data_root, name, init_dump, proj_ckpt) -> dict:
    """Run dmi_tpu's LoraTrainer on the same inputs."""
    os.environ.setdefault("WANDB_MODE", "disabled")
    from dmi_tpu import chat_templates as our_ct
    from dmi_tpu import train_lora as our_tl
    from dmi_tpu.config import (
        DatasetArgs,
        LMArgs,
        LoraArgs,
        MEncArgs,
        ProjectorArgs,
        TrainArgs,
    )

    our_ct.LLMS_CHATTEMPLATES[lm_dir] = our_ct.LLAMA32_CHAT_TEMPLATE

    run_dir = osp.join(workdir, "ours", "run")
    out_root = osp.join(workdir, "ours", "outputs")
    os.makedirs(out_root, exist_ok=True)

    c = base._train_args_common()
    c.pop("output_dir")
    c.pop("device")
    train_args = TrainArgs(
        output_dir="outputs",
        resume_from_checkpoint=init_dump,
        output_root=osp.abspath(out_root),
        checkpoint_dir=osp.join(workdir, "ours", "checkpoints"),
        seeds=None,
        **c,
    )
    lora_args = LoraArgs(**_lora_kwargs())
    data_args = DatasetArgs(
        dataset_names_or_paths=["sydney"], data_root=osp.abspath(data_root)
    )
    lm_args = LMArgs(lm_name_or_path=lm_dir, lm_dtype="float32")
    menc_args = MEncArgs(
        menc_names_or_paths=[ENC],
        load_extracted_features=[True],
        mm_dim=MM_DIM,
        mm_dtype="float32",
    )
    proj_args = ProjectorArgs(
        proj_name_or_path=proj_ckpt, proj_dropout=0.0, proj_n_layers=2
    )

    with base.chdir(run_dir):
        our_tl.main(
            name, data_args, lora_args, lm_args, menc_args, proj_args, train_args
        )
        jsonl = osp.join("logs", f"{name}.metrics.jsonl")
        records = [json.loads(line) for line in open(jsonl)]

    train_loss = [(r["step"], r["train_loss"]) for r in records if "train_loss" in r]
    eval_loss = [(r["step"], r["eval_loss"]) for r in records if "eval_loss" in r]
    results_path = osp.join(out_root, f"lora:{name}-results.json")
    return {
        "train_loss": train_loss,
        "eval_loss": eval_loss,
        "results": json.load(open(results_path)),
    }


def run_equivalence(workdir: str) -> dict:
    # CPU determinism + keep the TPU relay out of a torch-vs-jax diff
    # (sitecustomize ignores JAX_PLATFORMS; config.update is required)
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.makedirs(workdir, exist_ok=True)
    name = f"refequivlora-dszfull-seed{SEED}"
    lm_dir = base.build_local_lm(workdir)
    data_root = base.build_fixture_data(workdir)
    import transformers

    lm_dim = transformers.AutoConfig.from_pretrained(lm_dir).hidden_size
    proj_ckpt = hyp.build_frozen_projector(workdir, lm_dim)
    ref = run_reference(workdir, lm_dir, data_root, name, proj_ckpt)
    ours = run_ours(workdir, lm_dir, data_root, name, ref["init_dump"], proj_ckpt)
    verdict = base.compare(ref, ours)
    with open(osp.join(workdir, "ref_equivalence_lora.json"), "w") as f:
        json.dump(verdict, f, indent=2)
    return verdict


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ref_equiv_lora"
    v = run_equivalence(workdir)
    summary = {
        "train_n": v["train_loss"]["n_common"],
        "train_max_abs": v["train_loss"]["max_abs"],
        "train_max_rel": v["train_loss"]["max_rel"],
        "eval_max_abs": v["eval_loss"]["max_abs"],
        "preds": f"{v['preds_identical']}/{v['preds_total']}",
        "gts_equal": v["gts_equal"],
        "ids_equal": v["ids_equal"],
        "metric_abs_diffs": v["metric_abs_diffs"],
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
