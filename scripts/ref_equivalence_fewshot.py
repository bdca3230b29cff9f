"""Stage-3 (fewshot) offline equivalence: the EXECUTED reference
`dmi/train_hypernet.py` (mode=fewshot) vs dmi_tpu's
HypernetTrainer.fewshot_generate — the paper's headline experiment.

Completes the pipeline-equivalence triptych (stage 1:
scripts/ref_equivalence.py, stage 2: scripts/ref_equivalence_hypernet.py).
Both stacks resume the SAME random hypernet checkpoint (reference
checkpoint schema, built by the executed reference HyperNetWrapper),
then run the full stage-3 path on identical data: adapter emission from a
conditioning subset, adapter averaging, `combine_lora` baking into a
concrete generated projector, a fresh AdamW (torch-default betas/eps)
finetune of that projector against the frozen LLM, periodic
generate->CIDEr best-model selection, best reload, test generation, and
the results-JSON artifact.  Per-update train losses and the final results
JSON (metrics / preds / gts / ids) are diffed.

Determinism design (see ref_equivalence_hypernet.py for the shared
tricks):
  * the fewshot TRAIN split holds ONE row (build_fixture_data_hyp), so
    every InfiniteSampler draw — reference global-np.random vs our
    stateless jax stream — yields identical batch and subset content
  * finetune_generated_projector=True: after adapter baking, forward
    routes through the concrete generated projector on both sides
    (reference dmi/model/hypernet.py:268-274), so eval/test subset draws
    never touch the math and the eval/test splits stay fully diverse
  * rotation is structurally off in stage 3 (can_rotate=False,
    dmi/train_hypernet.py:246) and the MHSA dropout (p=0.05 hardcoded,
    dmi/model/hypernet.py:47) is zeroed on both sides — adapter emission
    must be deterministic

Usage:
    python scripts/ref_equivalence_fewshot.py [workdir]
prints one JSON verdict line and writes <workdir>/ref_equivalence_fewshot.json.
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
import ref_equivalence_hypernet as hyp  # noqa: E402  (stage-2 builders)

ENC = base.ENC
ENC_SHORT = base.ENC_SHORT
MM_DIM = base.MM_DIM
SEED = 55625
EPOCHS = 96  # 1-row fewshot split x epochs=96 / bs 4 -> 24 update steps
TRAIN_BS = 4
SUBSET_BS = 8
EVAL_BS = 5
EVAL_EVERY = 4  # -> 6 generate->CIDEr best-selection points


def _train_args_common():
    return dict(
        output_dir="outputs",
        device="cpu",
        mode="fewshot",
        train_batch_size=TRAIN_BS,
        subset_batch_size=SUBSET_BS,
        eval_batch_size=EVAL_BS,
        learning_rate=1e-3,  # main optimizer; unused in fewshot mode
        weight_decay=0.0,
        epochs=EPOCHS,
        dataset_size="full",
        warmup_steps=0,
        scheduler="cosine_warmup",
        logging_steps=1,
        save_steps=10_000,
        eval_steps=EVAL_EVERY,
        generate_steps=10_000,
        seed=SEED,
        gradient_accumulation_steps=1,
        feed_txt_embs=True,
        augment_emb_space=False,
        debug=False,
    )


def _fewshot_kwargs():
    return dict(
        finetune_generated_projector=True,
        fewshot_learning_rate=1e-3,
        fewshot_weight_decay=5e-6,  # exercises decoupled-wd parity
        fewshot_n_adapters="one",
    )


def build_resume_ckpts(workdir: str, lm_dim: int, proj_ckpt: str):
    """Build ONE random hypernet state via the executed reference
    HyperNetWrapper and save it twice: the reference resume file carries
    the optimizer_state_dict its load_checkpoint requires
    (dmi/train_hypernet.py:417-427); ours carries just the weights."""
    ref_path = osp.join(workdir, "resume_ref.pt")
    our_path = osp.join(workdir, "resume_ours.pt")
    if osp.exists(ref_path) and osp.exists(our_path):
        return ref_path, our_path
    base.install_reference_stubs()
    import torch

    from dmi.model.hypernet import HyperNetWrapper
    from dmi.utils.args import (
        HypnetArgs as RHypnetArgs,
        ProjectorArgs as RProjectorArgs,
    )

    hn_args = RHypnetArgs(**hyp._hn_kwargs())
    hn_args.hn_n_proj_layers = 2
    proj_args = RProjectorArgs(proj_name_or_path=proj_ckpt, proj_dropout=0.0)
    torch.manual_seed(11)
    w = HyperNetWrapper(
        hn_args=hn_args, proj_args=proj_args, lm_emb_dim=lm_dim,
        mm_emb_dim=MM_DIM, n_tokens=SUBSET_BS, device="cpu",
    )
    opt = torch.optim.AdamW(w.trainable_parameters(), lr=1e-3)
    torch.save(
        {
            "step_idx": 0,
            "hypernet_state_dict": w.state_dict(),
            "optimizer_state_dict": opt.state_dict(),
        },
        ref_path,
    )
    torch.save({"step_idx": 0, "hypernet_state_dict": w.state_dict()}, our_path)
    return ref_path, our_path


def run_reference(workdir, lm_dir, data_root, name, proj_ckpt, resume) -> dict:
    """Execute the actual reference train_hypernet.main() mode=fewshot."""
    rec = base.install_reference_stubs()

    import transformers

    import dmi.model as ref_model_pkg
    import dmi.train_hypernet as ref_th
    from dmi.utils.args import (
        DatasetArgs as RDatasetArgs,
        FewshotArgs as RFewshotArgs,
        HypnetArgs as RHypnetArgs,
        LMArgs as RLMArgs,
        MEncArgs as RMEncArgs,
        ProjectorArgs as RProjectorArgs,
        TrainArgs as RTrainArgs,
    )

    from dmi_tpu.evals.metrics import calc_metrics as our_calc_metrics

    ref_model_pkg.LLMS_CHATTEMPLATES[lm_dir] = ref_model_pkg.LLMS_CHATTEMPLATES[
        "meta-llama/Llama-3.2-1B-Instruct"
    ]
    ref_th.LLMS_CHATTEMPLATES = ref_model_pkg.LLMS_CHATTEMPLATES

    abs_data_root = osp.abspath(data_root)
    ref_th.calc_metrics = lambda preds, ids, ds, exp_id, mode: our_calc_metrics(
        preds, ids, ds, exp_id, mode, data_root=abs_data_root
    )

    class ZeroDropWrapper(ref_th.HyperNetWrapper):
        """Zero the hardcoded MHSA dropout (see module docstring); the
        resumed state_dict then makes both stacks weight-identical."""

        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.hypernet.hypnet.dropout.p = 0.0

    ref_th.HyperNetWrapper = ZeroDropWrapper

    run_dir = osp.join(workdir, "ref", "run")
    os.makedirs(osp.join(workdir, "ref", "outputs"), exist_ok=True)
    os.makedirs(run_dir, exist_ok=True)
    data_link = osp.join(run_dir, "data")
    if not osp.exists(data_link):
        os.symlink(abs_data_root, data_link)

    train_args = RTrainArgs(**_train_args_common(), resume_from_checkpoint=resume)
    hn_args = RHypnetArgs(**hyp._hn_kwargs())
    hn_args.hn_n_proj_layers = 2
    data_args = RDatasetArgs(
        dataset_names_or_paths=["sydney"],
        fewshot_dataset_names_or_paths=["sydney"],
    )
    lm_args = RLMArgs(lm_name_or_path=lm_dir, lm_dtype="float32")
    menc_args = RMEncArgs(
        menc_names_or_paths=[ENC],
        load_extracted_features=[True],
        fewshot_menc_names_or_paths=[ENC],
        fewshot_load_extracted_features=[True],
        mm_dim=MM_DIM,
        mm_dtype="float32",
    )
    proj_args = RProjectorArgs(proj_name_or_path=proj_ckpt, proj_dropout=0.0)
    fewshot_args = RFewshotArgs(**_fewshot_kwargs())

    with base.chdir(run_dir):
        transformers.set_seed(SEED)
        ref_th.main(
            name, train_args, hn_args, proj_args, data_args, menc_args,
            lm_args, fewshot_args,
        )

    results_path = osp.join(workdir, "ref", "outputs", f"hypernet:{name}-results.json")
    return {
        "train_loss": rec.series("train_loss"),
        "results": json.load(open(results_path)),
    }


def run_ours(workdir, lm_dir, data_root, name, proj_ckpt, resume) -> dict:
    """Run dmi_tpu's fewshot path on the same inputs."""
    os.environ.setdefault("WANDB_MODE", "disabled")
    from dmi_tpu import chat_templates as our_ct
    from dmi_tpu import train_hypernet as our_th
    from dmi_tpu.config import (
        DatasetArgs,
        FewshotArgs,
        HypnetArgs,
        LMArgs,
        MEncArgs,
        ProjectorArgs,
        TrainArgs,
        hypernet_post_init,
    )

    our_ct.LLMS_CHATTEMPLATES[lm_dir] = our_ct.LLAMA32_CHAT_TEMPLATE

    run_dir = osp.join(workdir, "ours", "run")
    out_root = osp.join(workdir, "ours", "outputs")
    os.makedirs(out_root, exist_ok=True)

    c = _train_args_common()
    c.pop("output_dir")
    c.pop("device")
    train_args = TrainArgs(
        output_dir="outputs",
        resume_from_checkpoint=resume,
        output_root=osp.abspath(out_root),
        checkpoint_dir=osp.join(workdir, "ours", "checkpoints"),
        seeds=None,
        **c,
    )
    hn_args = HypnetArgs(**hyp._hn_kwargs(), hn_attn_dropout=0.0)
    data_args = DatasetArgs(
        dataset_names_or_paths=["sydney"],
        fewshot_dataset_names_or_paths=["sydney"],
        data_root=osp.abspath(data_root),
    )
    lm_args = LMArgs(lm_name_or_path=lm_dir, lm_dtype="float32")
    menc_args = MEncArgs(
        menc_names_or_paths=[ENC],
        load_extracted_features=[True],
        fewshot_menc_names_or_paths=[ENC],
        fewshot_load_extracted_features=[True],
        mm_dim=MM_DIM,
        mm_dtype="float32",
    )
    proj_args = ProjectorArgs(proj_name_or_path=proj_ckpt, proj_dropout=0.0)
    fewshot_args = FewshotArgs(**_fewshot_kwargs())
    hypernet_post_init(hn_args, proj_args, train_args, menc_args)

    with base.chdir(run_dir):
        our_th.main(
            name, train_args, hn_args, proj_args, data_args, menc_args,
            lm_args, fewshot_args,
        )
        jsonl = osp.join("logs", f"{name}.metrics.jsonl")
        records = [json.loads(line) for line in open(jsonl)]

    train_loss = [(r["step"], r["train_loss"]) for r in records if "train_loss" in r]
    results_path = osp.join(out_root, f"hypernet:{name}-results.json")
    return {"train_loss": train_loss, "results": json.load(open(results_path))}


def compare(ref: dict, ours: dict) -> dict:
    tl = hyp.compare(
        {"train_loss": ref["train_loss"], "eval_loss": [], "gen_metrics": {}},
        {"train_loss": ours["train_loss"], "eval_loss": [], "gen_metrics": {}},
    )["train_loss"]

    rres, ores = ref["results"], ours["results"]
    enc = ENC_SHORT
    pred_match = [
        a == b for a, b in zip(rres["preds"][enc], ores["preds"][enc])
    ]
    metric_diffs = {
        k: abs(rres["metrics"][enc][k] - ores["metrics"][enc][k])
        for k in rres["metrics"][enc]
        if k in ores["metrics"][enc]
        and isinstance(rres["metrics"][enc][k], (int, float))
    }
    return {
        "train_loss": tl,
        "preds_total": len(pred_match),
        "preds_identical": sum(pred_match),
        "gts_equal": rres["gts"][enc] == ores["gts"][enc],
        "ids_equal": rres["ids"][enc] == ores["ids"][enc],
        "metric_abs_diffs": metric_diffs,
    }


def run_equivalence(workdir: str) -> dict:
    # CPU determinism + keep the TPU relay out of a torch-vs-jax diff
    # (sitecustomize ignores JAX_PLATFORMS; config.update is required)
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.makedirs(workdir, exist_ok=True)
    name = f"refequivfs-dszfull-seed{SEED}"
    lm_dir = base.build_local_lm(workdir)
    data_root = hyp.build_fixture_data_hyp(workdir)
    import transformers

    lm_dim = transformers.AutoConfig.from_pretrained(lm_dir).hidden_size
    proj_ckpt = hyp.build_frozen_projector(workdir, lm_dim)
    ref_resume, our_resume = build_resume_ckpts(workdir, lm_dim, proj_ckpt)
    ref = run_reference(workdir, lm_dir, data_root, name, proj_ckpt, ref_resume)
    ours = run_ours(workdir, lm_dir, data_root, name, proj_ckpt, our_resume)
    verdict = compare(ref, ours)
    with open(osp.join(workdir, "ref_equivalence_fewshot.json"), "w") as f:
        json.dump(verdict, f, indent=2)
    return verdict


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ref_equiv_fs"
    v = run_equivalence(workdir)
    summary = {
        "train_n": v["train_loss"]["n_common"],
        "train_max_abs": v["train_loss"]["max_abs"],
        "train_max_rel": v["train_loss"]["max_rel"],
        "preds": f"{v['preds_identical']}/{v['preds_total']}",
        "gts_equal": v["gts_equal"],
        "ids_equal": v["ids_equal"],
        "metric_abs_diffs": v["metric_abs_diffs"],
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
