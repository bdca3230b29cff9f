"""Stage-2 (hypernet) offline equivalence: the EXECUTED reference
`dmi/train_hypernet.py` (mode=train) vs dmi_tpu's HypernetTrainer.

Extends scripts/ref_equivalence.py (stage 1) to the hypernet loop — the
remaining half of VERDICT r2 missing #2 ("Extend to the hypernet loop with
rotation disabled").  Both stacks run the full stage-2 pipeline on
identical data from identical initial weights: conditioning-subset
assembly (interleave + prefix concat), hypernet forward, per-sample LoRA
on the frozen stage-1 projector, frozen-LLM loss, grad-clip + AdamW +
warmup-cosine, eval-loss loop, and the generate path through
hypernet-emitted adapters; per-step train losses, the eval trajectory and
the generate metrics are diffed.

Determinism design (on top of the stage-1 tricks in ref_equivalence.py):
  * the SUBSET loaders draw through the reference's InfiniteSampler, which
    samples from GLOBAL np.random (dmi/utils/sampler.py:18-22) — index
    equality across frameworks is impossible, so subset CONTENT is made
    index-invariant instead: the train split holds ONE item, and every
    validation item shares item 0's mm embedding and one shared text
    embedding (captions stay diverse AND ragged, so eval losses and the
    label-pad/dead-mask quirks are still exercised on real ragged batches)
  * rotation augmentation OFF (augment_emb_space=False): the reference's
    scipy ortho_group draw (dmi/train_hypernet.py:57-58) cannot be
    replicated from a jax QR-Haar stream
  * the attention arch's MHSA weight dropout (hardcoded p=0.05,
    dmi/model/hypernet.py:47) is zeroed on BOTH sides — torch and jax
    dropout masks cannot match (ours via the hn_attn_dropout config knob,
    the reference by setting the built module's p post-construction)
  * the reference's random torch hypernet init (wrapper state_dict, the
    production checkpoint schema of dmi/train_hypernet.py:404-415) is
    dumped at construction and imported into our run through the
    production torch_import path; the frozen stage-1 projector is a
    reference-built Projector checkpoint both stacks load from disk

Usage:
    python scripts/ref_equivalence_hypernet.py [workdir]
prints one JSON verdict line and writes <workdir>/ref_equivalence_hypernet.json.
Also driven by tests/test_reference_pipeline_equivalence.py (slow).
"""

from __future__ import annotations

import json
import os
import os.path as osp
import pickle
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

import ref_equivalence as base  # noqa: E402  (shared builders + stubs)

ENC = base.ENC
ENC_SHORT = base.ENC_SHORT
MM_DIM = base.MM_DIM
SEED = 55625
EPOCHS = 96  # 1-item split x epochs=96 / bs 4 -> 24 update steps
TRAIN_BS = 4
SUBSET_BS = 8  # = hypernet n_tokens; z rows = 2*8+1 (+2 prefix tokens)
EVAL_BS = 5
LR = 1e-3
WARMUP = 4
# knobs the STOCHASTIC harness (ref_equivalence_stochastic.py) flips —
# defaults reproduce this deterministic leg exactly
AUGMENT = False       # rotation augmentation (scipy ortho_group vs QR-Haar)
ATTN_DROPOUT = 0.0    # hypernet MHSA weight dropout (reference hardcodes 0.05)
EVAL_STEPS = 1
GEN_STEPS = 8
SAVE_STEPS = 8


def build_fixture_data_hyp(workdir: str) -> str:
    """Like base.build_fixture_data, but text embeddings share the mm width:
    the reference interleave torch.stacks mm and text rows into one tensor
    (dmi/train_hypernet.py:76-83), so feed_txt_embs requires
    text_dim == mm_dim (true of the real gte-modernbert/768 pairing)."""
    from dmi_tpu.data.fixtures import generate_dataset

    data_root = osp.join(workdir, "data")
    marker = osp.join(data_root, ".ref_equiv_ready")
    if osp.exists(marker):
        return data_root
    generate_dataset(
        data_root, "sydney", ENC_SHORT, mm_dim=MM_DIM, text_dim=MM_DIM,
        n_train=1, n_eval=2, seed=0,
    )
    train_pkl = osp.join(data_root, "sydney", f"train_embs_{ENC_SHORT}.pkl")
    with open(train_pkl, "rb") as f:
        d = pickle.load(f)
    first_key = next(iter(d))
    with open(train_pkl, "wb") as f:
        pickle.dump({first_key: d[first_key]}, f)
    prefix_pkl = osp.join(data_root, "prefixes", "satellite_inst.pkl")
    with open(prefix_pkl, "rb") as f:
        pdict = pickle.load(f)
    k0 = sorted(pdict)[0]
    with open(prefix_pkl, "wb") as f:
        pickle.dump({k0: pdict[k0]}, f)
    open(marker, "w").write("ok\n")
    return data_root


def degenerate_eval_embeddings(data_root: str) -> None:
    """Make every validation item's mm/text embedding identical (item 0's)
    so any subset draw is content-equal; captions/ids stay diverse."""
    marker = osp.join(data_root, ".hyp_equiv_ready")
    if osp.exists(marker):
        return
    ddir = osp.join(data_root, "sydney")
    emb_pkl = osp.join(ddir, f"validation_embs_{ENC_SHORT}.pkl")
    with open(emb_pkl, "rb") as f:
        d = pickle.load(f)
    first = d[next(iter(d))]["emb"]
    for v in d.values():
        v["emb"] = first
    with open(emb_pkl, "wb") as f:
        pickle.dump(d, f)
    txt_pkl = osp.join(ddir, "validation_embs_gte-modernbert-base.pkl")
    with open(txt_pkl, "rb") as f:
        t = pickle.load(f)
    tfirst = t[next(iter(t))]
    for k in t:
        t[k] = tfirst
    with open(txt_pkl, "wb") as f:
        pickle.dump(t, f)
    open(marker, "w").write("ok\n")


def build_frozen_projector(workdir: str, lm_dim: int) -> str:
    """Stand-in stage-1 product: a reference-built torch Projector saved in
    the reference checkpoint schema (both stacks load this file)."""
    path = osp.join(workdir, "frozen_projector.pt")
    if osp.exists(path):
        return path
    base.install_reference_stubs()
    import torch

    from dmi.model.projector import Projector
    from dmi.utils.args import ProjectorArgs as RProjectorArgs

    torch.manual_seed(3)
    p = Projector(
        RProjectorArgs(proj_dropout=0.0), lm_emb_dim=lm_dim, mm_emb_dim=MM_DIM,
        device="cpu",
    )
    torch.save({"step_idx": 0, "projector_state_dict": p.state_dict()}, path)
    return path


def _train_args_common():
    return dict(
        output_dir="outputs",
        device="cpu",
        mode="train",
        train_batch_size=TRAIN_BS,
        subset_batch_size=SUBSET_BS,
        eval_batch_size=EVAL_BS,
        learning_rate=LR,
        weight_decay=0.0,
        epochs=EPOCHS,
        dataset_size="full",
        warmup_steps=WARMUP,
        scheduler="cosine_warmup",
        logging_steps=1,
        save_steps=SAVE_STEPS,
        eval_steps=EVAL_STEPS,
        generate_steps=GEN_STEPS,
        seed=SEED,
        gradient_accumulation_steps=1,
        feed_txt_embs=True,
        augment_emb_space=AUGMENT,  # rotation OFF here (see docstring)
        debug=False,
    )


def _hn_kwargs():
    return dict(
        hn_arch="attention",
        hn_n_heads=2,
        hn_hypnet_dim=MM_DIM,  # reference assumption: hypnet_dim == mm_dim
        hn_rank=4,
        hn_alpha=4,
        hn_predict_bias=True,
        hn_use_pos_encs=True,
    )


def run_reference(workdir, lm_dir, data_root, name, proj_ckpt) -> dict:
    """Execute the actual reference train_hypernet.main() in-process."""
    rec = base.install_reference_stubs()

    import torch
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

    # dump the wrapper's initial weights (production schema: the wrapper
    # state_dict carries hypernet.* + the loaded frozen projector.*) and
    # zero the MHSA dropout (see module docstring)
    init_dump = osp.join(workdir, "ref_init_hypernet.pt")

    class DumpingWrapper(ref_th.HyperNetWrapper):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.hypernet.hypnet.dropout.p = ATTN_DROPOUT
            torch.save(
                {"step_idx": -1, "hypernet_state_dict": self.state_dict()},
                init_dump,
            )

    ref_th.HyperNetWrapper = DumpingWrapper

    run_dir = osp.join(workdir, "ref", "run")
    os.makedirs(osp.join(workdir, "ref", "outputs"), exist_ok=True)
    os.makedirs(run_dir, exist_ok=True)
    data_link = osp.join(run_dir, "data")
    if not osp.exists(data_link):
        os.symlink(abs_data_root, data_link)

    train_args = RTrainArgs(**_train_args_common())
    hn_args = RHypnetArgs(**_hn_kwargs())
    hn_args.hn_n_proj_layers = 2  # args_post_init(dmi/train_hypernet.py:466)
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
    fewshot_args = RFewshotArgs(finetune_generated_projector=True)

    with base.chdir(run_dir):
        transformers.set_seed(SEED)
        ref_th.main(
            name, train_args, hn_args, proj_args, data_args, menc_args,
            lm_args, fewshot_args,
        )

    gen_series = {
        k: rec.series(k)
        for _, d in rec.records
        for k in d
        if " - " in k and "loss" not in k
    }
    return {
        "train_loss": rec.series("train_loss"),
        "eval_loss": rec.series("eval_loss"),
        "gen_metrics": gen_series,
        "init_dump": init_dump,
    }


def run_ours(workdir, lm_dir, data_root, name, init_dump, proj_ckpt) -> dict:
    """Run dmi_tpu's HypernetTrainer on the same inputs."""
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
        resume_from_checkpoint=init_dump,
        output_root=osp.abspath(out_root),
        checkpoint_dir=osp.join(workdir, "ours", "checkpoints"),
        seeds=None,
        **c,
    )
    hn_args = HypnetArgs(**_hn_kwargs(), hn_attn_dropout=ATTN_DROPOUT)
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
    fewshot_args = FewshotArgs(finetune_generated_projector=True)
    hypernet_post_init(hn_args, proj_args, train_args, menc_args)

    with base.chdir(run_dir):
        our_th.main(
            name, train_args, hn_args, proj_args, data_args, menc_args,
            lm_args, fewshot_args,
        )
        jsonl = osp.join("logs", f"{name}.metrics.jsonl")
        records = [json.loads(line) for line in open(jsonl)]

    train_loss = [(r["step"], r["train_loss"]) for r in records if "train_loss" in r]
    eval_loss = [(r["step"], r["eval_loss"]) for r in records if "eval_loss" in r]
    gen_series = {}
    for r in records:
        for k, v in r.items():
            if " - " in k and "loss" not in k and isinstance(v, (int, float)):
                gen_series.setdefault(k, []).append((r["step"], v))
    return {"train_loss": train_loss, "eval_loss": eval_loss, "gen_metrics": gen_series}


def compare(ref: dict, ours: dict) -> dict:
    def diff_series(a, b):
        da, db = dict(a), dict(b)
        steps = sorted(set(da) & set(db))
        rows = [
            {
                "step": s,
                "ref": da[s],
                "ours": db[s],
                "abs": abs(da[s] - db[s]),
                "rel": abs(da[s] - db[s]) / max(abs(da[s]), 1e-9),
            }
            for s in steps
        ]
        return {
            "n_common": len(steps),
            "n_ref": len(da),
            "n_ours": len(db),
            "max_abs": max((r["abs"] for r in rows), default=float("nan")),
            "max_rel": max((r["rel"] for r in rows), default=float("nan")),
            "rows": rows,
        }

    # reference metric keys carry a trailing space (dmi/train.py:178) and
    # are wandb.logged WITHOUT a step — align the two series positionally
    ref_gen = {k.strip(): [v for _, v in s] for k, s in ref["gen_metrics"].items()}
    our_gen = {k.strip(): [v for _, v in s] for k, s in ours["gen_metrics"].items()}
    gen_diffs = {
        k: max(
            (abs(a - b) for a, b in zip(ref_gen[k], our_gen[k])),
            default=float("nan"),
        )
        for k in sorted(set(ref_gen) & set(our_gen))
    }
    return {
        "train_loss": diff_series(ref["train_loss"], ours["train_loss"]),
        "eval_loss": diff_series(ref["eval_loss"], ours["eval_loss"]),
        "gen_metric_max_abs": gen_diffs,
        "gen_metrics_common": len(gen_diffs),
        "gen_metrics_ref_only": sorted(set(ref_gen) - set(our_gen)),
        "gen_metrics_ours_only": sorted(set(our_gen) - set(ref_gen)),
    }


def run_equivalence(workdir: str) -> dict:
    # CPU determinism + keep the TPU relay out of a torch-vs-jax diff
    # (sitecustomize ignores JAX_PLATFORMS; config.update is required)
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.makedirs(workdir, exist_ok=True)
    name = f"refequivhyp-dszfull-seed{SEED}"
    lm_dir = base.build_local_lm(workdir)
    data_root = build_fixture_data_hyp(workdir)
    degenerate_eval_embeddings(data_root)
    import transformers

    lm_dim = transformers.AutoConfig.from_pretrained(lm_dir).hidden_size
    proj_ckpt = build_frozen_projector(workdir, lm_dim)
    ref = run_reference(workdir, lm_dir, data_root, name, proj_ckpt)
    ours = run_ours(workdir, lm_dir, data_root, name, ref["init_dump"], proj_ckpt)
    verdict = compare(ref, ours)
    with open(osp.join(workdir, "ref_equivalence_hypernet.json"), "w") as f:
        json.dump(verdict, f, indent=2)
    return verdict


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ref_equiv_hyp"
    v = run_equivalence(workdir)
    summary = {
        "train_n": v["train_loss"]["n_common"],
        "train_max_abs": v["train_loss"]["max_abs"],
        "train_max_rel": v["train_loss"]["max_rel"],
        "eval_n": v["eval_loss"]["n_common"],
        "eval_max_abs": v["eval_loss"]["max_abs"],
        "gen_metric_max_abs": v["gen_metric_max_abs"],
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
