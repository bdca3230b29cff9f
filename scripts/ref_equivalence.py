"""Offline end-to-end equivalence: the EXECUTED reference pipeline vs dmi_tpu.

Runs the actual reference driver (`/root/reference/dmi/train_projector.py`
main(), imported and executed in-process) and the dmi_tpu ProjectorTrainer
on identical synthetic data with identical initial projector weights, then
diffs per-step train losses, the eval-loss trajectory, and the test
results-JSON artifact (metrics / preds / gts / ids).  This is the
strongest offline proxy for the ±1-CIDEr north star: every layer of both
stacks executes — tokenizer, chat template, collator, loader, embedding
normalization, frozen-LLM loss, AdamW + warmup-cosine, best-checkpoint
selection, greedy decode, metric harness, results writer.

Design notes (what makes cross-implementation determinism possible):
  * the train split holds ONE item, so every with-replacement batch from
    the reference's InfiniteSampler (dmi/utils/sampler.py:18-22, global
    np.random) equals our stateless-sampler batch regardless of RNG —
    batch loss is order-invariant (token-mean)
  * the instruction-prefix pkl holds ONE prefix, so the reference's
    per-batch random.choice (dmi/data/base.py:207) is deterministic
  * eval/test splits are diverse AND ragged (CAPS_PER_IMAGE=5 captions of
    different lengths), iterated sequentially by both sides — the eval
    trajectory therefore exercises the dead-attention-mask + label-pad
    loss quirks on real ragged batches
  * proj_dropout=0, lm_dtype=float32, single dataset/encoder
  * both sides share ONE tiny local HF Llama (built from config, saved to
    disk — no network) and the byte-BPE tokenizer fixture; weights flow
    HF -> torch (reference) and HF -> pytree (ours) through the production
    importers
  * the reference's initial torch projector weights are dumped at build
    time and imported into our run via resume_from_checkpoint (.pt
    transparently readable)
  * calc_metrics on the reference side is shimmed to dmi_tpu's native
    calc_metrics (the reference's needs the external Java cococap +
    HF-evaluate, absent here) so both results JSONs are scored by the
    same metric code — the comparison then isolates train/decode parity

Environment stubs for the reference import (PUBLIC UNTRUSTED CONTENT is
only executed, never copied): timm (module-level import in
dmi/data/coco.py:196), wandb (recording stub; dmi/train.py logs through
it), evaluate + cococap (module-level imports in dmi/utils/eval_utils.py).

Usage:
    python scripts/ref_equivalence.py [workdir]
prints one JSON verdict line and writes <workdir>/ref_equivalence.json.
Also driven by tests/test_reference_pipeline_equivalence.py (slow).
"""

from __future__ import annotations

import importlib.machinery
import json
import os
import os.path as osp
import pickle
import sys
import types
from contextlib import contextmanager

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

REFERENCE_ROOT = "/root/reference"

ENC = "chendelong/RemoteCLIP-ViT-L-14"  # registered satellite encoder
ENC_SHORT = ENC.split("/")[-1]
MM_DIM = 16
SEED = 55625
EPOCHS = 48
TRAIN_BS = 4  # 1-item train split -> every batch is that item x4
EVAL_BS = 5  # 10 eval entries -> 2 full ragged batches
LR = 1e-3
WARMUP = 4


def _stub_module(name, **attrs):
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


class WandbRecorder:
    """Stub capturing the reference's wandb.log stream."""

    def __init__(self):
        self.records = []

    def log(self, data, step=None):
        self.records.append((step, dict(data)))

    def watch(self, *a, **k):
        pass

    def Table(self, data=None, columns=None):
        return {"data": data, "columns": columns}

    def series(self, key):
        return [(s, d[key]) for s, d in self.records if key in d]


def install_reference_stubs() -> WandbRecorder:
    rec = WandbRecorder()
    if "timm" not in sys.modules:
        _stub_module("timm")
    # rebind IN PLACE when the stub already exists: reference modules hold
    # `import wandb` bindings from their first import, so replacing the
    # sys.modules entry would leave them logging into a discarded recorder
    # (bit the multi-run stochastic harness: seed 2+ recorded nothing)
    existing = sys.modules.get("wandb")
    if existing is not None and getattr(existing, "_dmi_stub", False):
        wandb = existing
        wandb.log = rec.log
        wandb.watch = rec.watch
        wandb.Table = rec.Table
    else:
        wandb = _stub_module(
            "wandb",
            log=rec.log,
            watch=rec.watch,
            Table=rec.Table,
            finish=lambda: None,
        )
        wandb.init = lambda **k: wandb
        wandb._dmi_stub = True
    _stub_module("evaluate", load=None)
    _stub_module("cococap")
    _stub_module("cococap.pycocotools")
    _stub_module("cococap.pycocotools.coco", COCO=object)
    _stub_module("cococap.pycocoevalcap")
    _stub_module("cococap.pycocoevalcap.eval", COCOEvalCap=object)
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    return rec


@contextmanager
def chdir(path):
    old = os.getcwd()
    os.makedirs(path, exist_ok=True)
    os.chdir(path)
    try:
        yield
    finally:
        os.chdir(old)


def build_local_lm(workdir: str) -> str:
    """Tiny random HF Llama + the byte-BPE tokenizer fixture, saved as a
    normal local HF model directory both stacks load from disk."""
    import torch
    import transformers

    from dmi_tpu.data.tok_fixture import build_test_tokenizer

    lm_dir = osp.join(workdir, "lm")
    if osp.exists(osp.join(lm_dir, "config.json")):
        return lm_dir
    tok = build_test_tokenizer()
    tok.save_pretrained(lm_dir)
    cfg = transformers.LlamaConfig(
        vocab_size=max(len(tok), tok.vocab_size),
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=512,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=True,
        bos_token_id=tok.bos_token_id,
        eos_token_id=tok.eos_token_id,
        pad_token_id=tok.pad_token_id,
    )
    torch.manual_seed(7)
    model = transformers.LlamaForCausalLM(cfg)
    model = model.to(torch.float32)
    model.save_pretrained(lm_dir)
    return lm_dir


def build_fixture_data(workdir: str) -> str:
    """Reference-schema sydney fixtures: 1-item train split, diverse ragged
    eval/test splits, single-prefix pkl."""
    from dmi_tpu.data.fixtures import generate_dataset

    data_root = osp.join(workdir, "data")
    marker = osp.join(data_root, ".ref_equiv_ready")
    if osp.exists(marker):
        return data_root
    # loaders read {split}_embs_{model_name}.pkl with model_name = the last
    # path component of the encoder name (dmi/train_projector.py:246)
    generate_dataset(
        data_root, "sydney", ENC_SHORT, mm_dim=MM_DIM, n_train=1, n_eval=2, seed=0
    )
    # shrink train to ONE entry (generate_dataset writes caps_per_image=5
    # captions per item) — the whole-batch-equals-the-set trick above
    train_pkl = osp.join(data_root, "sydney", f"train_embs_{ENC_SHORT}.pkl")
    with open(train_pkl, "rb") as f:
        d = pickle.load(f)
    first_key = next(iter(d))
    with open(train_pkl, "wb") as f:
        pickle.dump({first_key: d[first_key]}, f)
    # single instruction prefix -> reference random.choice is deterministic
    prefix_pkl = osp.join(data_root, "prefixes", "satellite_inst.pkl")
    with open(prefix_pkl, "rb") as f:
        pdict = pickle.load(f)
    k0 = sorted(pdict)[0]
    with open(prefix_pkl, "wb") as f:
        pickle.dump({k0: pdict[k0]}, f)
    open(marker, "w").write("ok\n")
    return data_root


def _train_args_common():
    return dict(
        output_dir="outputs",
        device="cpu",
        train_batch_size=TRAIN_BS,
        eval_batch_size=EVAL_BS,
        learning_rate=LR,
        weight_decay=0.0,
        epochs=EPOCHS,
        dataset_size="full",
        warmup_steps=WARMUP,
        scheduler="cosine_warmup",
        logging_steps=1,
        save_steps=6,
        eval_steps=1,
        generate_steps=6,
        eval_at_step_zero=True,
        seed=SEED,
        gradient_accumulation_steps=1,
        debug=False,
    )


def run_reference(workdir: str, lm_dir: str, data_root: str, name: str) -> dict:
    """Execute the actual reference driver main() in-process."""
    rec = install_reference_stubs()

    import transformers

    import dmi.model as ref_model_pkg
    import dmi.model.projector as ref_projector_mod
    import dmi.train_projector as ref_tp
    from dmi.utils.args import (
        DatasetArgs as RDatasetArgs,
        LMArgs as RLMArgs,
        MEncArgs as RMEncArgs,
        ProjectorArgs as RProjectorArgs,
        TrainArgs as RTrainArgs,
    )

    from dmi_tpu.evals.metrics import calc_metrics as our_calc_metrics

    # local LM gets the reference's own Llama-3.2 chat template (is_instruct
    # keys off this dict, dmi/train_projector.py:188)
    ref_model_pkg.LLMS_CHATTEMPLATES[lm_dir] = ref_model_pkg.LLMS_CHATTEMPLATES[
        "meta-llama/Llama-3.2-1B-Instruct"
    ]
    ref_tp.LLMS_CHATTEMPLATES = ref_model_pkg.LLMS_CHATTEMPLATES

    # metric shim: same scorer for both stacks (see module docstring)
    abs_data_root = osp.abspath(data_root)
    ref_tp.calc_metrics = lambda preds, ids, ds, exp_id, mode: our_calc_metrics(
        preds, ids, ds, exp_id, mode, data_root=abs_data_root
    )

    # dump the torch projector's initial weights for our run to import
    init_dump = osp.join(workdir, "ref_init_projector.pt")

    import torch

    class DumpingProjector(ref_projector_mod.Projector):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            torch.save(
                {"step_idx": -1, "projector_state_dict": self.state_dict()},
                init_dump,
            )

    ref_tp.Projector = DumpingProjector

    run_dir = osp.join(workdir, "ref", "run")
    os.makedirs(osp.join(workdir, "ref", "outputs"), exist_ok=True)
    os.makedirs(run_dir, exist_ok=True)
    data_link = osp.join(run_dir, "data")
    if not osp.exists(data_link):
        os.symlink(abs_data_root, data_link)

    c = _train_args_common()
    train_args = RTrainArgs(**c)
    data_args = RDatasetArgs(dataset_names_or_paths=["sydney"])
    lm_args = RLMArgs(lm_name_or_path=lm_dir, lm_dtype="float32")
    menc_args = RMEncArgs(
        menc_names_or_paths=[ENC],
        load_extracted_features=[True],
        mm_dim=MM_DIM,
        mm_dtype="float32",
    )
    proj_args = RProjectorArgs(proj_dropout=0.0)

    with chdir(run_dir):
        transformers.set_seed(SEED)
        ref_tp.main(name, data_args, lm_args, menc_args, proj_args, train_args)

    results_path = osp.join(workdir, "ref", "outputs", f"projector:{name}-results.json")
    with open(results_path) as f:
        results = json.load(f)
    return {
        "train_loss": rec.series("train_loss"),
        "eval_loss": rec.series("eval_loss"),
        "results": results,
        "init_dump": init_dump,
    }


def run_ours(workdir: str, lm_dir: str, data_root: str, name: str, init_dump: str) -> dict:
    """Run dmi_tpu's ProjectorTrainer on the same inputs."""
    os.environ.setdefault("WANDB_MODE", "disabled")
    from dmi_tpu import chat_templates as our_ct
    from dmi_tpu import train_projector as our_tp
    from dmi_tpu.config import (
        DatasetArgs,
        LMArgs,
        MEncArgs,
        ProjectorArgs,
        TrainArgs,
    )

    our_ct.LLMS_CHATTEMPLATES[lm_dir] = our_ct.LLAMA32_CHAT_TEMPLATE

    run_dir = osp.join(workdir, "ours", "run")
    out_root = osp.join(workdir, "ours", "outputs")
    os.makedirs(out_root, exist_ok=True)

    c = _train_args_common()
    c.pop("output_dir")
    train_args = TrainArgs(
        output_dir="outputs",
        resume_from_checkpoint=init_dump,
        output_root=osp.abspath(out_root),
        checkpoint_dir=osp.join(workdir, "ours", "checkpoints"),
        seeds=None,
        **c,
    )
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
    proj_args = ProjectorArgs(proj_dropout=0.0)

    with chdir(run_dir):
        our_tp.main(name, data_args, lm_args, menc_args, proj_args, train_args)
        jsonl = osp.join("logs", f"{name}.metrics.jsonl")
        records = [json.loads(line) for line in open(jsonl)]

    train_loss = [(r["step"], r["train_loss"]) for r in records if "train_loss" in r]
    eval_loss = [(r["step"], r["eval_loss"]) for r in records if "eval_loss" in r]
    with open(osp.join(out_root, f"projector:{name}-results.json")) as f:
        results = json.load(f)
    return {"train_loss": train_loss, "eval_loss": eval_loss, "results": results}


def compare(ref: dict, ours: dict) -> dict:
    """Diff the two runs; returns the verdict dict."""

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

    train = diff_series(ref["train_loss"], ours["train_loss"])
    evald = diff_series(ref["eval_loss"], ours["eval_loss"])

    rres, ores = ref["results"], ours["results"]
    enc = ENC_SHORT
    pred_match = [
        int(p == q) for p, q in zip(rres["preds"][enc], ores["preds"][enc])
    ]
    gts_equal = rres["gts"][enc] == ores["gts"][enc]
    ids_equal = list(map(str, rres["ids"][enc])) == list(map(str, ores["ids"][enc]))
    metric_diffs = {
        k: abs(rres["metrics"][enc][k] - ores["metrics"][enc][k])
        for k in rres["metrics"][enc]
        if k in ores["metrics"][enc]
        and isinstance(rres["metrics"][enc][k], (int, float))
    }
    return {
        "train_loss": train,
        "eval_loss": evald,
        "preds_total": len(pred_match),
        "preds_identical": sum(pred_match),
        "gts_equal": gts_equal,
        "ids_equal": ids_equal,
        "metric_abs_diffs": metric_diffs,
    }


def run_equivalence(workdir: str) -> dict:
    # CPU determinism + keep the TPU relay out of a torch-vs-jax diff.
    # The env var is NOT enough: sitecustomize's axon register() calls
    # jax.config.update("jax_platforms", ...), and config beats env —
    # without this line the "ours" leg runs over the TPU relay (measured:
    # a wedged relay stalls this script in nanosleep for 25+ minutes).
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.makedirs(workdir, exist_ok=True)
    name = f"refequiv-dszfull-seed{SEED}"
    lm_dir = build_local_lm(workdir)
    data_root = build_fixture_data(workdir)
    ref = run_reference(workdir, lm_dir, data_root, name)
    ours = run_ours(workdir, lm_dir, data_root, name, ref["init_dump"])
    verdict = compare(ref, ours)
    with open(osp.join(workdir, "ref_equivalence.json"), "w") as f:
        json.dump(verdict, f, indent=2)
    return verdict


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ref_equiv"
    v = run_equivalence(workdir)
    summary = {
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
