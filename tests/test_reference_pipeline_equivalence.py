"""End-to-end equivalence vs the EXECUTED reference pipeline (VERDICT r2 #2).

Drives scripts/ref_equivalence.py: the actual reference driver
(`/root/reference/dmi/train_projector.py` main(), imported and run
in-process with wandb/evaluate/cococap stubs) and dmi_tpu's
ProjectorTrainer run on identical synthetic data from identical initial
projector weights; per-step train losses, the eval-loss trajectory, and
the test results-JSON artifact are diffed.

Slow (two full 48-step CPU training runs + greedy decode + metrics);
runs in a subprocess so the reference import stubs never leak into this
test session.
"""

import json
import os.path as osp
import subprocess
import sys

import pytest

from tests.conftest import REFERENCE_ROOT, requires_reference

pytestmark = [pytest.mark.slow, requires_reference]

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def test_reference_pipeline_equivalence(tmp_path):
    proc = subprocess.run(
        [sys.executable, osp.join(REPO, "scripts", "ref_equivalence.py"), str(tmp_path)],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    # f32 cross-implementation numerics (torch/oneDNN vs jax/XLA CPU):
    # measured 2.3e-7 max rel over 48 steps; 1e-3 is the regression wall.
    assert summary["train_max_rel"] < 1e-3, summary
    assert summary["eval_max_abs"] < 1e-2, summary
    ident, total = map(int, summary["preds"].split("/"))
    assert total >= 10 and ident == total, summary
    assert summary["gts_equal"] and summary["ids_equal"], summary
    assert all(v == 0.0 for v in summary["metric_abs_diffs"].values()), summary


def test_reference_hypernet_pipeline_equivalence(tmp_path):
    """Stage-2 leg (scripts/ref_equivalence_hypernet.py): the executed
    reference train_hypernet.py mode=train vs our HypernetTrainer —
    subset interleave + prefix concat, hypernet forward, per-sample LoRA
    on the frozen projector, grad-clip/AdamW/cosine, eval loop, generate
    through hypernet-emitted adapters.  Rotation off, MHSA dropout zeroed
    on both sides (see the script docstring for the determinism design)."""
    proc = subprocess.run(
        [
            sys.executable,
            osp.join(REPO, "scripts", "ref_equivalence_hypernet.py"),
            str(tmp_path),
        ],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    # measured 1.5e-7 max rel over 23 steps / 1.7e-6 eval max abs
    assert summary["train_n"] >= 20, summary
    assert summary["train_max_rel"] < 1e-3, summary
    assert summary["eval_max_abs"] < 1e-2, summary
    gen = summary["gen_metric_max_abs"]
    assert len(gen) >= 8, summary
    assert all(v == 0.0 for v in gen.values()), summary


def test_reference_fewshot_pipeline_equivalence(tmp_path):
    """Stage-3 leg (scripts/ref_equivalence_fewshot.py): the executed
    reference train_hypernet.py mode=fewshot vs our fewshot_generate —
    adapter emission + averaging + combine_lora baking, fresh-AdamW
    finetune of the generated projector, best-by-CIDEr selection, test
    generate, results JSON.  Both sides resume one reference-built
    hypernet checkpoint (see the script docstring)."""
    proc = subprocess.run(
        [
            sys.executable,
            osp.join(REPO, "scripts", "ref_equivalence_fewshot.py"),
            str(tmp_path),
        ],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    # measured 1.5e-7 max rel over 23 update steps
    assert summary["train_n"] >= 20, summary
    assert summary["train_max_rel"] < 1e-3, summary
    ident, total = map(int, summary["preds"].split("/"))
    assert total >= 10 and ident == total, summary
    assert summary["gts_equal"] and summary["ids_equal"], summary
    diffs = summary["metric_abs_diffs"]
    assert len(diffs) >= 8, summary
    assert all(v == 0.0 for v in diffs.values()), summary


def test_reference_lora_pipeline_equivalence(tmp_path):
    """LoRA-baseline leg (scripts/ref_equivalence_lora.py): the executed
    reference train_lora.py vs our LoraTrainer — module-LoRA forward over
    the shared frozen projector, AdamW + warmup-cosine, best-by-CIDEr,
    test generate, results JSON, from the reference's dumped adapter
    init."""
    proc = subprocess.run(
        [
            sys.executable,
            osp.join(REPO, "scripts", "ref_equivalence_lora.py"),
            str(tmp_path),
        ],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    # measured 1.5e-7 max rel / 1.2e-6 eval max abs
    assert summary["train_n"] >= 10, summary
    assert summary["train_max_rel"] < 1e-3, summary
    assert summary["eval_max_abs"] < 1e-2, summary
    ident, total = map(int, summary["preds"].split("/"))
    assert total >= 10 and ident == total, summary
    assert summary["gts_equal"] and summary["ids_equal"], summary
    diffs = summary["metric_abs_diffs"]
    assert len(diffs) >= 8, summary
    assert all(v == 0.0 for v in diffs.values()), summary


def test_reference_stochastic_statistical_parity(tmp_path):
    """Stage-2 with rotation + MHSA dropout ON (the paths the
    deterministic legs must disable): N-seed matched-moment comparison of
    loss trajectories, our QR-Haar/jax-dropout stream vs the executed
    reference's scipy-ortho_group/torch-dropout stream.  Tolerances
    justified in scripts/ref_equivalence_stochastic.py (Welch |t| < 5 or
    2% band; std ratio in [1/8, 8]).  Measured: t=-0.15, rel 3e-5,
    std ratio 0.59 at 4 seeds."""
    proc = subprocess.run(
        [
            sys.executable,
            osp.join(REPO, "scripts", "ref_equivalence_stochastic.py"),
            str(tmp_path),
            "3",  # 3 seeds keep the slow lane under ~4 min; 4 run manually
        ],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["ok"], summary
    assert summary["n_seeds"] == 3, summary
