"""Stochastic-path statistical parity: stage-2 with rotation + MHSA
dropout ON, the EXECUTED reference vs dmi_tpu, N seeds each (VERDICT r3
#7).

The deterministic legs (ref_equivalence_hypernet.py) necessarily ran with
rotation off and dropout zeroed — torch/scipy and jax random streams
cannot match draw-for-draw.  This harness pins the stochastic components
DISTRIBUTIONALLY instead: the train split holds one item and the subset
content is index-invariant (inherited from the deterministic harness), so
with rotation + dropout ON the per-seed loss trajectory varies ONLY
through (a) the reference's scipy `ortho_group` vs our QR-Haar rotation,
(b) torch vs jax Bernoulli dropout masks at the same p=0.05, and (c) the
per-seed torch init both stacks share (ours resumes from the reference's
dumped init, seed by seed).

Statistic + tolerance (matched moments over seeds):
  * per seed: the trajectory mean train loss (a scalar integrating the
    rotation/dropout marginals over EPOCHS/bs update steps)
  * Welch t between the two N-seed samples.  Under H0 (equal
    distributions) t ~ Student with ~2N-2 dof: |t| < 5 bounds the
    false-alarm rate near 1% at N=4; a wrong rotation distribution
    (e.g. non-Haar scaling) or wrong dropout scale shifts every seed's
    mean and sends |t| far beyond that.  Degenerate near-zero-variance
    cases fall back to a 2% relative-mean band.
  * across-seed std ratio within [1/8, 8] (an F-band wide enough for
    N=4 yet failing on a missing noise source entirely — e.g. dropout
    masks never applied gives ratio -> 0/inf).

Usage: python scripts/ref_equivalence_stochastic.py [workdir] [n_seeds]
Prints one JSON verdict; driven by
tests/test_reference_pipeline_equivalence.py (slow lane).
"""

from __future__ import annotations

import json
import math
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

import numpy as np

import ref_equivalence as base  # noqa: E402
import ref_equivalence_hypernet as hyp  # noqa: E402

SEEDS = (55625, 66848, 92900, 5225)


def trajectory_mean(run: dict) -> float:
    losses = [v for _, v in run["train_loss"]]
    assert losses, run
    return float(np.mean(losses))


def welch_t(a: np.ndarray, b: np.ndarray) -> float:
    va, vb = a.var(ddof=1), b.var(ddof=1)
    denom = math.sqrt(va / len(a) + vb / len(b))
    if denom == 0:
        return 0.0 if a.mean() == b.mean() else float("inf")
    return float((a.mean() - b.mean()) / denom)


def run_stochastic(workdir: str, n_seeds: int = 4) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import os

    os.makedirs(workdir, exist_ok=True)

    # flip the harness into stochastic mode: rotation ON, the reference's
    # hardcoded MHSA dropout p (dmi/model/hypernet.py:47), no per-step
    # eval/generate (they don't touch the stochastic components and
    # dominate runtime)
    hyp.AUGMENT = True
    hyp.ATTN_DROPOUT = 0.05
    hyp.EVAL_STEPS = 10_000  # final-step eval still fires (and must: the
    # reference's save path reads eval_loss, so eval precedes the only save)
    hyp.GEN_STEPS = 10_000
    hyp.SAVE_STEPS = 10_000
    hyp.EPOCHS = 48  # 1-item split / bs 4 -> 12 update steps per run

    lm_dir = base.build_local_lm(workdir)
    data_root = hyp.build_fixture_data_hyp(workdir)
    hyp.degenerate_eval_embeddings(data_root)
    import transformers

    lm_dim = transformers.AutoConfig.from_pretrained(lm_dir).hidden_size
    proj_ckpt = hyp.build_frozen_projector(workdir, lm_dim)

    ref_means, our_means = [], []
    for seed in SEEDS[:n_seeds]:
        hyp.SEED = seed
        name = f"refstoch-dszfull-seed{seed}"
        ref = hyp.run_reference(workdir, lm_dir, data_root, name, proj_ckpt)
        ours = hyp.run_ours(
            workdir, lm_dir, data_root, name, ref["init_dump"], proj_ckpt
        )
        ref_means.append(trajectory_mean(ref))
        our_means.append(trajectory_mean(ours))

    a, b = np.asarray(ref_means), np.asarray(our_means)
    t = welch_t(a, b)
    rel = abs(a.mean() - b.mean()) / max(abs(a.mean()), 1e-9)
    std_ratio = float((a.std(ddof=1) + 1e-12) / (b.std(ddof=1) + 1e-12))
    verdict = {
        "n_seeds": n_seeds,
        "ref_means": [round(x, 6) for x in ref_means],
        "our_means": [round(x, 6) for x in our_means],
        "welch_t": round(t, 3),
        "rel_mean_diff": round(float(rel), 6),
        "std_ratio_ref_over_ours": round(std_ratio, 4),
        "mean_ok": abs(t) < 5.0 or rel < 0.02,
        "var_ok": 1 / 8 <= std_ratio <= 8,
    }
    verdict["ok"] = verdict["mean_ok"] and verdict["var_ok"]
    with open(osp.join(workdir, "ref_equivalence_stochastic.json"), "w") as f:
        json.dump(verdict, f, indent=2)
    return verdict


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ref_equiv_stoch"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    v = run_stochastic(workdir, n)
    print(json.dumps(v))
    sys.exit(0 if v["ok"] else 1)


if __name__ == "__main__":
    main()
