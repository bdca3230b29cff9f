"""Trainer base: step-schedule conditions, loader mixing, logging, results.

Functional equivalent of the reference BaseTrainer (dmi/train.py:16-255)
redesigned around jitted train steps:
  * eval/generate/save conditions support both periodic intervals and
    explicit step lists (dmi/train.py:128-167)
  * per-step loader choice is a stateless function of (seed, step) —
    weighted-by-length for projector/LoRA training (dmi/train.py:76,
    dmi/train_projector.py:57), uniform for hypernet
    (dmi/train_hypernet.py:125) — so resume never replays iterators
  * results artifacts via dmi_tpu.training.results
"""

from __future__ import annotations

import logging
from typing import List, Optional, Sequence

import numpy as np

from dmi_tpu.config import TrainArgs

log = logging.getLogger("dmi_tpu")


def _in_step_list(step_idx: int, steps: Sequence[int]) -> bool:
    return any(step_idx + 1 == s for s in steps)


class StepConditions:
    """The reference's (wandb_step_idx, total_steps) boolean schedule."""

    def __init__(self, train_args: TrainArgs):
        self.a = train_args

    def grad_acc(self, step_idx: int, total_steps: int) -> bool:
        return (step_idx == total_steps - 1) or (
            (step_idx + 1) % self.a.gradient_accumulation_steps == 0
        )

    def _periodic_or_list(self, step_idx, total_steps, period, step_list, at_zero,
                          include_final=True):
        if step_list is None:
            periodic = (step_idx + 1) % period == 0 and (step_idx > 0 or at_zero)
            final = include_final and step_idx == total_steps - 1
            return final or periodic
        return _in_step_list(step_idx, step_list) or (step_idx == total_steps - 1)

    def evaluate(self, step_idx: int, total_steps: int) -> bool:
        return self._periodic_or_list(
            step_idx, total_steps, self.a.eval_steps, self.a.eval_steps_l,
            self.a.eval_at_step_zero,
        )

    def generate(self, step_idx: int, total_steps: int, include_final: bool = True) -> bool:
        # hypernet training drops the final-step generate
        # (dmi/train_hypernet.py:298-307)
        return self._periodic_or_list(
            step_idx, total_steps, self.a.generate_steps, self.a.generate_steps_l,
            self.a.generate_at_step_zero, include_final=include_final,
        )

    def save(self, step_idx: int, total_steps: int) -> bool:
        if self.a.save_steps_l is None:
            return (step_idx == total_steps - 1) or (
                (step_idx + 1) % self.a.save_steps == 0 and step_idx > 0
            )
        return _in_step_list(step_idx, self.a.save_steps_l) or (
            step_idx == total_steps - 1
        )


def pick_loader(
    seed: int, step: int, n_loaders: int, weights: Optional[List[float]] = None
) -> int:
    """Stateless per-step loader choice."""
    rng = np.random.default_rng((seed, 2, step))
    if weights is None:
        return int(rng.integers(n_loaders))
    return int(rng.choice(n_loaders, p=np.asarray(weights) / np.sum(weights)))


def strip_to_assistant(texts: List[str]) -> List[str]:
    """GT extraction from decoded eval rows (dmi/train.py:189-195)."""
    return [t.split("assistant\n\n\n")[-1].strip() for t in texts]
