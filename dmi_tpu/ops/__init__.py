"""Compute ops: pure-XLA reference implementations plus Pallas TPU kernels.

Every Pallas kernel in dmi_tpu.ops.pallas has a pure-XLA twin here that
serves as its correctness oracle (SURVEY.md §7 design stance).
"""

from dmi_tpu.ops.linalg import (
    interleave_rows,
    l2_normalize,
    pad_features,
    random_orthogonal,
    sinusoidal_positions,
)

__all__ = [
    "interleave_rows",
    "l2_normalize",
    "pad_features",
    "random_orthogonal",
    "sinusoidal_positions",
]
