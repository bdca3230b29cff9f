"""Device mesh construction."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Tuple[str, ...] = ("data", "model"),
    devices: Optional[Sequence] = None,
    platform: Optional[str] = None,
) -> Mesh:
    """Build a (data, model) mesh.

    shape defaults to (n_devices, 1) — pure data parallelism.  On a v5e-8
    pass (4, 2) or (2, 4) to split tensor-parallel groups along ICI.
    `platform` can pin the device kind (e.g. "cpu" for the virtual
    8-device test mesh even when a TPU plugin is registered).
    """
    if devices is None:
        devices = jax.devices(platform) if platform else jax.devices()
    devices = list(devices)
    if shape is None:
        shape = (len(devices), 1)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {tuple(shape)} needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(shape)
    return Mesh(arr, axis_names[: arr.ndim])
