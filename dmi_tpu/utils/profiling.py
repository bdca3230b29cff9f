"""Profiling / tracing hooks (SURVEY.md §5: auxiliary subsystem upgrade).

The reference has no tracing at all (tqdm bars only).  Here:
  * trace(dir) — context manager around jax.profiler for Perfetto/XProf
    dumps of any training/decode region (enable via TrainArgs.profile_dir)
  * StepTimer — wall-clock per-step timing with warm-up skip and percentile
    summary; forces a host transfer on a probe array so timings are honest
    on asynchronous/remote backends (the axon relay does not block in
    block_until_ready)
  * debug_nans(enable) — NaN checking for debug runs (pure-functional JAX
    replaces the reference's absent sanitizers)
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import numpy as np

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace region; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def await_device(x) -> None:
    """Force completion via host transfer (relay-safe; see module doc)."""
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(jax.tree.map(lambda a: a.ravel()[0], leaf)))


class StepTimer:
    def __init__(self, skip: int = 2):
        self.skip = skip
        self.times: List[float] = []
        self._t0: Optional[float] = None
        self._n = 0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, probe=None):
        if probe is not None:
            await_device(probe)
        dt = time.perf_counter() - self._t0
        self._n += 1
        if self._n > self.skip:
            self.times.append(dt)
        return dt

    def summary(self) -> dict:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
            "steps_per_s": float(1.0 / arr.mean()),
        }


def debug_nans(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)
