"""Pytree checkpointing with best-metric retention.

Reference semantics (dmi/train.py:215-254): a single rolling "best"
checkpoint per (model name, save type), replaced only when the tracked
metric improves (higher-better for projector/fewshot CIDEr, lower-better
for hypernet eval loss); step checkpoints are cleaned up.  Contents:
{step_idx, <type>_state_dict, optimizer_state_dict, <metric_name>}.

Arrays are stored as numpy inside a pickle — framework-neutral and exactly
restorable into jax pytrees.
"""

from __future__ import annotations

import os
import os.path as osp
import pickle
from glob import glob
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)


def save_pytree(path: str, obj: Dict[str, Any]) -> None:
    os.makedirs(osp.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(_to_numpy(obj), f)


def load_pytree(path: str) -> Dict[str, Any]:
    """Load a dmi_tpu checkpoint — or, transparently, a reference torch
    ``.pt`` checkpoint (zip-serialized torch.save output), converted into
    the same envelope via dmi_tpu.models.torch_import.  The envelope's
    optimizer_state_dict stays None for imported files (it is reserved for
    raw optax state); torch AdamW moments are instead converted on demand
    by the resume paths via torch_import.optax_moments_from_checkpoint +
    optim.set_adamw_moments (exactness pinned against executed torch in
    tests/test_optimizer_interop.py)."""
    import zipfile

    if zipfile.is_zipfile(path):
        return _load_torch_envelope(path)
    with open(path, "rb") as f:
        try:
            return pickle.load(f)
        except Exception:
            # legacy (pre-zip) torch serialization also lands here
            return _load_torch_envelope(path)


def _load_torch_envelope(path: str) -> Dict[str, Any]:
    from dmi_tpu.models import torch_import as ti

    out = ti.load_torch_checkpoint(path)
    env: Dict[str, Any] = {
        "step_idx": out.get("step_idx", 0),
        "optimizer_state_dict": None,
    }
    if "metric" in out:
        env["metric"] = out["metric"]
    if "projector" in out:
        env["projector_state_dict"] = out["projector"]
    if "hypernet" in out:
        env["hypernet_state_dict"] = out["hypernet"]
    if "lora_adapters" in out:
        env["lora_model_state_dict"] = out["lora_adapters"]
    return env


def save_pytree_orbax(path: str, obj: Dict[str, Any]) -> None:
    """Orbax backend: sharded/async-capable checkpointing for params too
    large to funnel through a single-host pickle (multi-chip runs).  The
    pickle backend stays the default at the reference's model scale."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(osp.abspath(path), obj, force=True)
    ckptr.wait_until_finished()


def load_pytree_orbax(path: str, like: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Restore an orbax checkpoint.  When `like` carries sharded
    jax.Arrays (or the abstract targets from sharded_like), each process
    reads ONLY its own shards and the restored arrays land directly in
    those shardings — no host gather anywhere (the multi-host path the
    pickle backend cannot express)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(osp.abspath(path), target=like)
    return ckptr.restore(osp.abspath(path))


def sharded_like(tree):
    """Abstract restore target carrying shapes/dtypes/shardings of `tree`
    without keeping its buffers alive — pass as load_pytree_orbax(like=)
    so restore never holds two copies of large sharded state."""
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        if hasattr(x, "sharding")
        else x,
        tree,
    )


class BestCheckpointer:
    def __init__(self, ckpt_dir: str, model_name: str, save_type: str, mode: str = "max"):
        assert mode in ("max", "min")
        self.ckpt_dir = ckpt_dir
        self.model_name = model_name
        self.save_type = save_type
        self.mode = mode

    @property
    def best_path(self) -> str:
        return osp.join(
            self.ckpt_dir, f"{self.model_name}-checkpoint-{self.save_type}-best.pt"
        )

    def clear_step_checkpoints(self) -> None:
        for f in glob(
            osp.join(self.ckpt_dir, f"{self.model_name}-checkpoint-{self.save_type}-step*.pt")
        ):
            os.remove(f)

    def save(
        self,
        step_idx: int,
        metric: float,
        metric_name: str,
        state_dict,
        optimizer_state=None,
    ) -> bool:
        """Save if metric improves; returns True when the best was replaced."""
        old = None
        if osp.exists(self.best_path):
            # the comparison metric can legitimately change between saves
            # (coco_cider seeded before the first generate, bleu after on
            # datasets without a CIDEr source) — an old checkpoint missing
            # the new metric name is simply replaced
            old = load_pytree(self.best_path).get(metric_name)
        self.clear_step_checkpoints()
        improved = (
            old is None
            or (self.mode == "max" and metric > old)
            or (self.mode == "min" and metric < old)
        )
        if improved:
            save_pytree(
                self.best_path,
                {
                    "step_idx": step_idx,
                    f"{self.save_type}_state_dict": state_dict,
                    "optimizer_state_dict": optimizer_state,
                    metric_name: metric,
                },
            )
        return improved

    def load_best(self) -> Optional[Dict[str, Any]]:
        if not osp.exists(self.best_path):
            return None
        return load_pytree(self.best_path)
