"""On-device gradient summaries (the wandb.watch(log='gradients') analogue).

The reference attaches wandb.watch(model, log="gradients", log_freq=10)
(/root/reference/dmi/train.py:70), which records per-parameter gradient
histograms.  Here the summary is computed INSIDE the jitted update step
from the fully-accumulated gradient the optimizer consumes (zero extra
passes; the trainable modules are the small projector/hypernet/LoRA, so
the reductions are noise next to the frozen-LLM backward), and logged to
the JSONL/wandb stream at the trainer's logging cadence:

  * global l2 norm
  * per-parameter l2 norms (path-named leaves)
  * a log10-|g| histogram over fixed decade buckets (the dynamic range the
    dashboards actually read off wandb histograms)
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

# decade edges 1e-12 .. 1e2 (+ underflow/overflow buckets)
HIST_EDGES = [10.0**e for e in range(-12, 3)]


def _path_name(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return ".".join(parts)


def grad_summary(grads, prefix: str = "grad") -> Dict[str, jax.Array]:
    """Jit-friendly: returns a flat dict of device scalars plus one
    histogram-count vector under '<prefix>_hist' (len(HIST_EDGES)+1)."""
    leaves_with_path = jax.tree_util.tree_flatten_with_path(grads)[0]
    out: Dict[str, jax.Array] = {}
    total_sq = jnp.zeros((), jnp.float32)
    all_abs = []
    for path, leaf in leaves_with_path:
        lf = leaf.astype(jnp.float32)
        sq = jnp.sum(lf * lf)
        total_sq = total_sq + sq
        out[f"{prefix}_norm/{_path_name(path)}"] = jnp.sqrt(sq)
        all_abs.append(jnp.abs(lf).ravel())
    out[f"{prefix}_global_norm"] = jnp.sqrt(total_sq)
    flat = jnp.concatenate(all_abs) if all_abs else jnp.zeros((1,), jnp.float32)
    edges = jnp.asarray(HIST_EDGES, jnp.float32)
    idx = jnp.searchsorted(edges, flat)  # 0 = underflow, len(edges) = overflow
    out[f"{prefix}_hist"] = jnp.bincount(idx, length=len(HIST_EDGES) + 1)
    return out


def host_grad_summary(dev_stats: Dict[str, jax.Array]) -> Dict:
    """One host transfer of the device dict, histogram as a plain list."""
    import numpy as np

    host = {k: np.asarray(v) for k, v in dev_stats.items()}
    return {
        k: (v.tolist() if v.ndim else float(v)) for k, v in host.items()
    }
