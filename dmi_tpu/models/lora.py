"""LoRA-baseline adapters (reference: dmi/model/lora.py).

One (A, B) pair per projector linear layer; A ~ N(0,1)/sqrt(rank),
B = 0, delta = (alpha/rank)·x@A@B (dmi/model/lora.py:6-17).  The wrapper
semantics (frozen pretrained projector + trainable adapters, forward =
projector.only_lora_forward) live in dmi_tpu.models.projector.module_lora_apply.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import jax
import jax.numpy as jnp

from dmi_tpu.models.projector import ProjectorSpec


@dataclass(frozen=True)
class LoraSpec:
    rank: int = 32
    alpha: int = 32
    n_proj_layers: int = 2


def init(key: jax.Array, lora_spec: LoraSpec, proj_spec: ProjectorSpec, dtype=jnp.float32) -> List[dict]:
    """Per-layer adapters; layer 0 has in_dim = mm_dim
    (reference: dmi/model/lora.py:29-35)."""
    adapters = []
    std = 1.0 / jnp.sqrt(jnp.asarray(lora_spec.rank, jnp.float32))
    for layer_idx, (in_dim, out_dim) in enumerate(proj_spec.layer_dims()):
        key, ak = jax.random.split(key)
        a = jax.random.normal(ak, (in_dim, lora_spec.rank), dtype) * std
        b = jnp.zeros((lora_spec.rank, out_dim), dtype)
        adapters.append({"a": a, "b": b})
    return adapters
