"""Parallelism layer: device meshes and sharding rules.

The reference is strictly single-device (SURVEY.md §2: no DP/TP/PP, no
collectives anywhere) — this layer is the upgrade surface the TPU rebuild
adds: jax.sharding.Mesh over ICI with data-parallel batches and
tensor-parallel LLM weights; XLA inserts the psum/all-gather collectives.
"""

from dmi_tpu.parallel.distributed import (
    batch_axes,
    init_distributed,
    make_multihost_mesh,
)
from dmi_tpu.parallel.mesh import make_mesh
from dmi_tpu.parallel.sharding import (
    batch_sharding,
    replicate,
    shard_batch,
    shard_llm_params,
    shard_params,
)

__all__ = [
    "make_mesh",
    "init_distributed",
    "make_multihost_mesh",
    "batch_axes",
    "batch_sharding",
    "replicate",
    "shard_batch",
    "shard_llm_params",
    "shard_params",
]
