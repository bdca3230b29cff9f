"""Multi-host / multi-slice entry (jax.distributed + DCN mesh axis).

The reference is single-device (SURVEY.md §2: no torch.distributed
anywhere); this is the framework's scale-out surface.  Topology model:

  * ICI (intra-slice): fast chip-to-chip fabric — tensor-parallel ('model')
    and the intra-slice portion of data parallelism live here
  * DCN (inter-slice / multi-host): slower datacenter network — ONLY the
    leading data-parallel axis ('replica') crosses it, so every collective
    on the 'model' axis rides ICI and the only DCN traffic is the gradient
    all-reduce (psum over 'replica'+'data'), exactly the
    how-to-scale-your-model recipe for multislice DP

Call init_distributed() once per process before any jax computation; build
the mesh with make_multihost_mesh().  Single-process runs (including this
image, which has one host and one chip) fall through cleanly: no
coordinator is spawned and the mesh degenerates to the local one.

Environment contract (standard jax.distributed variables, or explicit
kwargs): COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID — on Cloud TPU
pods jax.distributed.initialize() autodetects all three.
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh

log = logging.getLogger(__name__)

_INITIALIZED = False


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed for multi-host execution.

    Returns True when a multi-process runtime was initialized, False for
    the single-process fallthrough.  Idempotent.  Explicit args override
    the COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID environment (on
    TPU pods all of it autodetects)."""
    global _INITIALIZED
    if _INITIALIZED:
        return True

    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("NUM_PROCESSES"):
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and os.environ.get("PROCESS_ID"):
        process_id = int(os.environ["PROCESS_ID"])

    # autodetect only applies to genuine multi-worker TPU pods (2+ entries
    # in TPU_WORKER_HOSTNAMES); single-worker relays set the variable too
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    autodetect = coordinator_address is None and len(hostnames.split(",")) > 1
    if coordinator_address is None and not autodetect:
        log.info("single-process run: jax.distributed not initialized")
        return False

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        # backends already initialized (library used interactively) or
        # double-init: keep running single-process rather than crash a job
        log.warning("jax.distributed.initialize skipped: %s", e)
        return False
    _INITIALIZED = True
    log.info(
        "jax.distributed initialized: process %d/%d",
        jax.process_index(),
        jax.process_count(),
    )
    return True


def make_multihost_mesh(
    ici_shape: Optional[Sequence[int]] = None,
    axis_names: Tuple[str, ...] = ("replica", "data", "model"),
    allow_split_physical_axes: bool = False,
) -> Mesh:
    """(replica, data, model) mesh with the 'replica' axis over DCN.

    ici_shape is the per-granule (data, model) layout; the leading
    'replica' axis spans the DCN granules.  A granule is a TPU slice when
    the devices report distinct slice_index values (multi-slice pods),
    otherwise a process (multi-host CPU/GPU runs, where each process's
    devices are the fast-network island) — mesh_utils'
    create_hybrid_device_mesh maps the physical ICI topology contiguously
    onto the trailing axes within each granule.  Single-granule runs
    degenerate to a size-1 replica axis over jax.devices(), so every
    downstream PartitionSpec works unchanged in both worlds."""
    from jax.experimental import mesh_utils

    all_devices = jax.devices()
    slice_ids = {getattr(d, "slice_index", 0) for d in all_devices}
    if len(slice_ids) > 1:
        n_granules, process_is_granule = len(slice_ids), False
    else:
        n_granules, process_is_granule = max(1, jax.process_count()), True

    if ici_shape is None:
        ici_shape = (len(all_devices) // n_granules, 1)
    ici_shape = tuple(ici_shape)

    if n_granules > 1:
        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=ici_shape,
            dcn_mesh_shape=(n_granules,) + (1,) * (len(ici_shape) - 1),
            process_is_granule=process_is_granule,
            allow_split_physical_axes=allow_split_physical_axes,
        )
        # hybrid mesh returns (granules*data, model); reshape to 3 axes
        devices = devices.reshape((n_granules,) + ici_shape)
    else:
        n = int(np.prod(ici_shape))
        devices = np.asarray(all_devices[:n]).reshape((1,) + ici_shape)
    return Mesh(devices, axis_names)


def batch_axes(mesh: Mesh) -> Tuple[str, ...]:
    """The axes a global batch shards over: every data-parallel axis
    present in the mesh ('replica' across DCN + 'data' across ICI)."""
    return tuple(a for a in ("replica", "data") if a in mesh.axis_names)
