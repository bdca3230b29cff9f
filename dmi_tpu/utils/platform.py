"""Backend selection for CLI entry points.

The image's sitecustomize pins jax_platforms="axon,cpu" at interpreter
start whenever the JAX_PLATFORMS env var is unset — and setting that env
var flips JAX to auto-selection rather than honoring it.  The reliable
override is jax.config.update BEFORE the first backend use; DMI_PLATFORM
exposes that to every CLI (e.g. DMI_PLATFORM=cpu for offline smokes,
DMI_PLATFORM=cpu with xla_force_host_platform_device_count for virtual
meshes).
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    # DMI_PLATFORM wins; an explicitly-set JAX_PLATFORMS is honored as the
    # fallback (restoring stock JAX semantics that sitecustomize's
    # config.update silently overrides — measured round 3: a subprocess
    # with JAX_PLATFORMS=cpu still initialized the axon relay backend).
    plat = os.environ.get("DMI_PLATFORM") or os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def pin_to_device(tree):
    """Rematerialize every array leaf of `tree` through a jitted on-device
    identity so the result is chip-resident on the axon relay.

    Motivation (measured, scripts/probe_buffer_residency.py +
    BASELINE.md round-5 "8B W4A8" section): on the relay, buffers whose
    origin is a cpu-backend jax array moved with `jax.device_put` are
    RE-STREAMED from the host on every dispatch that reads them (~40 MB/s
    — a 256 MB buffer costs ~6.9 s PER consuming call vs 26 ms once
    resident; an 8B packed tree decoded 276x slower).  Buffers produced
    by a device program (any jit output) are resident.  Laundering a
    host-origin tree through a jitted elementwise identity therefore
    fixes the pathology at the cost of ONE extra transfer + a transient
    2x-tree HBM footprint (no donation: donated args would alias the
    output to the host-origin buffer and defeat the copy).

    No-op semantics everywhere (bit-identical leaves); harmless on real
    TPU/CPU backends (one fused copy).  Call it after building or
    quantizing a weight tree on the host before entering a serving loop.
    Non-array leaves (ints, floats, None) pass through untouched.
    """
    import jax
    import jax.numpy as jnp

    def _copy(x):
        # Force a real elementwise op so XLA materializes a fresh
        # device-native output buffer (a bare identity jaxpr would let
        # the output alias the host-origin parameter).
        if x.dtype == jnp.bool_:
            return jnp.logical_and(x, True)
        return x + jnp.zeros((), x.dtype)

    # Partition OUTSIDE jit (inside, every leaf is a tracer with a dtype):
    # only ndarray-like leaves ride through the device program.
    leaves, treedef = jax.tree.flatten(tree)
    idx = [i for i, x in enumerate(leaves)
           if hasattr(x, "dtype") and hasattr(x, "shape")]
    if idx:
        pinned = jax.jit(lambda xs: [_copy(x) for x in xs])(
            [leaves[i] for i in idx]
        )
        for i, x in zip(idx, pinned):
            leaves[i] = x
    return jax.tree.unflatten(treedef, leaves)
