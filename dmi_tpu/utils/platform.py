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
