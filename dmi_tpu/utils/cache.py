"""Persistent XLA compilation cache for the CLIs.

Sweeps (sizes x seeds) re-enter main() per run and would recompile
identical programs; the persistent cache turns those into disk hits.
Directory override: DMI_COMPILE_CACHE (set to '0' to disable).
"""

from __future__ import annotations

import os


def enable_compilation_cache() -> None:
    target = os.environ.get("DMI_COMPILE_CACHE", os.path.expanduser("~/.cache/dmi_jax"))
    if target == "0":
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", target)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
