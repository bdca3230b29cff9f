"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the recommended pjit test setup (SURVEY.md §4): an 8-way host
platform lets multi-chip sharding tests compile and execute without TPUs.

Note: this image's sitecustomize registers the 'axon' TPU plugin and calls
jax.config.update("jax_platforms", "axon,cpu") at interpreter start, which
overrides the JAX_PLATFORMS env var — so we must override via jax.config
too, before any backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: the decode/train-step compiles dominate the
# suite runtime on this 1-core host; repeat runs hit the cache
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache_dmi")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_backend():
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert jax.device_count() == 8
