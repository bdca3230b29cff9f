"""Multi-host entry: single-process fallthrough + (replica, data, model)
mesh semantics on the virtual 8-device CPU platform."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from dmi_tpu.parallel import batch_axes, init_distributed, make_multihost_mesh


def test_init_distributed_single_process_noop(monkeypatch):
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    assert init_distributed() is False  # no coordinator -> clean fallthrough


def test_multihost_mesh_degenerates_single_process():
    mesh = make_multihost_mesh(ici_shape=(4, 2))
    assert mesh.axis_names == ("replica", "data", "model")
    assert mesh.devices.shape == (1, 4, 2)
    assert batch_axes(mesh) == ("replica", "data")


def test_training_step_on_replica_data_model_mesh():
    """The 3-axis mesh must run a sharded step with batch over
    ('replica','data') and unsharded ('model'-replicated) params — the
    PartitionSpecs downstream code uses work unchanged."""
    mesh = make_multihost_mesh(ici_shape=(4, 2))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(16, 16)).astype(np.float32))

    xs = jax.device_put(x, NamedSharding(mesh, P(("replica", "data"), None)))
    ws = jax.device_put(w, NamedSharding(mesh, P(None, "model")))

    @jax.jit
    def step(x, w):
        return jnp.mean((x @ w) ** 2)

    out = float(step(xs, ws))
    ref = float(step(x, w))
    np.testing.assert_allclose(out, ref, rtol=1e-6)
