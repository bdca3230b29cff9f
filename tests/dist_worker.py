"""Multi-process jax.distributed worker (spawned by test_distributed).

Each process owns 4 virtual CPU devices; N processes rendezvous at a
localhost coordinator, build the (replica, data, model) hybrid mesh and
run ONE real stage-1 projector train step on a global batch sharded over
('replica', 'data').  Rank 0 prints the loss and a post-update parameter
checksum; the test compares them against the same step computed
single-process (the multi-host data-parallel contract: process count is
invisible to the math).

Usage: dist_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

# sitecustomize ignores JAX_PLATFORMS; config.update is the supported way
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def global_batch(B=8, T=12, mm_dim=32, vocab=256):
    rng = np.random.default_rng(0)
    return {
        "embs": rng.normal(size=(B, mm_dim)).astype(np.float32),
        "input_ids": rng.integers(6, vocab, size=(B, T), dtype=np.int64)
        .astype(np.int32),
        "attention_mask": np.ones((B, T), np.int32),
        "labels": rng.integers(6, vocab, size=(B, T), dtype=np.int64)
        .astype(np.int32),
    }


def run_step(mesh):
    """One jitted stage-1 step (projector loss through the frozen tiny LLM,
    adamw update) with the batch sharded over every data axis of `mesh`.
    Returns (loss, updated-projector checksum) as floats."""
    import optax

    from dmi_tpu.models import llama, mmmodel
    from dmi_tpu.models import projector as proj
    from dmi_tpu.parallel import batch_axes

    cfg = llama.tiny_config()
    llm = llama.init(jax.random.key(0), cfg)
    pspec = proj.ProjectorSpec(mm_dim=32, lm_dim=cfg.hidden_size, n_layers=2)
    pp = proj.init(jax.random.key(1), pspec)
    opt = optax.adamw(1e-3)

    def put(x, spec):
        # make_array_from_callback assembles the GLOBAL array from local
        # shards — works identically single- and multi-process
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, NamedSharding(mesh, spec), lambda idx: x[idx]
        )

    baxes = batch_axes(mesh)
    batch = {
        k: put(v, P(baxes, *([None] * (v.ndim - 1))))
        for k, v in global_batch(vocab=cfg.vocab_size).items()
    }
    llm_r = jax.tree.map(lambda x: put(x, P()), llm)
    pp_r = jax.tree.map(lambda x: put(x, P()), pp)
    opt_r = jax.tree.map(
        lambda x: put(x, P()) if hasattr(x, "shape") else x, opt.init(pp)
    )

    def loss_fn(pparams, llm_params, b):
        soft = proj.apply(pspec, pparams, b["embs"], train=False)
        return mmmodel.caption_loss(
            cfg, llm_params, soft, b["input_ids"], b["attention_mask"],
            b["labels"],
        )

    @jax.jit
    def step(pparams, opt_state, llm_params, b):
        loss, g = jax.value_and_grad(loss_fn)(pparams, llm_params, b)
        updates, opt_state = opt.update(g, opt_state, pparams)
        return optax.apply_updates(pparams, updates), opt_state, loss

    new_pp, _, loss = step(pp_r, opt_r, llm_r, batch)
    checksum = float(
        sum(np.abs(np.asarray(x)).sum() for x in jax.tree.leaves(new_pp))
    )
    return float(loss), checksum


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    from dmi_tpu.parallel import init_distributed, make_multihost_mesh

    ok = init_distributed(f"127.0.0.1:{port}", nproc, pid)
    assert ok, "multi-process init fell through"
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, jax.devices()
    assert len(jax.local_devices()) == 4

    # hybrid branch: n_slices = 8 devices / 4 local = 2 > 1
    mesh = make_multihost_mesh(ici_shape=(2, 2))
    assert mesh.axis_names == ("replica", "data", "model")
    assert mesh.devices.shape == (nproc, 2, 2), mesh.devices.shape
    # the replica axis must follow process boundaries (DCN contract:
    # only 'replica' collectives cross processes)
    for s in range(nproc):
        procs = {d.process_index for d in mesh.devices[s].flat}
        assert procs == {s}, (s, procs)

    loss, checksum = run_step(mesh)
    if jax.process_index() == 0:
        print(f"RESULT loss={loss!r} checksum={checksum!r}", flush=True)


if __name__ == "__main__":
    main()
