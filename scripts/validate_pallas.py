"""On-chip validation of the Pallas projector kernels vs their XLA twins.

Run on a real TPU (the axon relay): checks numerics (max abs diff) and
timing for the fused MLP2 single-block, column-tiled, and LoRA-layer0
kernels at the production serving/training shapes.  Interpret-mode tests
cover correctness on CPU; only the real chip enforces the ~16M scoped
VMEM limit, so any kernel/tile change must be re-run here before relying
on it (see CLAUDE.md: Mosaic double-buffers streamed blocks).

Usage: PYTHONPATH=. python scripts/validate_pallas.py
"""

import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def _bench(name, fn, args, n=20):
    y = np.asarray(fn(*args))  # compile + force (host transfer: the relay's
    t0 = time.perf_counter()   # block_until_ready is a no-op)
    for _ in range(n):
        y = np.asarray(fn(*args))
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt * 1e3:.3f} ms/call")
    return y


def main():
    import jax
    import jax.numpy as jnp

    from dmi_tpu.ops.pallas import projector as pk

    print("backend:", jax.default_backend())
    if jax.default_backend() != "tpu":
        print("needs a real TPU (CPU only supports interpret mode) — aborting")
        return
    rng = np.random.default_rng(0)

    for dtype, B, mm, lm in [
        (np.float32, 256, 1024, 2048),   # serving path (tiled on hardware)
        (jnp.bfloat16, 128, 1024, 2048), # training path (single-block)
    ]:
        x = jnp.asarray(rng.normal(size=(B, mm)).astype(np.float32)).astype(dtype)
        w0 = jnp.asarray(rng.normal(size=(mm, lm)).astype(np.float32) * 0.02).astype(dtype)
        b0 = jnp.asarray(rng.normal(size=(lm,)).astype(np.float32) * 0.02).astype(dtype)
        w1 = jnp.asarray(rng.normal(size=(lm, lm)).astype(np.float32) * 0.02).astype(dtype)
        b1 = jnp.asarray(rng.normal(size=(lm,)).astype(np.float32) * 0.02).astype(dtype)
        args = (x, w0, b0, w1, b1)

        print(f"\n== fused MLP2 {np.dtype(dtype).name if dtype is np.float32 else 'bf16'} "
              f"B={B} {mm}->{lm}->{lm} ==")
        single_ok = pk._mlp2_vmem_bytes(x, w0, w1) <= pk.VMEM_BUDGET
        tiled_est = pk._mlp2_tiled_vmem_bytes(x, w0, w1, 256)
        print(f"single-block fits: {single_ok}; tiled est {tiled_est/2**20:.2f} MiB "
              f"(budget {pk.VMEM_BUDGET/2**20:.0f})")
        yr = _bench("xla twin", jax.jit(pk._mlp2_xla), args)
        if single_ok:
            ys = _bench("single-block", jax.jit(pk._mlp2_pallas), args)
            print("  max diff:", float(np.abs(ys.astype(np.float32) - yr.astype(np.float32)).max()))
        if tiled_est <= pk.VMEM_BUDGET:
            yt = _bench("tiled", jax.jit(lambda *a: pk._mlp2_pallas_tiled(*a, tile_n=256)), args)
            print("  max diff:", float(np.abs(yt.astype(np.float32) - yr.astype(np.float32)).max()))
        yd = _bench("dispatcher (fused_mlp2)", jax.jit(pk.fused_mlp2), args)
        print("  max diff:", float(np.abs(yd.astype(np.float32) - yr.astype(np.float32)).max()))


if __name__ == "__main__":
    main()
