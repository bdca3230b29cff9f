"""Relay buffer-residency probe (round 5).

The 8B host-build pathology (BASELINE.md round-5 8B section) showed a
host-built device_put tree decoding 276x slower than the identical
program with the tree synthesized on device — consistent with the relay
re-streaming host-origin buffers per dispatch instead of keeping them
chip-resident.  This probe isolates the effect on ONE buffer and tests
the cheap fix: "laundering" a host-origin buffer through a jitted
on-device identity, whose OUTPUT is produced by a device program and so
should be resident.

Cells (same jitted 8-iter chained-reduction consumer, one scalar fetch):
  put_np        — jax.device_put(numpy array)
  put_cpu       — jax.device_put(cpu-backend jax array)  [the 8B build's form]
  laundered     — jax.jit(lambda a: a * 1.0)(put_np)
  laundered_cpu — jax.jit(lambda a: a * 1.0)(put_cpu)  [the pin_to_device fix]
  native        — jax.jit(random.normal)(key) on device

If put_* cells are ~stream-limited (size / 40 MB/s per call) while
laundered/native are ~free, every serving path that loads real weights
(torch_import -> device) on THIS relay must pin trees via the jitted
identity — utils.platform.pin_to_device.

Usage: python scripts/probe_buffer_residency.py [--mb 256] [--iters 3]
Prints one JSON line.  Run with the host otherwise idle.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=256)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)

    n = args.mb * (1 << 20) // 4
    host = np.random.default_rng(0).standard_normal(n).astype(np.float32)

    @jax.jit
    def consume(a):
        # 8 chained full reads of `a` (DCE-proof: each term feeds the next)
        def body(i, acc):
            return acc + jnp.sum(a * (1.0 + acc * 1e-30))

        return jax.lax.fori_loop(0, 8, body, jnp.float32(0))

    def timeit(a, label):
        np.asarray(consume(a))  # compile + first
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            np.asarray(consume(a))
            ts.append((time.perf_counter() - t0) * 1e3)
        ts.sort()
        med = ts[len(ts) // 2]
        print(f"{label}: {med:.1f} ms median {ts}", flush=True)
        return med

    out = {"metric": "buffer_residency_ms", "mb": args.mb}

    t0 = time.time()
    put_np = jax.device_put(host)
    put_np.block_until_ready()
    print(f"device_put(np) {time.time()-t0:.1f}s", flush=True)
    out["put_np_ms"] = timeit(put_np, "put_np")

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        cpu_arr = jnp.asarray(host)
    t0 = time.time()
    put_cpu = jax.device_put(cpu_arr)
    put_cpu.block_until_ready()
    print(f"device_put(cpu-jax) {time.time()-t0:.1f}s", flush=True)
    out["put_cpu_ms"] = timeit(put_cpu, "put_cpu")

    laundered = jax.jit(lambda a: a * 1.0)(put_np)
    laundered.block_until_ready()
    out["laundered_ms"] = timeit(laundered, "laundered")

    # The fix cell: launder the HAZARD form (cpu-backend array) through a
    # jitted on-device identity.  If this is fast, utils.platform
    # pin_to_device is a sufficient guard for every host-built tree.
    t0 = time.time()
    laundered_cpu = jax.jit(lambda a: a * 1.0)(put_cpu)
    np.asarray(jnp.sum(laundered_cpu))
    print(f"launder(put_cpu) {time.time()-t0:.1f}s", flush=True)
    out["laundered_cpu_ms"] = timeit(laundered_cpu, "laundered_cpu")

    native = jax.jit(
        lambda k: jax.random.normal(k, (n,), jnp.float32)
    )(jax.random.PRNGKey(0))
    native.block_until_ready()
    out["native_ms"] = timeit(native, "native")

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
