"""The driver runs bench.py and __graft_entry__.py unattended at round
end; a crash there loses the round's measurements.  Smoke them the way
the driver invokes them (subprocess for bench — it re-execs itself on
relay failure — and in-process for the graft entry points)."""

import json
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

# every test here shells out to bench/entry scripts with fresh compiles
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(tmp_path, extra_env):
    # copy bench.py out of the repo so its baseline-recording writes a
    # throwaway bench_baseline.json instead of dirtying the committed one
    shutil.copy(os.path.join(REPO, "bench.py"), tmp_path / "bench.py")
    env = dict(
        os.environ,
        PYTHONPATH=REPO,
        _DMI_BENCH_FORCE_CPU="1",  # don't touch (or wait for) the relay
        # share the suite's persistent compile cache: the subprocess's
        # fresh XLA compiles are what made these tests minutes-long (and
        # timeout-flaky) on a loaded 1-core host
        JAX_COMPILATION_CACHE_DIR="/tmp/jax_compile_cache_dmi",
        **extra_env,
    )
    r = subprocess.run(
        [sys.executable, str(tmp_path / "bench.py")],
        capture_output=True, text=True, env=env, timeout=900, cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = r.stdout.strip().splitlines()[-1]
    return json.loads(line)


def test_bench_small_decode(tmp_path):
    out = _run_bench(tmp_path, {"DMI_BENCH_SMALL": "1"})
    assert out["metric"] == "decode_captions_per_sec_small"
    assert out["unit"] == "captions/s/chip"
    assert out["value"] > 0
    assert out["vs_baseline"] == 1.0  # first recording defines the baseline


def test_bench_relay_dead_fallback(tmp_path):
    """Relay never registers -> bench must still print a JSON line, under
    an explicit _cpu_fallback metric that can't pollute TPU baselines."""
    out = _run_bench(tmp_path, {})
    assert out["metric"].endswith("_cpu_fallback")
    assert out["value"] > 0


def test_bench_mid_run_crash_recovery(tmp_path):
    """An exception after relay registration (relay died mid-run) must
    still end with one JSON line, via the pinned-CPU re-exec."""
    shutil.copy(os.path.join(REPO, "bench.py"), tmp_path / "bench.py")
    env = dict(
        os.environ, PYTHONPATH=REPO,
        _DMI_BENCH_CRASH_TEST="1", DMI_BENCH_SMALL="1",
        # a dead relay must not add 150s probe stalls to this test, and a
        # fully loaded 1-core host needs headroom for the compile —
        # seen flaking at 600s before the shared persistent cache
        DMI_BENCH_PROBE_TIMEOUT="5",
        JAX_COMPILATION_CACHE_DIR="/tmp/jax_compile_cache_dmi",
    )
    r = subprocess.run(
        [sys.executable, str(tmp_path / "bench.py")],
        capture_output=True, text=True, env=env, timeout=900, cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "simulated mid-run relay death" in r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["value"] > 0


def test_bench_small_train(tmp_path):
    out = _run_bench(tmp_path, {"DMI_BENCH_SMALL": "1", "DMI_BENCH_MODE": "train"})
    assert out["metric"] == "train_samples_per_sec_small"
    assert out["unit"] == "samples/s/chip"
    assert out["value"] > 0


def test_graft_entry_traces():
    """entry() must return a jittable fn + matching example args; trace it
    with eval_shape (full 1B-body abstract shapes, no FLOPs)."""
    import jax

    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as ge
    finally:
        sys.path.pop(0)

    fn, example_args = ge.entry()
    out = jax.eval_shape(fn, *example_args)
    assert out.shape == () and out.dtype == np.float32


def test_graft_dryrun_multichip(capsys):
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as ge
    finally:
        sys.path.pop(0)

    ge.dryrun_multichip(8)
    out = capsys.readouterr().out
    # projector, hypernet, decode, stage-3 fewshot, grad-accum, checkpoint,
    # orbax sharded checkpoint (round-3 path 7), continuous-batching engine
    # dp x tp (round-4 path 8), speculative W4A8 self-draft decode
    # (round-4 path 9), speculative continuous batching (round-4 path 10),
    # mixtral MoE dp x tp x ep on a 3-D mesh (round-4 path 11)
    assert out.count("dryrun_multichip OK") == 11
