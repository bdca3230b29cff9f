"""bench.py --retry-until: an end-of-round relay wedge must degrade to
"late", not to a _cpu_fallback metric (round-3 postmortem: a 2h outage
cost the round its chip number).  The probe loop runs in killable
subprocesses; here the probe is mocked dead-then-alive so the loop's
control flow is pinned without a relay."""

import importlib.util
import os
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture
def clean_env(monkeypatch):
    for var in (
        "DMI_BENCH_SMALL", "_DMI_BENCH_TRIES", "_DMI_BENCH_RETRY_START",
        "_DMI_BENCH_FORCE_CPU", "DMI_BENCH_RETRY_UNTIL",
        "DMI_BENCH_RETRY_INTERVAL",
    ):
        monkeypatch.delenv(var, raising=False)
    return monkeypatch


def test_retry_budget_flag_parsing(clean_env):
    bench = _load_bench()
    assert bench._retry_budget() == 900.0  # driver-default insurance
    clean_env.setenv("DMI_BENCH_RETRY_UNTIL", "0")
    assert bench._retry_budget() == 0.0
    clean_env.delenv("DMI_BENCH_RETRY_UNTIL")
    clean_env.setenv("DMI_BENCH_RETRY_UNTIL", "120")
    assert bench._retry_budget() == 120.0
    clean_env.setattr(sys, "argv", ["bench.py", "--retry-until=7200"])
    assert bench._retry_budget() == 7200.0
    clean_env.setattr(sys, "argv", ["bench.py", "--retry-until", "300"])
    assert bench._retry_budget() == 300.0


def test_retry_until_waits_for_recovery(clean_env):
    """Probe dead twice then alive: the budget loop must keep probing
    (without initializing a backend) and hand off to the re-exec path as
    soon as the relay answers."""
    bench = _load_bench()
    clean_env.setenv("DMI_BENCH_RETRY_UNTIL", "30")
    clean_env.setenv("DMI_BENCH_RETRY_INTERVAL", "0.01")

    calls = {"n": 0}

    def fake_probe(timeout_s):
        calls["n"] += 1
        return "" if calls["n"] < 3 else "axon"

    clean_env.setattr(bench, "_probe_backend_subprocess", fake_probe)
    clean_env.setattr(time, "sleep", lambda s: None)  # skip the 90s backoff

    def fake_execv(*a):
        raise SystemExit("reexec")

    clean_env.setattr(os, "execv", fake_execv)

    with pytest.raises(SystemExit, match="reexec"):
        bench._ensure_tpu_or_retry()
    # initial probe (dead) + loop probe (dead) + loop probe (alive)
    assert calls["n"] == 3
    # recovery hands off to the bounded re-exec path, counting a try
    assert os.environ["_DMI_BENCH_TRIES"] == "1"
    assert "_DMI_BENCH_FORCE_CPU" not in os.environ


def test_retry_until_budget_exhausts_to_cpu(clean_env):
    """Probe never recovers: once the wall-clock budget is spent the old
    bounded-retry -> CPU-fallback behavior takes over (here tries are
    pre-exhausted so the fallback re-exec is immediate)."""
    bench = _load_bench()
    clean_env.setenv("DMI_BENCH_RETRY_UNTIL", "0.05")
    clean_env.setenv("DMI_BENCH_RETRY_INTERVAL", "0.01")
    clean_env.setenv("_DMI_BENCH_TRIES", "5")

    calls = {"n": 0}

    def fake_probe(timeout_s):
        calls["n"] += 1
        return ""

    clean_env.setattr(bench, "_probe_backend_subprocess", fake_probe)

    def fake_execv(*a):
        raise SystemExit("reexec-cpu")

    clean_env.setattr(os, "execv", fake_execv)

    t0 = time.perf_counter()
    with pytest.raises(SystemExit, match="reexec-cpu"):
        bench._ensure_tpu_or_retry()
    assert time.perf_counter() - t0 >= 0.05  # actually waited the budget
    assert calls["n"] >= 2  # initial probe + at least one loop probe
    assert os.environ["_DMI_BENCH_FORCE_CPU"] == "1"


def test_retry_start_is_anchored_across_reexecs(clean_env):
    """_DMI_BENCH_RETRY_START persists in the env across os.execv, so a
    re-exec after recovery must NOT restart the budget clock: with the
    anchor in the past and the budget spent, the loop is skipped."""
    bench = _load_bench()
    clean_env.setenv("DMI_BENCH_RETRY_UNTIL", "10")
    clean_env.setenv("_DMI_BENCH_RETRY_START", str(time.time() - 60))
    clean_env.setenv("_DMI_BENCH_TRIES", "5")

    calls = {"n": 0}

    def fake_probe(timeout_s):
        calls["n"] += 1
        return ""

    clean_env.setattr(bench, "_probe_backend_subprocess", fake_probe)
    clean_env.setattr(os, "execv", lambda *a: (_ for _ in ()).throw(SystemExit("x")))

    t0 = time.perf_counter()
    with pytest.raises(SystemExit):
        bench._ensure_tpu_or_retry()
    assert time.perf_counter() - t0 < 5  # no fresh 10s wait
    assert calls["n"] == 1  # only the initial probe; loop body never ran
