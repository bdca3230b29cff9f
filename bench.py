"""Decode-throughput benchmark: captions/sec/chip on the flagship captioner.

The headline serving path (SURVEY.md §3.4): soft token + chat prefix ->
batched KV-cache greedy decode on Llama-3.2-1B(-shaped) weights, sydney's
max_new_tokens=22 budget.  Weight values don't affect decode cost, so
random bf16 weights measure the same compute/bandwidth path as real ones;
EOS early-exit is disabled so every sequence decodes the full budget (a
lower bound on real-workload throughput, where early exit only helps).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against bench_baseline.json (written on first run) so
later rounds track improvement; the reference publishes no decode numbers
(BASELINE.md).

Env knobs: DMI_BENCH_SMALL=1 (tiny model for CPU smokes),
DMI_BENCH_MODEL=1b|3b|8b (body size; default 1b — batch defaults scale),
DMI_BENCH_BATCH (default 256 at 1b), DMI_BENCH_NEW_TOKENS (default 22),
DMI_BENCH_INT8=1 (quantized weights),
DMI_BENCH_MODE=train (projector train-step throughput instead of decode),
DMI_BENCH_RETRY_UNTIL / --retry-until <s> (ride out a relay outage).
"""

from __future__ import annotations

import dataclasses
import json
import os
import os.path as osp
import time
from functools import partial

import numpy as np


def bench_train(cfg, llm_params, pspec, pparams, batch, seq_len=48) -> dict:
    """Projector train-step throughput: value_and_grad through the frozen
    LLM + AdamW update (the stage-1/3 hot loop)."""
    import time

    import jax
    import jax.numpy as jnp
    import optax

    from dmi_tpu.models import mmmodel
    from dmi_tpu.models import projector as proj

    rng = np.random.default_rng(0)
    embs = jnp.asarray(rng.normal(size=(batch, pspec.mm_dim)).astype(np.float32))
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(batch, seq_len)), jnp.int32)
    mask = jnp.ones((batch, seq_len), jnp.int32)
    labels = jnp.where(jnp.arange(seq_len)[None] < seq_len // 2, -100, ids)

    opt = optax.adamw(1e-4)
    opt_state = opt.init(pparams)

    def loss_fn(p, llm_p, embs, ids, mask, labels):
        soft = proj.apply(pspec, p, embs, train=False)
        return mmmodel.caption_loss(cfg, llm_p, soft, ids, mask, labels)

    # llm params MUST be jit arguments, not closure captures: captured
    # constants embed the 2.5GB of weights into the lowered program, and
    # the relay's compile helper chokes on the multi-GB POST
    @jax.jit
    def step(p, s, llm_p, embs, ids, mask, labels):
        loss, g = jax.value_and_grad(loss_fn)(p, llm_p, embs, ids, mask, labels)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s, loss

    pparams, opt_state, loss = step(pparams, opt_state, llm_params, embs, ids, mask, labels)
    _ = float(loss)  # compile + force
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        pparams, opt_state, loss = step(pparams, opt_state, llm_params, embs, ids, mask, labels)
    # ONE host sync at the end: the steps serialize on the pparams
    # dependency anyway, and a float() per step would add the ~25 ms relay
    # dispatch overhead to every step (the production trainers keep losses
    # as device scalars exactly like this)
    _ = float(loss)
    dt = time.perf_counter() - t0
    return {"steps_per_sec": n / dt, "samples_per_sec": batch * n / dt}


def _load_or_record_baseline(metric: str, value: float) -> float:
    """Per-metric baseline tracking: merge into bench_baseline.json (never
    clobber other variants' recorded baselines)."""
    baseline_file = osp.join(osp.dirname(osp.abspath(__file__)), "bench_baseline.json")
    recorded = {}
    if osp.exists(baseline_file):
        recorded = json.load(open(baseline_file))
    if metric in recorded:
        return recorded[metric]
    recorded[metric] = value
    with open(baseline_file, "w") as f:
        json.dump(recorded, f, indent=2)
    return value


def _probe_backend_subprocess(timeout_s: float) -> str:
    """The default backend a CHILD interpreter reports within timeout_s,
    or "" on hang/crash.  A wedged relay makes PJRT client creation HANG
    (observed: >9 min on a trivial op after queue abuse), which no
    in-process try/except can escape — so the liveness probe must run in a
    killable subprocess BEFORE this process commits to backend init."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.default_backend())"],
            timeout=timeout_s, capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        return ""
    return r.stdout.strip() if r.returncode == 0 else ""


def _retry_budget() -> float:
    """Wall-clock seconds to wait for relay RECOVERY before accepting the
    CPU fallback: `--retry-until <s>` / `--retry-until=<s>` flag (argv
    survives the re-execs) or DMI_BENCH_RETRY_UNTIL env (default 900).
    0 = bounded quick retries, then CPU.  The round-3 postmortem:
    a 2h relay wedge at round end turned the whole round's bench into a
    _cpu_fallback line — with a budget, the wedge degrades to 'late'."""
    import sys

    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a.startswith("--retry-until="):
            return float(a.split("=", 1)[1])
        if a == "--retry-until" and i + 1 < len(argv):
            return float(argv[i + 1])
    # default 900s: the DRIVER invokes `python bench.py` bare at round end,
    # so the insurance must be on by default (the probe loop only engages
    # when the relay is actually dead; a healthy relay costs nothing)
    return float(os.environ.get("DMI_BENCH_RETRY_UNTIL", "900"))


def _ensure_tpu_or_retry() -> str:
    """The axon relay's PJRT registration fails transiently (a failure at
    interpreter start leaves only the CPU backend) or terminally (default
    platforms name a backend that never registered, making
    jax.default_backend() RAISE) — and a wedged relay HANGS init outright
    (probed in a subprocess, above).  Re-exec a few times to win a healthy
    registration; if the relay never appears, re-exec once more pinned to
    CPU (the config update must precede backend init, hence the fresh
    interpreter) so the bench always completes and always prints its one
    JSON line."""
    import sys
    import time

    import jax

    if os.environ.get("_DMI_BENCH_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
        return jax.default_backend()
    probed = _probe_backend_subprocess(
        float(os.environ.get("DMI_BENCH_PROBE_TIMEOUT", "150"))
    )
    # a healthy CPU-only child is a valid outcome for small smokes (no
    # detour through the force-CPU re-exec); anything else non-live is
    # treated as relay trouble
    if probed in ("tpu", "axon") or (
        probed == "cpu" and os.environ.get("DMI_BENCH_SMALL") == "1"
    ):
        try:
            backend = jax.default_backend()
        except RuntimeError:
            backend = "uninitialized"  # e.g. "Backend 'axon' is not ... known"
    else:
        backend = "uninitialized"  # hang or crash in the probe child
    if backend == "tpu":
        return backend
    if backend == "cpu" and os.environ.get("DMI_BENCH_SMALL") == "1":
        return backend
    budget = _retry_budget()
    if budget > 0 and os.environ.get("DMI_BENCH_SMALL") != "1":
        # probe loop across the outage: stay uninitialized (probes run in
        # killable children) until the relay answers or the budget runs
        # out, then fall through to the bounded-retry / CPU-fallback path
        # either way (the re-exec there wins a FRESH registration).
        start = float(
            os.environ.setdefault("_DMI_BENCH_RETRY_START", str(time.time()))
        )
        interval = float(os.environ.get("DMI_BENCH_RETRY_INTERVAL", "60"))
        probe_timeout = float(os.environ.get("DMI_BENCH_PROBE_TIMEOUT", "150"))
        while time.time() - start < budget:
            if _probe_backend_subprocess(probe_timeout) in ("tpu", "axon"):
                break  # recovered: bounded re-exec path takes it from here
            time.sleep(min(interval, max(0.0, start + budget - time.time())))
    tries = int(os.environ.get("_DMI_BENCH_TRIES", "0"))
    if tries < 5 and os.environ.get("DMI_BENCH_SMALL") != "1":
        time.sleep(90)
        os.environ["_DMI_BENCH_TRIES"] = str(tries + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)
    os.environ["_DMI_BENCH_FORCE_CPU"] = "1"
    os.execv(sys.executable, [sys.executable] + sys.argv)


def main() -> None:
    # The headline decode loop runs the XLA multiply-reduce attention (the
    # Pallas decode-attn kernel measured SLOWER in-loop and is opt-in);
    # the projector Pallas kernels remain default-on.  DMI_DISABLE_PALLAS=1
    # still opts everything out if the relay misbehaves on Mosaic compiles.

    if (
        os.environ.get("_DMI_BENCH_CRASH_TEST") == "1"
        and os.environ.get("_DMI_BENCH_FORCE_CPU") != "1"
    ):  # test hook for the mid-run-relay-death recovery path
        raise RuntimeError("simulated mid-run relay death")

    backend = _ensure_tpu_or_retry()

    import jax
    import jax.numpy as jnp

    from dmi_tpu.models import decode, llama
    from dmi_tpu.models import projector as proj

    small = os.environ.get("DMI_BENCH_SMALL") == "1"
    if backend != "tpu" and not small:
        # relay never registered: run the small model so the bench still
        # completes, under an explicit metric name that cannot pollute the
        # TPU baselines
        small = True
        os.environ["_DMI_BENCH_CPU_FALLBACK"] = "1"
    # DMI_BENCH_MODEL: the LM slot is any decoder size (the reference's is
    # AutoModelForCausalLM); 3b proves the decode stack isn't overfit to
    # the 1B shape (VERDICT r3 #9)
    model = os.environ.get("DMI_BENCH_MODEL", "1b")
    if model not in ("1b", "3b", "8b"):
        raise SystemExit(f"DMI_BENCH_MODEL must be 1b/3b/8b, got {model!r}")
    # batch 256 saturates the weight-read-bound decode on v5e at 1B
    # (64 -> 376, 256 -> 750, 1024 -> 776 captions/s measured); larger
    # bodies halve the default so weights + triple companions + KV fit HBM
    default_batch = {"1b": "256", "3b": "128", "8b": "64"}[model]
    batch = int(os.environ.get("DMI_BENCH_BATCH", "16" if small else default_batch))
    max_new = int(os.environ.get("DMI_BENCH_NEW_TOKENS", "22"))
    prefix_len = 15  # typical chat-template instruction prompt

    if small:
        cfg = llama.tiny_config(vocab_size=512, hidden_size=128, n_layers=4,
                                n_heads=8, n_kv=4, intermediate=256)
        mm_dim = 64
    else:
        maker = {"1b": llama.llama32_1b, "3b": llama.llama32_3b,
                 "8b": llama.llama31_8b}[model]
        cfg = maker()
        mm_dim = 1024
    # disable EOS early-exit: decode the full budget every time
    cfg = dataclasses.replace(cfg, eos_token_ids=())

    key = jax.random.key(0)
    llm_params = llama.init(key, cfg)
    # "1" = int8 weights dequantized to bf16 (halves weight reads);
    # "w8a8" = native int8 matmuls (halves weight reads);
    # "w4a8" = int4 loop weights (halves them again; int8 activations)
    int8 = os.environ.get("DMI_BENCH_INT8", "")
    if int8 not in ("", "0", "1", "w8a8", "w4a8"):
        raise SystemExit(
            f"DMI_BENCH_INT8 must be '', 0, 1, w8a8 or w4a8, got {int8!r}")
    int8 = int8 in ("1", "w8a8", "w4a8") and int8 or ""
    # fused QKV/gate-up is the single-chip serving default (token-exact,
    # +3.4% measured); DMI_BENCH_FUSED=0 opts out
    fused = os.environ.get("DMI_BENCH_FUSED", "1") == "1"
    if fused:
        llm_params = llama.fuse_projections(llm_params)
    llm_params_bf16 = llm_params
    if int8:
        from dmi_tpu.models.quant import quantize_llama

        if int8 == "w4a8":
            llm_params = quantize_llama(llm_params, bits=4)
        else:
            llm_params = quantize_llama(llm_params, native=(int8 == "w8a8"))
    pspec = proj.ProjectorSpec(mm_dim=mm_dim, lm_dim=cfg.hidden_size, n_layers=2)
    pparams = proj.init(jax.random.key(1), pspec)

    if os.environ.get("DMI_BENCH_MODE") == "train":
        if "DMI_BENCH_BATCH" not in os.environ and not small:
            # the recorded train baseline is batch 64 (B=256 fwd+bwd
            # activations through the 1B body exceed the 16G HBM);
            # larger bodies scale it down
            batch = {"1b": 64, "3b": 32, "8b": 16}[model]
        r = bench_train(cfg, llm_params, pspec, pparams, batch)
        metric = f"train_samples_per_sec_per_chip_{model}" if not small else "train_samples_per_sec_small"
        if os.environ.get("_DMI_BENCH_CPU_FALLBACK") == "1":
            metric += "_cpu_fallback"
        value = r["samples_per_sec"]
        baseline = _load_or_record_baseline(metric, value)
        print(
            json.dumps(
                {
                    "metric": metric,
                    "value": round(value, 3),
                    "unit": "samples/s/chip",
                    "vs_baseline": round(value / baseline, 3),
                }
            )
        )
        return

    rng = np.random.default_rng(0)
    embs = jnp.asarray(rng.normal(size=(batch, mm_dim)).astype(np.float32))
    prefix = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(batch, prefix_len)), jnp.int32)

    # ONE jitted program for the whole projector -> assemble -> decode
    # pipeline: eager proj.apply/embed/concat cost several ~25 ms relay
    # dispatch round-trips per batch (measured ~35-45 ms bench overhead vs
    # the profiler's bare greedy_generate_bl)
    from dmi_tpu.models import mmmodel

    # ONE jitted program reusing the PRODUCTION serving pipeline
    # (mmmodel.caption_generate — the same path serve.py ships), so the
    # bench cannot drift from what serving actually runs.  Quantized loop
    # + bf16 prefill split and the DMI_DECODE_BATCH_FIRST pin both live
    # inside caption_generate.
    @partial(jax.jit, static_argnames=("cfg", "pspec", "max_new", "batch_first"))
    def _pipeline(cfg, pspec, pparams, llm_params, pre_params, embs, prefix,
                  max_new, batch_first=False):
        soft = proj.apply(pspec, pparams, embs, train=False)
        return mmmodel.caption_generate(
            cfg, llm_params, soft, prefix, max_new, 0,
            prefill_params=pre_params, batch_first=batch_first,
        )

    def measure(lp, pre, m_embs=None, m_prefix=None):
        # pre=None must be decided HERE: inside jit every pytree argument
        # is rebuilt with fresh tracers, so an `is` identity check there
        # can never detect "same weights"
        m_embs = embs if m_embs is None else m_embs
        m_prefix = prefix if m_prefix is None else m_prefix

        def run_once():
            toks = _pipeline(cfg, pspec, pparams, lp, pre, m_embs, m_prefix,
                             max_new,
                             batch_first=os.environ.get(
                                 "DMI_DECODE_BATCH_FIRST") == "1")
            # force completion via a host transfer: on the axon relay
            # platform, block_until_ready returns before remote execution
            # finishes
            return np.asarray(toks)

        run_once()  # compile
        run_once()  # warm
        n_iters = int(os.environ.get("DMI_BENCH_ITERS", "10"))
        iter_ms = []
        for _ in range(n_iters):
            t0 = time.perf_counter()
            run_once()
            iter_ms.append((time.perf_counter() - t0) * 1e3)
        iter_ms.sort()
        return iter_ms

    def measure_adaptive(lp, pre, label, extra):
        """Companion measurement that halves batch on OOM instead of
        dying: the 3B triple at B=128 lost its W8A8 number to
        RESOURCE_EXHAUSTED in round 4 (bf16 tree + quantized copies + KV
        all resident).  Returns (key, captions/s) and annotates non-full
        batches in the key."""
        b = batch
        while b >= 8:
            try:
                ms = measure(lp, pre, embs[:b], prefix[:b])
                key = label if b == batch else f"{label}_b{b}"
                return key, round(b / (ms[len(ms) // 2] / 1e3), 3)
            except Exception as e:  # pragma: no cover - chip-dependent
                if "RESOURCE_EXHAUSTED" not in str(e):
                    raise
                extra.setdefault("companion_oom", []).append(f"{label}@B{b}")
                b //= 2
        raise RuntimeError(f"{label}: OOM at every batch down to 8")

    extra = {}
    iter_ms = measure(llm_params, llm_params_bf16 if int8 else None)
    median_ms = iter_ms[len(iter_ms) // 2]

    captions_per_sec = batch / (median_ms / 1e3)

    # companion number for the other weight mode (serving ships W8A8, parity
    # work runs bf16): measured in the same process so the pair is a valid
    # A/B; best-effort — a relay failure here must not lose the headline
    bf = os.environ.get("DMI_DECODE_BATCH_FIRST") == "1"
    if not small and os.environ.get("DMI_BENCH_BOTH", "1") == "1" and not bf:
        try:
            from dmi_tpu.models.quant import quantize_llama as _ql

            if int8:
                k, v = measure_adaptive(llm_params_bf16, None,
                                        "bf16_captions_per_sec", extra)
                extra[k] = v
            else:
                # same-process TRIPLE: the chip drifts ±6% between
                # processes, so w8a8 AND w4a8 companions are measured here
                # back-to-back with the bf16 headline (valid A/Bs); each
                # quantized tree is dropped before the next is built (the
                # 3B body cannot hold bf16 + w8a8 + w4a8 copies at once)
                qp = _ql(llm_params_bf16, native=True)
                k, v = measure_adaptive(qp, llm_params_bf16,
                                        "w8a8_captions_per_sec", extra)
                extra[k] = v
                del qp
                qp4 = _ql(llm_params_bf16, bits=4)
                k, v = measure_adaptive(qp4, llm_params_bf16,
                                        "w4a8_captions_per_sec", extra)
                extra[k] = v
                del qp4
        except Exception as e:  # pragma: no cover - relay-dependent
            extra["companion_error"] = str(e)[:120]
    metric = f"decode_captions_per_sec_per_chip_{model}" if not small else "decode_captions_per_sec_small"
    if not small and batch != int(default_batch):
        metric += f"_b{batch}"  # keep non-default batches off the headline baseline
    if not small and max_new != 22:
        metric += f"_n{max_new}"  # likewise non-default decode budgets
    if int8:
        metric += "_int8" if int8 == "1" else f"_{int8}"
    if not fused:
        metric += "_unfused"  # fused is the headline configuration
    if os.environ.get("_DMI_BENCH_CPU_FALLBACK") == "1":
        metric += "_cpu_fallback"

    baseline = _load_or_record_baseline(metric, captions_per_sec)

    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(captions_per_sec, 3),
                "unit": "captions/s/chip",
                "vs_baseline": round(captions_per_sec / baseline, 3),
                # per-iteration spread so round-over-round deltas are
                # distinguishable from relay noise (n >= 10, median-based)
                "n_iters": len(iter_ms),
                "iter_ms_min": round(iter_ms[0], 2),
                "iter_ms_median": round(median_ms, 2),
                "iter_ms_max": round(iter_ms[-1], 2),
                **extra,
            }
        )
    )


def _arm_hang_watchdog():
    """A relay that WEDGES mid-run leaves the process blocked inside a C
    transfer call — SIGALRM handlers never run because the interpreter
    never regains control, so the escape hatch is a watchdog THREAD that
    re-execs the whole process pinned to CPU (os.execv from a secondary
    thread replaces the image even while the main thread is stuck).
    Deadline via DMI_BENCH_DEADLINE (default 3600 s — remote compiles
    alone can take 4-480 s each and the triple companion compiles four
    programs; the bound exists to beat 'forever', not to be tight)."""
    if os.environ.get("_DMI_BENCH_FORCE_CPU") == "1":
        return None
    import sys
    import threading

    # the retry-until probe loop is legitimate waiting, not a hang: give
    # the watchdog that much extra rope on top of the work deadline
    deadline = float(os.environ.get("DMI_BENCH_DEADLINE", "3600")) + _retry_budget()

    def fire():
        sys.stderr.write(
            f"bench exceeded {deadline:.0f}s (relay hang?); "
            "re-exec pinned to CPU\n"
        )
        sys.stderr.flush()
        os.environ["_DMI_BENCH_FORCE_CPU"] = "1"
        os.execv(sys.executable, [sys.executable] + sys.argv)

    t = threading.Timer(deadline, fire)
    t.daemon = True
    t.start()
    return t


def _main_with_last_resort():
    """A relay that dies MID-RUN (after winning registration) surfaces as
    an arbitrary runtime error after _ensure_tpu_or_retry passed.  One
    JSON line must still be printed: re-exec pinned to CPU once; if the
    CPU run itself fails, that's a real bug — crash loudly."""
    watchdog = _arm_hang_watchdog()
    try:
        main()
        if watchdog is not None:
            watchdog.cancel()
    except (NameError, AttributeError, TypeError, ImportError, KeyError):
        # programming errors are NOT relay deaths: a CPU fallback here
        # would mask a real bug behind a quiet _cpu_fallback metric
        raise
    except Exception:
        if os.environ.get("_DMI_BENCH_FORCE_CPU") == "1":
            raise
        import sys
        import traceback

        traceback.print_exc(file=sys.stderr)
        print("relay died mid-run; retrying pinned to CPU", file=sys.stderr)
        os.environ["_DMI_BENCH_FORCE_CPU"] = "1"
        os.execv(sys.executable, [sys.executable] + sys.argv)


if __name__ == "__main__":
    _main_with_last_resort()
