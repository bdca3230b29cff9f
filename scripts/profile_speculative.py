"""Chip A/B for speculative decode's verify-side ceiling
(dmi_tpu/models/speculative.py).

Measures, in ONE process back-to-back (CLAUDE.md: only same-process A/Bs
are valid), plain greedy decode vs oracle-draft speculative decode as a
function of acceptance.  The oracle draft costs ZERO model time (the
proposals come from a precomputed token buffer), so the measured
speedup is the VERIFY-SIDE CEILING: the best any real draft could do at
that acceptance rate before paying its own forward passes.

  greedy    dec.greedy_generate_bl — the production loop (bench.py)
  spec p=0  perfect oracle (proposals = the greedy output): every round
            emits k+1 tokens -> ceil((budget-1)/(k+1)) verify forwards
  spec p=m  every m-th output position corrupted -> partial acceptance
  spec p=1  every proposal wrong: pure overhead floor (each round emits
            exactly 1 token through the k+1-wide verify forward)

Decode below pool saturation is weight-stream bound (BASELINE.md), so
the expected shape is: speedup ~ tokens-per-round at small B, decaying
toward <1x as B approaches MXU saturation (B=256 at 1B) where the
(k+1)x extra compute stops being free.  EOS early-exit is disabled the
same way bench.py does it (unreachable eos id) so every slot runs the
full budget.

--self-draft additionally measures the PRODUCTION configuration
(serve.Captioner(speculative=k)): a W4A8 copy of the same weights as the
draft, bf16 draft prefill — a real draft paying real forward passes,
with whatever acceptance random-init weights yield (real checkpoints
should accept more: quantization perturbs ties, trained logits are
better separated).

--bulk additionally measures the CONTINUOUS-BATCHING composition on a
4x-pool workload: the plain bulk slot engine (streaming.bulk_caption)
vs the speculative bulk engine (speculative_bulk_caption, W4A8
self-draft) — the engine overheads (admission cond, ring bookkeeping)
ride along, so this is the end-to-end serving number rather than the
verify-side ceiling.  EOS is disabled, so refill buys nothing here and
any win is pure speculation; real workloads add the refill term on top.

Usage: python scripts/profile_speculative.py [--batches 8,32,64]
       [--k 4] [--periods 0,3,1] [--budget 22] [--iters 5] [--small]
       [--self-draft] [--bulk]
Prints one JSON object.  Run with the host otherwise idle.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=str, default="8,32,64")
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--periods", type=str, default="0,3,1")
    ap.add_argument("--budget", type=int, default=22)
    ap.add_argument("--prefix", type=int, default=32)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--self-draft", action="store_true")
    ap.add_argument("--bulk", action="store_true")
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.small:
        jax.config.update("jax_platforms", "cpu")

    from dmi_tpu.models import decode as dec
    from dmi_tpu.models import llama
    from dmi_tpu.models.speculative import (
        speculative_generate_bl,
        speculative_generate_oracle_bl,
    )

    if args.small:
        cfg = llama.tiny_config(vocab_size=512, hidden_size=128, n_layers=2,
                                n_heads=4, n_kv=2, intermediate=256)
        args.batches, args.iters, args.budget = "2,4", 2, 8
    else:
        cfg = llama.llama32_1b()
    # disable EOS early-exit like bench.py: unreachable id
    cfg = dataclasses.replace(cfg, eos_token_ids=(cfg.vocab_size - 1,))
    params = llama.init(jax.random.key(0), cfg)
    draft_params = None
    if args.self_draft:
        from dmi_tpu.models.quant import quantize_llama

        draft_params = quantize_llama(params, bits=4)

    batches = [int(b) for b in args.batches.split(",")]
    periods = [int(p) for p in args.periods.split(",")]
    budget, T, k = args.budget, args.prefix, args.k
    out = {"k": k, "budget": budget, "prefix": T, "iters": args.iters}

    for B in batches:
        rng = np.random.default_rng(B)
        scale = 1.0 / np.sqrt(cfg.hidden_size)
        embeds = jnp.asarray(
            scale * rng.normal(size=(B, T, cfg.hidden_size)).astype(np.float32)
        )

        def run_greedy():
            return dec.greedy_generate_bl(cfg, params, embeds, budget, 0)

        def measure(fn):
            r = fn()
            toks = r[0] if isinstance(r, tuple) else r
            _ = np.asarray(toks)  # warm/compile; host fetch = completion
            times = []
            for _i in range(args.iters):
                t0 = time.perf_counter()
                r = fn()
                toks = r[0] if isinstance(r, tuple) else r
                _ = np.asarray(toks)
                times.append(time.perf_counter() - t0)
            return sorted(times)[len(times) // 2], r

        g_ms, g_toks = measure(run_greedy)
        out[f"b{B}_greedy_cps"] = round(B / g_ms, 1)
        oracle = jnp.asarray(np.asarray(g_toks))

        for p in periods:
            t_ms, r = measure(
                lambda p=p: speculative_generate_oracle_bl(
                    cfg, params, embeds, oracle, budget, 0, k=k,
                    wrong_period=p,
                )
            )
            toks, rounds = r
            exact = bool(np.array_equal(np.asarray(toks), np.asarray(g_toks)))
            rounds = int(np.asarray(rounds))
            out[f"b{B}_spec_p{p}_cps"] = round(B / t_ms, 1)
            out[f"b{B}_spec_p{p}_speedup"] = round(g_ms / t_ms, 3)
            out[f"b{B}_spec_p{p}_rounds"] = rounds
            out[f"b{B}_spec_p{p}_tok_per_round"] = round(
                (budget - 1) / max(rounds, 1), 2
            )
            out[f"b{B}_spec_p{p}_exact"] = exact
            # NOTE the oracle stream is a FIXED precomputed trajectory:
            # on bf16 chips the first near-tie argmax flip (see
            # diag_spec_exact.py) makes every later oracle proposal come
            # from a stale prefix, so acceptance cascades to ~1/round for
            # the rest of the decode — oracle cells UNDERSTATE real-draft
            # acceptance at long budgets; the self-draft cells re-draft
            # from the true prefix each round and do not cascade.

        if args.self_draft:
            # bf16 self-draft (draft == target, share_prefill): a real,
            # cascade-free draft paying FULL draft price — its tok/round
            # is the pure bf16 cross-forward acceptance rate; its speedup
            # is expected < 1 (k extra full-price steps/round), so read
            # it for acceptance, not throughput
            t_ms, r = measure(
                lambda: speculative_generate_bl(
                    cfg, params, cfg, params, embeds, embeds,
                    budget, 0, k=k, share_prefill=True,
                )
            )
            toks, rounds = r
            rounds = int(np.asarray(rounds))
            out[f"b{B}_bf16draft_speedup"] = round(g_ms / t_ms, 3)
            out[f"b{B}_bf16draft_rounds"] = rounds
            out[f"b{B}_bf16draft_tok_per_round"] = round(
                (budget - 1) / max(rounds, 1), 2
            )

        if draft_params is not None:
            t_ms, r = measure(
                lambda: speculative_generate_bl(
                    cfg, params, cfg, draft_params, embeds, embeds,
                    budget, 0, k=k, draft_prefill_params=params,
                    # the production config: the self-draft starts from
                    # the target's prefill cache (exact, halves the
                    # admission prefill)
                    share_prefill=True,
                )
            )
            toks, rounds = r
            rounds = int(np.asarray(rounds))
            out[f"b{B}_w4draft_cps"] = round(B / t_ms, 1)
            out[f"b{B}_w4draft_speedup"] = round(g_ms / t_ms, 3)
            out[f"b{B}_w4draft_rounds"] = rounds
            # mean accepted proposals per round, batch-aggregate
            out[f"b{B}_w4draft_tok_per_round"] = round(
                (budget - 1) / max(rounds, 1), 2
            )
            out[f"b{B}_w4draft_exact"] = bool(
                np.array_equal(np.asarray(toks), np.asarray(g_toks))
            )

        if args.bulk:
            from dmi_tpu.models import projector as proj
            from dmi_tpu.models.quant import quantize_llama
            from dmi_tpu.models.speculative import speculative_bulk_caption
            from dmi_tpu.streaming import StreamingCaptioner

            if draft_params is None:
                draft_params = quantize_llama(params, bits=4)
            mm_dim = 64
            pspec = proj.ProjectorSpec(mm_dim=mm_dim, lm_dim=cfg.hidden_size,
                                       n_layers=2, dropout=0.0)
            pparams = proj.init(jax.random.key(1), pspec)
            # same prompt length as the batch legs: soft token + T-1 prefix
            prefix_np = rng.integers(
                1, cfg.vocab_size - 1, size=(T - 1,)
            ).astype(np.int32)
            N = 4 * B
            chunk = max(1, B // 4)
            q_embs = rng.normal(size=(N, mm_dim)).astype(np.float32)
            eng = StreamingCaptioner(
                cfg, params, pspec, pparams, prefix_np, budget, 0,
                pool=max(2, B), admit=chunk,
            )
            pb_ms, _ = measure(lambda: eng.run_bulk(q_embs))
            out[f"b{B}_bulk_plain_cps"] = round(N / pb_ms, 1)

            Nq = chunk * (-(-N // chunk))
            q = np.zeros((Nq, mm_dim), np.float32)
            q[:N] = q_embs
            qj = jnp.asarray(q)
            prefix_chunk = jnp.tile(jnp.asarray(prefix_np)[None, :],
                                    (chunk, 1))
            sb_ms, r = measure(
                lambda: speculative_bulk_caption(
                    cfg, params, cfg, draft_params, pspec, pparams, qj,
                    prefix_chunk, jnp.asarray(N, jnp.int32), T, budget, 0,
                    chunk, max(2, B), k=k, draft_prefill_params=params,
                )
            )
            out[f"b{B}_bulk_spec_cps"] = round(N / sb_ms, 1)
            out[f"b{B}_bulk_spec_speedup"] = round(pb_ms / sb_ms, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
