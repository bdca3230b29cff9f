"""Continuous-batching engine throughput vs the batch captioner on chip.

Random weights never emit a single EOS id, so caption-length variety is
synthesized by declaring a large EOS SET: with |eos|/V per-step stop
probability the lengths are geometric (mean ~V/|eos|), which is the
regime the engine exists for — the batch path pays ~max(length) per
batch while the engine pays ~mean(length) per slot.

Two configurations:
  * eos-rich (mean length ~16 of a 22 budget): the realistic workload
  * eos-free (every caption runs the full budget): isolates the engine's
    per-slot machinery overhead vs the batch loop

Usage: python scripts/smoke_streaming_chip.py [--n 2048] [--small]
       [--baseline]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--pool", type=int, default=256)
    ap.add_argument("--admit", type=int, default=64)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--budget", type=int, default=22)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--baseline", action="store_true")
    ap.add_argument("--int8", default="", choices=["", "w8a8"])
    args = ap.parse_args()

    small = args.small or os.environ.get("DMI_SMOKE_SMALL") == "1"

    import jax
    import jax.numpy as jnp

    if small:
        jax.config.update("jax_platforms", "cpu")

    from dmi_tpu.models import llama, mmmodel
    from dmi_tpu.models import projector as proj
    from dmi_tpu.streaming import StreamingCaptioner

    if small:
        cfg = llama.tiny_config(vocab_size=256, hidden_size=64, n_layers=2,
                                n_heads=4, n_kv=2, intermediate=128)
        mm_dim = 32
        args.n, args.pool, args.admit, args.k, args.budget = 40, 8, 4, 3, 8
        eos_frac = 8
    else:
        cfg = llama.llama32_1b()
        mm_dim = 1024
        eos_frac = 16  # |eos| = V/16 -> mean caption length ~16 tokens

    rng = np.random.default_rng(0)
    llm_params = llama.fuse_projections(llama.init(jax.random.key(0), cfg))
    prefill_params = None
    if args.int8 == "w8a8":
        from dmi_tpu.models.quant import quantize_llama

        prefill_params = llm_params
        llm_params = quantize_llama(llm_params, native=True)
    pspec = proj.ProjectorSpec(mm_dim=mm_dim, lm_dim=cfg.hidden_size, n_layers=2)
    pparams = proj.init(jax.random.key(1), pspec)
    prefix = rng.integers(1, cfg.vocab_size, size=15).astype(np.int32)
    embs = rng.normal(size=(args.n, mm_dim)).astype(np.float32)

    # eos set: every vocab id divisible by eos_frac (static, spread out)
    eos_rich = tuple(range(eos_frac, cfg.vocab_size, eos_frac))  # skip 0 (pad)

    results = {}
    for tag, eos in [("eosrich", eos_rich), ("eosfree", ())]:
        c = dataclasses.replace(cfg, eos_token_ids=eos)

        # --- batch path -----------------------------------------------------
        prefix_ids = jnp.tile(jnp.asarray(prefix)[None, :], (args.pool, 1))

        def run_batch():
            toks = []
            for s in range(0, args.n, args.pool):
                chunk = embs[s : s + args.pool]
                if chunk.shape[0] < args.pool:
                    chunk = np.concatenate(
                        [chunk, np.zeros((args.pool - chunk.shape[0], mm_dim),
                                         np.float32)]
                    )
                soft = proj.apply(pspec, pparams, jnp.asarray(chunk), train=False)
                toks.append(np.asarray(mmmodel.caption_generate(
                    c, llm_params, soft, prefix_ids, args.budget, 0,
                    prefill_params=prefill_params,
                )))
            return np.concatenate(toks)[: args.n]

        run_batch()  # compile + warm
        t0 = time.perf_counter()
        batch_toks = run_batch()
        bt = time.perf_counter() - t0

        # --- fully-on-device bulk engine ------------------------------------
        def run_bulk():
            eng = StreamingCaptioner(c, llm_params, pspec, pparams, prefix,
                                     args.budget, 0, pool=args.pool,
                                     admit=args.admit, k_steps=args.k,
                                     prefill_params=prefill_params)
            return eng.run_bulk(embs), eng

        run_bulk()  # compile + warm
        t0 = time.perf_counter()
        bulk_toks, _ = run_bulk()
        kt = time.perf_counter() - t0
        results[f"{tag}_bulk_captions_per_s"] = round(args.n / kt, 1)

        # --- streaming engine ----------------------------------------------
        def run_stream():
            eng = StreamingCaptioner(c, llm_params, pspec, pparams, prefix,
                                     args.budget, 0, pool=args.pool,
                                     admit=args.admit, k_steps=args.k,
                                     prefill_params=prefill_params)
            return eng.run(embs), eng

        run_stream()  # compile + warm
        t0 = time.perf_counter()
        stream_toks, eng = run_stream()
        st = time.perf_counter() - t0

        # Exact token parity holds within one program (tests/test_streaming
        # .py, CPU) but NOT across separately compiled programs on TPU:
        # XLA may tile bf16 matmuls differently per program, and with
        # RANDOM weights the 128k-way argmax flips on single-bit logit
        # differences, which then chain.  Report the divergence instead
        # of asserting (real peaked-distribution weights are robust).
        row_match = (stream_toks == batch_toks).all(axis=1).mean()
        results[f"{tag}_row_token_match"] = round(float(row_match), 3)
        lengths = (batch_toks != 0).sum(axis=1)
        results[f"{tag}_mean_len"] = round(float(lengths.mean()), 1)
        results[f"{tag}_batch_captions_per_s"] = round(args.n / bt, 1)
        results[f"{tag}_stream_captions_per_s"] = round(args.n / st, 1)
        results[f"{tag}_speedup"] = round(bt / st, 3)
        results[f"{tag}_dispatches"] = eng.dispatches
        results[f"{tag}_bulk_speedup"] = round(
            results[f"{tag}_bulk_captions_per_s"]
            / results[f"{tag}_batch_captions_per_s"], 3)
        print(json.dumps({tag: results[f"{tag}_speedup"],
                          "bulk": results[f"{tag}_bulk_captions_per_s"],
                          "stream": results[f"{tag}_stream_captions_per_s"],
                          "batch": results[f"{tag}_batch_captions_per_s"]}),
              flush=True)

    print(json.dumps(results))
    if args.baseline:
        with open(osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                           "BASELINE.md"), "a") as f:
            f.write(
                f"\n- continuous-batching engine (chip, pool {args.pool}, "
                f"K={args.k}): eos-rich (mean len "
                f"{results['eosrich_mean_len']}) "
                f"{results['eosrich_stream_captions_per_s']} vs batch "
                f"{results['eosrich_batch_captions_per_s']} captions/s "
                f"({results['eosrich_speedup']}x host-loop, "
                f"{results['eosrich_bulk_speedup']}x on-device bulk); "
                f"eos-free overhead {results['eosfree_speedup']}x host-loop, "
                f"{results['eosfree_bulk_speedup']}x bulk\n"
            )


if __name__ == "__main__":
    main()
