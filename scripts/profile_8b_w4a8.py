"""8B-shape W4A8 decode row (VERDICT r4 #7): the 4x-weight-memory serving
option's actual use case — a body whose bf16 weights (~16 GB) do NOT fit
the chip, decoded from int4-packed loop weights (~4 GB + scales).

The tree is synthesized ON DEVICE by default (jitted normal -> int4
quantize per stacked leaf, f32 temp is one layer at a time), so no bf16
8B copy ever exists anywhere and — critically on the axon relay — no
multi-GB host->device transfer either: the 2026-08-19 host-build run
measured 105–205 s PER DECODE ITER (~0.5 captions/s), consistent with
the relay re-streaming host-mirrored device_put buffers at the ~40 MB/s
host link on every dispatch; the on-device build pins the packed tree
chip-resident.  --host-build keeps the old path for A/B'ing that relay
behavior.  Prefill runs the SAME packed weights (quality is irrelevant
for a throughput row; the W4A8 XLA-twin/pallas matmuls handle prefill
shapes).  The embed stays int8 per-vocab-row like quantize_llama(bits=4).

--spec adds the speculative leg for the regime BASELINE.md's round-5
write-off points at (big target + genuinely small draft): the 8B W4A8
target with a 1B W4A8 draft (~0.29 GB/step stream vs the target's
~4.3 GB).  Cells: oracle p0 (cascade-poisoned ceiling), oracle p1
(verify-cost floor: 1/speedup = verify forward in plain-step units),
and the REAL 1B draft (random-init, so acceptance ~1 t/r — reads as the
full-pipeline cost floor; 1/speedup = verify + k draft steps in
plain-step units).  Breakeven acceptance = that round cost in tokens.

Usage: python scripts/profile_8b_w4a8.py [--batch 64] [--new 22] [--spec]
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--new", type=int, default=22)
    ap.add_argument("--prefix", type=int, default=32)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--small", action="store_true", help="1B shape smoke")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny-config CPU smoke (code-path check only)")
    ap.add_argument("--spec", action="store_true",
                    help="add the 8B-target/1B-draft speculative leg")
    ap.add_argument("--forced", action="store_true",
                    help="add the controlled-acceptance full-cost sweep "
                         "(speculative_generate_forced_bl): both models run "
                         "their real forwards; wrong_period sets acceptance "
                         "exactly, cascade-free — the measured speedup IS "
                         "the full-pipeline wall-clock at that acceptance")
    ap.add_argument("--wps", default="0,7,3,2,1",
                    help="wrong_period cells for --forced (0 = full "
                         "acceptance; at budget 22/k 4 the cells give "
                         "t/r = 4.2, 3.5, 3.0, 1.9, 1.0)")
    ap.add_argument("--host-build", action="store_true",
                    help="build the tree on host + device_put (the relay "
                         "re-streams these buffers per dispatch; see module "
                         "docstring)")
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dmi_tpu.models import decode as dec
    from dmi_tpu.models import llama
    from dmi_tpu.models.quant import quantize_embed_tensor, quantize_tensor_int4

    print("backend:", jax.default_backend(), flush=True)
    if args.tiny:
        cfg = llama.tiny_config(hidden_size=128, n_layers=2, n_heads=4,
                                n_kv=2, intermediate=256, vocab_size=512,
                                dtype=jnp.float32)
    else:
        cfg = llama.llama32_1b() if args.small else llama.llama31_8b()

    cpu = jax.devices("cpu")[0]
    rng = np.random.default_rng(0)

    def build_w4_tree_ondevice(c, seed):
        """Synthesize the packed W4A8 tree directly on the default device:
        per stacked leaf, one jitted lax.map draws a layer's f32 normal
        (transient, ~235 MB at 8B MLP shape) and int4-quantizes it, so
        only the packed bytes + scales persist and nothing crosses the
        host link."""
        from jax import random as jrand

        L, H = c.num_hidden_layers, c.hidden_size
        nh, nkv, hd = (c.num_attention_heads, c.num_key_value_heads,
                       c.head_dim)
        I, V = c.intermediate_size, c.vocab_size
        root = jrand.PRNGKey(seed)
        counter = [0]

        def next_key():
            counter[0] += 1
            return jrand.fold_in(root, counter[0])

        def dev_w4(shape):
            per_layer = shape[1:] if len(shape) == 3 else shape

            def one(k):
                w = jrand.normal(k, per_layer, jnp.float32) * 0.02
                return quantize_tensor_int4(w)

            if len(shape) == 3:
                fn = jax.jit(lambda ks: jax.lax.map(one, ks))
                return fn(jrand.split(next_key(), shape[0]))
            return jax.jit(one)(next_key())

        def dev_embed():
            def gen(k):
                q = jrand.randint(k, (V, H), -127, 128, jnp.int8)
                s = jnp.full((V, 1), 2e-4, jnp.float32)
                return {"q8": q, "s": s}

            return jax.jit(gen)(next_key())

        def dev_norm(shape):
            return jnp.ones(shape, c.dtype)

        layers = {
            "wq": dev_w4((L, H, nh * hd)),
            "wk": dev_w4((L, H, nkv * hd)),
            "wv": dev_w4((L, H, nkv * hd)),
            "wo": dev_w4((L, nh * hd, H)),
            "w_gate": dev_w4((L, H, I)),
            "w_up": dev_w4((L, H, I)),
            "w_down": dev_w4((L, I, H)),
            "ln_attn": dev_norm((L, H)),
            "ln_mlp": dev_norm((L, H)),
        }
        p = {"layers": layers, "embed": dev_embed(),
             "final_norm": dev_norm((H,))}
        if not c.tie_word_embeddings:
            p["lm_head"] = dev_w4((H, V))
        jax.block_until_ready(p)
        return p

    def build_w4_tree(c):
        """Random W4A8 packed tree for config c, quantized on the host
        CPU device and device_put piecewise (never bf16 on the chip)."""
        L, H = c.num_hidden_layers, c.hidden_size
        nh, nkv, hd = (c.num_attention_heads, c.num_key_value_heads,
                       c.head_dim)
        I, V = c.intermediate_size, c.vocab_size

        def dev_w4(shape):
            w = (rng.standard_normal(shape, dtype=np.float32) * 0.02)
            with jax.default_device(cpu):
                q = quantize_tensor_int4(jnp.asarray(w))
            return jax.tree.map(jax.device_put, q)

        def dev_norm(shape):
            return jax.device_put(jnp.ones(shape, c.dtype))

        layers = {
            "wq": dev_w4((L, H, nh * hd)),
            "wk": dev_w4((L, H, nkv * hd)),
            "wv": dev_w4((L, H, nkv * hd)),
            "wo": dev_w4((L, nh * hd, H)),
            "w_gate": dev_w4((L, H, I)),
            "w_up": dev_w4((L, H, I)),
            "w_down": dev_w4((L, I, H)),
            "ln_attn": dev_norm((L, H)),
            "ln_mlp": dev_norm((L, H)),
        }
        emb = (rng.standard_normal((V, H), dtype=np.float32) * 0.02)
        with jax.default_device(cpu):
            embed = quantize_embed_tensor(jnp.asarray(emb), native=True)
        p = {
            "layers": layers,
            "embed": jax.tree.map(jax.device_put, embed),
            "final_norm": dev_norm((H,)),
        }
        if not c.tie_word_embeddings:
            p["lm_head"] = dev_w4((H, V))
        return p

    build = build_w4_tree if args.host_build else (
        lambda c: build_w4_tree_ondevice(c, seed=0))
    t0 = time.time()
    params = build(cfg)
    n_bytes = sum(
        x.nbytes for x in jax.tree.leaves(params)
    )
    print(f"packed tree built+transferred {time.time()-t0:.1f}s, "
          f"{n_bytes/1e9:.2f} GB on device", flush=True)
    H = cfg.hidden_size

    B, T, NEW = args.batch, args.prefix, args.new
    embs = jnp.asarray(
        rng.standard_normal((B, T, H), dtype=np.float32) * 0.1
    )

    def once():
        return np.asarray(dec.greedy_generate_bl(cfg, params, embs, NEW, 0))

    t0 = time.time()
    once()
    print(f"compile+first {time.time()-t0:.1f}s", flush=True)
    once()
    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        once()
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    med = times[len(times) // 2]
    print(f"decode median {med:.1f} ms -> {B / (med / 1e3):.1f} captions/s",
          flush=True)
    out = {
        "metric": "decode_captions_per_sec_per_chip_8b_w4a8",
        "batch": B, "new": NEW, "prefix": T,
        "median_ms": round(med, 1),
        "captions_per_sec": round(B / (med / 1e3), 2),
        "packed_gb": round(n_bytes / 1e9, 2),
        "iter_ms": [round(t, 1) for t in times],
    }

    if args.spec:
        from dmi_tpu.models.speculative import (
            speculative_generate_bl,
            speculative_generate_oracle_bl,
        )

        k = args.k
        out["k"] = k
        g_toks = jnp.asarray(
            np.asarray(dec.greedy_generate_bl(cfg, params, embs, NEW, 0))
        )

        def measure(fn):
            r = jax.tree.map(np.asarray, fn())  # compile + first
            ts = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                r = jax.tree.map(np.asarray, fn())
                ts.append((time.perf_counter() - t0) * 1e3)
            ts.sort()
            return ts[len(ts) // 2], r

        for name, wp in (("p0", 0), ("p1", 1)):
            t_ms, (toks, rounds) = measure(
                lambda wp=wp: speculative_generate_oracle_bl(
                    cfg, params, embs, g_toks, NEW, 0, k=k, wrong_period=wp,
                )
            )
            rounds = int(rounds)
            out[f"spec_{name}_speedup"] = round(med / t_ms, 3)
            out[f"spec_{name}_rounds"] = rounds
            out[f"spec_{name}_tok_per_round"] = round(
                (NEW - 1) / max(rounds, 1), 2
            )

        # the real small draft: a 1B W4A8 tree (~1.0 GB packed stream vs
        # the target's ~4.3 GB).  Random-init, so cross-model acceptance
        # is ~0 and the cell reads as the FULL-PIPELINE COST FLOOR:
        # 1/speedup = (verify + k draft steps) in plain-step units, and
        # breakeven acceptance = that many tokens/round.
        if args.tiny:
            dcfg = llama.tiny_config(hidden_size=64, n_layers=1, n_heads=2,
                                     n_kv=1, intermediate=128,
                                     vocab_size=512, dtype=jnp.float32)
        else:
            dcfg = llama.llama32_1b()
        t0 = time.time()
        dparams = build(dcfg)
        d_bytes = sum(x.nbytes for x in jax.tree.leaves(dparams))
        print(f"draft tree built+transferred {time.time()-t0:.1f}s, "
              f"{d_bytes/1e9:.2f} GB on device", flush=True)
        dembs = jnp.asarray(
            rng.standard_normal((B, T, dcfg.hidden_size), dtype=np.float32)
            * 0.1
        )
        t_ms, (toks, rounds) = measure(
            lambda: speculative_generate_bl(
                cfg, params, dcfg, dparams, embs, dembs, NEW, 0, k=k,
            )
        )
        rounds = int(rounds)
        out["spec_1bdraft_speedup"] = round(med / t_ms, 3)
        out["spec_1bdraft_rounds"] = rounds
        out["spec_1bdraft_tok_per_round"] = round(
            (NEW - 1) / max(rounds, 1), 2
        )
        # per-round cost in plain-step units -> tokens/round needed to tie
        out["spec_1bdraft_breakeven_tpr"] = round(
            (t_ms / max(rounds, 1)) / (med / (NEW - 1)), 2
        )
        out["draft_packed_gb"] = round(d_bytes / 1e9, 2)

    if args.forced:
        from dmi_tpu.models.speculative import speculative_generate_forced_bl

        k = args.k
        out["k"] = k
        if args.tiny:
            dcfg = llama.tiny_config(hidden_size=64, n_layers=1, n_heads=2,
                                     n_kv=1, intermediate=128,
                                     vocab_size=512, dtype=jnp.float32)
        else:
            dcfg = llama.llama32_1b()
        if "draft_packed_gb" not in out:
            t0 = time.time()
            dparams = build(dcfg)
            d_bytes = sum(x.nbytes for x in jax.tree.leaves(dparams))
            print(f"draft tree built+transferred {time.time()-t0:.1f}s, "
                  f"{d_bytes/1e9:.2f} GB on device", flush=True)
            out["draft_packed_gb"] = round(d_bytes / 1e9, 2)
            dembs = jnp.asarray(
                rng.standard_normal((B, T, dcfg.hidden_size),
                                    dtype=np.float32) * 0.1
            )

        def measure_forced(wp):
            def call():
                return speculative_generate_forced_bl(
                    cfg, params, dcfg, dparams, embs, dembs, NEW, 0,
                    jnp.int32(wp), k=k,
                )
            toks, rounds = jax.tree.map(np.asarray, call())  # warm
            ts = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                toks, rounds = jax.tree.map(np.asarray, call())
                ts.append((time.perf_counter() - t0) * 1e3)
            ts.sort()
            return ts[len(ts) // 2], int(rounds)

        cells = []
        t0 = time.time()
        for wp in (int(x) for x in args.wps.split(",")):
            t_ms, rounds = measure_forced(wp)
            tpr = round((NEW - 1) / max(rounds, 1), 2)
            cell = {
                "wp": wp,
                "tok_per_round": tpr,
                "rounds": rounds,
                "median_ms": round(t_ms, 1),
                "speedup": round(med / t_ms, 3),
            }
            cells.append(cell)
            print(f"forced wp={wp}: t/r {tpr} rounds {rounds} "
                  f"{t_ms:.1f} ms -> {cell['speedup']}x "
                  f"({time.time()-t0:.0f}s elapsed)", flush=True)
        out["forced_cells"] = cells

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
