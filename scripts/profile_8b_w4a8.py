"""8B-shape W4A8 decode row (VERDICT r4 #7): the 4x-weight-memory serving
option's actual use case — a body whose bf16 weights (~16 GB) do NOT fit
the chip, decoded from int4-packed loop weights (~4 GB + scales).

The tree is built layer-by-layer ON HOST (numpy RNG -> CPU-jax quantize)
and device_put piecewise, so no bf16 8B copy ever exists on the chip;
prefill runs the SAME packed weights (quality is irrelevant for a
throughput row; the W4A8 XLA-twin/pallas matmuls handle prefill shapes).
The embed stays int8 per-vocab-row like quantize_llama(bits=4).

Usage: python scripts/profile_8b_w4a8.py [--batch 64] [--new 22]
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
    cfg = llama.llama32_1b() if args.small else llama.llama31_8b()
    L, H = cfg.num_hidden_layers, cfg.hidden_size
    nh, nkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                   cfg.head_dim)
    I, V = cfg.intermediate_size, cfg.vocab_size

    cpu = jax.devices("cpu")[0]
    rng = np.random.default_rng(0)

    def dev_w4(shape):
        """Random bf16-scale weight -> packed int4 dict, quantized on the
        host CPU device, then transferred (never bf16 on the chip)."""
        w = (rng.standard_normal(shape, dtype=np.float32) * 0.02)
        with jax.default_device(cpu):
            q = quantize_tensor_int4(jnp.asarray(w))
        return jax.tree.map(jax.device_put, q)

    def dev_norm(shape):
        return jax.device_put(jnp.ones(shape, cfg.dtype))

    t0 = time.time()
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
    params = {
        "layers": layers,
        "embed": jax.tree.map(jax.device_put, embed),
        "final_norm": dev_norm((H,)),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dev_w4((H, V))
    n_bytes = sum(
        x.nbytes for x in jax.tree.leaves(params)
    )
    print(f"packed tree built+transferred {time.time()-t0:.1f}s, "
          f"{n_bytes/1e9:.2f} GB on device", flush=True)

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
    out = {
        "metric": "decode_captions_per_sec_per_chip_8b_w4a8",
        "batch": B, "new": NEW, "prefix": T,
        "median_ms": round(med, 1),
        "captions_per_sec": round(B / (med / 1e3), 2),
        "packed_gb": round(n_bytes / 1e9, 2),
        "iter_ms": [round(t, 1) for t in times],
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
