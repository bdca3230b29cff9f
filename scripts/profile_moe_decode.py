"""MoE decode chip measurement (VERDICT r4 #8): a mixtral-shape sparse
model scaled to fit one chip's HBM, decoded through the production
batch-last loop, bf16 + W8A8 back-to-back in ONE process (the only valid
A/B on the drifting chip).

Shape: 8 experts, top-2, H=2048, I=4096, L=16, V=32000 (mixtral's layout
at ~0.4x width) — ~3.2B effective params, 6.4 GB bf16.  Dense evaluation
reads ALL experts' weights every step, so the decode loop's weight stream
is E/top_k = 4x the active-parameter stream; this run measures where that
binds vs the 1B dense ladder (BASELINE.md).

Usage: python scripts/profile_moe_decode.py [--batch 64] [--new 22]
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
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--small", action="store_true", help="tiny smoke shape")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dmi_tpu.models import decode as dec
    from dmi_tpu.models import llama
    from dmi_tpu.models.quant import quantize_llama

    print("backend:", jax.default_backend(), flush=True)
    if args.small:
        cfg = llama.tiny_mixtral_config(dtype=jnp.bfloat16)
    else:
        cfg = llama.LlamaConfig(
            vocab_size=32000,
            hidden_size=2048,
            intermediate_size=4096,
            num_hidden_layers=16,
            num_attention_heads=32,
            num_key_value_heads=8,
            head_dim=64,
            rope_theta=1e6,
            rope_scaling_factor=None,
            num_experts=8,
            num_experts_per_tok=2,
            moe_norm_topk=True,
            eos_token_ids=(2,),
            bos_token_id=1,
            dtype=jnp.bfloat16,
        )
    params = llama.init(jax.random.key(0), cfg)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print(f"params: {n_params/1e9:.2f}B ({2*n_params/1e9:.1f} GB bf16)", flush=True)

    B, T, NEW = args.batch, args.prefix, args.new
    emb = (
        jax.random.normal(jax.random.key(1), (B, T, cfg.hidden_size), jnp.float32)
        * 0.1
    )

    def measure(lp, pre, tag):
        def once():
            return np.asarray(
                dec.greedy_generate_bl(cfg, lp, emb, NEW, 0, prefill_params=pre)
            )

        t0 = time.time()
        once()
        print(f"{tag}: compile+first {time.time()-t0:.1f}s", flush=True)
        once()
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            once()
            times.append((time.perf_counter() - t0) * 1e3)
        times.sort()
        med = times[len(times) // 2]
        print(f"{tag}: median {med:.1f} ms -> {B / (med / 1e3):.1f} captions/s",
              flush=True)
        return med

    out = {"batch": B, "new": NEW, "prefix": T, "params_b": round(n_params / 1e9, 3)}
    med_bf = measure(params, None, "bf16")
    out["bf16_captions_per_sec"] = round(B / (med_bf / 1e3), 2)
    qp = quantize_llama(params, native=True)
    med_q = measure(qp, params, "w8a8")
    out["w8a8_captions_per_sec"] = round(B / (med_q / 1e3), 2)
    # drift control: re-measure bf16 last
    med_bf2 = measure(params, None, "bf16-recheck")
    out["bf16_recheck_captions_per_sec"] = round(B / (med_bf2 / 1e3), 2)

    # binding-limit context: bytes the dense-eval loop streams per step
    lay = params["layers"]
    expert_bytes = sum(
        int(np.prod(lay[k].shape)) * 2 for k in ("moe_w1", "moe_w3", "moe_w2")
    )
    other_bytes = sum(
        int(np.prod(v.shape)) * 2
        for k, v in lay.items()
        if k not in ("moe_w1", "moe_w3", "moe_w2")
    ) + int(np.prod(params["embed"].shape)) * 2
    out["stream_gb_per_step_bf16"] = round((expert_bytes + other_bytes) / 1e9, 3)
    out["expert_share"] = round(expert_bytes / (expert_bytes + other_bytes), 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
