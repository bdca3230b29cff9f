"""Decode-step microprofiler by ablation.

The axon relay exposes no usable jax.profiler trace, so the binding
constraint of the KV-cache decode loop (dmi_tpu/models/decode.py) is
located by timing ablated variants of the same while_loop on hardware:
each variant removes one component of the step body (head matmul,
attention math, MLP matmuls, QKV/O matmuls) while keeping the loop
structure, cache threading, and shapes identical.

Also measures the raw floors the step competes against:
  * weight-stream floor: one pass that reads every weight byte (sum)
  * head-matmul-alone cost at the decode batch

Every dispatch is forced to completion with a host transfer
(np.asarray) because block_until_ready returns early on the relay.

Usage:  python scripts/profile_decode.py [--batch 256] [--steps 22]
        [--small]   (tiny model, CPU smoke)
Prints one JSON dict of median milliseconds per variant.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os.path as osp
import statistics
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def timeit(fn, n=7, warmup=2):
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        times.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(times), times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=22)
    ap.add_argument("--prefix", type=int, default=16)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--fused", type=int, default=1)
    ap.add_argument("--iters", type=int, default=7)
    ap.add_argument("--quant", type=int, default=0,
                    help="also time q/w8a8 quantized batch-last full decode")
    ap.add_argument("--bf", type=int, default=1,
                    help="0 skips the batch-first ablation loops")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.small:
        jax.config.update("jax_platforms", "cpu")

    from dmi_tpu.models import decode, llama

    if args.small:
        cfg = llama.tiny_config(vocab_size=512, hidden_size=128, n_layers=4,
                                n_heads=8, n_kv=4, intermediate=256)
    else:
        cfg = llama.llama32_1b()
    cfg = dataclasses.replace(cfg, eos_token_ids=())

    B, T, NEW = args.batch, args.prefix, args.steps
    params = llama.init(jax.random.key(0), cfg)
    if args.fused:
        params = llama.fuse_projections(params)
    if cfg.tie_word_embeddings:
        params = {**params, "head": params["embed"].T}

    rng = np.random.default_rng(0)
    inputs = jnp.asarray(
        rng.normal(size=(B, T, cfg.hidden_size)).astype(np.float32), cfg.dtype
    )

    results = {}

    # --- full greedy decode (the bench path) --------------------------------
    def full():
        toks = decode.greedy_generate(cfg, params, inputs, NEW, 0)
        return np.asarray(toks)

    results["full_decode_ms"], _ = timeit(full, args.iters)

    # --- batch-last decode (decode.greedy_generate_bl) -----------------------
    def full_bl():
        toks = decode.greedy_generate_bl(cfg, params, inputs, NEW, 0)
        return np.asarray(toks)

    results["full_decode_bl_ms"], _ = timeit(full_bl, args.iters)

    # --- batch-last decode, quantized weights (in-process A/B vs bf16) ------
    if args.quant:
        from dmi_tpu.models.quant import quantize_llama

        params_noh = {k: v for k, v in params.items() if k != "head"}
        for qname, native in [("q", False), ("w8a8", True)]:
            qp = quantize_llama(params_noh, native=native)

            def full_bl_q(qp=qp):
                toks = decode.greedy_generate_bl(cfg, qp, inputs, NEW, 0)
                return np.asarray(toks)

            results[f"full_decode_bl_{qname}_ms"], _ = timeit(full_bl_q, args.iters)

    # --- prefill only -------------------------------------------------------
    @partial(jax.jit, static_argnames=("cfg", "total"))
    def _prefill(cfg, params, inputs, total):
        caches = decode.init_cache(cfg, inputs.shape[0], total)
        logits, _ = decode.prefill(cfg, params, inputs, caches)
        return logits

    def prefill_only():
        # fetch a tiny slice: np.asarray of the full [B, V] logits would move
        # ~131 MB through the ~40 MB/s relay and dominate the measurement
        return np.asarray(_prefill(cfg, params, inputs, T + NEW)[:, :8])

    results["prefill_ms"], _ = timeit(prefill_only, args.iters)

    # --- ablated step loops --------------------------------------------------
    # Each variant runs NEW iterations of a while_loop whose body mirrors
    # greedy_generate's, with one component disabled via the `ablate` flag.
    def run_layers_ablated(ablate, cfg, params, x, cos, sin, bias, caches, idx):
        k_cache, v_cache = caches
        nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

        def body(carry, xs):
            h_in = carry
            lw, kc, vc = xs
            B_, T_, H = h_in.shape
            h = llama.rms_norm(h_in, lw["ln_attn"], cfg.rms_norm_eps)
            if ablate == "no_qkvo":
                x2 = h_in
                kc2, vc2 = kc, vc
            else:
                if "w_qkv" in lw:
                    qkv = h @ lw["w_qkv"]
                    q, k, v = jnp.split(qkv, [nh * hd, nh * hd + nkv * hd], axis=-1)
                else:
                    q, k, v = h @ lw["wq"], h @ lw["wk"], h @ lw["wv"]
                q = q.reshape(B_, T_, nh, hd).transpose(0, 2, 1, 3)
                k = k.reshape(B_, T_, nkv, hd).transpose(0, 2, 1, 3)
                v = v.reshape(B_, T_, nkv, hd).transpose(0, 2, 1, 3)
                q = llama.apply_rope(q, cos, sin)
                k = llama.apply_rope(k, cos, sin)
                kc2 = jax.lax.dynamic_update_slice_in_dim(kc, k, idx, axis=2)
                vc2 = jax.lax.dynamic_update_slice_in_dim(vc, v, idx, axis=2)
                if ablate == "no_attn":
                    # skip QK^T/softmax/PV: use v broadcast over head groups
                    attn = jnp.repeat(v, nh // nkv, axis=1)
                elif ablate == "mxu_attn":
                    attn = llama._attention(q, kc2, vc2, bias)
                elif ablate == "vpu_attn":
                    attn = llama._decode_attention(q, kc2, vc2, bias)
                elif ablate == "pallas_attn":
                    from dmi_tpu.ops.pallas import decode_attn as _dk

                    nb_ = _dk._pick_block(
                        q.shape[0] * kc2.shape[1], nh // nkv, kc2.shape[2], hd
                    )
                    attn = _dk._decode_attn_pallas(q, kc2, vc2, bias, nb_)
                else:
                    attn = llama._decode_attention_blockdiag(q, kc2, vc2, bias)
                attn = attn.transpose(0, 2, 1, 3).reshape(B_, T_, nh * hd)
                x2 = h_in + attn @ lw["wo"]
            if ablate == "no_mlp":
                out = x2
            else:
                h2 = llama.rms_norm(x2, lw["ln_mlp"], cfg.rms_norm_eps)
                if "w_gu" in lw:
                    gu = h2 @ lw["w_gu"]
                    gate, up = jnp.split(gu, 2, axis=-1)
                    out = x2 + (jax.nn.silu(gate) * up) @ lw["w_down"]
                else:
                    gate = jax.nn.silu(h2 @ lw["w_gate"])
                    out = x2 + (gate * (h2 @ lw["w_up"])) @ lw["w_down"]
            return out, (kc2, vc2)

        x, (k_cache, v_cache) = jax.lax.scan(body, x, (params["layers"], k_cache, v_cache))
        x = llama.rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        if ablate == "no_head":
            # cheap stand-in logits with the right shape dependencies
            logits = jnp.broadcast_to(
                x.sum(-1, keepdims=True), (x.shape[0], x.shape[1], cfg.vocab_size)
            )
        else:
            logits = llama._head_matmul(x, params, cfg)
        return logits, (k_cache, v_cache)

    @partial(jax.jit, static_argnames=("cfg", "new", "ablate"))
    def ablated_loop(cfg, params, inputs, new, ablate):
        Bq, Tq, _ = inputs.shape
        total = Tq + new
        caches = decode.init_cache(cfg, Bq, total)
        logits, caches = decode.prefill(cfg, params, inputs, caches)
        tokens0 = jnp.full((Bq, new), 0, jnp.int32)

        def cond(state):
            return state[0] < new

        def body(state):
            step, logits, caches, tokens = state
            next_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            tokens = jax.lax.dynamic_update_slice(tokens, next_tok[:, None], (0, step))
            embeds = llama.embed_tokens(cfg, params, next_tok)[:, None, :]
            S = caches[0].shape[3]
            posx = Tq + step
            cos, sin = llama.rope_tables(cfg, posx[None] if hasattr(posx, "shape") else jnp.asarray([posx]))
            valid = (jnp.arange(S) <= posx)[None, None, :]
            bias = jnp.where(valid, 0.0, jnp.finfo(jnp.float32).min)
            bias = jnp.broadcast_to(bias, (Bq, 1, S))
            logits3, caches = run_layers_ablated(
                ablate, cfg, params, embeds.astype(cfg.dtype), cos, sin, bias, caches, posx
            )
            return step + 1, logits3[:, 0, :], caches, tokens

        _, _, _, tokens = jax.lax.while_loop(cond, body, (0, logits, caches, tokens0))
        return tokens

    import os

    variants = ["none", "vpu_attn", "mxu_attn", "no_head", "no_attn", "no_mlp", "no_qkvo"]
    if os.environ.get("DMI_PROFILE_PALLAS_ATTN") == "1" and not args.small:
        variants.insert(1, "pallas_attn")
    if not args.bf:
        variants = []
    for ablate in variants:
        def run(ab=ablate):
            return np.asarray(ablated_loop(cfg, params, inputs, NEW, ab))

        results[f"loop_{ablate}_ms"], _ = timeit(run, args.iters)

    # --- ablated BATCH-LAST step loops ---------------------------------------
    # mirrors decode._decode_step_bl with one component disabled; shares
    # decode.py's helpers so layout/fusion behavior matches production.
    from dmi_tpu.models.decode import (
        _decode_attention_bl,
        _mm_bl,
        _rms_norm_bl,
        _rope_bl,
    )

    def bl_step_ablated(ablate, cfg, params, h, caches, pos, bias):
        k_cache, v_cache = caches
        nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
        g = nh // nkv
        Bq = h.shape[1]
        cos, sin = llama.rope_tables(cfg, pos)

        def body(carry, xs):
            x, kcache, vcache = carry
            lw, li = xs
            hn = (x if ablate == "no_norm_rope"
                  else _rms_norm_bl(x, lw["ln_attn"], cfg.rms_norm_eps))
            if ablate == "no_qkvo":
                x2, kcache2, vcache2 = x, kcache, vcache
            else:
                if "w_qkv" in lw:
                    qkv = _mm_bl(lw["w_qkv"], hn)
                    q, k, v = jnp.split(qkv, [nh * hd, nh * hd + nkv * hd], axis=0)
                else:
                    q = _mm_bl(lw["wq"], hn)
                    k = _mm_bl(lw["wk"], hn)
                    v = _mm_bl(lw["wv"], hn)
                if ablate == "no_norm_rope":
                    q = q.reshape(nkv, g, hd, Bq)
                    k = k.reshape(nkv, hd, Bq)
                else:
                    q = _rope_bl(q.reshape(nkv, g, hd, Bq), cos, sin)
                    k = _rope_bl(k.reshape(nkv, hd, Bq), cos, sin)
                v = v.reshape(nkv, hd, Bq)
                if ablate == "no_cache_update":
                    kcache2, vcache2 = kcache, vcache
                else:
                    kcache2 = jax.lax.dynamic_update_slice(
                        kcache, k[None, :, None, :, :], (li, 0, pos, 0, 0)
                    )
                    vcache2 = jax.lax.dynamic_update_slice(
                        vcache, v[None, :, None, :, :], (li, 0, pos, 0, 0)
                    )
                if ablate == "no_attn":
                    attn = jnp.broadcast_to(v[:, None], (nkv, g, hd, Bq))
                else:
                    kc = jax.lax.dynamic_slice(
                        kcache2, (li, 0, 0, 0, 0), (1, nkv, kcache2.shape[2], hd, Bq)
                    )[0]
                    vc = jax.lax.dynamic_slice(
                        vcache2, (li, 0, 0, 0, 0), (1, nkv, vcache2.shape[2], hd, Bq)
                    )[0]
                    attn = _decode_attention_bl(q, kc, vc, bias)
                x2 = x + _mm_bl(lw["wo"], attn.reshape(nh * hd, Bq))
            if ablate == "no_mlp":
                out = x2
            else:
                hn = (x2 if ablate == "no_norm_rope"
                      else _rms_norm_bl(x2, lw["ln_mlp"], cfg.rms_norm_eps))
                if "w_gu" in lw:
                    gu = _mm_bl(lw["w_gu"], hn)
                    gate, up = jnp.split(gu, 2, axis=0)
                    out = x2 + _mm_bl(lw["w_down"], jax.nn.silu(gate) * up)
                else:
                    gate = jax.nn.silu(_mm_bl(lw["w_gate"], hn))
                    out = x2 + _mm_bl(lw["w_down"], gate * _mm_bl(lw["w_up"], hn))
            return (out, kcache2, vcache2), None

        L = k_cache.shape[0]
        (h, k_cache, v_cache), _ = jax.lax.scan(
            body, (h, k_cache, v_cache), (params["layers"], jnp.arange(L))
        )
        h = _rms_norm_bl(h, params["final_norm"], cfg.rms_norm_eps)
        if ablate == "no_head":
            logits = jnp.broadcast_to(
                h.sum(0, keepdims=True), (cfg.vocab_size, h.shape[1])
            )
        else:
            embed = params["embed"]
            if cfg.tie_word_embeddings and not (
                isinstance(embed, dict) and "q" in embed
            ):
                logits = jax.lax.dot_general(embed, h, (((1,), (0,)), ((), ())))
            else:
                logits = _mm_bl(params.get("lm_head", embed), h)
        return logits, (k_cache, v_cache)

    @partial(jax.jit, static_argnames=("cfg", "new", "ablate"))
    def bl_ablated_loop(cfg, params, inputs, new, ablate):
        Bq, Tq, _ = inputs.shape
        total = Tq + new
        caches = decode.init_cache(cfg, Bq, total)
        logits0, caches = decode.prefill(cfg, params, inputs, caches)
        k_cache = caches[0].transpose(0, 2, 3, 4, 1)
        v_cache = caches[1].transpose(0, 2, 3, 4, 1)
        logits = logits0.T
        tokens0 = jnp.full((Bq, new), 0, jnp.int32)
        key_pos = jnp.arange(total)

        def cond(state):
            return state[0] < new

        def body(state):
            step, logits, k_cache, v_cache, tokens = state
            if ablate == "fixed_token":
                # NOTE: tokens stop depending on logits, so XLA dead-code-
                # eliminates the entire model computation — this variant
                # measures the PURE while_loop + token-buffer machinery
                # floor (~0.4 ms/step on chip), NOT the argmax cost.  The
                # argmax itself is a full [V, B] read (~0.12 ms/step at
                # measured bandwidth) and cannot be ablated independently:
                # any replacement that keeps logits live reads them too.
                next_tok = jnp.full((logits.shape[1],), 7, jnp.int32)
            else:
                next_tok = jnp.argmax(logits, axis=0).astype(jnp.int32)
            tokens = jax.lax.dynamic_update_slice(tokens, next_tok[:, None], (0, step))
            h = llama.embed_tokens(cfg, params, next_tok).T.astype(cfg.dtype)
            pos = Tq + step
            bias = jnp.where(key_pos <= pos, 0.0, jnp.finfo(jnp.float32).min)
            logits, (k_cache, v_cache) = bl_step_ablated(
                ablate, cfg, params, h, (k_cache, v_cache), pos, bias
            )
            return step + 1, logits, k_cache, v_cache, tokens

        _, _, _, _, tokens = jax.lax.while_loop(
            cond, body, (0, logits, k_cache, v_cache, tokens0)
        )
        return tokens

    for ablate in ["none", "no_head", "no_attn", "no_mlp", "no_qkvo",
                   "no_norm_rope", "no_cache_update", "fixed_token"]:
        def run_bl(ab=ablate):
            return np.asarray(bl_ablated_loop(cfg, params, inputs, NEW, ab))

        results[f"bl_loop_{ablate}_ms"], _ = timeit(run_bl, args.iters)

    # --- floors --------------------------------------------------------------
    @partial(jax.jit, static_argnames=())
    def weight_stream(params):
        return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(params))

    def stream():
        return np.asarray(weight_stream(params))

    results["weight_stream_ms"], _ = timeit(stream, args.iters)

    x1 = jnp.asarray(rng.normal(size=(B, cfg.hidden_size)).astype(np.float32), cfg.dtype)

    @jax.jit
    def head_only(x, head):
        return x @ head

    def head():
        return np.asarray(head_only(x1, params["head"])[:, :8])

    results["head_matmul_ms"], _ = timeit(head, args.iters)

    nbytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
    results["weight_bytes_gb"] = round(nbytes / 1e9, 3)
    results["derived"] = {
        "decode_loop_ms": round(results["full_decode_ms"] - results["prefill_ms"], 2),
        "per_step_ms": round((results["full_decode_ms"] - results["prefill_ms"]) / NEW, 3),
        "weight_floor_per_step_ms": round(results["weight_stream_ms"], 3),
        "bl_head_share_ms": round(
            results["bl_loop_none_ms"] - results["bl_loop_no_head_ms"], 2
        ),
        "bl_attn_share_ms": round(
            results["bl_loop_none_ms"] - results["bl_loop_no_attn_ms"], 2
        ),
        "bl_mlp_share_ms": round(
            results["bl_loop_none_ms"] - results["bl_loop_no_mlp_ms"], 2
        ),
        "bl_norm_rope_share_ms": round(
            results["bl_loop_none_ms"] - results["bl_loop_no_norm_rope_ms"], 2
        ),
        "bl_cache_update_share_ms": round(
            results["bl_loop_none_ms"] - results["bl_loop_no_cache_update_ms"], 2
        ),
        "bl_loop_machinery_floor_ms": round(results["bl_loop_fixed_token_ms"], 2),
        "bl_qkvo_share_ms": round(
            results["bl_loop_none_ms"] - results["bl_loop_no_qkvo_ms"], 2
        ),
    }
    if "loop_none_ms" in results:
        results["derived"].update({
            "head_share_ms": round(results["loop_none_ms"] - results["loop_no_head_ms"], 2),
            "attn_share_ms": round(results["loop_none_ms"] - results["loop_no_attn_ms"], 2),
            "mlp_share_ms": round(results["loop_none_ms"] - results["loop_no_mlp_ms"], 2),
            "qkvo_share_ms": round(results["loop_none_ms"] - results["loop_no_qkvo_ms"], 2),
        })
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
