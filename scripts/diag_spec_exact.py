"""Chip diagnostic: WHERE does the speculative verify forward disagree
with the plain step forward?  (Round-4 owed run: every spec cell on chip
reported exact:false with acceptance collapsed to ~1.0 tok/round even for
a perfect oracle — CPU bf16 reproduces NONE of this, so the divergence is
chip-specific.  This isolates it.)

Three measurements at a 1B llama shape in bf16 (small B, tiny fetches):

1. MACRO: plain greedy tokens vs oracle-spec tokens (oracle = the plain
   run's own output): rounds, mismatch fraction.
2. MICRO: ONE verify forward ([last, d1..dk], the oracle's round-0 call)
   vs k+1 plain step forwards from the same prefill state.  Per position:
   max |logit delta|, the step path's top1-top2 margin, argmax equality.
   - position 0 consumes the SAME token/state as the plain step: a large
     delta here = shape-dependent numerics (or a bug) inside one round.
   - positions 1..k tell whether divergence compounds across the round.
3. MARGINS: the distribution of step-path top-2 margins (if margins are
   ~the cross-path noise, random-weight acceptance is meaningless and the
   profiler needs margin-separated weights; if margins >> noise, the
   collapse is a real bug).

Usage: python scripts/diag_spec_exact.py [--b 8] [--t 32] [--new 12]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--t", type=int, default=32)
    ap.add_argument("--new", type=int, default=12)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--small", action="store_true",
                    help="512-wide bf16 model (CPU smoke)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dmi_tpu.models import decode as dec
    from dmi_tpu.models import llama
    from dmi_tpu.models import speculative as spec

    print("backend:", jax.default_backend(), flush=True)
    if args.small:
        cfg = llama.tiny_config(vocab_size=8192, hidden_size=512, n_layers=8,
                                n_heads=8, n_kv=4, intermediate=1024,
                                dtype=jnp.bfloat16)
    else:
        cfg = llama.llama32_1b()
    params = llama.init(jax.random.key(0), cfg)
    B, T, NEW, K = args.b, args.t, args.new, args.k
    PAD = 5 if args.small else 128004
    emb = (
        jax.random.normal(jax.random.key(1), (B, T, cfg.hidden_size), jnp.float32)
        * 0.1
    )

    # --- 1. macro -----------------------------------------------------
    t0 = time.time()
    plain = np.asarray(dec.greedy_generate_bl(cfg, params, emb, NEW, PAD))
    print(f"plain greedy done {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    toks, rounds = spec.speculative_generate_oracle_bl(
        cfg, params, emb, jnp.asarray(plain), NEW, PAD, k=K
    )
    toks = np.asarray(toks)
    print(f"oracle spec done {time.time()-t0:.1f}s", flush=True)
    print(
        f"MACRO: rounds={int(rounds)} (ideal ~{-(-(NEW-1)//(K+1))}, "
        f"no-accept={NEW-1}), token mismatch={float((toks != plain).mean()):.3f}",
        flush=True,
    )

    # --- 2+3. micro: one verify forward vs k+1 plain steps -------------
    total = T + NEW
    S = T + (K + 1) * (NEW - 1)

    @jax.jit
    def micro(params, emb, plain):
        caches = dec.init_cache(cfg, B, total)
        logits0, caches = dec.prefill(cfg, params, emb, caches)
        kv = jnp.stack(
            [caches[0].transpose(0, 2, 3, 4, 1), caches[1].transpose(0, 2, 3, 4, 1)],
            axis=1,
        )
        tok0 = jnp.argmax(logits0, axis=-1).astype(jnp.int32)
        key_pos = jnp.arange(total)

        # k+1 plain steps, collecting logits [k+1, V, B]
        def step(carry, i):
            kv, tok = carry
            h = llama.scale_embeds(
                cfg, llama.embed_tokens(cfg, params, tok).T.astype(cfg.dtype)
            )
            pos = T + i
            bias = jnp.where(key_pos <= pos, 0.0, jnp.finfo(jnp.float32).min)
            lg, kv = dec._decode_step_bl(cfg, params, h, kv, pos, bias)
            nxt = jnp.argmax(lg, axis=0).astype(jnp.int32)
            return (kv, nxt), lg

        (_, _), step_logits = jax.lax.scan(
            step, (kv, tok0), jnp.arange(K + 1)
        )
        return logits0, tok0, step_logits

    @jax.jit
    def micro_verify(params, emb, plain):
        # the spec engine's own setup + round-0 verify, verbatim internals
        core, eos, T_, max_rounds = spec._spec_setup(
            cfg, params, None, emb, NEW, PAD, K
        )
        props = plain[:, 1 : 1 + K].T.astype(jnp.int32)  # oracle: plain's tokens
        core2, v_logits = spec._verify_target(
            cfg, params, core, props, K, T_, False, T_
        )
        return v_logits  # [V, k+1, B]

    logits0, tok0, step_logits = jax.tree.map(
        np.asarray, micro(params, emb, jnp.asarray(plain))
    )
    v_logits = np.asarray(micro_verify(params, emb, jnp.asarray(plain)))

    # step i consumed token at output index i and produced logits for
    # output index i+1; verify position i consumed [last, d1..dk][i] ==
    # the same token stream (oracle props are the plain tokens).
    print("\nMICRO (per in-round position):", flush=True)
    for i in range(K + 1):
        sl = step_logits[i]  # [V, B]
        vl = v_logits[:, i, :]  # [V, B]
        d = np.abs(sl.astype(np.float32) - vl.astype(np.float32))
        srt = np.sort(sl.astype(np.float32), axis=0)
        margin = (srt[-1] - srt[-2]).astype(np.float32)  # [B]
        agree = float((np.argmax(sl, axis=0) == np.argmax(vl, axis=0)).mean())
        scale = float(np.abs(sl.astype(np.float32)).max())
        print(
            f"  pos {i}: max|dlogit|={d.max():.4f} (logit scale ~{scale:.2f}) "
            f"median_margin={np.median(margin):.4f} argmax_agree={agree:.2f}",
            flush=True,
        )
    # sanity: does the verify's pos-0 argmax reproduce the plain loop's
    # token 1 (it should, if acceptance works at all)?
    a0 = np.argmax(v_logits[:, 0, :], axis=0)
    print(
        f"\nverify pos0 argmax == plain token[1]: "
        f"{(a0 == plain[:, 1]).mean():.2f}",
        flush=True,
    )


if __name__ == "__main__":
    sys.exit(main())
