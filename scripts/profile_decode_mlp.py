"""In-process chip A/B for the single-pass streamed decode-MLP kernel
(dmi_tpu/ops/pallas/decode_mlp, DMI_PALLAS_DECODE_MLP).

The decode loop's MLP carries ~84% of the per-step weight stream at the
1B shape, and the stream runs at 550-645 GB/s of 819 peak (BASELINE.md
binding-limit analysis) — this measures whether fusing the whole MLP
into one Pallas grid (every weight byte read once, intermediate resident
in VMEM) closes any of that gap end-to-end.

Method (CLAUDE.md: only same-process A/Bs are valid; env flags are read
at TRACE time, so each leg jits a FRESH wrapper around the decode
entry's unjitted body to force a retrace under its own flag):

  leg A  DMI_PALLAS_DECODE_MLP unset  -> production XLA MLP
  leg B  DMI_PALLAS_DECODE_MLP=1     -> Pallas streamed MLP
  legs run interleaved A B A B .. to cancel chip drift; token parity
  checked across legs (same weights, same prompt).

Usage: python scripts/profile_decode_mlp.py [--batch 256] [--new 22]
       [--iters 5] [--small]
Prints one JSON object.  Run with the host otherwise idle.
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--new", type=int, default=22)
    ap.add_argument("--prefix", type=int, default=32)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dmi_tpu.models import decode as dec
    from dmi_tpu.models import llama

    print("backend:", jax.default_backend(), flush=True)
    if args.small:
        cfg = llama.tiny_config(hidden_size=128, n_layers=2, n_heads=4,
                                n_kv=2, intermediate=256, vocab_size=512)
        args.batch, args.new, args.prefix, args.iters = 8, 8, 8, 2
    else:
        cfg = llama.llama32_1b()

    key = jax.random.PRNGKey(0)
    params = llama.fuse_projections(llama.init(key, cfg))
    B, T = args.batch, args.prefix
    embs = jax.random.normal(
        jax.random.fold_in(key, 1), (B, T, cfg.hidden_size), cfg.dtype
    ) * 0.1

    body = dec.greedy_generate_bl.__wrapped__
    statics = ("cfg", "max_new_tokens", "pad_token_id", "fused_head")

    def leg(flag_on):
        if flag_on:
            os.environ["DMI_PALLAS_DECODE_MLP"] = "1"
        else:
            os.environ.pop("DMI_PALLAS_DECODE_MLP", None)
        f = jax.jit(body, static_argnames=statics)
        toks = np.asarray(f(cfg, params, embs, args.new, 0))  # compile
        return f, toks

    f_off, toks_off = leg(False)
    f_on, toks_on = leg(True)
    parity = bool(np.array_equal(toks_off, toks_on))

    def run(f, flag_on):
        # the flag must match the trace so any lazy retrace (new donation
        # layout etc.) stays consistent
        if flag_on:
            os.environ["DMI_PALLAS_DECODE_MLP"] = "1"
        else:
            os.environ.pop("DMI_PALLAS_DECODE_MLP", None)
        t0 = time.perf_counter()
        np.asarray(f(cfg, params, embs, args.new, 0))
        return (time.perf_counter() - t0) * 1e3

    run(f_off, False), run(f_on, True)  # warm both
    t_off, t_on = [], []
    for _ in range(args.iters):  # interleave to cancel drift
        t_off.append(run(f_off, False))
        t_on.append(run(f_on, True))
    t_off.sort(), t_on.sort()
    m_off, m_on = t_off[len(t_off) // 2], t_on[len(t_on) // 2]
    print(json.dumps({
        "batch": B, "new": args.new, "prefix": T, "iters": args.iters,
        "xla_ms": round(m_off, 2), "pallas_ms": round(m_on, 2),
        "speedup": round(m_off / m_on, 4),
        "xla_cps": round(B / (m_off / 1e3), 1),
        "pallas_cps": round(B / (m_on / 1e3), 1),
        "token_parity": parity,
        "xla_iters": [round(t, 1) for t in t_off],
        "pallas_iters": [round(t, 1) for t in t_on],
    }), flush=True)


if __name__ == "__main__":
    main()
