#!/bin/bash
# Round-4 chip work (run when the axon relay is healthy; poll first, keep
# the host otherwise idle — CLAUDE.md relay hazards):
#   1. the round-3 owed bench triple (bf16/w8a8/w4a8 in ONE process) —
#      validates the family-generalized decode tree on hardware
#   2. DMI_DECODE_LAYER_UNROLL A/B (promote on a clear same-process win,
#      else delete the knob)
#   3. 3B-scale decode proof (VERDICT r3 #9)
#   4. stage-2 grad-accum coalescing A/B (micro_batch_coalesce; expect
#      >= ~1.09x from the MXU-underfill attribution, BASELINE.md)
# Afterwards: record rows in BASELINE.md, set defaults, commit.
set -u
cd "$(dirname "$0")/.."

echo "== relay probe =="
timeout 180 python -u -c "
import time, numpy as np; t0=time.time()
import jax; jax.devices()
import jax.numpy as jnp
x = jnp.ones((8,8)) @ jnp.ones((8,8))
print('relay OK', np.asarray(x).sum(), f'{time.time()-t0:.1f}s')
" || { echo "relay DOWN — aborting"; exit 1; }

echo "== bench (full, default headline; triple companion) =="
timeout 3000 python bench.py | tee /tmp/bench_r4_check.json

echo "== layer-unroll A/B (w8a8) =="
timeout 3000 python scripts/profile_layer_unroll.py --unrolls 1,2,4 --modes w8a8 | tee /tmp/unroll_w8a8.json

echo "== layer-unroll A/B (bf16) =="
timeout 3000 python scripts/profile_layer_unroll.py --unrolls 1,4 --modes bf16 | tee /tmp/unroll_bf16.json

echo "== 3B decode proof (bf16 + companions, B=128) =="
timeout 3000 env DMI_BENCH_MODEL=3b python bench.py | tee /tmp/bench_3b.json

echo "== stage-2 coalesce A/B (k=5,8) =="
timeout 3000 python scripts/profile_coalesce.py --ks 5,8 | tee /tmp/coalesce.json

echo "== speculative verify-side ceiling (oracle draft) + w4a8 self-draft + bulk engine =="
timeout 3000 python scripts/profile_speculative.py --self-draft --bulk | tee /tmp/speculative.json

echo "done — record results in BASELINE.md and commit"
