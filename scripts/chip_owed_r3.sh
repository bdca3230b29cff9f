#!/bin/bash
# Owed round-3 chip work (run when the axon relay is healthy; see
# CLAUDE.md relay hazards — poll first, keep the host otherwise idle):
#   1. bench re-validation after the decoder-family generalization
#      (expected ~unchanged: the llama jaxpr is branch-identical, see
#      BASELINE.md "headline-neutrality argument"; history ~1288 bf16 /
#      ~1450 w8a8 captions/s at B=256, chip drift ±6% between processes —
#      only the in-process bf16/w8a8/w4a8 triple is a valid A/B)
#   2. DMI_DECODE_LAYER_UNROLL in-process A/B (scan unroll vs the
#      69-79%-of-HBM loop weight stream)
# Afterwards: record rows in BASELINE.md, decide the unroll default
# (promote only on a clear same-process win), commit.
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

echo "== bench (full, default headline) =="
timeout 3000 python bench.py | tee /tmp/bench_r3_check.json

echo "== layer-unroll A/B (w8a8) =="
timeout 3000 python scripts/profile_layer_unroll.py --unrolls 1,2,4 --modes w8a8 | tee /tmp/unroll_w8a8.json

echo "== layer-unroll A/B (bf16) =="
timeout 3000 python scripts/profile_layer_unroll.py --unrolls 1,4 --modes bf16 | tee /tmp/unroll_bf16.json

echo "done — record results in BASELINE.md and commit"
