#!/usr/bin/env bash
# Full-stack smoke: synthetic data -> all three training stages + the LoRA
# baseline -> results JSONs, entirely offline (test:tiny LM, CPU ok).
#
#   bash scripts/smoke.sh [workdir]
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="${1:-$(mktemp -d /tmp/dmi_smoke.XXXX)}"
mkdir -p "$WORK"
cd "$WORK"
echo "workdir: $WORK"

export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
# tiny-model smoke: CPU by default (the TPU relay's per-dispatch latency and
# wildly variable remote-compile times dwarf these runs); DMI_PLATFORM=axon,cpu
# opts back into the chip
export DMI_PLATFORM="${DMI_PLATFORM:-cpu}"
python -c "
from dmi_tpu.utils.platform import apply_platform_env; apply_platform_env()
from dmi_tpu.data.fetch import fetch_synthetic
fetch_synthetic('data', mm_dim=32)"

for cfg in \
  "v2:smoke_projector_sydney" \
  "v4:smoke_hypernet" \
  "v6:smoke_fewshot_candels" \
  "v3:smoke_lora_sydney"; do
  echo "=== $cfg ==="
  bash "$REPO/run.sh" "$REPO/configs/smoke/$cfg.json"
done

echo "=== artifacts ==="
ls outputs/
python - <<'EOF'
import glob, json
for f in sorted(glob.glob("outputs/*-results.json")):
    d = json.load(open(f))
    if "metrics" in d:
        enc, m = next(iter(d["metrics"].items()))
        print(f, "->", enc, {k: round(v, 3) for k, v in list(m.items())[:3]})
EOF
