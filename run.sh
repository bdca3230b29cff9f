#!/usr/bin/env bash
# Experiment pipeline driver (reference: dmi/run.sh) — routes a config to
# the right training CLI by its contents (hypernet configs carry hn_*,
# LoRA configs carry lora_rank), so any directory layout works:
#
#   ./run.sh configs/experiments/projector/v1:....json     # stage 1: projector pretrain
#   ./run.sh configs/experiments/hypernet/v4:....json      # stage 2: hypernet training
#   ./run.sh configs/experiments/hypernet/v6:....json      # stage 3: few-shot sweeps
#   ./run.sh configs/experiments/lora/v3:....json          # LoRA baseline
set -euo pipefail

if [[ $# -lt 1 ]]; then
  echo "usage: $0 <config.json>  (see configs/smoke/ for runnable examples)" >&2
  exit 2
fi
CONFIG="$1"
if grep -q '"hn_arch"\|"finetune_generated_projector"' "$CONFIG"; then
  exec python -u -m dmi_tpu.train_hypernet "$CONFIG"
elif grep -q '"lora_rank"\|"lora_alpha"' "$CONFIG"; then
  exec python -u -m dmi_tpu.train_lora "$CONFIG"
else
  exec python -u -m dmi_tpu.train_projector "$CONFIG"
fi
