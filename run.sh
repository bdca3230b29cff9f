#!/usr/bin/env bash
# Experiment pipeline driver (reference: dmi/run.sh) — run the three-stage
# stack end to end against a config directory.
#
#   ./run.sh configs/projector/v1:....json     # stage 1: projector pretrain
#   ./run.sh configs/hypernet/v4:....json      # stage 2: hypernet training
#   ./run.sh configs/hypernet/v6:....json      # stage 3: few-shot sweeps
#   ./run.sh configs/lora/v3:....json          # LoRA baseline
#
# The entry point is picked from the config path, mirroring the reference's
# per-directory train_*.py invocation.
set -euo pipefail

CONFIG="$1"
case "$CONFIG" in
  *hypernet*) exec python -u -m dmi_tpu.train_hypernet "$CONFIG" ;;
  *lora*)     exec python -u -m dmi_tpu.train_lora "$CONFIG" ;;
  *)          exec python -u -m dmi_tpu.train_projector "$CONFIG" ;;
esac
