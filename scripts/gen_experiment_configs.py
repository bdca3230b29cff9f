#!/usr/bin/env python3
"""Regenerate the vendored experiment-config surface (configs/experiments).

The reference ships 74 hand-written sweep JSONs (/root/reference/dmi/
configs/**: 37 projector, 19 hypernet, 18 lora).  This repo vendors the
same experiment surface so the paper sweeps run with the reference
unmounted, but stores it factored: one BASE template per family (the
modal value of every key across the family) plus a per-file DELTA — the
hyperparameters that experiment actually changes.  That factoring lives
in configs/experiments/sweeps.json; this script expands it into the
per-experiment JSONs the trainers consume.

The vendored values are config FACTS (dataset names, encoder ids, batch
sizes, schedules) — semantic parity with the mounted reference is pinned
by tests/test_config.py::test_vendored_configs_match_reference, and
idempotence (checked-in files == regenerated files) by
test_vendored_configs_generator_idempotent.

Usage:
  python scripts/gen_experiment_configs.py          # (re)write the tree
  python scripts/gen_experiment_configs.py --check  # exit 1 on any drift
"""

from __future__ import annotations

import argparse
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
EXP_DIR = os.path.join(HERE, "..", "configs", "experiments")
SWEEPS = os.path.join(EXP_DIR, "sweeps.json")


def expand() -> dict:
    """relpath -> full config dict."""
    with open(SWEEPS) as f:
        sweeps = json.load(f)
    base, deltas, absent = sweeps["base"], sweeps["deltas"], sweeps["absent"]
    out = {}
    for rel, delta in deltas.items():
        family = rel.split("/")[0]
        cfg = dict(base[family])
        for k in absent.get(rel, ()):  # keys this experiment omits
            cfg.pop(k, None)
        cfg.update(delta)
        out[rel] = cfg
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="verify checked-in files match regeneration")
    args = ap.parse_args()

    configs = expand()
    drift = []
    for rel, cfg in sorted(configs.items()):
        path = os.path.join(EXP_DIR, rel)
        text = json.dumps(cfg, indent=2, sort_keys=True) + "\n"
        if args.check:
            try:
                with open(path) as f:
                    if f.read() != text:
                        drift.append(rel)
            except FileNotFoundError:
                drift.append(rel + " (missing)")
        else:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "w") as f:
                f.write(text)
    if args.check:
        if drift:
            print("DRIFT:", *drift, sep="\n  ")
            return 1
        print(f"OK: {len(configs)} vendored configs match sweeps.json")
        return 0
    print(f"wrote {len(configs)} configs under {os.path.relpath(EXP_DIR)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
