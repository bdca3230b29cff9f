"""Dataset fetch: download the embedding archives, or synthesize fixtures.

The reference downloads ten .tar.gz embedding archives from the HF dataset
ospanbatyr/dmi_embs and unpacks per-dataset dirs (dmi/data/pkls.py).  This
environment is zero-egress, so a --synthetic mode generates schema-correct
fixture datasets instead (dmi_tpu.data.fixtures) for development/smokes.

Usage:
    python -m dmi_tpu.data.fetch --out data                 # real archives
    python -m dmi_tpu.data.fetch --out data --synthetic     # fixtures
"""

from __future__ import annotations

import argparse
import os
import tarfile

ARCHIVES = [
    "coco", "audiocaps", "openvid", "sharegpt4v", "clothodetail",
    "sharegpt4video", "chebi20", "candels", "sydney", "prefixes",
]
HF_DATASET = "ospanbatyr/dmi_embs"


def fetch_real(out_dir: str) -> None:
    from huggingface_hub import hf_hub_download

    os.makedirs(out_dir, exist_ok=True)
    for name in ARCHIVES:
        path = hf_hub_download(
            repo_id=HF_DATASET, filename=f"{name}.tar.gz", repo_type="dataset"
        )
        with tarfile.open(path, "r:gz") as tar:
            tar.extractall(out_dir)
        print(f"unpacked {name} -> {out_dir}")


def fetch_synthetic(out_dir: str, mm_dim: int = 768, seed: int = 0) -> None:
    from dmi_tpu.data.fixtures import generate_dataset
    from dmi_tpu.registry import DATASETS, ENCODER_MODALITIES

    for i, (name, spec) in enumerate(DATASETS.items()):
        # one pkl per registered encoder of this modality, same items
        encs = sorted(
            {n.split("/")[-1] for n, m in ENCODER_MODALITIES.items() if m == spec.modality}
        )
        generate_dataset(
            out_dir, name, encs,
            mm_dim=mm_dim, n_train=64, n_eval=16, text_dim=mm_dim, seed=seed + i,
        )
        print(f"synthesized {name} ({', '.join(encs)})")


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--mm-dim", type=int, default=768)
    args = ap.parse_args(argv)
    if args.synthetic:
        fetch_synthetic(args.out, args.mm_dim)
    else:
        fetch_real(args.out)


if __name__ == "__main__":
    main()
