"""Offline embedding extraction: raw media -> reference-schema pkl archives.

The reference ships per-dataset offline extraction utilities (its COCO
loader embeds images with timm/CLIP/SigLIP at dmi/data/coco.py:199-265;
audio/video loaders carry CLAP/ViCLIP equivalents).  Here extraction is
one generic utility: a pluggable encoder callable maps a batch of raw
items to embedding rows, and the writer emits exactly the pkl schema the
loader (and the reference) reads — ``{item_id: {emb_key: emb, "caption":
..., ("smiles": ...)}}`` with the per-dataset emb key / leading-axis
quirks taken from the declarative registry instead of being re-hardcoded
per dataset.

Encoding itself runs on CPU torch (the baked-in HF transformers stack);
the TPU is reserved for the training/serving path.  All experiment
configs use ``load_extracted_features: true``, so this is a data-prep
utility, not a training-time dependency.
"""

from __future__ import annotations

import os
import os.path as osp
import pickle
from typing import Callable, Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from dmi_tpu.registry import dataset_spec

# item = (item_id, caption, payload); payload is whatever the encoder
# understands (an image path, an audio path, a SMILES string, ...)
Item = Tuple[str, str, object]


def build_hf_encoder(model_name_or_path: str, modality: str) -> Callable:
    """Encoder over a locally-cached HF checkpoint (CLIP/SigLIP-style for
    images, CLAP-style for audio).  Zero-egress environments must pass a
    local path; a clear error is raised otherwise."""
    try:
        import torch
        from transformers import AutoModel, AutoProcessor
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("torch+transformers required for HF extraction") from e

    try:
        model = AutoModel.from_pretrained(model_name_or_path)
        processor = AutoProcessor.from_pretrained(model_name_or_path)
    except Exception as e:  # OSError / HFValidationError / hub errors
        raise RuntimeError(
            f"cannot load {model_name_or_path!r}: no network access in this "
            "environment, pass a local checkpoint directory"
        ) from e
    model.eval()

    get_feats = getattr(
        model,
        {"image": "get_image_features", "audio": "get_audio_features"}.get(
            modality, "get_image_features"
        ),
        None,
    )

    def encode(payloads: Sequence[object]) -> np.ndarray:
        from PIL import Image

        if modality == "image":
            media = [Image.open(p).convert("RGB") for p in payloads]
            inputs = processor(images=media, return_tensors="pt")
        else:
            inputs = processor(audios=list(payloads), return_tensors="pt")
        with torch.no_grad():
            if get_feats is not None:
                out = get_feats(**inputs)
            else:  # pragma: no cover - models without a features head
                out = model(**inputs).pooler_output
        return out.float().cpu().numpy()

    return encode


def extract_split(
    dataset: str,
    enc_name: str,
    split: str,
    items: Iterable[Item],
    encoder_fn: Callable[[Sequence[object]], np.ndarray],
    out_dir: str,
    batch_size: int = 32,
) -> str:
    """Encode items in batches and write ``{split}_embs_{enc_name}.pkl``
    in the dataset's directory under ``out_dir``, matching the schema the
    loader reads back (emb key, optional leading axis, smiles field)."""
    spec = dataset_spec(dataset)
    items = list(items)
    ddir = osp.join(out_dir, spec.path)
    os.makedirs(ddir, exist_ok=True)

    d: Dict[str, dict] = {}
    for i in range(0, len(items), batch_size):
        chunk = items[i : i + batch_size]
        embs = np.asarray(encoder_fn([p for _, _, p in chunk]), np.float32)
        assert embs.shape[0] == len(chunk), (embs.shape, len(chunk))
        for (item_id, caption, payload), emb in zip(chunk, embs):
            if spec.emb_index is not None:
                # loaders index a leading axis (reference stores [CLS, patch...])
                emb = emb[None, :]
            value = {"caption": caption, spec.emb_key: emb}
            if spec.has_smiles:
                value["smiles"] = payload if isinstance(payload, str) else str(payload)
            d[item_id] = value

    path = osp.join(ddir, f"{split}_embs_{enc_name}.pkl")
    with open(path, "wb") as f:
        pickle.dump(d, f)
    return path


def read_manifest(path: str) -> List[Item]:
    """TSV manifest: ``item_id<TAB>caption<TAB>payload`` per line."""
    items: List[Item] = []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            item_id, caption, payload = line.split("\t", 2)
            items.append((item_id, caption, payload))
    return items


def main(argv: Optional[List[str]] = None) -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--enc-name", required=True, help="name used in the pkl filename")
    ap.add_argument("--model", required=True, help="local HF checkpoint dir")
    ap.add_argument("--modality", default="image", choices=["image", "audio"])
    ap.add_argument("--split", default="train")
    ap.add_argument("--manifest", required=True,
                    help="TSV: item_id<TAB>caption<TAB>media-path")
    ap.add_argument("--out", default="data")
    ap.add_argument("--batch-size", type=int, default=32)
    args = ap.parse_args(argv)

    encoder = build_hf_encoder(args.model, args.modality)
    path = extract_split(
        args.dataset, args.enc_name, args.split, read_manifest(args.manifest),
        encoder, args.out, batch_size=args.batch_size,
    )
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
