"""Embedding manager: device-side L2 normalization of precomputed features.

Reference EmbeddingManager extracted-features path
(dmi/utils/model_utils.py:47-62): move to device, L2-normalize rows; when
feed_txt_embs the (mm, text, prefix) tuple has all three normalized.  The
live-encoder path is inoperable in the reference (all registry entries are
None, dmi/model/__init__.py:66-131); we expose the same hook surface for
future encoders.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp

from dmi_tpu.ops import l2_normalize


@jax.jit
def _norm(x):
    return l2_normalize(jnp.asarray(x, jnp.float32))


class EmbeddingManager:
    def __init__(self, model_name_or_path: str, load_extracted_features: bool = True):
        self.model_name_or_path = model_name_or_path
        self.load_extracted_features = load_extracted_features
        if not load_extracted_features:
            raise NotImplementedError(
                "live encoders are not wired in the reference either "
                "(dmi/model/__init__.py:66-131); provide extracted features"
            )

    @property
    def short_name(self) -> str:
        return self.model_name_or_path.split("/")[-1]

    def get_embeddings(
        self, inputs: Union[jnp.ndarray, Tuple]
    ) -> Union[jax.Array, Tuple[jax.Array, ...]]:
        """L2-normalize an embedding array or a (mm, text[, prefix]) tuple
        (the coco-family subset collate has no prefix embedding)."""
        if isinstance(inputs, (tuple, list)):
            return tuple(_norm(x) for x in inputs)
        return _norm(inputs)


def build_embedding_managers(menc_args) -> list:
    return [
        EmbeddingManager(name, ext)
        for name, ext in zip(menc_args.menc_names_or_paths, menc_args.load_extracted_features)
    ]


def build_fewshot_embedding_managers(menc_args) -> list:
    return [
        EmbeddingManager(name, ext)
        for name, ext in zip(
            menc_args.fewshot_menc_names_or_paths, menc_args.fewshot_load_extracted_features
        )
    ]
