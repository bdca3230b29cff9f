"""LoRA-baseline trainer (reference: dmi/train_lora.py:24-160).

Same loop as the projector trainer but the trainable pytree is the
per-layer (A, B) adapters over a FROZEN pretrained projector; the forward
is the full-net module-LoRA path (dmi/model/projector.py:61-74 via
dmi/model/lora.py:41-63).  Best checkpoint by coco_cider/bleu.
"""

from __future__ import annotations

from typing import List

import jax

from dmi_tpu.models import projector as proj
from dmi_tpu.models.lora import LoraSpec
from dmi_tpu.training.checkpoint import load_pytree
from dmi_tpu.training.projector_trainer import ProjectorTrainer


class LoraTrainer(ProjectorTrainer):
    TRAINER_TYPE = "lora"
    SAVE_TYPE = "lora_model"  # checkpoint key parity (dmi/train_lora.py:28)

    def __init__(
        self,
        *,
        lora_spec: LoraSpec,
        lora_params: List[dict],
        frozen_proj_params: dict,
        **kwargs,
    ):
        self.lora_spec = lora_spec
        self._frozen_proj = frozen_proj_params
        # the parent trains whatever pytree it is given — hand it adapters
        super().__init__(proj_params=lora_params, **kwargs)

    def _load_pruned(self, path: str, init_params):
        raise NotImplementedError("LoRA baseline does not fine-tune from checkpoints")

    def _soft_train(self, params, embs, rng):
        # frozen projector stays in eval in this path (dmi/model/lora.py:49-57)
        return proj.module_lora_apply(
            self.proj_spec, self._frozen_proj, embs, params,
            self.lora_spec.alpha, self.lora_spec.rank,
        )

    def _soft_eval(self, params, embs):
        return self._soft_train(params, embs, None)


def load_frozen_projector(path: str, proj_spec: proj.ProjectorSpec) -> dict:
    """Load + prune the pretrained projector the adapters ride on
    (dmi/model/projector.py:46-54)."""
    import jax.numpy as jnp

    ckpt = load_pytree(path)
    params = ckpt["projector_state_dict"]
    if params["layers"][0]["w"].shape[0] > proj_spec.mm_dim:
        params = proj.prune(params, proj_spec.mm_dim)
    return jax.tree.map(jnp.asarray, params)
