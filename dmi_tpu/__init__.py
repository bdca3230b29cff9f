"""dmi_tpu — TPU-native sample-efficient multimodality integration framework.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of
`ospanbatyr/sample-efficient-multimodality` (reference: /root/reference/dmi):
integrating unseen low-resource modalities into a frozen Llama-3.2-1B-Instruct
decoder with as few as 32 paired samples via

  1. a shared encoder->LLM projector MLP pre-trained on high-resource
     modalities (reference: dmi/model/projector.py),
  2. a hypernetwork emitting per-modality LoRA adapters over the shared
     projector, conditioned on a sample subset and trained with isometric
     orthogonal augmentation (reference: dmi/model/hypernet.py,
     dmi/train_hypernet.py:56-108), and
  3. few-shot adaptation baking generated adapters into a concrete projector
     (reference: dmi/train_hypernet.py:168-295),

plus projector-from-scratch / fine-tuned-projector / LoRA baselines.

Design stance (TPU-first, not a port):
  * pure-functional models over pytree params; single jitted train steps
  * frozen LLM forward + batched KV-cache greedy decode as lax.while_loop
  * device meshes via jax.sharding; dp x tp shardings with XLA collectives
  * on-device orthogonal augmentation (QR of Gaussian) instead of host scipy
  * Pallas TPU kernels for the hot projector/LoRA math
  * declarative dataset registry instead of nine near-identical loader files
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level API (avoids importing jax at package import)
    if name == "Captioner":
        from dmi_tpu.serve import Captioner

        return Captioner
    if name == "LlamaConfig":
        from dmi_tpu.models.llama import LlamaConfig

        return LlamaConfig
    if name == "DatasetLoader":
        from dmi_tpu.data.loader import DatasetLoader

        return DatasetLoader
    raise AttributeError(name)
