"""Pallas TPU kernels for the hot compute paths.

Each kernel has a pure-XLA twin in dmi_tpu.ops / dmi_tpu.models that serves
as its correctness oracle; wrappers fall back to the twin off-TPU or on
unaligned shapes.
"""

from dmi_tpu.ops.pallas.projector import fused_mlp2, fused_lora_layer0
from dmi_tpu.ops.pallas.decode_attn import fused_decode_attention
from dmi_tpu.ops.pallas.head_argmax import head_argmax, head_argmax_available

__all__ = [
    "fused_mlp2",
    "fused_lora_layer0",
    "fused_decode_attention",
    "head_argmax",
    "head_argmax_available",
]
