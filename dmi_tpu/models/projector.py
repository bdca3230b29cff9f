"""Shared encoder->LLM projector as a pure-functional pytree model.

Semantics of the reference Projector (dmi/model/projector.py):

  * arch 'mlp'  : Linear(mm,lm) -> GELU(tanh) -> Dropout -> [Linear(lm,lm)
                  -> GELU(tanh) -> Dropout]*(n-2) -> Linear(lm,lm)
                  (dmi/model/projector.py:29-40)
  * arch 'linear': Linear(mm,lm) -> Dropout (dmi/model/projector.py:26-28)
  * prune        : keep only the first `prune` input features of layer 0
                  (dmi/model/projector.py:49-54)
  * lora_apply   : hypernet-emitted low-rank deltas added to linear outputs
                  (dmi/model/projector.py:118-159).  NOTE the reference zips
                  the 4-module net against 2 adapter tuples, so iteration
                  stops after [Linear0+adapter, GELU] — the final linear
                  never runs in this path.  The hypernet is therefore
                  trained against gelu(L0(x) + x@A0@B0 + b0).  We replicate
                  this faithfully by default (truncate_like_reference=True)
                  because the published results depend on it; pass False
                  for the "fixed" full forward.
  * module_lora_apply: the LoRA-baseline path, which DOES traverse the full
                  net (dmi/model/projector.py:61-74), adding
                  (alpha/rank)*x@A@B at each linear.
  * combine_lora : bake adapters into concrete weights
                  (dmi/model/projector.py:76-116): W' = W + A@B, b' = b + d.

Weights are stored (in_dim, out_dim) so application is plain `x @ w + b`
(MXU-friendly); the torch checkpoint layout (out,in) is transposed at
import time (see dmi_tpu.models.torch_import).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class ProjectorSpec:
    mm_dim: int
    lm_dim: int
    arch: str = "mlp"
    act: str = "quick_gelu"
    n_layers: int = 2
    dropout: float = 0.1

    @property
    def n_linear(self) -> int:
        return 1 if self.arch == "linear" else self.n_layers

    def layer_dims(self) -> List[Tuple[int, int]]:
        if self.arch == "linear":
            return [(self.mm_dim, self.lm_dim)]
        if self.arch == "mlp":
            if self.n_layers < 2:
                raise ValueError("mlp projector needs depth >= 2")
            dims = [(self.mm_dim, self.lm_dim)]
            dims += [(self.lm_dim, self.lm_dim)] * (self.n_layers - 1)
            return dims
        raise NotImplementedError(self.arch)


def _act(spec: ProjectorSpec, x: jax.Array) -> jax.Array:
    if spec.act == "quick_gelu":
        # reference instantiates nn.GELU(approximate='tanh')
        return jax.nn.gelu(x, approximate=True)
    raise NotImplementedError(spec.act)


def _dropout(x: jax.Array, rate: float, rng: Optional[jax.Array], train: bool) -> jax.Array:
    if not train or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def init(key: jax.Array, spec: ProjectorSpec, dtype=jnp.float32) -> dict:
    """torch nn.Linear default init: W, b ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    layers = []
    for in_dim, out_dim in spec.layer_dims():
        key, wk, bk = jax.random.split(key, 3)
        bound = 1.0 / jnp.sqrt(in_dim)
        w = jax.random.uniform(wk, (in_dim, out_dim), dtype, -bound, bound)
        b = jax.random.uniform(bk, (out_dim,), dtype, -bound, bound)
        layers.append({"w": w, "b": b})
    return {"layers": layers}


def prune(params: dict, keep: int) -> dict:
    """Slice layer-0 input features to the first `keep` dims
    (reference: dmi/model/projector.py:49-54 prunes net.0.weight columns)."""
    layers = list(params["layers"])
    l0 = dict(layers[0])
    l0["w"] = l0["w"][:keep, :]
    layers[0] = l0
    return {"layers": layers}


def apply(
    spec: ProjectorSpec,
    params: dict,
    x: jax.Array,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Plain projector forward (reference: dmi/model/projector.py:56-59)."""
    layers = params["layers"]
    if spec.arch == "linear":
        y = x @ layers[0]["w"] + layers[0]["b"]
        return _dropout(y, spec.dropout, rng, train)
    if spec.arch == "mlp" and spec.n_layers == 2 and not train:
        # eval/serving hot path: fused Pallas MLP2 on TPU (XLA twin
        # elsewhere; gradients route through the twin via custom_vjp)
        from dmi_tpu.ops.pallas import fused_mlp2

        return fused_mlp2(
            x, layers[0]["w"], layers[0]["b"], layers[1]["w"], layers[1]["b"]
        )
    n = len(layers)
    for i, layer in enumerate(layers):
        x = x @ layer["w"] + layer["b"]
        if i < n - 1:
            x = _act(spec, x)
            if rng is not None:
                rng, sub = jax.random.split(rng)
            else:
                sub = None
            x = _dropout(x, spec.dropout, sub, train)
    return x


def _reshape_ab(
    a_flat: jax.Array, b_flat: jax.Array, in_dim: int, out_dim: int
) -> Tuple[jax.Array, jax.Array]:
    a = a_flat.reshape(in_dim, -1)  # [in, r]
    b = b_flat.reshape(-1, out_dim)  # [r, out]
    return a, b


def lora_apply(
    spec: ProjectorSpec,
    params: dict,
    x: jax.Array,
    a_weights: Sequence[jax.Array],
    b_weights: Sequence[jax.Array],
    biases: Optional[Sequence[jax.Array]],
    *,
    truncate_like_reference: bool = True,
) -> jax.Array:
    """Projector forward with hypernet-emitted additive low-rank deltas.

    The adapters arrive flat and already scaled by alpha/rank
    (dmi/model/hypernet.py:182).  See module docstring for the
    truncate_like_reference quirk.  Dropout is never active here: the
    pretrained projector is pinned to eval inside the hypernet wrapper
    (dmi/model/hypernet.py:218-226).
    """
    layers = params["layers"]
    dims = [(w["w"].shape[0], w["w"].shape[1]) for w in layers]
    if biases is None:
        biases = [jnp.zeros((out,), x.dtype) for (_, out) in dims[: len(a_weights)]]

    if truncate_like_reference and spec.arch == "mlp":
        # Reference iteration order over modules [L0, GELU, Dropout, L1, ...]
        # zipped with len(a_weights) adapters: adapter i is consumed by
        # module i, so only module 0 (Linear) gets its adapter and module 1
        # (GELU) ends the loop.  This is the hypernet-train hot op -> fused
        # Pallas kernel on TPU (XLA twin elsewhere / for grads).
        from dmi_tpu.ops.pallas import fused_lora_layer0

        in0, out0 = dims[0]
        a, b = _reshape_ab(a_weights[0], b_weights[0], in0, out0)
        return fused_lora_layer0(
            x, layers[0]["w"], layers[0]["b"], a, b, biases[0]
        )

    # Full forward: every linear gets its adapter.
    n = len(layers)
    for i, layer in enumerate(layers):
        in_d, out_d = dims[i]
        a, b = _reshape_ab(a_weights[i], b_weights[i], in_d, out_d)
        y = x @ layer["w"] + layer["b"] + (x @ a) @ b + biases[i]
        x = _act(spec, y) if (i < n - 1 and spec.arch == "mlp") else y
    return x


def module_lora_apply(
    spec: ProjectorSpec,
    params: dict,
    x: jax.Array,
    lora_params: Sequence[dict],
    alpha: float,
    rank: int,
) -> jax.Array:
    """LoRA-baseline forward (reference: dmi/model/projector.py:61-74 with
    dmi/model/lora.py:15-17): full net traversal, delta = (alpha/r)·x@A@B.

    The frozen projector stays in eval mode in this path
    (dmi/model/lora.py:49-57) so dropout is identity."""
    layers = params["layers"]
    scale = alpha / rank
    n = len(layers)
    for i, layer in enumerate(layers):
        lp = lora_params[i]
        delta = scale * ((x @ lp["a"]) @ lp["b"])
        y = x @ layer["w"] + layer["b"] + delta
        x = _act(spec, y) if (i < n - 1 and spec.arch == "mlp") else y
    return x


def combine_lora(
    spec: ProjectorSpec,
    params: dict,
    a_weights: Sequence[jax.Array],
    b_weights: Sequence[jax.Array],
    biases: Optional[Sequence[jax.Array]],
) -> dict:
    """Bake adapters into a concrete "generated projector"
    (reference: dmi/model/projector.py:76-116)."""
    layers = params["layers"]
    if len(a_weights) != len(layers):
        raise ValueError(
            f"{len(a_weights)} adapters for {len(layers)} linear layers"
        )
    if biases is None:
        biases = [jnp.zeros((w["w"].shape[1],), w["w"].dtype) for w in layers]
    new_layers = []
    for layer, af, bf, d in zip(layers, a_weights, b_weights, biases):
        in_d, out_d = layer["w"].shape
        a, b = _reshape_ab(af, bf, in_d, out_d)
        new_layers.append({"w": layer["w"] + a @ b, "b": layer["b"] + d})
    return {"layers": new_layers}
