"""Sharding rules: tensor-parallel LLM weights, data-parallel batches.

Layout (scaling-book style: pick a mesh, annotate, let XLA insert the
collectives):

  * mesh axes ("data", "model"); batch dims shard over "data"
  * attention: wq/wk/wv shard the head dim ("model" on the out column),
    wo shards its input rows -> one psum per attention block
  * MLP: w_gate/w_up shard columns, w_down shards rows -> one psum
  * embedding/lm-head shard the vocab dim (logits gather under argmax /
    softmax handled by XLA)
  * norms replicated

All params are stacked (L, in, out), so the layer axis is never sharded —
layers run as a lax.scan (no pipeline parallelism; at 1B params per-layer
compute is far too small for PP to beat dp x tp on ICI, and sequence
lengths here are tiny so sequence/context parallelism has nothing to cut).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int):
    """Shard dim0 (batch) over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def llm_param_specs(expert_axis: str = "model") -> Dict[str, Any]:
    """PartitionSpecs for the stacked-layer Llama pytree.

    expert_axis: mesh axis for the MoE expert dimension.  Default 'model'
    reuses the tp groups; pass a dedicated axis (e.g. 'expert' on a 3-D
    (data, model, expert) mesh) for dp x tp x ep — attention/MLP columns
    stay on 'model' while each expert group holds E/n_expert experts."""
    return {
        "embed": P("model", None),  # vocab rows sharded
        "layers": {
            "wq": P(None, None, "model"),
            "wk": P(None, None, "model"),
            "wv": P(None, None, "model"),
            "wo": P(None, "model", None),
            "w_gate": P(None, None, "model"),
            "w_up": P(None, None, "model"),
            "w_down": P(None, "model", None),
            "ln_attn": P(None, None),
            "ln_mlp": P(None, None),
            # family extensions (llama.py): qwen2 qkv biases ride their
            # matmul's sharded output column; gemma-2 post-block norms
            # replicate like the other norms
            "bq": P(None, "model"),
            "bk": P(None, "model"),
            "bv": P(None, "model"),
            "ln_post_attn": P(None, None),
            "ln_post_mlp": P(None, None),
            # qwen3 per-head q/k norms: tiny [L, hd] vectors, replicated
            "q_norm": P(None, None),
            "k_norm": P(None, None),
            # mixtral sparse MoE: EXPERT PARALLELISM — the expert axis of
            # the stacked [L, E, ...] expert weights shards over 'model'
            # (each shard dense-evaluates its E/n experts; the router
            # combine psums the weighted outputs).  Router replicates.
            "w_router": P(None, None, None),
            "moe_w1": P(None, expert_axis, None, None),
            "moe_w3": P(None, expert_axis, None, None),
            "moe_w2": P(None, expert_axis, None, None),
            # deepseek-v2 MLA: per-head projections shard the head dim
            # (wq / wq_b / wkv_b columns are nh * per-head widths; wo
            # contracts nh*v_head_dim rows -> the attention psum), while
            # the COMPRESSED latent path replicates — every shard's heads
            # read the same [kv latent | shared key] row (wkv_a out and
            # its norm are shared by all heads), like the q_a bottleneck
            "wq_a": P(None, None, None),
            "wq_b": P(None, None, "model"),
            "q_a_norm": P(None, None),
            "wkv_a": P(None, None, None),
            "kv_a_norm": P(None, None),
            "wkv_b": P(None, None, "model"),
            # deepseek-v2 MoE shared experts: dense-MLP tp layout
            "w_shared_gate": P(None, None, "model"),
            "w_shared_up": P(None, None, "model"),
            "w_shared_down": P(None, "model", None),
        },
        "final_norm": P(None),
        "lm_head": P(None, "model"),
    }


def shard_llm_params(mesh: Mesh, params: dict,
                     expert_axis: str = "model") -> dict:
    """device_put the LLM pytree with tensor-parallel shardings.

    Quantized pytrees (dmi_tpu.models.quant) compose: a weight's {q|q8, s}
    dict takes the weight's spec for the int8 payload, and the per-output
    scale drops the sharding on its size-1 (contraction) axes — so
    col-sharded weights shard their scales along 'model' while row-sharded
    weights replicate them, and packed-int4 ("qp") bytes take the weight's
    spec (placement-only; the global unpack+dot semantics are unchanged)."""
    specs = llm_param_specs(expert_axis=expert_axis)

    def put(path, x):
        spec = specs
        for k in path:
            if isinstance(spec, dict):
                spec = spec[k.key]
            elif k.key in ("q", "q8"):
                pass  # int8 payload: same layout as the bf16 weight
            elif k.key == "s":
                spec = P(*[None if x.shape[i] == 1 else a
                           for i, a in enumerate(spec)])
            elif k.key == "qp":
                # K-split packed bytes (..., K/2, out): sharding is
                # placement-only (SPMD keeps the global unpack+dot
                # semantics), so the bf16 weight's spec applies — the
                # packed K/2 axis shards wherever K would
                pass
            elif k.key == "s4g":
                # grouped scales (..., G, out): replicate the group axis,
                # shard the output axis like the weight's
                spec = P(*([None] * (len(spec) - 1) + [spec[-1]]))
            else:
                raise KeyError(f"unknown quantized leaf key {k.key!r}")
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params)


def shard_params(mesh: Mesh, params, spec=P()):
    """Replicate (default) or uniformly shard a trainable pytree."""
    return jax.tree.map(lambda x: jax.device_put(x, NamedSharding(mesh, spec)), params)


def shard_batch(mesh: Mesh, batch):
    """device_put a pytree of batch arrays sharded on dim0 over 'data'."""
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, x.ndim)), batch
    )
