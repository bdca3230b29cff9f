"""Hypernetwork emitting per-modality LoRA adapters over the shared projector.

Functional re-design of the reference HyperNetwork (dmi/model/hypernet.py:84-204):

  * learnable prefix tokens, one per projector linear layer (:130)
  * conditioning set z appended after the prefix tokens, zero-padded to the
    fixed context length 2*n_tokens + n_proj_layers + 1 with a key mask
    (:140-163) — here always padded to the static context length so the
    whole thing jits with fixed shapes
  * optional sinusoidal positional encodings scaled 1/sqrt(d) (:26-43,132-135)
  * encoder archs: 'attention' (bare multi-head self-attention with
    scores/sqrt(d_model), attention-weight dropout 0.05, and NO output
    projection, :46-82), 'transformer' (1-layer post-norm torch-style
    encoder, :96-98), 'att_w_nonlinear' (attention + GELU, :101-105)
  * per-layer linear generator heads emitting flat
    [a | b | bias] scaled alpha/rank (:109-128, :180-195); the first layer's
    `a` is truncated to mm_dim*rank when hypnet_dim > mm_dim (:187-188)
  * xavier-uniform prefix/generator weights, zero generator bias (:199-204)

The experiment configs drive arch='attention' with use_pos_encs=True
(dmi/configs/hypernet/v4:llama1b_inst_all.json).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from dmi_tpu.ops.linalg import sinusoidal_positions

Adapters = Tuple[List[jax.Array], List[jax.Array], Optional[List[jax.Array]]]


@dataclass(frozen=True)
class HypnetSpec:
    lm_dim: int
    mm_dim: int
    n_tokens: int  # conditioning subset size (subset_batch_size or fewshot_n_tokens)
    arch: str = "transformer"
    n_layers: int = 1
    n_heads: int = 1
    hypnet_dim: int = 768
    rank: int = 32
    alpha: int = 32
    predict_bias: bool = True
    n_proj_layers: int = 2
    use_pos_encs: bool = False
    attn_dropout: float = 0.05  # MHSA weight dropout (dmi/model/hypernet.py:47)
    transformer_dropout: float = 0.1  # torch TransformerEncoderLayer default

    @property
    def context_len(self) -> int:
        # reference: 2*n_tokens + n_prefix + 1 (dmi/model/hypernet.py:134,142)
        return 2 * self.n_tokens + self.n_proj_layers + 1

    def a_dim(self, layer_idx: int) -> int:
        in_dim = self.hypnet_dim if layer_idx == 0 else self.lm_dim
        return in_dim * self.rank

    def b_dim(self, layer_idx: int) -> int:
        return self.rank * self.lm_dim

    def gen_out_dim(self, layer_idx: int) -> int:
        d = self.a_dim(layer_idx) + self.b_dim(layer_idx)
        if self.predict_bias:
            d += self.lm_dim
        return d


def _xavier_uniform(key, shape, fan_in, fan_out, dtype=jnp.float32):
    bound = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _linear_default(key, in_dim, out_dim, dtype=jnp.float32):
    """torch nn.Linear default init, stored (in, out)."""
    wk, bk = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(in_dim)
    return {
        "w": jax.random.uniform(wk, (in_dim, out_dim), dtype, -bound, bound),
        "b": jax.random.uniform(bk, (out_dim,), dtype, -bound, bound),
    }


def init(key: jax.Array, spec: HypnetSpec, dtype=jnp.float32) -> dict:
    d = spec.hypnet_dim
    params: dict = {}

    key, pk = jax.random.split(key)
    # torch xavier on a (n_prefix, d) tensor: fan_out = dim0, fan_in = dim1
    params["prefix_tokens"] = _xavier_uniform(
        pk, (spec.n_proj_layers, d), fan_in=d, fan_out=spec.n_proj_layers, dtype=dtype
    )

    gens = []
    for layer_idx in range(spec.n_proj_layers):
        key, gk = jax.random.split(key)
        out_dim = spec.gen_out_dim(layer_idx)
        w = _xavier_uniform(gk, (d, out_dim), fan_in=d, fan_out=out_dim, dtype=dtype)
        gens.append({"w": w, "b": jnp.zeros((out_dim,), dtype)})
    params["generators"] = gens

    if spec.arch in ("attention", "att_w_nonlinear"):
        key, qk, kk, vk = jax.random.split(key, 4)
        params["attn"] = {
            "q": _linear_default(qk, d, d, dtype),
            "k": _linear_default(kk, d, d, dtype),
            "v": _linear_default(vk, d, d, dtype),
        }
    elif spec.arch == "transformer":
        blocks = []
        for _ in range(spec.n_layers):
            key, ik, ok, f1, f2 = jax.random.split(key, 5)
            blocks.append(
                {
                    # torch MHA: xavier in_proj, zero in_proj bias + out_proj bias
                    "in_proj_w": _xavier_uniform(ik, (d, 3 * d), fan_in=d, fan_out=3 * d, dtype=dtype),
                    "in_proj_b": jnp.zeros((3 * d,), dtype),
                    "out_proj": {
                        "w": _linear_default(ok, d, d, dtype)["w"],
                        "b": jnp.zeros((d,), dtype),
                    },
                    "ff1": _linear_default(f1, d, 4 * d, dtype),
                    "ff2": _linear_default(f2, 4 * d, d, dtype),
                    "ln1": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
                    "ln2": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
                }
            )
        params["blocks"] = blocks
    else:
        raise ValueError(f"Unknown hypernetwork architecture: {spec.arch}")
    return params


def _dropout(x, rate, rng, train):
    if not train or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def _mhsa(spec: HypnetSpec, p: dict, x: jax.Array, key_valid: jax.Array, *, train, rng):
    """Reference MultiheadSelfAttention (dmi/model/hypernet.py:46-82):
    scale by 1/sqrt(d_model) (not head_dim), no output projection."""
    L, d = x.shape
    h = spec.n_heads
    q = (x @ p["q"]["w"] + p["q"]["b"]).reshape(L, h, d // h).transpose(1, 0, 2)
    k = (x @ p["k"]["w"] + p["k"]["b"]).reshape(L, h, d // h).transpose(1, 0, 2)
    v = (x @ p["v"]["w"] + p["v"]["b"]).reshape(L, h, d // h).transpose(1, 0, 2)
    scores = (q @ k.transpose(0, 2, 1)) / jnp.sqrt(jnp.asarray(d, x.dtype))
    scores = jnp.where(key_valid[None, None, :], scores, -jnp.inf)
    w = jax.nn.softmax(scores, axis=-1)
    w = _dropout(w, spec.attn_dropout, rng, train)
    out = (w @ v).transpose(1, 0, 2).reshape(L, d)
    return out


def _layer_norm(x, p, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * p["scale"] + p["bias"]


def _torch_mha(spec: HypnetSpec, blk: dict, x: jax.Array, key_valid: jax.Array, *, train, rng):
    """torch nn.MultiheadAttention semantics: joint qkv projection, scale by
    1/sqrt(head_dim), output projection."""
    L, d = x.shape
    h = spec.n_heads
    qkv = x @ blk["in_proj_w"] + blk["in_proj_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(L, h, d // h).transpose(1, 0, 2)
    k = k.reshape(L, h, d // h).transpose(1, 0, 2)
    v = v.reshape(L, h, d // h).transpose(1, 0, 2)
    scores = (q @ k.transpose(0, 2, 1)) / jnp.sqrt(jnp.asarray(d // h, x.dtype))
    scores = jnp.where(key_valid[None, None, :], scores, -jnp.inf)
    w = jax.nn.softmax(scores, axis=-1)
    if rng is not None:
        rng, sub = jax.random.split(rng)
        w = _dropout(w, spec.transformer_dropout, sub, train)
    out = (w @ v).transpose(1, 0, 2).reshape(L, d)
    return out @ blk["out_proj"]["w"] + blk["out_proj"]["b"]


def _transformer_block(spec, blk, x, key_valid, *, train, rng):
    """Post-norm torch TransformerEncoderLayer with GELU feed-forward."""
    rngs = jax.random.split(rng, 4) if rng is not None else [None] * 4
    attn = _torch_mha(spec, blk, x, key_valid, train=train, rng=rngs[0])
    x = _layer_norm(x + _dropout(attn, spec.transformer_dropout, rngs[1], train), blk["ln1"])
    ff = jax.nn.gelu(x @ blk["ff1"]["w"] + blk["ff1"]["b"], approximate=False)
    ff = _dropout(ff, spec.transformer_dropout, rngs[2], train)
    ff = ff @ blk["ff2"]["w"] + blk["ff2"]["b"]
    x = _layer_norm(x + _dropout(ff, spec.transformer_dropout, rngs[3], train), blk["ln2"])
    return x


def apply(
    spec: HypnetSpec,
    params: dict,
    z: jax.Array,
    z_len: Optional[jax.Array] = None,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> Adapters:
    """Emit flat (a_weights, b_weights, biases) from conditioning set z.

    z: [n_z, hypnet_dim].  If n_prefix + n_z is below the fixed context
    length, z is zero-padded and the extra keys masked, matching the
    reference's padding branch (dmi/model/hypernet.py:144-159); z_len
    (default n_z) allows marking trailing rows of an already-padded z
    invalid so the whole call stays shape-static under jit.
    """
    n_prefix = spec.n_proj_layers
    n_z = z.shape[0]
    if z_len is None:
        z_len = jnp.asarray(n_z)
    seq = jnp.concatenate([params["prefix_tokens"].astype(z.dtype), z], axis=0)

    L = max(spec.context_len, n_prefix + n_z)
    if seq.shape[0] < L:
        seq = jnp.pad(seq, ((0, L - seq.shape[0]), (0, 0)))
    key_valid = jnp.arange(L) < (n_prefix + z_len)

    if spec.use_pos_encs:
        pe = sinusoidal_positions(spec.hypnet_dim, L) / jnp.sqrt(
            jnp.asarray(spec.hypnet_dim, jnp.float32)
        )
        seq = seq + pe.astype(seq.dtype)

    if spec.arch == "attention":
        enc = _mhsa(spec, params["attn"], seq, key_valid, train=train, rng=rng)
    elif spec.arch == "att_w_nonlinear":
        enc = jax.nn.gelu(
            _mhsa(spec, params["attn"], seq, key_valid, train=train, rng=rng),
            approximate=False,
        )
    elif spec.arch == "transformer":
        enc = seq
        for blk in params["blocks"]:
            if rng is not None:
                rng, sub = jax.random.split(rng)
            else:
                sub = None
            enc = _transformer_block(spec, blk, enc, key_valid, train=train, rng=sub)
    else:
        raise ValueError(spec.arch)

    prefix_enc = enc[:n_prefix]

    scale = spec.alpha / spec.rank
    a_weights, b_weights = [], []
    biases = [] if spec.predict_bias else None
    for idx, gen in enumerate(params["generators"]):
        w = scale * (prefix_enc[idx] @ gen["w"] + gen["b"])
        a_dim, b_dim = spec.a_dim(idx), spec.b_dim(idx)
        a = w[:a_dim]
        b = w[a_dim : a_dim + b_dim]
        if idx == 0 and spec.hypnet_dim > spec.mm_dim:
            a = a[: spec.mm_dim * spec.rank]
        a_weights.append(a)
        b_weights.append(b)
        if spec.predict_bias:
            biases.append(w[a_dim + b_dim :])
    return a_weights, b_weights, biases


def average_adapters(adapter_list: List[Adapters]) -> Adapters:
    """Average LoRA emissions across multiple conditioning subsets
    (reference: dmi/model/hypernet.py:234-266)."""
    a0, b0, bias0 = adapter_list[0]
    n_layers = len(a0)
    avg_a = [jnp.mean(jnp.stack([t[0][i] for t in adapter_list]), axis=0) for i in range(n_layers)]
    avg_b = [jnp.mean(jnp.stack([t[1][i] for t in adapter_list]), axis=0) for i in range(n_layers)]
    if bias0 is not None:
        avg_bias = [
            jnp.mean(jnp.stack([t[2][i] for t in adapter_list]), axis=0) for i in range(n_layers)
        ]
    else:
        avg_bias = None
    return avg_a, avg_b, avg_bias
