"""Batch captioning service: embeddings in, captions out.

The deployment surface over the trained artifacts (the reference stops at
experiment scripts; serving is part of this framework's mandate):

    captioner = Captioner.from_checkpoint(
        lm="meta-llama/Llama-3.2-1B-Instruct",
        projector_ckpt="checkpoints/...-projector-best.pt",
        dataset="sydney",
    )
    captions = captioner.caption(embeddings)   # [N, mm_dim] -> N strings

Fixed-shape batching (pad the tail batch) keeps one compiled decode;
options: int8 weight quantization, multi-chip mesh (dp-sharded batches,
tp-sharded LLM).

CLI:  python -m dmi_tpu.serve --lm test:tiny --projector-ckpt P --dataset
      sydney --embs embs.npy --out captions.json
"""

from __future__ import annotations

import json
import logging
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from functools import partial

from dmi_tpu.config import LMArgs
from dmi_tpu.models import mmmodel
from dmi_tpu.models import projector as proj
from dmi_tpu.ops import l2_normalize
from dmi_tpu.registry import dataset_spec
from dmi_tpu.training.checkpoint import load_pytree
from dmi_tpu.training.model_utils import build_lm, build_tokenizer

log = logging.getLogger("dmi_tpu")

# engine="auto" regime constants (chip measurements, BASELINE.md engine
# rows): the bulk engine wins 1.25-1.47x at moderate pools when captions
# terminate early (refilled lanes amortize the weight stream idle lanes
# waste) but is a wash at pool 512 (1.01x) and 0.977x when nothing
# terminates early.  Auto therefore (a) never picks bulk above
# _BULK_MAX_POOL, and (b) probes the first batch on the batch path and
# only switches when the measured mean caption length shows idle-lane
# waste worth amortizing.
_BULK_MAX_POOL = 384
_BULK_LEN_RATIO = 0.75


@partial(jax.jit,
         static_argnames=("cfg", "pspec", "max_new", "pad_id", "batch_first"))
def _caption_pipeline(cfg, pspec, pparams, llm_params, prefill_params, embs,
                      prefix_ids, max_new, pad_id, batch_first=False):
    """Projector -> prompt assembly -> greedy decode as ONE program (the
    eager version costs several ~25 ms dispatch round-trips per batch on
    the TPU relay; measured +40% serving throughput in bench.py).
    batch_first is resolved by the caller (env read at trace time would be
    frozen into the jit cache)."""
    soft = proj.apply(pspec, pparams, embs, train=False)
    return mmmodel.caption_generate(
        cfg, llm_params, soft, prefix_ids, max_new, pad_id,
        prefill_params=prefill_params, batch_first=batch_first,
    )


@partial(jax.jit, static_argnames=("cfg", "pspec", "max_new", "pad_id", "k"))
def _caption_pipeline_spec(cfg, pspec, pparams, llm_params, prefill_params,
                           draft_params, draft_prefill_params, embs,
                           prefix_ids, max_new, pad_id, k):
    """Speculative twin of _caption_pipeline: projector -> prompt assembly
    -> draft-verify greedy decode as ONE program.  Token-identical to the
    greedy pipeline (greedy-rejection invariant, speculative.py); the
    draft is a W4A8 copy of the target so draft_cfg == cfg AND the draft
    prefill rides the same bf16 tree — share_prefill skips the redundant
    second prefill (the admission-side cost of speculation)."""
    soft = proj.apply(pspec, pparams, embs, train=False)
    return mmmodel.caption_generate_speculative(
        cfg, llm_params, cfg, draft_params, soft, prefix_ids, max_new,
        pad_id, k=k, prefill_params=prefill_params,
        draft_prefill_params=draft_prefill_params, share_prefill=True,
    )


class Captioner:
    def __init__(
        self,
        llm_cfg,
        llm_params,
        proj_spec: proj.ProjectorSpec,
        proj_params: dict,
        tokenizer,
        prefix: str,
        max_new_tokens: int,
        batch_size: int = 256,
        int8: bool = False,
        mesh_shape: Optional[tuple] = None,
        speculative: int = 0,
    ):
        if mesh_shape is None:
            # fused QKV/gate-up layout: +3.4% decode on v5e (token-exact);
            # unfused under tensor parallelism (shard-boundary straddling)
            from dmi_tpu.models.llama import fuse_projections

            llm_params = fuse_projections(llm_params)
        self.mesh = None
        if mesh_shape:
            # shard BEFORE quantizing: the sharding rules walk the
            # unquantized tree; quantization of sharded arrays propagates
            # the shardings through GSPMD
            from dmi_tpu.parallel import make_mesh, shard_llm_params

            self.mesh = make_mesh(tuple(mesh_shape))
            llm_params = shard_llm_params(self.mesh, llm_params)
        self.llm_params_prefill = None
        self.spec_k = int(speculative)
        self.draft_params = None
        if self.spec_k:
            # self-speculation: the draft is a W4A8 copy of the SAME
            # weights (greedy rejection keeps the output token-identical
            # regardless — speculative.py).  Its weight stream is ~1/4 of
            # the bf16 target's, so each accepted run trades k+1 cheap
            # draft steps for skipped full-priced loop steps.  The draft
            # prefill rides the bf16 tree (prefill is compute-bound;
            # keeps draft KV identical to the target's for acceptance).
            if int8 == "w4a8":
                raise ValueError(
                    "speculative=k needs a draft cheaper than the target "
                    "loop; the w4a8 target is already the cheapest flavor"
                )
            from dmi_tpu.models.quant import quantize_llama as _q

            self.draft_params = _q(llm_params, bits=4)
            self.draft_prefill_params = llm_params
        if int8:
            from dmi_tpu.models.quant import quantize_llama

            # int8=True: weights dequantized to bf16 at the matmul;
            # int8="w8a8": native int8 MXU matmuls for the token loop, with
            # the bf16 originals kept for the compute-bound prefill (int8
            # dots are no faster than bf16 on this MXU stack - BASELINE.md);
            # int8="w4a8": int4 weights for the token loop (halves the
            # weight stream again), same bf16 prefill shadow
            if int8 in ("w8a8", "w4a8"):
                self.llm_params_prefill = llm_params
            if int8 == "w4a8":
                llm_params = quantize_llama(llm_params, bits=4)
            else:
                llm_params = quantize_llama(llm_params, native=(int8 == "w8a8"))
        if jax.default_backend() == "tpu" and self.mesh is None:
            # Relay residency guard (BASELINE.md round-5 8B pathology):
            # host-origin buffers moved via device_put are re-streamed at
            # ~40 MB/s on EVERY dispatch; one jitted identity copy makes
            # the trees device-native (bit-identical, one fused copy —
            # utils/platform.pin_to_device).  Skipped under a mesh:
            # shard_llm_params' sharded device_put already re-lays-out
            # through the runtime, and pinning would have to respect the
            # shardings.  DMI_PIN_WEIGHTS=0 opts out.
            import os as _os

            from dmi_tpu.utils.platform import pin_to_device

            if _os.environ.get("DMI_PIN_WEIGHTS", "1") != "0":
                (llm_params, self.llm_params_prefill, self.draft_params,
                 draft_prefill, proj_params) = pin_to_device(
                    (llm_params, self.llm_params_prefill, self.draft_params,
                     getattr(self, "draft_prefill_params", None), proj_params)
                )
                if self.draft_params is not None:
                    self.draft_prefill_params = draft_prefill
        self.llm_cfg = llm_cfg
        self.llm_params = llm_params
        self.proj_spec = proj_spec
        self.proj_params = proj_params
        self.tokenizer = tokenizer
        self.max_new_tokens = max_new_tokens
        self.batch_size = batch_size
        # (engine, reason) of the last caption() call — observability for
        # the auto regime picker
        self.engine_decision: Optional[tuple] = None

        ids = tokenizer.apply_chat_template(
            [{"role": "user", "content": prefix}],
            tokenize=True,
            add_generation_prompt=True,
        )
        self._prefix = jnp.asarray(
            np.tile(np.asarray(ids, np.int32)[None, :], (batch_size, 1))
        )

    @classmethod
    def from_checkpoint(
        cls,
        lm: str,
        projector_ckpt: str,
        dataset: str,
        lm_dtype: str = "bfloat16",
        **kwargs,
    ) -> "Captioner":
        spec = dataset_spec(dataset)
        lm_args = LMArgs(lm_name_or_path=lm, lm_dtype=lm_dtype)
        tokenizer = build_tokenizer(lm_args)
        llm_cfg, llm_params = build_lm(lm_args, tokenizer)
        ckpt = load_pytree(projector_ckpt)
        if ckpt.get("generated_projector") is not None:
            # fewshot checkpoint: serve the baked generated projector
            pparams = jax.tree.map(jnp.asarray, ckpt["generated_projector"])
        else:
            key = next(
                k for k in ckpt
                if k.endswith("_state_dict")
                and k not in ("optimizer_state_dict", "hypernet_state_dict")
            )
            pparams = jax.tree.map(jnp.asarray, ckpt[key])
        mm_dim = pparams["layers"][0]["w"].shape[0]
        pspec = proj.ProjectorSpec(
            mm_dim=mm_dim,
            lm_dim=llm_cfg.hidden_size,
            n_layers=len(pparams["layers"]),
        )
        prefix = spec.fixed_prefix or f"Describe the {spec.modality.value}"
        return cls(
            llm_cfg, llm_params, pspec, pparams, tokenizer,
            prefix, spec.max_new_tokens, **kwargs,
        )

    def _dispatch_batch(self, chunk: np.ndarray, temperature, top_k, seed,
                        row_start: int, top_p: float = 1.0):
        """Pad one chunk to the compiled batch shape and dispatch it
        (async on device); returns (tokens, real_row_count).  row_start:
        the chunk's global workload row — sampling keys are
        request-indexed (fold_in(key(seed), row*budget + age)), identical
        to the continuous-batching engine's draws for the same rows."""
        real = chunk.shape[0]
        if real < self.batch_size:  # pad the tail to the compiled shape
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], self.batch_size - real, axis=0)],
                axis=0,
            )
        embs = l2_normalize(jnp.asarray(chunk, jnp.float32))
        if self.mesh is not None:
            from dmi_tpu.parallel import batch_sharding

            embs = jax.device_put(embs, batch_sharding(self.mesh, embs.ndim))
        if temperature is None and self.spec_k:
            tokens = _caption_pipeline_spec(
                self.llm_cfg, self.proj_spec, self.proj_params,
                self.llm_params, self.llm_params_prefill,
                self.draft_params, self.draft_prefill_params, embs,
                self._prefix, self.max_new_tokens,
                self.tokenizer.pad_token_id, self.spec_k,
            )
        elif temperature is None:
            # one jitted program for projector -> assemble -> decode:
            # eager assembly costs ~25 ms/dispatch through the relay
            import os

            tokens = _caption_pipeline(
                self.llm_cfg, self.proj_spec, self.proj_params,
                self.llm_params, self.llm_params_prefill, embs,
                self._prefix, self.max_new_tokens,
                self.tokenizer.pad_token_id,
                batch_first=os.environ.get("DMI_DECODE_BATCH_FIRST") == "1",
            )
        elif self.spec_k:
            # stochastic speculative: distribution-preserving for the
            # W4A8 self-draft (per-seed tokens differ from the plain
            # sampler's unless draft == target; the marginal is identical)
            soft = proj.apply(self.proj_spec, self.proj_params, embs,
                              train=False)
            tokens = mmmodel.caption_sample_speculative(
                self.llm_cfg, self.llm_params, self.llm_cfg,
                self.draft_params, soft, self._prefix,
                self.max_new_tokens, self.tokenizer.pad_token_id,
                jax.random.key(seed), temperature=temperature, top_k=top_k,
                top_p=top_p,
                req_ids=jnp.arange(row_start, row_start + self.batch_size,
                                   dtype=jnp.int32),
                k=self.spec_k, prefill_params=self.llm_params_prefill,
                draft_prefill_params=self.draft_prefill_params,
                share_prefill=True,
            )
        else:
            soft = proj.apply(self.proj_spec, self.proj_params, embs,
                              train=False)
            # request-indexed sampling (same bf16-prompt / quantized-loop
            # split as the greedy path)
            tokens = mmmodel.caption_sample(
                self.llm_cfg, self.llm_params, soft, self._prefix,
                self.max_new_tokens, self.tokenizer.pad_token_id,
                jax.random.key(seed), temperature=temperature, top_k=top_k,
                top_p=top_p,
                req_ids=jnp.arange(row_start, row_start + self.batch_size,
                                   dtype=jnp.int32),
                prefill_params=self.llm_params_prefill,
            )
        return tokens, real

    def _caption_bulk(self, embeddings: np.ndarray, temperature=None,
                      top_k=0, seed=0, req_base=0, top_p=1.0) -> List[str]:
        """The on-device continuous-batching engine over a whole workload
        (greedy, or request-indexed sampling when temperature is set; see
        dmi_tpu/streaming.py)."""
        from dmi_tpu.streaming import StreamingCaptioner

        prefix_np = np.asarray(self._prefix[0])
        eng = StreamingCaptioner(
            self.llm_cfg, self.llm_params, self.proj_spec,
            self.proj_params, prefix_np, self.max_new_tokens,
            # run_bulk never touches the scratch slot, but the pool
            # invariant is >= 2; clamp so batch_size=1 still serves
            self.tokenizer.pad_token_id, pool=max(2, self.batch_size),
            admit=max(1, min(64, self.batch_size // 4)),
            prefill_params=self.llm_params_prefill,
            temperature=temperature, top_k=top_k, top_p=top_p,
            sample_key=jax.random.key(seed), req_base=req_base,
        )
        toks = eng.run_bulk(
            np.asarray(l2_normalize(jnp.asarray(embeddings, jnp.float32)))
        )
        # same postprocessing as the batch path (no extra stripping)
        return self.tokenizer.batch_decode(toks, skip_special_tokens=True)

    def _caption_bulk_spec(self, embeddings: np.ndarray, temperature=None,
                           top_k=0, top_p=1.0, seed=0) -> List[str]:
        """Speculative continuous batching: the bulk slot engine running
        draft-verify rounds with finished lanes refilled mid-flight
        (speculative.py's speculative_bulk_caption).  Greedy is
        token-identical to the batch speculative path AND to plain greedy
        (greedy rejection); sampling draws with (request, age) keys, so it
        is bit-identical to the batch speculative sampler on the same
        rows."""
        from dmi_tpu.models.speculative import speculative_bulk_caption

        N = embeddings.shape[0]
        if N == 0:
            return []
        sample = (
            (float(temperature), int(top_k), float(top_p))
            if temperature is not None else None
        )
        from dmi_tpu.streaming import bucket_queue_len

        M = max(1, min(64, self.batch_size // 4))
        pool = max(M, self.batch_size)
        Nq = bucket_queue_len(N, M)  # O(log N) compiled variants
        q = np.zeros((Nq, embeddings.shape[1]), np.float32)
        q[:N] = np.asarray(
            l2_normalize(jnp.asarray(embeddings, jnp.float32))
        )
        prefix_chunk = jnp.tile(self._prefix[:1], (M, 1))
        toks = speculative_bulk_caption(
            self.llm_cfg, self.llm_params, self.llm_cfg, self.draft_params,
            self.proj_spec, self.proj_params, jnp.asarray(q), prefix_chunk,
            jnp.asarray(N, jnp.int32), 1 + int(self._prefix.shape[1]),
            self.max_new_tokens, self.tokenizer.pad_token_id, M, pool,
            k=self.spec_k, prefill_params=self.llm_params_prefill,
            draft_prefill_params=self.draft_prefill_params, mesh=self.mesh,
            sample=sample, sample_key=jax.random.key(seed),
            # self-draft: draft prefill == target prefill (same bf16 tree)
            share_prefill=True,
        )
        return self.tokenizer.batch_decode(
            np.asarray(toks)[:N], skip_special_tokens=True
        )

    def caption(
        self,
        embeddings: np.ndarray,
        temperature: Optional[float] = None,
        top_k: int = 0,
        top_p: float = 1.0,
        seed: int = 0,
        engine: str = "auto",
    ) -> List[str]:
        """Greedy by default (the reference's decode mode); pass a
        temperature for stochastic decoding.

        engine="bulk": fully-on-device continuous batching
        (dmi_tpu/streaming.py) — one dispatch for the whole workload,
        finished lanes refilled with new requests; 1.25x over fixed
        batches on chip when caption lengths vary.  Composes with
        tensor-parallel meshes (GSPMD partitions the engine like the
        batch tp decode; tokens pinned equal in tests).  Sampling runs
        here too (request-indexed rng; see below).

        engine="auto" (default): pick per workload.  Multi-batch greedy
        workloads at moderate pools probe the FIRST batch on the batch
        path; if the measured mean caption length is under
        _BULK_LEN_RATIO of the budget (idle-lane waste bulk amortizes —
        its 1.25-1.47x regime), the remainder runs on the bulk engine,
        otherwise it stays on the batch path (bulk's eos-free overhead is
        0.977x).  The decision and its reason land in
        self.engine_decision.

        Sampling outputs are engine-INVARIANT: both paths draw with
        request-indexed keys, so batch/bulk/auto return identical captions
        for the same (seed, workload)."""
        n = embeddings.shape[0]
        if engine not in ("auto", "batch", "bulk"):
            raise ValueError(f"unknown engine {engine!r}")
        if self.spec_k:
            if engine == "bulk" and self.max_new_tokens >= 2:
                # greedy AND sampling: (request, age)-keyed draws make the
                # engine output equal the batch speculative path row-for-row.
                # (budget 1 has no rounds to speculate — the batch path
                # below serves it; outputs are identical either way.)
                self.engine_decision = ("bulk", "explicit (speculative)")
                return self._caption_bulk_spec(
                    embeddings, temperature=temperature, top_k=top_k,
                    top_p=top_p, seed=seed,
                )
            # auto keeps the batch path: the regime probe's length model
            # is calibrated for the plain engines
            engine = "batch"
        decision, reason, probe = engine, "explicit", False
        if engine == "auto":
            if n <= self.batch_size:
                decision, reason = "batch", "single batch (nothing to amortize)"
            elif self.batch_size > _BULK_MAX_POOL:
                decision, reason = "batch", (
                    f"pool {self.batch_size} > {_BULK_MAX_POOL} "
                    "(bulk measured a wash at 512)"
                )
            else:
                decision, probe = "batch", True
        if decision == "bulk" and n > 0:
            self.engine_decision = ("bulk", reason)
            return self._caption_bulk(embeddings, temperature, top_k, seed,
                                      top_p=top_p)

        out: List[str] = []
        start = 0
        if probe:
            # decide from the first batch, measured on the batch path (a
            # synchronous fetch; costs pipelining on batch #1 only)
            tokens, real = self._dispatch_batch(
                embeddings[: self.batch_size], temperature, top_k, seed, 0,
                top_p=top_p,
            )
            toks_np = np.asarray(tokens)
            out.extend(
                self.tokenizer.batch_decode(toks_np, skip_special_tokens=True)
            )
            # decode writes pad after termination: non-pad count per row is
            # the effective caption length
            lens = (toks_np != self.tokenizer.pad_token_id).sum(axis=1)
            ratio = float(lens.mean()) / max(1, self.max_new_tokens)
            start = self.batch_size
            if ratio < _BULK_LEN_RATIO:
                self.engine_decision = (
                    "bulk", f"probe: mean-length ratio {ratio:.2f} < "
                    f"{_BULK_LEN_RATIO} (idle-lane waste; bulk regime)"
                )
                out.extend(self._caption_bulk(
                    embeddings[start:], temperature, top_k, seed,
                    req_base=start, top_p=top_p,
                ))
                return out
            self.engine_decision = (
                "batch", f"probe: mean-length ratio {ratio:.2f} >= "
                f"{_BULK_LEN_RATIO} (bulk eos-free overhead)"
            )
        else:
            self.engine_decision = ("batch", reason)
        # two-phase pipeline: dispatch every batch (async), then fetch in
        # order — host prep and detokenization overlap device decode
        pending = []
        for s in range(start, n, self.batch_size):
            pending.append(self._dispatch_batch(
                embeddings[s : s + self.batch_size], temperature, top_k,
                seed, s, top_p=top_p,
            ))
        for tokens, real in pending:
            out.extend(
                self.tokenizer.batch_decode(
                    np.asarray(tokens)[:real], skip_special_tokens=True
                )
            )
        return out


def _load_embs(path: str):
    import pickle

    if path.endswith(".npy"):
        arr = np.load(path)
        return [str(i) for i in range(arr.shape[0])], arr
    with open(path, "rb") as f:
        d = pickle.load(f)
    ids = list(d)
    key = "emb" if "emb" in next(iter(d.values())) else "embs"
    embs = np.stack([np.asarray(d[i][key], np.float32) for i in ids])
    if embs.ndim == 3:
        embs = embs[:, 0]
    return ids, embs


def main(argv=None) -> None:
    import argparse

    from dmi_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser()
    ap.add_argument("--lm", required=True)
    ap.add_argument("--projector-ckpt", required=True)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--embs", required=True, help=".npy array or reference-schema .pkl")
    ap.add_argument("--out", default="captions.json")
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument(
        "--int8", nargs="?", const="1", default="",
        choices=["", "1", "w8a8", "w4a8"],
        help="int8 weights (dequant matmuls); w8a8 = native int8 MXU; "
             "w4a8 = int4 loop weights (bandwidth-bound serving)",
    )
    ap.add_argument("--speculative", type=int, default=0, metavar="K",
                    help="draft-verify decode with a W4A8 self-draft "
                         "proposing K tokens per round: greedy output is "
                         "token-identical to the plain loop, sampling "
                         "preserves the plain sampler's distribution; "
                         "serves on the batch AND bulk engines")
    ap.add_argument("--top-p", type=float, default=1.0,
                    help="nucleus sampling mass (with --temperature)")
    ap.add_argument("--temperature", type=float, default=None,
                    help="stochastic decoding (default: greedy)")
    ap.add_argument("--top-k", type=int, default=0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--engine", choices=["auto", "batch", "bulk"],
                    default="auto",
                    help="bulk = on-device continuous batching (greedy, "
                         "sampling, and speculative all serve there; "
                         "outputs are engine-invariant); auto probes the "
                         "first batch and picks")
    args = ap.parse_args(argv)

    cap = Captioner.from_checkpoint(
        args.lm, args.projector_ckpt, args.dataset,
        batch_size=args.batch_size, int8=args.int8,
        speculative=args.speculative,
    )
    ids, embs = _load_embs(args.embs)
    captions = cap.caption(
        embs, temperature=args.temperature, top_k=args.top_k,
        top_p=args.top_p, seed=args.seed,
        engine=args.engine,
    )
    if cap.engine_decision is not None:
        log.info("engine: %s (%s)", *cap.engine_decision)
    with open(args.out, "w") as f:
        json.dump(dict(zip(ids, captions)), f, indent=2)
    print(f"wrote {len(captions)} captions -> {args.out}")


if __name__ == "__main__":
    main()
