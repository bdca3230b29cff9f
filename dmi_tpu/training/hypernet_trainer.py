"""Hypernetwork trainer: stage-2 training + stage-3 few-shot integration.

Functional port of HypernetTrainer (dmi/train_hypernet.py:26-462):

Train mode:
  * uniform random loader pick per step (:125)
  * each step draws a main batch AND a conditioning subset batch (:130-136)
  * _process_embeddings (:85-108), replicated exactly:
      - when augment_emb_space and can_rotate, a fresh Haar-orthogonal R
        rotates both mm and subset embeddings — ON DEVICE here (QR of
        Gaussian) instead of host scipy (:56-57); NOTE the reference only
        applies R inside the feed_txt_embs branch, so augmentation is
        conditioned on feed_txt_embs — preserved
      - pruned subsets are zero-padded back to finetune_mm_dim (:99-100)
      - text embeddings interleave with subset rows; prefix embedding is
        prepended (:102-106)
  * grad accumulation (config v4 uses 40), clip, step-indexed LR
  * best checkpoint by eval loss, lower wins (:437-462)
  * the final-step generate of the base condition is dropped (:298-307)

Fewshot mode (:168-295):
  * optionally pre-generate a concrete projector by averaging adapters
    from 1 or len(train)//subset_bsz subset draws, baked via combine_lora
  * fresh AdamW (fewshot lr/wd) over the generated projector params (or
    the hypernet when finetune_generated_projector=false)
  * best-by-CIDEr model selection, final test generate + results JSON
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Any, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dmi_tpu.config import FewshotArgs, TrainArgs
from dmi_tpu.data.collator import pad_batch_dim
from dmi_tpu.models import hypernet as hn
from dmi_tpu.models import mmmodel
from dmi_tpu.models import projector as proj
from dmi_tpu.models.llama import LlamaConfig
from dmi_tpu.ops import interleave_rows, pad_features, random_orthogonal
from dmi_tpu.training.checkpoint import BestCheckpointer, load_pytree, save_pytree
from dmi_tpu.training.generation import (
    comp_metric,
    metrics_for,
    pad_emb_rows,
    prefix_prompt_ids,
    safe_batch_decode,
)
from dmi_tpu.training.optim import make_lr_fn, make_optimizer, set_lr
from dmi_tpu.training.results import save_run_results
from dmi_tpu.training.trainer import StepConditions, pick_loader, strip_to_assistant

log = logging.getLogger("dmi_tpu")


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    accum: Any
    sched_step: jnp.ndarray


def process_embeddings(
    mm_embs,
    subset,
    *,
    feed_txt_embs: bool,
    augment: bool,
    rotate_key: Optional[jax.Array],
    pad_to: Optional[int],
):
    """dmi/train_hypernet.py:85-108, jittable."""
    if feed_txt_embs:
        # prefix may be absent: the coco-family subset collate yields
        # (embs, text_embs) with no instruction-prefix embedding
        # (dmi/data/coco.py:166-182)
        if len(subset) == 3:
            subm, txt, pre = subset
        else:
            subm, txt = subset
            pre = None
        if augment and rotate_key is not None:
            R = random_orthogonal(rotate_key, mm_embs.shape[1])
            mm_embs = mm_embs @ R
            subm = subm @ R
        if pad_to is not None and subm.shape[1] < pad_to:
            subm = pad_features(subm, pad_to)
        z = interleave_rows(subm, txt)
        if pre is not None:
            z = jnp.concatenate([pre, z], axis=0)
        return mm_embs, z
    # no-text path: the reference computes R but never applies it (:88-108)
    subm = subset
    if pad_to is not None and subm.shape[1] < pad_to:
        subm = pad_features(subm, pad_to)
    return mm_embs, subm


class HypernetTrainer:
    TRAINER_TYPE = "hypernet"
    SAVE_TYPE = "hypernet"

    def __init__(
        self,
        name: str,
        llm_cfg: LlamaConfig,
        llm_params: dict,
        proj_spec: proj.ProjectorSpec,
        frozen_proj_params: dict,
        hn_spec: hn.HypnetSpec,
        hn_params: dict,
        loaders: List,
        emb_mgrs: List,
        fewshot_loaders: List,
        fewshot_emb_mgrs: List,
        tokenizer,
        train_args: TrainArgs,
        fewshot_args: FewshotArgs,
        data_root: str = "data",
    ):
        self.name = name
        self.llm_cfg = llm_cfg
        self.llm_params = llm_params
        self.proj_spec = proj_spec
        self.frozen_proj = frozen_proj_params
        self.hn_spec = hn_spec
        self.loaders = loaders or []
        self.emb_mgrs = emb_mgrs or []
        self.fewshot_loaders = fewshot_loaders or []
        self.fewshot_emb_mgrs = fewshot_emb_mgrs or []
        self.tokenizer = tokenizer
        self.train_args = train_args
        self.fewshot_args = fewshot_args
        self.data_root = data_root
        self.cond = StepConditions(train_args)
        self.ckpt = BestCheckpointer(
            train_args.checkpoint_dir, name, self.SAVE_TYPE, mode="min"
        )

        # optional multi-chip execution (see projector_trainer)
        self.mesh = None
        if train_args.mesh_shape:
            from dmi_tpu.parallel import make_mesh, shard_llm_params

            self.mesh = make_mesh(tuple(train_args.mesh_shape))
            llm_params = shard_llm_params(self.mesh, llm_params)
            self.llm_params = llm_params
        self.hn_params = hn_params
        self.generated_projector: Optional[dict] = None
        self._base_key = jax.random.key(train_args.seed)
        # the interface dim z rows are padded to (hypnet input width)
        self.pad_to = (
            train_args.finetune_mm_dim
            if train_args.finetune_mm_dim is not None
            and proj_spec.mm_dim < train_args.finetune_mm_dim
            else None
        )
        self._build_steps()

    # ------------------------------------------------------------------
    # jitted steps
    # ------------------------------------------------------------------

    def _soft_from_hypernet(self, params, mm_embs, z, rng, train):
        a, b, d = hn.apply(self.hn_spec, params, z, train=train, rng=rng)
        return proj.lora_apply(self.proj_spec, self.frozen_proj, mm_embs, a, b, d)

    def _build_steps(self):
        cfg = self.llm_cfg
        args = self.train_args
        accum_steps = args.gradient_accumulation_steps
        feed = args.feed_txt_embs
        augment = args.augment_emb_space

        self.opt = make_optimizer(args)
        if self.loaders:
            total = sum(ld.total_train_steps() for ld in self.loaders)
            self.total_steps = total
            self.lr_fn = make_lr_fn(args, total)
        else:
            self.total_steps = 0
            self.lr_fn = make_lr_fn(args, 1)
        self.state = TrainState(
            params=self.hn_params,
            opt_state=self.opt.init(self.hn_params),
            accum=jax.tree.map(jnp.zeros_like, self.hn_params),
            sched_step=jnp.asarray(0, jnp.int32),
        )

        def loss_fn(params, llm_params, mm, subset, ids, mask, labels, rot_key, hn_rng, can_rotate):
            mm2, z = process_embeddings(
                mm, subset, feed_txt_embs=feed,
                augment=augment and can_rotate,
                rotate_key=rot_key, pad_to=self.pad_to,
            )
            soft = self._soft_from_hypernet(params, mm2, z, hn_rng, train=True)
            return mmmodel.caption_loss(cfg, llm_params, soft, ids, mask, labels)

        @partial(jax.jit, static_argnames=("do_update", "can_rotate"))
        def micro_step(state, llm_params, mm, subset, ids, mask, labels, rot_key,
                       hn_rng, step, do_update, can_rotate=True):
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, llm_params, mm, subset, ids, mask, labels,
                rot_key, hn_rng, can_rotate,
            )
            loss = loss / accum_steps
            grads = jax.tree.map(lambda g: g / accum_steps, grads)
            accum = jax.tree.map(jnp.add, state.accum, grads)
            if not do_update:
                return state._replace(accum=accum), loss, None
            from dmi_tpu.utils.grad_stats import grad_summary

            gstats = grad_summary(accum)  # wandb.watch analogue (train.py:70)
            lr = self.lr_fn(state.sched_step)
            opt_state = set_lr(state.opt_state, lr)
            updates, opt_state = self.opt.update(accum, opt_state, state.params)
            params = jax.tree.map(jnp.add, state.params, updates)
            accum = jax.tree.map(jnp.zeros_like, accum)
            return TrainState(params, opt_state, accum, jnp.asarray(step, jnp.int32)), loss, gstats

        # --- grad-accum coalescing (TrainArgs.micro_batch_coalesce) -----
        # k same-loader micro-batches run as ONE k*B-row dispatch through
        # the frozen LLM (the stage-2 MFU lever: B=8 underfills the MXU,
        # BASELINE.md round-3 decomposition).  Per-group rotation keys,
        # dropout rngs, and token-mean losses are derived from the GLOBAL
        # step indices exactly like the sequential path (fold_in is
        # deterministic), so grads match sequential accumulation up to
        # summation order.
        self.coalesce = max(1, int(getattr(args, "micro_batch_coalesce", 1)))
        base_key = self._base_key

        @partial(jax.jit, static_argnames=("can_rotate",))
        def micro_step_k(state, llm_params, mm_k, subset_k, ids_k, mask_k,
                         labels_k, steps_k, can_rotate=True):
            def group_loss(params):
                def per_group(mm, subset, step):
                    rot_key = jax.random.fold_in(base_key, 2 * step)
                    hn_rng = jax.random.fold_in(base_key, 2 * step + 1)
                    mm2, z = process_embeddings(
                        mm, subset, feed_txt_embs=feed,
                        augment=augment and can_rotate,
                        rotate_key=rot_key, pad_to=self.pad_to,
                    )
                    return self._soft_from_hypernet(params, mm2, z, hn_rng,
                                                    train=True)

                soft = jax.vmap(per_group)(mm_k, subset_k, steps_k)
                k, B, H = soft.shape
                T = ids_k.shape[-1]
                losses = mmmodel.caption_loss_grouped(
                    cfg, llm_params, soft.reshape(k * B, H),
                    ids_k.reshape(k * B, T), mask_k.reshape(k * B, T),
                    labels_k.reshape(k * B, T), k,
                )
                # same scale as k sequential micro-steps' loss/accum adds
                return jnp.sum(losses) / accum_steps

            loss, grads = jax.value_and_grad(group_loss)(state.params)
            accum = jax.tree.map(jnp.add, state.accum, grads)
            return state._replace(accum=accum), loss

        @jax.jit
        def update_step(state, step):
            """The update branch of micro_step, standalone — the coalesced
            loop accumulates out of order within a window, then applies
            once (gradient summation is order-free up to fp)."""
            from dmi_tpu.utils.grad_stats import grad_summary

            gstats = grad_summary(state.accum)
            lr = self.lr_fn(state.sched_step)
            opt_state = set_lr(state.opt_state, lr)
            updates, opt_state = self.opt.update(state.accum, opt_state, state.params)
            params = jax.tree.map(jnp.add, state.params, updates)
            accum = jax.tree.map(jnp.zeros_like, state.accum)
            return TrainState(
                params, opt_state, accum, jnp.asarray(step, jnp.int32)
            ), gstats

        self._micro_step_k = micro_step_k
        self._update_step = update_step

        @jax.jit
        def eval_loss(params, llm_params, mm, subset, ids, mask, labels):
            mm2, z = process_embeddings(
                mm, subset, feed_txt_embs=feed, augment=False,
                rotate_key=None, pad_to=self.pad_to,
            )
            soft = self._soft_from_hypernet(params, mm2, z, None, train=False)
            return mmmodel.caption_loss(cfg, llm_params, soft, ids, mask, labels)

        @jax.jit
        def soft_tokens_eval(params, mm, subset):
            mm2, z = process_embeddings(
                mm, subset, feed_txt_embs=feed, augment=False,
                rotate_key=None, pad_to=self.pad_to,
            )
            return self._soft_from_hypernet(params, mm2, z, None, train=False)

        self._micro_step = micro_step
        self._eval_loss = eval_loss
        self._soft_tokens_eval = soft_tokens_eval

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------

    def _device_batch(self, batch):
        out = (
            jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["attention_mask"]),
            jnp.asarray(batch["labels"]),
        )
        if self.mesh is not None:
            from dmi_tpu.parallel import batch_sharding

            out = tuple(
                jax.device_put(x, batch_sharding(self.mesh, x.ndim)) for x in out
            )
        return out

    def load_checkpoint(self, path: str):
        """Resume hypernet (dmi/train_hypernet.py:417-427); pruning of the
        frozen projector happens at construction, not here.  Optimizer
        state and the LR-schedule step restore too when present, giving
        exact mid-run resume."""
        ckpt = load_pytree(path)
        self.hn_params = jax.tree.map(jnp.asarray, ckpt[f"{self.SAVE_TYPE}_state_dict"])
        self.state = self.state._replace(params=self.hn_params)
        if ckpt.get("optimizer_state_dict") is not None:
            self.state = self.state._replace(
                opt_state=jax.tree.map(jnp.asarray, ckpt["optimizer_state_dict"]),
                sched_step=jnp.asarray(ckpt["step_idx"], jnp.int32),
            )
        else:
            # reference torch checkpoints: convert the AdamW moments of the
            # hypernet param set (the wrapper's frozen projector is not in
            # the optimizer, dmi/train_hypernet.py:220-221)
            from dmi_tpu.models.torch_import import optax_moments_from_checkpoint
            from dmi_tpu.training.optim import set_adamw_moments

            m = optax_moments_from_checkpoint(
                path, self.SAVE_TYPE, arch=self.hn_spec.arch
            )
            if m is not None:
                self.state = self.state._replace(
                    opt_state=set_adamw_moments(
                        self.state.opt_state, m["mu"], m["nu"], m["count"]
                    ),
                    sched_step=jnp.asarray(ckpt["step_idx"], jnp.int32),
                )
        return dict(step_idx=ckpt["step_idx"])

    # ------------------------------------------------------------------
    # stage-2 training
    # ------------------------------------------------------------------

    def fetch_batch(self, step: int):
        """Host-side batch + conditioning-subset assembly — pure in the step
        index, so the prefetch worker can stage it ahead."""
        idx = pick_loader(self.train_args.seed, step, len(self.loaders))
        loader = self.loaders[idx]
        return idx, loader.train_batch(step), loader.subset_batch(step, "train")

    def _stack_chunk(self, chunk, mgr):
        """Host-side packing of k same-loader micro-batches: pad each to
        the chunk's max seq length with labels=-100 / mask=0 (the extension
        is causally invisible and loss-excluded — caption_loss_grouped),
        stack, and L2-normalize mm/subset stacks in one device call each."""
        steps = np.asarray([s for s, _, _, _ in chunk], np.int32)
        T = max(b["input_ids"].shape[1] for _, _, b, _ in chunk)

        def padded(b, key, fill):
            x = b[key]
            if x.shape[1] < T:
                ext = np.full((x.shape[0], T - x.shape[1]), fill, x.dtype)
                x = np.concatenate([x, ext], axis=1)
            return x

        ids = np.stack([padded(b, "input_ids", 0) for _, _, b, _ in chunk])
        mask = np.stack([padded(b, "attention_mask", 0) for _, _, b, _ in chunk])
        labels = np.stack([padded(b, "labels", -100) for _, _, b, _ in chunk])
        mm = mgr.get_embeddings(np.stack([b["embs"] for _, _, b, _ in chunk]))
        raw0 = chunk[0][3]
        if isinstance(raw0, (tuple, list)):
            subset = mgr.get_embeddings(tuple(
                np.stack([c[3][j] for c in chunk]) for j in range(len(raw0))
            ))
        else:
            subset = mgr.get_embeddings(np.stack([c[3] for c in chunk]))
        dev = (jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(labels))
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            s = NamedSharding(self.mesh, P(None, "data", None))
            dev = tuple(jax.device_put(x, s) for x in dev)
        return mm, subset, dev, jnp.asarray(steps)

    def _run_window(self, window):
        """Execute one accumulation window's micro-batches: group by
        loader, run full-k same-loader chunks coalesced, the rest through
        the sequential micro (grad order within a window is free).
        Returns the window's accumulated loss (device scalar)."""
        from collections import defaultdict

        per = defaultdict(list)
        for item in window:
            per[item[1]].append(item)
        loss_sum = 0.0
        for idx, items in per.items():
            mgr = self.emb_mgrs[idx]
            pos = 0
            while pos < len(items):
                chunk = items[pos:pos + self.coalesce]
                if len(chunk) == self.coalesce and self.coalesce > 1:
                    mm, subset, (ids, mask, labels), steps = self._stack_chunk(chunk, mgr)
                    self.state, loss = self._micro_step_k(
                        self.state, self.llm_params, mm, subset, ids, mask,
                        labels, steps, can_rotate=True,
                    )
                    loss_sum = loss_sum + loss
                    pos += len(chunk)
                else:  # remainder: the sequential micro, one at a time
                    step, _, batch, subset_raw = items[pos]
                    subset = mgr.get_embeddings(subset_raw)
                    mm = mgr.get_embeddings(batch["embs"])
                    ids, mask, labels = self._device_batch(batch)
                    rot_key = jax.random.fold_in(self._base_key, 2 * step)
                    hn_rng = jax.random.fold_in(self._base_key, 2 * step + 1)
                    self.state, loss, _ = self._micro_step(
                        self.state, self.llm_params, mm, subset, ids, mask,
                        labels, rot_key, hn_rng, step, False, can_rotate=True,
                    )
                    loss_sum = loss_sum + loss
                    pos += 1
        return loss_sum

    def _train_coalesced(self, start_step: int):
        """train() with micro_batch_coalesce > 1: buffer each accumulation
        window, execute it via _run_window, then apply the update — the
        same step-indexed batches/keys/schedule as the sequential loop,
        equal up to gradient summation order."""
        from dmi_tpu.data.prefetch import Prefetcher
        from dmi_tpu.utils.logging import MetricLogger

        total = self.total_steps
        cur_eval_loss = float("inf")
        mlog = MetricLogger(self.name, f"dmi_{self.TRAINER_TYPE}")
        grad_stats = None
        prefetcher = Prefetcher(self.fetch_batch, depth=2 * self.coalesce)
        window = []
        for step, (idx, batch, subset_raw) in prefetcher.run(start_step, total):
            window.append((step, idx, batch, subset_raw))
            if not self.cond.grad_acc(step, total):
                continue
            accumulated = self._run_window(window)
            window = []
            self.state, gstats = self._update_step(self.state, step)
            grad_stats = gstats
            if (step + 1) % self.train_args.logging_steps == 0 and step > 0:
                log.info("Step: %d/%d Train Loss: %.3f", step, total, float(accumulated))
                rec = {"train_loss": float(accumulated)}
                if grad_stats is not None:
                    from dmi_tpu.utils.grad_stats import host_grad_summary

                    rec.update(host_grad_summary(grad_stats))
                mlog.log(rec, step)
            if self.cond.evaluate(step, total):
                cur_eval_loss = self.evaluate()
                log.info("Step: %d Eval Loss: %.3f", step, cur_eval_loss)
                mlog.log({"eval_loss": cur_eval_loss}, step)
            if self.cond.generate(step, total, include_final=False):
                all_metrics, _, _, _ = self.generate(mode="eval")
                log.info("Step: %d Metrics: %s", step, all_metrics)
                for mname, ms in all_metrics.items():
                    mlog.log({f"{k} - {mname}": v for k, v in ms.items()}, step)
            if self.cond.save(step, total):
                self.ckpt.save(
                    step, cur_eval_loss, "loss", self.state.params,
                    optimizer_state=self.state.opt_state
                    if self.train_args.save_state else None,
                )
        return cur_eval_loss

    def train(self, start_step: int = 0):
        from dmi_tpu.data.prefetch import Prefetcher

        from dmi_tpu.utils.logging import MetricLogger

        if self.coalesce > 1:
            return self._train_coalesced(start_step)

        total = self.total_steps
        accumulated = 0.0
        cur_eval_loss = float("inf")
        mlog = MetricLogger(self.name, f"dmi_{self.TRAINER_TYPE}")
        grad_stats = None
        prefetcher = Prefetcher(self.fetch_batch, depth=2)
        for step, (idx, batch, subset_raw) in prefetcher.run(start_step, total):
            if step % self.train_args.gradient_accumulation_steps == 0:
                accumulated = 0.0
            mgr = self.emb_mgrs[idx]
            subset = mgr.get_embeddings(subset_raw)
            mm = mgr.get_embeddings(batch["embs"])
            ids, mask, labels = self._device_batch(batch)
            rot_key = jax.random.fold_in(self._base_key, 2 * step)
            hn_rng = jax.random.fold_in(self._base_key, 2 * step + 1)
            do_update = self.cond.grad_acc(step, total)
            self.state, loss, gstats = self._micro_step(
                self.state, self.llm_params, mm, subset, ids, mask, labels,
                rot_key, hn_rng, step, do_update, can_rotate=True,
            )
            if gstats is not None:
                grad_stats = gstats
            accumulated = accumulated + loss  # device scalar; sync at log time
            if do_update:
                if (step + 1) % self.train_args.logging_steps == 0 and step > 0:
                    log.info("Step: %d/%d Train Loss: %.3f", step, total, float(accumulated))
                    rec = {"train_loss": float(accumulated)}
                    if grad_stats is not None:
                        from dmi_tpu.utils.grad_stats import host_grad_summary

                        rec.update(host_grad_summary(grad_stats))
                    mlog.log(rec, step)
                if self.cond.evaluate(step, total):
                    cur_eval_loss = self.evaluate()
                    log.info("Step: %d Eval Loss: %.3f", step, cur_eval_loss)
                    mlog.log({"eval_loss": cur_eval_loss}, step)
                if self.cond.generate(step, total, include_final=False):
                    all_metrics, _, _, _ = self.generate(mode="eval")
                    log.info("Step: %d Metrics: %s", step, all_metrics)
                    # reference wandb.logs every metric (dmi/train.py:169-178)
                    for mname, ms in all_metrics.items():
                        mlog.log({f"{k} - {mname}": v for k, v in ms.items()}, step)
                if self.cond.save(step, total):
                    self.ckpt.save(
                        step, cur_eval_loss, "loss", self.state.params,
                        optimizer_state=self.state.opt_state
                        if self.train_args.save_state else None,
                    )
        return cur_eval_loss

    def evaluate(self, fewshot_idx: Optional[int] = None) -> float:
        """Per-batch mean loss (dmi/train_hypernet.py:310-352)."""
        if fewshot_idx is None:
            pairs = list(zip(self.loaders, self.emb_mgrs))
        else:
            pairs = [(self.fewshot_loaders[fewshot_idx], self.fewshot_emb_mgrs[fewshot_idx])]
        losses = []
        for loader, mgr in pairs:
            for bi, batch in enumerate(loader.eval_batches("validation")):
                subset = mgr.get_embeddings(loader.subset_batch(bi, "validation"))
                batch_p = pad_batch_dim(
                    {k: v for k, v in batch.items() if k != "ids" and k != "embs"},
                    self.train_args.eval_batch_size,
                )
                mm = mgr.get_embeddings(
                    pad_emb_rows(batch["embs"], self.train_args.eval_batch_size)
                )
                ids, mask, labels = self._device_batch(batch_p)
                # device scalars accumulated async; single host sync below
                # (mirrors the train loop's no-per-step-float discipline)
                losses.append(
                    self._eval_loss(self.state.params, self.llm_params, mm, subset, ids, mask, labels)
                )
        if not losses:  # empty eval split: nan, like the reference's mean([])
            return float("nan")
        return float(np.mean(np.asarray(jnp.stack(losses))))

    # ------------------------------------------------------------------
    # generate (shared by train eval + fewshot)
    # ------------------------------------------------------------------

    def _soft_for_generate(self, mm, subset):
        if self.generated_projector is not None:
            return proj.apply(self.proj_spec_generated, self.generated_projector, mm)
        return self._soft_tokens_eval(self.state.params, mm, subset)

    def generate(self, mode: str = "eval", fewshot_idx: Optional[int] = None):
        assert mode in ("eval", "test")
        split = "validation" if mode == "eval" else "test"
        if fewshot_idx is None:
            triples = [
                (ld, mgr) for ld, mgr in zip(self.loaders, self.emb_mgrs)
            ]
        else:
            triples = [
                (self.fewshot_loaders[fewshot_idx], self.fewshot_emb_mgrs[fewshot_idx])
            ]
        all_metrics, all_gts, all_preds, all_ids = {}, {}, {}, {}
        bsz = self.train_args.eval_batch_size
        for loader, mgr in triples:
            mgr_name = mgr.short_name
            gts, preds, ids = [], [], []
            prefix = prefix_prompt_ids(self.tokenizer, loader, bsz)
            for bi, batch in enumerate(loader.eval_batches(split)):
                real = batch["input_ids"].shape[0]
                gt_texts = safe_batch_decode(
                    self.tokenizer,
                    batch["input_ids"], skip_special_tokens=True
                )
                gts.extend(strip_to_assistant(gt_texts))
                ids.extend(batch["ids"])
                subset = mgr.get_embeddings(loader.subset_batch(bi, split))
                mm = mgr.get_embeddings(pad_emb_rows(batch["embs"], bsz))
                soft = self._soft_for_generate(mm, subset)
                tokens = mmmodel.caption_generate(
                    self.llm_cfg, self.llm_params, soft, prefix,
                    loader.max_new_tokens, self.tokenizer.pad_token_id,
                )
                preds.extend(
                    safe_batch_decode(
                    self.tokenizer,
                        np.asarray(tokens)[:real], skip_special_tokens=True
                    )
                )
            all_gts[mgr_name] = gts
            all_preds[mgr_name] = preds
            all_ids[mgr_name] = ids
            all_metrics[mgr_name] = metrics_for(
                loader, preds, ids, gts, self.name, mode, self.data_root
            )
        return all_metrics, all_gts, all_preds, all_ids

    # ------------------------------------------------------------------
    # stage-3: fewshot
    # ------------------------------------------------------------------

    @property
    def proj_spec_generated(self) -> proj.ProjectorSpec:
        return self.proj_spec

    def fewshot_generate_adapters(self, emb_idx: int):
        """dmi/train_hypernet.py:168-200."""
        if not self.fewshot_args.finetune_generated_projector:
            return
        loader = self.fewshot_loaders[emb_idx]
        mgr = self.fewshot_emb_mgrs[emb_idx]
        if self.fewshot_args.fewshot_n_adapters == "one":
            n_subsets = 1
        elif self.fewshot_args.fewshot_n_adapters == "multiple":
            n_subsets = max(
                1, len(loader.train) // self.train_args.subset_batch_size
            )
        else:
            raise ValueError(self.fewshot_args.fewshot_n_adapters)
        log.info("Generating %d adapters for fewshot training", n_subsets)
        draws = []
        for s in range(n_subsets):
            subset = mgr.get_embeddings(loader.subset_batch(s, "train"))
            _, z = process_embeddings(
                jnp.zeros((1, self.proj_spec.mm_dim)), subset,
                feed_txt_embs=self.train_args.feed_txt_embs,
                augment=False, rotate_key=None, pad_to=self.pad_to,
            )
            draws.append(hn.apply(self.hn_spec, self.state.params, z, train=False))
        avg = hn.average_adapters(draws)
        self.generated_projector = proj.combine_lora(self.proj_spec, self.frozen_proj, *avg)

    def fewshot_generate(self, train_step_idx: Optional[int] = None):
        """dmi/train_hypernet.py:202-295."""
        from dmi_tpu.utils.logging import MetricLogger

        args, fargs = self.train_args, self.fewshot_args
        mlog = MetricLogger(self.name, f"dmi_{self.TRAINER_TYPE}")
        all_test = {"metrics": {}, "gts": {}, "preds": {}, "ids": {}}
        for emb_idx, (loader, mgr) in enumerate(
            zip(self.fewshot_loaders, self.fewshot_emb_mgrs)
        ):
            mgr_name = mgr.short_name
            total = loader.total_train_steps()
            self.fewshot_generate_adapters(emb_idx)

            # fresh AdamW over the trainable set (:220-224)
            fs_args = TrainArgs(
                output_dir=args.output_dir,
                learning_rate=fargs.fewshot_learning_rate,
                weight_decay=fargs.fewshot_weight_decay,
                max_grad_norm=args.max_grad_norm,
                adam_beta1=0.9, adam_beta2=0.999, adam_epsilon=1e-8,
            )
            trainable = (
                self.generated_projector
                if self.generated_projector is not None
                else self.hn_params
            )
            fs_opt = make_optimizer(fs_args)
            fs_state = TrainState(
                params=trainable,
                opt_state=fs_opt.init(trainable),
                accum=jax.tree.map(jnp.zeros_like, trainable),
                sched_step=jnp.asarray(0, jnp.int32),
            )
            micro = self._build_fewshot_step(fs_opt, fargs.fewshot_learning_rate)

            fs_ckpt = BestCheckpointer(
                args.checkpoint_dir, self.name, "fewshot", mode="max"
            )
            best_metric = float("-inf")
            comp_metric = "coco_cider"
            accumulated = 0.0
            from dmi_tpu.data.prefetch import Prefetcher

            fs_prefetcher = Prefetcher(
                lambda s, _ld=loader: (_ld.train_batch(s), _ld.subset_batch(s, "train")),
                depth=2,
            )
            for step, (batch, subset_raw) in fs_prefetcher.run(0, total):
                if step % args.gradient_accumulation_steps == 0:
                    accumulated = 0.0
                subset = mgr.get_embeddings(subset_raw)
                mm = mgr.get_embeddings(batch["embs"])
                ids, mask, labels = self._device_batch(batch)
                rng = jax.random.fold_in(self._base_key, 3 * step + 2)
                do_update = self.cond.grad_acc(step, total)
                fs_state, loss = micro(
                    fs_state, self.llm_params, mm, subset, ids, mask, labels,
                    rng, do_update,
                )
                accumulated = accumulated + loss  # device scalar
                if self.generated_projector is not None:
                    self.generated_projector = fs_state.params
                else:
                    self.state = self.state._replace(params=fs_state.params)
                if do_update:
                    if (step + 1) % args.logging_steps == 0 and step > 0:
                        log.info("Fewshot step %d/%d loss %.3f", step, total, float(accumulated))
                        # reference fewshot loop wandb.logs train_loss per
                        # update (dmi/train.py:116-118 via train_hypernet.py:255)
                        mlog.log({"train_loss": float(accumulated)}, step)
                    if self.cond.evaluate(step, total):
                        all_metrics, _, _, _ = self.generate("eval", fewshot_idx=emb_idx)
                        comp_metric, cur = self._comp_metric(all_metrics)
                        if best_metric < cur:
                            log.info("Best %s: %s < %s", comp_metric, best_metric, cur)
                            best_metric = cur
                            save_pytree(
                                fs_ckpt.best_path,
                                {
                                    "step_idx": step,
                                    "hypernet_state_dict": self.state.params,
                                    "generated_projector": self.generated_projector,
                                    comp_metric: cur,
                                },
                            )

            best = fs_ckpt.load_best()
            if best is not None:
                self.state = self.state._replace(
                    params=jax.tree.map(jnp.asarray, best["hypernet_state_dict"])
                )
                if best.get("generated_projector") is not None:
                    self.generated_projector = jax.tree.map(
                        jnp.asarray, best["generated_projector"]
                    )
            tm, tg, tp, ti = self.generate("test", fewshot_idx=emb_idx)
            all_test["metrics"][mgr_name] = tm[mgr_name]
            all_test["gts"][mgr_name] = tg[mgr_name]
            all_test["preds"][mgr_name] = tp[mgr_name]
            all_test["ids"][mgr_name] = ti[mgr_name]
            self.generated_projector = None  # (:294-295)

        from dmi_tpu.evals.environment import eval_environment

        save_run_results(
            args.output_root, self.TRAINER_TYPE, self.name,
            all_test["metrics"], all_test["gts"], all_test["preds"], all_test["ids"],
            eval_env=eval_environment(self.fewshot_loaders[0].dataset_name),
        )
        return all_test["metrics"]

    def _comp_metric(self, all_metrics):
        return comp_metric(all_metrics)

    def _build_fewshot_step(self, fs_opt, lr):
        cfg = self.llm_cfg
        args = self.train_args
        accum_steps = args.gradient_accumulation_steps
        finetune_generated = self.generated_projector is not None

        if finetune_generated:

            def loss_fn(params, llm_params, mm, subset, ids, mask, labels, rng):
                soft = proj.apply(self.proj_spec, params, mm, train=True, rng=rng)
                return mmmodel.caption_loss(cfg, llm_params, soft, ids, mask, labels)

        else:

            def loss_fn(params, llm_params, mm, subset, ids, mask, labels, rng):
                mm2, z = process_embeddings(
                    mm, subset, feed_txt_embs=args.feed_txt_embs,
                    augment=False, rotate_key=None, pad_to=self.pad_to,
                )
                soft = self._soft_from_hypernet(params, mm2, z, rng, train=True)
                return mmmodel.caption_loss(cfg, llm_params, soft, ids, mask, labels)

        @partial(jax.jit, static_argnames=("do_update",))
        def micro(state, llm_params, mm, subset, ids, mask, labels, rng, do_update):
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, llm_params, mm, subset, ids, mask, labels, rng
            )
            loss = loss / accum_steps
            grads = jax.tree.map(lambda g: g / accum_steps, grads)
            accum = jax.tree.map(jnp.add, state.accum, grads)
            if not do_update:
                return state._replace(accum=accum), loss
            opt_state = set_lr(state.opt_state, jnp.asarray(lr, jnp.float32))
            updates, opt_state = fs_opt.update(accum, opt_state, state.params)
            params = jax.tree.map(jnp.add, state.params, updates)
            accum = jax.tree.map(jnp.zeros_like, accum)
            return TrainState(params, opt_state, accum, state.sched_step), loss

        return micro
