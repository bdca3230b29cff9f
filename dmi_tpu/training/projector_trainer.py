"""Stage-1 projector trainer (+ from-scratch / fine-tuned baselines).

Functional port of ProjectorTrainer semantics (dmi/train_projector.py:24-176)
around a single jitted micro-step:
  * weighted multi-loader sampling by loader length (dmi/train.py:76)
  * gradient accumulation with loss/accum scaling, global-norm clip,
    step-indexed LR (reference ordering: update uses the LR set at the
    previous update's step index)
  * periodic eval loss, generate -> CIDEr/BLEU, best-checkpoint by
    coco_cider (fallback bleu) (dmi/train_projector.py:85-93)
  * final: reload best, test generate, results JSON
    (dmi/train_projector.py:95-98)
  * finetune_from_checkpoint flips TRAINER_TYPE to 'ft_projector' and
    prunes layer-0 input features to proj_prune
    (dmi/train_projector.py:36-38,166-176)
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Any, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dmi_tpu.config import TrainArgs
from dmi_tpu.data.collator import pad_batch_dim
from dmi_tpu.models import mmmodel
from dmi_tpu.models import projector as proj
from dmi_tpu.models.llama import LlamaConfig
from dmi_tpu.training.checkpoint import BestCheckpointer, load_pytree
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
    sched_step: jnp.ndarray  # last micro-step whose LR was installed


class ProjectorTrainer:
    TRAINER_TYPE = "projector"
    SAVE_TYPE = "projector"

    def __init__(
        self,
        name: str,
        llm_cfg: LlamaConfig,
        llm_params: dict,
        proj_spec: proj.ProjectorSpec,
        proj_params: dict,
        loaders: List,  # DatasetLoader per encoder/dataset pair
        emb_mgrs: List,
        tokenizer,
        train_args: TrainArgs,
        data_root: str = "data",
    ):
        self.name = name
        self.llm_cfg = llm_cfg
        self.llm_params = llm_params
        self.proj_spec = proj_spec
        self.loaders = loaders
        self.emb_mgrs = emb_mgrs
        self.tokenizer = tokenizer
        self.train_args = train_args
        self.data_root = data_root
        self.cond = StepConditions(train_args)
        self.ckpt = BestCheckpointer(
            train_args.checkpoint_dir, name, self.SAVE_TYPE, mode="max"
        )

        # optional multi-chip execution: tp-shard the frozen LLM, dp-shard
        # batches; XLA inserts the collectives (new surface vs the
        # single-device reference, SURVEY.md §5)
        self.mesh = None
        if train_args.mesh_shape:
            from dmi_tpu.parallel import make_mesh, shard_llm_params

            self.mesh = make_mesh(tuple(train_args.mesh_shape))
            llm_params = shard_llm_params(self.mesh, llm_params)
            self.llm_params = llm_params

        if train_args.finetune_from_checkpoint:
            self.TRAINER_TYPE = "ft_projector"
            proj_params = self._load_pruned(train_args.finetune_from_checkpoint, proj_params)

        self.opt = make_optimizer(train_args)
        total = sum(ld.total_train_steps() for ld in loaders)
        self.total_steps = total
        self.lr_fn = make_lr_fn(train_args, total)
        self.state = TrainState(
            params=proj_params,
            opt_state=self.opt.init(proj_params),
            accum=jax.tree.map(jnp.zeros_like, proj_params),
            sched_step=jnp.asarray(0, jnp.int32),
        )
        self._base_key = jax.random.key(train_args.seed)
        self._build_steps()

    # ------------------------------------------------------------------

    def _load_pruned(self, path: str, init_params: dict) -> dict:
        """Load a pretrained projector, pruning layer-0 input features when
        the checkpoint is wider than this run's mm_dim
        (dmi/train_projector.py:166-176)."""
        ckpt = load_pytree(path)
        params = ckpt[f"{self.SAVE_TYPE}_state_dict"]
        keep = self.proj_spec.mm_dim
        if params["layers"][0]["w"].shape[0] > keep:
            params = proj.prune(params, keep)
        return jax.tree.map(jnp.asarray, params)

    def _soft_train(self, params, embs, rng):
        """Trainable-forward producing the soft token (overridden by the
        LoRA baseline trainer)."""
        return proj.apply(self.proj_spec, params, embs, train=True, rng=rng)

    def _soft_eval(self, params, embs):
        return proj.apply(self.proj_spec, params, embs, train=False)

    def _build_steps(self):
        cfg = self.llm_cfg
        accum_steps = self.train_args.gradient_accumulation_steps

        def loss_fn(params, llm_params, embs, ids, mask, labels, rng):
            soft = self._soft_train(params, embs, rng)
            return mmmodel.caption_loss(cfg, llm_params, soft, ids, mask, labels)

        @partial(jax.jit, static_argnames=("do_update",))
        def micro_step(state, llm_params, embs, ids, mask, labels, rng, step, do_update):
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, llm_params, embs, ids, mask, labels, rng
            )
            loss = loss / accum_steps
            grads = jax.tree.map(lambda g: g / accum_steps, grads)
            accum = jax.tree.map(jnp.add, state.accum, grads)
            if not do_update:
                return state._replace(accum=accum), loss, None
            # gradient summary of the full accumulated gradient the
            # optimizer consumes (wandb.watch analogue, dmi/train.py:70) —
            # device scalars, fetched only at logging cadence
            from dmi_tpu.utils.grad_stats import grad_summary

            gstats = grad_summary(accum)
            lr = self.lr_fn(state.sched_step)
            opt_state = set_lr(state.opt_state, lr)
            updates, opt_state = self.opt.update(accum, opt_state, state.params)
            params = jax.tree.map(jnp.add, state.params, updates)
            # optax.apply_updates via tree add (updates already negated)
            accum = jax.tree.map(jnp.zeros_like, accum)
            return (
                TrainState(params, opt_state, accum, jnp.asarray(step, jnp.int32)),
                loss,
                gstats,
            )

        @jax.jit
        def eval_loss(params, llm_params, embs, ids, mask, labels):
            soft = self._soft_eval(params, embs)
            return mmmodel.caption_loss(cfg, llm_params, soft, ids, mask, labels)

        self._micro_step = micro_step
        self._eval_loss = eval_loss

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

    def fetch_batch(self, step: int):
        """Host-side batch assembly — a pure function of the step index
        (stateless samplers/prefixes), so it can be prefetched ahead."""
        # weighted by per-loader step counts (dmi/train.py:76)
        weights = [ld.total_train_steps() for ld in self.loaders]
        idx = pick_loader(self.train_args.seed, step, len(self.loaders), weights)
        return idx, self.loaders[idx].train_batch(step)

    def train_step(self, step: int, total_steps: int, prefetched=None):
        idx, batch = prefetched if prefetched is not None else self.fetch_batch(step)
        embs = self.emb_mgrs[idx].get_embeddings(batch["embs"])
        ids, mask, labels = self._device_batch(batch)
        rng = jax.random.fold_in(self._base_key, step)
        do_update = self.cond.grad_acc(step, total_steps)
        self.state, loss, gstats = self._micro_step(
            self.state, self.llm_params, embs, ids, mask, labels, rng, step, do_update
        )
        if gstats is not None:
            self._last_grad_stats = gstats  # device dict; fetched at log time
        # loss stays a device scalar — forcing it every micro-step would
        # serialize host batch prep against device compute
        return loss, do_update

    def evaluate(self) -> float:
        """Mean of per-batch losses across all eval loaders
        (dmi/train_projector.py:100-129)."""
        losses = []
        for emb_idx, loader in enumerate(self.loaders):
            for batch in loader.eval_batches("validation"):
                batch_p = pad_batch_dim(
                    {k: v for k, v in batch.items() if k != "ids" and k != "embs"},
                    self.train_args.eval_batch_size,
                )
                embs_np = pad_emb_rows(batch["embs"], self.train_args.eval_batch_size)
                embs = self.emb_mgrs[emb_idx].get_embeddings(embs_np)
                ids, mask, labels = self._device_batch(batch_p)
                # keep losses as device scalars: a float() here would sync
                # host<->device once per batch and serialize the whole pass
                # (the train loop avoids exactly this) — one sync at the end
                losses.append(self._eval_loss(self.state.params, self.llm_params, embs, ids, mask, labels))
        if not losses:  # empty eval split: nan, like the reference's mean([])
            return float("nan")
        return float(np.mean(np.asarray(jnp.stack(losses))))

    # ------------------------------------------------------------------

    def _generate_soft(self, embs):
        return self._soft_eval(self.state.params, embs)

    def generate(self, mode: str = "eval"):
        """Decode + metrics for every loader (dmi/train_projector.py:131-164)."""
        assert mode in ("eval", "test")
        split = "validation" if mode == "eval" else "test"
        all_metrics, all_gts, all_preds, all_ids = {}, {}, {}, {}
        bsz = self.train_args.eval_batch_size
        for emb_idx, loader in enumerate(self.loaders):
            mgr_name = self.emb_mgrs[emb_idx].short_name
            gts, preds, ids = [], [], []
            prefix = prefix_prompt_ids(self.tokenizer, loader, bsz)
            for batch in loader.eval_batches(split):
                real = batch["input_ids"].shape[0]
                gt_texts = safe_batch_decode(
                    self.tokenizer,
                    batch["input_ids"], skip_special_tokens=True
                )
                gts.extend(strip_to_assistant(gt_texts))
                ids.extend(batch["ids"])
                embs = self.emb_mgrs[emb_idx].get_embeddings(
                    pad_emb_rows(batch["embs"], bsz)
                )
                soft = self._generate_soft(embs)
                tokens = mmmodel.caption_generate(
                    self.llm_cfg,
                    self.llm_params,
                    soft,
                    prefix,
                    loader.max_new_tokens,
                    self.tokenizer.pad_token_id,
                )
                texts = safe_batch_decode(
                    self.tokenizer,
                    np.asarray(tokens)[:real], skip_special_tokens=True
                )
                preds.extend(texts)
            all_gts[mgr_name] = gts
            all_preds[mgr_name] = preds
            all_ids[mgr_name] = ids
            all_metrics[mgr_name] = metrics_for(
                loader, preds, ids, gts, self.name, mode, self.data_root
            )
        return all_metrics, all_gts, all_preds, all_ids

    # ------------------------------------------------------------------

    def comp_metric_value(self, all_metrics) -> tuple:
        return comp_metric(all_metrics)

    def resume(self, path: Optional[str] = None) -> int:
        """Restore params + optimizer state + step from an explicit
        checkpoint path (the reference loads the configured
        resume_from_checkpoint, dmi/train_projector.py:34-35) or this run's
        best checkpoint.  Exact resume — the stateless sampler removes the
        reference's iterator-replay approximation (dmi/train.py:79-86)."""
        if path:
            best = load_pytree(path)
        else:
            best = self.ckpt.load_best()
        if best is None:
            return 0
        self.state = self.state._replace(
            params=jax.tree.map(jnp.asarray, best[f"{self.SAVE_TYPE}_state_dict"])
        )
        if best.get("optimizer_state_dict") is not None:
            self.state = self.state._replace(
                opt_state=jax.tree.map(jnp.asarray, best["optimizer_state_dict"]),
                sched_step=jnp.asarray(best["step_idx"], jnp.int32),
            )
        elif path:
            # reference torch checkpoints carry torch AdamW moments instead
            # of optax state; convert them so the resume continues with the
            # trained moments (torch step == optax count semantics)
            from dmi_tpu.models.torch_import import optax_moments_from_checkpoint
            from dmi_tpu.training.optim import set_adamw_moments

            m = optax_moments_from_checkpoint(path, self.SAVE_TYPE)
            if m is not None:
                self.state = self.state._replace(
                    opt_state=set_adamw_moments(
                        self.state.opt_state, m["mu"], m["nu"], m["count"]
                    ),
                    sched_step=jnp.asarray(best["step_idx"], jnp.int32),
                )
        return int(best["step_idx"]) + 1

    def train(self, start_step: int = 0):
        from dmi_tpu.utils.logging import MetricLogger
        from dmi_tpu.utils.profiling import trace

        total = self.total_steps
        accumulated = 0.0
        cur_metric, comp_metric = float("-inf"), "coco_cider"
        mlog = MetricLogger(self.name, f"dmi_{self.TRAINER_TYPE}")
        from dmi_tpu.data.prefetch import Prefetcher

        import time as _time

        prefetcher = Prefetcher(self.fetch_batch, depth=2)
        last_log_t, last_log_step = _time.perf_counter(), start_step
        with trace(self.train_args.profile_dir):
            for step, prefetched in prefetcher.run(start_step, total):
                if step % self.train_args.gradient_accumulation_steps == 0:
                    accumulated = 0.0
                loss, did_update = self.train_step(step, total, prefetched)
                accumulated += loss
                if did_update:
                    if (step + 1) % self.train_args.logging_steps == 0 and step > 0:
                        acc = float(accumulated)  # host sync only at log time
                        # the sync above makes wall time between logs cover
                        # real device work — honest steps/s on async backends
                        now = _time.perf_counter()
                        sps = (step - last_log_step) / max(now - last_log_t, 1e-9)
                        last_log_t, last_log_step = now, step
                        log.info("Step: %d/%d Train Loss: %.3f", step, total, acc)
                        rec = {"train_loss": acc, "steps_per_s": sps}
                        if getattr(self, "_last_grad_stats", None) is not None:
                            from dmi_tpu.utils.grad_stats import host_grad_summary

                            rec.update(host_grad_summary(self._last_grad_stats))
                        mlog.log(rec, step)
                    if self.cond.evaluate(step, total):
                        ev = self.evaluate()
                        log.info("Step: %d Eval Loss: %.3f", step, ev)
                        mlog.log({"eval_loss": ev}, step)
                    if self.cond.generate(step, total):
                        all_metrics, all_gts, all_preds, _ = self.generate("eval")
                        comp_metric, cur_metric = self.comp_metric_value(all_metrics)
                        log.info("Step: %d Metrics: %s", step, all_metrics)
                        for mgr, ms in all_metrics.items():
                            mlog.log({f"{k} - {mgr}": v for k, v in ms.items()}, step)
                            # prediction table sample (dmi/train.py:182-185)
                            mlog.log(
                                {
                                    f"samples - {mgr}": [
                                        {"expected": g, "prediction": p}
                                        for g, p in list(
                                            zip(all_gts[mgr], all_preds[mgr])
                                        )[:10]
                                    ]
                                },
                                step,
                            )
                    if self.cond.save(step, total):
                        self.ckpt.save(
                            step, cur_metric, comp_metric, self.state.params,
                            optimizer_state=self.state.opt_state
                            if self.train_args.save_state else None,
                        )
        mlog.finish()

        best = self.ckpt.load_best()
        if best is not None:
            self.state = self.state._replace(
                params=jax.tree.map(jnp.asarray, best[f"{self.SAVE_TYPE}_state_dict"])
            )
        test_metrics, test_gts, test_preds, test_ids = self.generate("test")
        from dmi_tpu.evals.environment import eval_environment

        save_run_results(
            self.train_args.output_root,
            self.TRAINER_TYPE,
            self.name,
            test_metrics,
            test_gts,
            test_preds,
            test_ids,
            eval_env=eval_environment(self.loaders[0].dataset_name),
        )
        return test_metrics
