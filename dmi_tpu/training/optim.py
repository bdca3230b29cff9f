"""Optimizer + step-indexed LR schedules (exact reference semantics).

The reference drives torch LambdaLR with explicit step indices —
``scheduler.step(step_idx)`` AFTER ``optimizer.step()`` (e.g.
dmi/train_projector.py:72-73) — so the LR used by the update at micro-step
s is lambda(s_prev) where s_prev is the previous update's step index
(lambda(0) for the first update).  We reproduce that exactly by carrying
``sched_step`` in the train state: lr = base * lambda(sched_step), and
sched_step is set to the current micro-step after each applied update.

AdamW matches torch semantics (decoupled weight decay scaled by lr), which
optax.adamw implements; clipping is global-norm over the trainable pytree
(torch clip_grad_norm_, dmi/train_projector.py:71).
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp
import optax

from dmi_tpu.config import TrainArgs


def cosine_warmup_lambda(num_warmup_steps: int, num_training_steps: int, num_cycles: float = 0.5) -> Callable:
    """reference: dmi/utils/scheduler.py:10-33 (torchtune-derived)."""

    def lr_lambda(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / max(1, num_warmup_steps)
        progress = (step - num_warmup_steps) / max(1, num_training_steps - num_warmup_steps)
        cos = 0.5 * (1.0 + jnp.cos(math.pi * num_cycles * 2.0 * progress))
        return jnp.where(step < num_warmup_steps, warm, jnp.maximum(0.0, cos))

    return lr_lambda


def constant_warmup_lambda(num_warmup_steps: int) -> Callable:
    """reference: dmi/utils/scheduler.py:36-49."""

    def lr_lambda(step):
        step = jnp.asarray(step, jnp.float32)
        return jnp.where(step < num_warmup_steps, step / max(1, num_warmup_steps), 1.0)

    return lr_lambda


def placeholder_lambda() -> Callable:
    return lambda step: jnp.asarray(1.0, jnp.float32)


def make_lr_fn(train_args: TrainArgs, total_steps: int) -> Callable:
    """scheduler selection (dmi/train_projector.py:263-277)."""
    base = train_args.learning_rate
    if train_args.scheduler == "linear_warmup":
        lam = constant_warmup_lambda(train_args.warmup_steps)
    elif train_args.scheduler == "cosine_warmup":
        lam = cosine_warmup_lambda(train_args.warmup_steps, total_steps)
    elif train_args.scheduler is None:
        lam = placeholder_lambda()
    else:
        raise ValueError("Scheduler should be either linear_warmup or cosine_warmup")
    return lambda step: base * lam(step)


def make_optimizer(train_args: TrainArgs, lr: float = 0.0) -> optax.GradientTransformation:
    """clip-by-global-norm -> AdamW with injectable learning rate."""
    return optax.chain(
        optax.clip_by_global_norm(train_args.max_grad_norm),
        optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr,
            b1=train_args.adam_beta1,
            b2=train_args.adam_beta2,
            eps=train_args.adam_epsilon,
            weight_decay=train_args.weight_decay,
        ),
    )


def set_lr(opt_state, lr):
    """Write the injected learning rate inside a jitted step."""
    opt_state[1].hyperparams["learning_rate"] = lr
    return opt_state


def set_adamw_moments(opt_state, mu, nu, count: int):
    """Splice imported AdamW moments (dmi_tpu.models.torch_import
    .adamw_moments_to_pytrees) into an initialized optax state: locate the
    ScaleByAdamState anywhere in the chain and replace (count, mu, nu).
    The moment pytrees must match the param tree the state was init'd on."""
    import jax

    found = [0]

    def is_adam(node):
        return hasattr(node, "mu") and hasattr(node, "nu") and hasattr(node, "count")

    def walk(node):
        if is_adam(node):
            found[0] += 1
            return node._replace(
                count=jnp.asarray(count, node.count.dtype),
                mu=jax.tree.map(jnp.asarray, mu),
                nu=jax.tree.map(jnp.asarray, nu),
            )
        if isinstance(node, tuple) and type(node) is not tuple:  # NamedTuple
            return type(node)(*[walk(v) for v in node])
        if isinstance(node, tuple):
            return tuple(walk(v) for v in node)
        if isinstance(node, list):
            return [walk(v) for v in node]
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return node

    new_state = walk(opt_state)
    if found[0] != 1:
        raise ValueError(f"expected exactly one ScaleByAdamState, found {found[0]}")
    return new_state
