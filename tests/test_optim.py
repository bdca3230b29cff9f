"""Optimizer/schedule parity: AdamW vs torch, LR curves vs reference math."""

import math

import numpy as np
import torch

import jax
import jax.numpy as jnp

from dmi_tpu.config import TrainArgs
from dmi_tpu.training.optim import (
    constant_warmup_lambda,
    cosine_warmup_lambda,
    make_lr_fn,
    make_optimizer,
    set_lr,
)


def test_adamw_matches_torch_step_for_step():
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(8, 4)).astype(np.float32)

    args = TrainArgs(
        output_dir="x", learning_rate=1e-3, weight_decay=0.01,
        adam_beta1=0.9, adam_beta2=0.95, adam_epsilon=1e-8, max_grad_norm=1.0,
    )
    opt = make_optimizer(args)
    params = {"w": jnp.asarray(w0)}
    opt_state = opt.init(params)

    wt = torch.nn.Parameter(torch.tensor(w0.copy()))
    topt = torch.optim.AdamW([wt], lr=1e-3, betas=(0.9, 0.95), eps=1e-8, weight_decay=0.01)

    for step in range(5):
        g = rng.normal(size=(8, 4)).astype(np.float32) * (step + 1)
        # torch: clip then step
        wt.grad = torch.tensor(g.copy())
        torch.nn.utils.clip_grad_norm_([wt], 1.0)
        topt.step()
        # ours
        opt_state = set_lr(opt_state, jnp.asarray(1e-3))
        updates, opt_state = opt.update({"w": jnp.asarray(g)}, opt_state, params)
        params = jax.tree.map(jnp.add, params, updates)
        np.testing.assert_allclose(
            np.asarray(params["w"]), wt.detach().numpy(), atol=1e-6, err_msg=f"step {step}"
        )


def test_cosine_warmup_matches_reference_formula():
    lam = cosine_warmup_lambda(100, 1000)
    for step in [0, 1, 50, 99, 100, 500, 999, 1000]:
        if step < 100:
            expected = step / 100
        else:
            progress = (step - 100) / max(1, 1000 - 100)
            expected = max(0.0, 0.5 * (1.0 + math.cos(math.pi * 0.5 * 2.0 * progress)))
        assert abs(float(lam(step)) - expected) < 1e-6, step  # f32 cos


def test_constant_warmup():
    lam = constant_warmup_lambda(10)
    assert float(lam(0)) == 0.0
    assert float(lam(5)) == 0.5
    assert float(lam(10)) == 1.0
    assert float(lam(500)) == 1.0


def test_make_lr_fn_selection():
    args = TrainArgs(output_dir="x", learning_rate=2e-4, scheduler=None)
    fn = make_lr_fn(args, 100)
    assert float(fn(50)) == np.float32(2e-4)
    args = TrainArgs(output_dir="x", scheduler="bogus")
    import pytest

    with pytest.raises(ValueError):
        make_lr_fn(args, 100)
