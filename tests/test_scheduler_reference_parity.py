"""LR-sequence parity with the reference's LambdaLR usage.

The reference steps its scheduler with explicit indices AFTER each update
(dmi/train_projector.py:72-73), so the LR used by update k is
lambda(previous update's step index).  Our trainers carry `sched_step` to
reproduce exactly that.  This test replays the reference's torch loop and
compares the per-update LR sequence."""

import numpy as np
import pytest
import torch

from dmi_tpu.config import TrainArgs
from dmi_tpu.training.optim import make_lr_fn
from tests.conftest import requires_reference, REFERENCE_ROOT


def _load_ref_schedulers():
    import ast
    import math
    import os.path as osp

    src = open(osp.join(REFERENCE_ROOT, "dmi", "utils", "scheduler.py")).read()
    tree = ast.parse(src)
    keep = [
        n for n in tree.body
        if isinstance(n, ast.FunctionDef)
        and n.name in ("get_cosine_schedule_with_warmup", "get_constant_schedule_with_warmup")
    ]
    ns = {"math": math, "torch": torch}
    from torch.optim.lr_scheduler import LambdaLR

    ns["LambdaLR"] = LambdaLR
    exec(compile(ast.Module(body=keep, type_ignores=[]), "<ref-sched>", "exec"), ns)
    return ns


@requires_reference
@pytest.mark.parametrize("kind", ["cosine_warmup", "linear_warmup"])
@pytest.mark.parametrize("accum", [1, 4])
def test_lr_sequence_matches_reference_loop(kind, accum):
    ns = _load_ref_schedulers()
    base_lr, warmup, total = 1e-3, 5, 40

    opt = torch.optim.AdamW([torch.nn.Parameter(torch.zeros(1))], lr=base_lr)
    if kind == "cosine_warmup":
        sched = ns["get_cosine_schedule_with_warmup"](opt, warmup, total)
    else:
        sched = ns["get_constant_schedule_with_warmup"](opt, warmup)

    # reference loop: lr BEFORE optimizer.step is what the update uses;
    # scheduler.step(step_idx) runs after (dmi/train_projector.py:70-73)
    ref_lrs = []
    for step_idx in range(total):
        do_update = (step_idx == total - 1) or ((step_idx + 1) % accum == 0)
        if do_update:
            ref_lrs.append(opt.param_groups[0]["lr"])
            opt.step()
            sched.step(step_idx)

    args = TrainArgs(output_dir="x", learning_rate=base_lr, warmup_steps=warmup,
                     scheduler=kind, gradient_accumulation_steps=accum)
    lr_fn = make_lr_fn(args, total)

    # our trainers: lr = lr_fn(sched_step); sched_step <- step after update
    ours = []
    sched_step = 0
    for step_idx in range(total):
        do_update = (step_idx == total - 1) or ((step_idx + 1) % accum == 0)
        if do_update:
            ours.append(float(lr_fn(sched_step)))
            sched_step = step_idx

    # f32 cosine vs torch f64: ~1e-6 relative near the cosine zero crossing
    np.testing.assert_allclose(ours, ref_lrs, rtol=1e-5, atol=1e-10)
