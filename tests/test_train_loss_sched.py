"""Loss and LR-schedule parity tests vs torch oracles."""

import importlib.util

import numpy as np
import pytest
import torch
import torch.nn.functional as TF
import jax.numpy as jnp

from vmg_tpu.train.loss import charbonnier_loss, edge_loss, total_loss
from vmg_tpu.train.schedule import cosine_annealing_restart, main_lr_schedule, spynet_lr_schedule
from vmg_tpu.configs.config import TrainConfig


def _load_ref_loss():
    spec = importlib.util.spec_from_file_location(
        "ref_loss", "/root/reference/utils/loss.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_charbonnier_matches_reference(rng):
    ref = _load_ref_loss()
    x = rng.standard_normal((2, 3, 8, 8, 3)).astype(np.float32)
    y = rng.standard_normal((2, 3, 8, 8, 3)).astype(np.float32)
    got = float(charbonnier_loss(jnp.asarray(x), jnp.asarray(y), eps=1e-12))
    crit = ref.CharbonnierLoss(eps=1e-12, if_aux_loss=False)
    want = float(crit(torch.from_numpy(x), torch.from_numpy(y)))
    assert abs(got - want) < 1e-6


def test_edge_aux_loss_matches_reference(rng):
    ref = _load_ref_loss()
    # reference EdgeLoss wants (B, T, C, H, W)
    x = rng.random((1, 2, 12, 16, 3)).astype(np.float32)
    y = rng.random((1, 2, 12, 16, 3)).astype(np.float32)
    got = float(edge_loss(jnp.asarray(x), jnp.asarray(y), eps=1e-12))
    el = ref.EdgeLoss(eps=1e-12)
    xt = torch.from_numpy(x).permute(0, 1, 4, 2, 3)
    yt = torch.from_numpy(y).permute(0, 1, 4, 2, 3)
    want = float(el(xt, yt))
    assert abs(got - want) < 1e-5


def test_total_loss_combination(rng):
    ref = _load_ref_loss()
    x = rng.random((1, 2, 8, 8, 3)).astype(np.float32)
    y = rng.random((1, 2, 8, 8, 3)).astype(np.float32)
    got = float(total_loss(jnp.asarray(x), jnp.asarray(y), eps=1e-12,
                           if_aux=True, aux_ratio=0.005))
    crit = ref.CharbonnierLoss(eps=1e-12, if_aux_loss=True, aux_ratio=0.005)
    want = float(crit(torch.from_numpy(x).permute(0, 1, 4, 2, 3),
                      torch.from_numpy(y).permute(0, 1, 4, 2, 3)))
    assert abs(got - want) < 1e-5


def test_cosine_schedule_matches_torch_scheduler():
    """Compare against the reference scheduler run step-by-step with a real
    torch optimizer (utils/lr_scheduler.py is importable: torch-only)."""
    spec = importlib.util.spec_from_file_location(
        "ref_sched", "/root/reference/utils/lr_scheduler.py"
    )
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    base_lr, eta_min, T = 2e-4, 1e-7, 1000
    opt = torch.optim.AdamW([torch.nn.Parameter(torch.zeros(3))], lr=base_lr)
    sch = ref.CosineAnnealingLR_Restart(opt, T_period=[T], eta_min=eta_min,
                                        restarts=None, weights=[1])
    mine = cosine_annealing_restart(base_lr, [T], None, [1.0], eta_min)
    for step in range(0, 1000, 50):
        want = opt.param_groups[0]["lr"]
        got = float(mine(step))
        assert abs(got - want) / max(want, 1e-12) < 1e-3, (step, got, want)
        for _ in range(50):
            sch.step()


def test_spynet_schedule_frozen_then_ratio():
    cfg = TrainConfig(lr=2e-4, T_period=(1000,), eta_min=0.0, pre_lr_ratio=0.125)
    main = main_lr_schedule(cfg)
    spy = spynet_lr_schedule(cfg, flow_fix=100)
    assert float(spy(50)) == 0.0
    assert float(spy(100)) == 0.0
    got = float(spy(500))
    assert abs(got - 0.125 * float(main(500))) < 1e-12


def test_warmup():
    cfg = TrainConfig(lr=2e-4, T_period=(1000,), warmup_iter=100)
    main = main_lr_schedule(cfg)
    assert abs(float(main(50)) - 2e-4 * 0.5) < 1e-9
    assert float(main(100)) <= 2e-4
