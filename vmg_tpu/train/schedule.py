"""LR schedules (reference ``utils/lr_scheduler.py`` + Trainer group logic).

Closed-form cosine annealing with warm restarts: within the period starting
at restart r with length T and weight w,

    lr(t) = eta_min + (base * w - eta_min) * (1 + cos(pi (t - r) / T)) / 2

which is what the reference's stepwise recurrence evaluates to.  The SPyNet
("pre-training") group is 0 for the first ``flow_fix`` steps -- the frozen
flow phase (reference ``Trainer.py:244-272``) -- then tracks the main LR
times ``pre_lr_ratio``.  Warmup linearly scales everything below
``warmup_iter``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax.numpy as jnp


def cosine_annealing_restart(
    base_lr: float,
    T_period: Sequence[int],
    restarts: Optional[Sequence[int]] = None,
    restart_weights: Sequence[float] = (1.0,),
    eta_min: float = 0.0,
):
    """Returns schedule(step) -> lr, jnp-traceable."""
    restarts = list(restarts) if restarts else [0]
    starts = [0] + [int(r) for r in restarts if r > 0]
    weights = [1.0] + [float(w) for w, r in zip(restart_weights, restarts) if r > 0]
    if len(starts) == 1:
        weights = [float(restart_weights[0])] if restart_weights else [1.0]
    periods = [int(t) for t in T_period]
    starts_arr = jnp.asarray(starts, jnp.float32)
    periods_arr = jnp.asarray(periods[: len(starts)], jnp.float32)
    weights_arr = jnp.asarray(weights[: len(starts)], jnp.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        idx = jnp.sum(step >= starts_arr) - 1
        idx = jnp.clip(idx, 0, len(starts) - 1)
        r = starts_arr[idx]
        T = periods_arr[idx]
        w = weights_arr[idx]
        cos = (1.0 + jnp.cos(jnp.pi * (step - r) / T)) / 2.0
        return eta_min + (base_lr * w - eta_min) * cos

    return schedule


def main_lr_schedule(train_cfg):
    """Main param-group LR from a TrainConfig.

    Warmup note (deliberate divergence): the reference applies warmup in
    ``update_learning_rate`` AFTER the optimizer step, so its update 0
    runs at the FULL base LR and update ``k`` (k >= 1) at
    ``base * (k-1) / warmup`` -- the first update skips warmup entirely
    (``Trainer.py:265-272`` + the post-step call order).  Here warmup is
    the clean form ``base * k / warmup``: update 0 is the smallest, not
    the largest.  One-step shift elsewhere, strictly safer at step 0.
    """
    base = cosine_annealing_restart(
        train_cfg.lr,
        train_cfg.T_period,
        train_cfg.restarts,
        train_cfg.restart_weights,
        train_cfg.eta_min,
    )

    def schedule(step):
        lr = base(step)
        if train_cfg.warmup_iter > 0:
            lr = jnp.where(
                step < train_cfg.warmup_iter,
                train_cfg.lr * step / train_cfg.warmup_iter,
                lr,
            )
        return lr

    return schedule


def spynet_lr_schedule(train_cfg, flow_fix: Optional[int]):
    """SPyNet group: frozen (0), then pre_lr_ratio x main.

    Boundary matches the reference update-for-update: the reference sets
    group LRs AFTER each optimizer step (``Trainer.update_learning_rate``
    called with ``cur_iter = k`` after update ``k``, frozen while
    ``cur_iter <= flow_fix``), so update ``k`` runs with the LR computed
    at ``k - 1`` -- the group is frozen for updates ``0 .. flow_fix + 1``
    and first moves at update ``flow_fix + 2`` (verified step-for-step by
    tests/test_train_dynamics_golden.py).
    """
    main = main_lr_schedule(train_cfg)
    fix = flow_fix if flow_fix is not None else 0

    def schedule(step):
        lr = main(step) * train_cfg.pre_lr_ratio
        return jnp.where(step <= fix + 1, 0.0, lr)

    return schedule


def linear_decay(base_lr: float, total_iters: int, min_ratio: float = 0.0):
    """Linear LR decay (reference mmedit/core/scheduler/lr_updater.py)."""

    def schedule(step):
        frac = jnp.clip(jnp.asarray(step, jnp.float32) / total_iters, 0.0, 1.0)
        return base_lr * (1.0 - frac * (1.0 - min_ratio))

    return schedule
