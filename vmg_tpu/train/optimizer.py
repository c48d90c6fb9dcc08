"""Optimizer construction: AdamW with the reference's three param groups
(reference ``tools/Trainer.py:57-115``):

  * ``spynet``  -- pretrained flow net: lr 0 through flow_fix, then
                   pre_lr_ratio x main (when ``pre_training``)
  * ``wd``      -- parameters under ``mlp_blocks`` get weight decay when
                   ``weight_decay`` is set (reference ``models/vmg.py:408-412``)
  * ``main``    -- everything else, cosine-restart LR

Implemented with optax.multi_transform over a label tree derived from
parameter paths -- the JAX-native analogue of torch param-group id filtering.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import optax

from vmg_tpu.configs.config import TrainConfig
from vmg_tpu.train.schedule import main_lr_schedule, spynet_lr_schedule


def param_labels(params) -> Any:
    """Label each param by path: 'spynet' | 'wd' | 'main'."""

    def label(path, _):
        keys = [getattr(k, "key", str(k)) for k in path]
        if any(str(k).startswith("spynet") for k in keys):
            return "spynet"
        if any(str(k).startswith("mlp_blocks") for k in keys):
            return "wd"
        return "main"

    return jax.tree_util.tree_map_with_path(label, params)


def build_optimizer(
    params,
    train_cfg: TrainConfig,
    flow_fix: Optional[int] = None,
) -> optax.GradientTransformation:
    betas = (train_cfg.beta1, train_cfg.beta2)
    wd = train_cfg.weight_decay or 0.0
    main_sched = main_lr_schedule(train_cfg)
    spynet_sched = (
        spynet_lr_schedule(train_cfg, flow_fix)
        if train_cfg.pre_training
        else main_sched
    )

    def adamw(sched, weight_decay):
        return optax.adamw(
            learning_rate=sched, b1=betas[0], b2=betas[1], eps=1e-8,
            weight_decay=weight_decay,
        )

    tx = optax.multi_transform(
        {
            "spynet": adamw(spynet_sched, 0.0),
            "wd": adamw(main_sched, wd),
            "main": adamw(main_sched, 0.0),
        },
        param_labels(params),
    )

    if train_cfg.if_grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(train_cfg.grad_clip_up), tx)
    return tx
