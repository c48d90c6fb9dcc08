"""Training hooks (reference ``mmedit/core/evaluation/eval_hooks.py``
EvalIterHook and ``mmedit/core/hooks/visualization.py``).

A minimal hook protocol for the vmg_tpu training loop: ``after_iter`` is
called with (step, state, extras); hooks decide when to fire.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional

import numpy as np

from vmg_tpu.edit.misc import tensor2img


class Hook:
    def after_iter(self, step: int, state, extras: Dict):  # pragma: no cover
        pass


class HookList(Hook):
    def __init__(self, hooks: List[Hook]):
        self.hooks = list(hooks)

    def after_iter(self, step, state, extras):
        for h in self.hooks:
            h.after_iter(step, state, extras)


class EvalIterHook(Hook):
    """Run an eval callback every ``interval`` iterations and keep the
    latest results (reference eval_hooks.py:7-60)."""

    def __init__(self, eval_fn: Callable[[object], Dict], interval: int = 5000,
                 logger=None):
        self.eval_fn = eval_fn
        self.interval = interval
        self.logger = logger
        self.latest: Optional[Dict] = None

    def after_iter(self, step, state, extras):
        if step % self.interval:
            return
        self.latest = self.eval_fn(state)
        if self.logger:
            msg = ", ".join(f"{k}: {v:.4f}" for k, v in self.latest.items())
            self.logger.info(f"[eval @ {step}] {msg}")


class VisualizationHook(Hook):
    """Periodically dump lq/output/gt triptychs as PNGs
    (reference visualization.py:11)."""

    def __init__(self, output_dir: str, interval: int = 1000,
                 keys=("lq", "output", "gt")):
        self.output_dir = output_dir
        self.interval = interval
        self.keys = keys

    def after_iter(self, step, state, extras):
        if step % self.interval:
            return
        import cv2

        os.makedirs(self.output_dir, exist_ok=True)
        for k in self.keys:
            if k not in extras:
                continue
            arr = np.asarray(extras[k])
            img = tensor2img(arr)
            cv2.imwrite(os.path.join(self.output_dir,
                                     f"iter_{step:08d}_{k}.png"), img)
