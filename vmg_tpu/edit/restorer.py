"""Restorer protocol (reference ``mmedit/models/restorers/basic_restorer.py``
BasicRestorer and ``ttvsr.py`` TTVSR): the model-level train/val/test
contract that mmedit runners drive.

JAX version: a thin object holding (flax model, params-in-TrainState, pixel
loss, metric fns) exposing ``train_step`` / ``val_step`` / ``forward_test``.
The TTVSR-style flow-net freeze phase (``ttvsr.py:72-81``) is expressed in
the optimizer schedule (vmg_tpu.train.schedule.spynet_lr_schedule), not by
mutating requires_grad.
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np
import jax

from vmg_tpu.edit.registry import MODELS
from vmg_tpu.eval.metrics import calculate_psnr, structural_similarity


@MODELS.register_module()
class BasicRestorer:
    def __init__(self, model, train_state, loss_fn: Callable,
                 allowed_metrics=("PSNR", "SSIM"), crop_border: int = 0):
        self.model = model
        self.state = train_state
        self.loss_fn = loss_fn
        self.crop_border = crop_border
        self._metrics = {
            "PSNR": lambda a, b: calculate_psnr(a, b, border=self.crop_border),
            "SSIM": lambda a, b: structural_similarity(a, b),
        }
        self.allowed_metrics = allowed_metrics

        def _step(state, lq, gt, rng):
            def loss(params):
                out = self.model.apply(params, lq, deterministic=False,
                                       rngs={"droppath": rng})
                return self.loss_fn(out, gt)

            l, grads = jax.value_and_grad(loss)(state.params)
            return state.apply_gradients(grads=grads), l

        self._jit_step = jax.jit(_step)
        self._jit_fwd = jax.jit(lambda params, lq: self.model.apply(params, lq))

    def train_step(self, data_batch: Dict, rng) -> Dict:
        self.state, loss = self._jit_step(
            self.state, data_batch["lq"], data_batch["gt"], rng
        )
        return {"loss_pix": float(loss),
                "num_samples": int(np.shape(data_batch["lq"])[0])}

    def forward_test(self, lq) -> np.ndarray:
        return np.asarray(self._jit_fwd(self.state.params, lq))

    def val_step(self, data_batch: Dict) -> Dict:
        out = self.forward_test(data_batch["lq"])
        gt = np.asarray(data_batch["gt"])
        res = {}
        for name in self.allowed_metrics:
            vals = []
            for b in range(out.shape[0]):
                o = np.clip(out[b], 0, 1).reshape(-1, *out.shape[-3:])
                g = np.clip(gt[b], 0, 1).reshape(-1, *gt.shape[-3:])
                vals.extend(
                    self._metrics[name]((of * 255).astype(np.float64),
                                        (gf * 255).astype(np.float64))
                    for of, gf in zip(o, g)
                )
            res[name] = float(np.mean(vals))
        return {"eval_result": res}
