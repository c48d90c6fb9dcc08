"""Loss zoo (reference ``mmedit/models/losses/``: pixelwise_loss.py,
gan_loss.py, gradient_loss.py, perceptual_loss.py -- JAX rebuild).

All pixel losses support 'none' | 'mean' | 'sum' reduction, optional
elementwise weight masks, and sample_wise averaging, matching the
mmedit mask-reduce semantics (``losses/utils.py``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vmg_tpu.edit.registry import LOSSES


def _reduce(loss, weight, reduction, sample_wise):
    if weight is not None:
        loss = loss * weight
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    if reduction != "mean":
        raise ValueError(f"bad reduction {reduction!r}")
    if weight is None:
        return jnp.mean(loss)
    # weighted mean: normalize by the weight mass (per sample if asked)
    if sample_wise:
        axes = tuple(range(1, loss.ndim))
        per = jnp.sum(loss, axes) / jnp.clip(jnp.sum(weight, axes), 1e-12)
        return jnp.mean(per)
    return jnp.sum(loss) / jnp.clip(jnp.sum(weight), 1e-12)


@LOSSES.register_module()
class L1Loss:
    def __init__(self, loss_weight=1.0, reduction="mean", sample_wise=False):
        self.loss_weight = loss_weight
        self.reduction = reduction
        self.sample_wise = sample_wise

    def __call__(self, pred, target, weight=None):
        loss = jnp.abs(pred - target)
        return self.loss_weight * _reduce(loss, weight, self.reduction,
                                          self.sample_wise)


@LOSSES.register_module()
class MSELoss:
    def __init__(self, loss_weight=1.0, reduction="mean", sample_wise=False):
        self.loss_weight = loss_weight
        self.reduction = reduction
        self.sample_wise = sample_wise

    def __call__(self, pred, target, weight=None):
        loss = (pred - target) ** 2
        return self.loss_weight * _reduce(loss, weight, self.reduction,
                                          self.sample_wise)


@LOSSES.register_module()
class CharbonnierLoss:
    """sqrt(diff^2 + eps) -- note mmedit uses eps=1e-12 additive form."""

    def __init__(self, loss_weight=1.0, reduction="mean", sample_wise=False,
                 eps=1e-12):
        self.loss_weight = loss_weight
        self.reduction = reduction
        self.sample_wise = sample_wise
        self.eps = eps

    def __call__(self, pred, target, weight=None):
        loss = jnp.sqrt((pred - target) ** 2 + self.eps)
        return self.loss_weight * _reduce(loss, weight, self.reduction,
                                          self.sample_wise)


@LOSSES.register_module()
class MaskedTVLoss:
    """Masked total-variation loss (reference pixelwise_loss.py)."""

    def __init__(self, loss_weight=1.0):
        self.loss_weight = loss_weight

    def __call__(self, pred, mask=None):
        if mask is None:
            mask = jnp.ones_like(pred)
        dy = jnp.abs(pred[:, 1:] - pred[:, :-1]) * jnp.minimum(
            mask[:, 1:], mask[:, :-1])
        dx = jnp.abs(pred[:, :, 1:] - pred[:, :, :-1]) * jnp.minimum(
            mask[:, :, 1:], mask[:, :, :-1])
        return self.loss_weight * (jnp.mean(dy) + jnp.mean(dx))


@LOSSES.register_module()
class GradientLoss:
    """L1 on Sobel-like finite-difference gradients
    (reference gradient_loss.py)."""

    def __init__(self, loss_weight=1.0, reduction="mean"):
        self.loss_weight = loss_weight
        self.reduction = reduction

    def __call__(self, pred, target, weight=None):
        def grads(v):
            gy = v[:, 1:, :-1] - v[:, :-1, :-1]
            gx = v[:, :-1, 1:] - v[:, :-1, :-1]
            return gy, gx

        py, px = grads(pred)
        ty, tx = grads(target)
        loss = jnp.abs(py - ty) + jnp.abs(px - tx)
        return self.loss_weight * _reduce(loss, None, self.reduction, False)


@LOSSES.register_module()
class GANLoss:
    """vanilla | lsgan | wgan | hinge (reference gan_loss.py)."""

    def __init__(self, gan_type="vanilla", real_label_val=1.0,
                 fake_label_val=0.0, loss_weight=1.0):
        self.gan_type = gan_type
        self.real_label_val = real_label_val
        self.fake_label_val = fake_label_val
        self.loss_weight = loss_weight

    def __call__(self, logits, target_is_real: bool, is_disc: bool = False):
        if self.gan_type == "wgan":
            loss = -jnp.mean(logits) if target_is_real else jnp.mean(logits)
            return loss if is_disc else self.loss_weight * loss
        if self.gan_type == "hinge":
            if is_disc:
                loss = (jnp.mean(jax.nn.relu(1.0 - logits)) if target_is_real
                        else jnp.mean(jax.nn.relu(1.0 + logits)))
            else:
                loss = -jnp.mean(logits)
            return loss if is_disc else self.loss_weight * loss
        label = self.real_label_val if target_is_real else self.fake_label_val
        target = jnp.full_like(logits, label)
        if self.gan_type == "vanilla":
            loss = jnp.mean(
                jnp.maximum(logits, 0) - logits * target
                + jnp.log1p(jnp.exp(-jnp.abs(logits)))
            )
        elif self.gan_type == "lsgan":
            loss = jnp.mean((logits - target) ** 2)
        else:
            raise ValueError(f"bad gan_type {self.gan_type!r}")
        return loss if is_disc else self.loss_weight * loss


@LOSSES.register_module()
class PerceptualLoss:
    """VGG feature-space loss (reference perceptual_loss.py).

    Requires pretrained VGG feature weights; this environment has no
    network egress, so construction raises until weights are supplied via
    ``vgg_params_path`` (a converted .npz of VGG16 conv weights).
    """

    def __init__(self, layer_weights=None, vgg_params_path: Optional[str] = None,
                 perceptual_weight=1.0, style_weight=0.0):
        if vgg_params_path is None:
            raise NotImplementedError(
                "PerceptualLoss needs pretrained VGG weights; pass "
                "vgg_params_path (no-egress environment cannot download them)"
            )
        raise NotImplementedError("VGG feature extractor wiring lands in a "
                                  "later milestone")
