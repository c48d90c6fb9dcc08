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


class _CompositionLossBase:
    """alpha-composition losses (reference
    ``mmedit/models/losses/composition_loss.py:10-150``): compare
    ``pred_alpha * fg + (1 - pred_alpha) * bg`` against the original merged
    image.  Channels-last: pred_alpha (N,H,W,1), fg/bg/ori_merged (N,H,W,3),
    weight (N,H,W,1) with 1 where trimap == 128."""

    def __init__(self, loss_weight=1.0, reduction="mean", sample_wise=False):
        if reduction not in ("none", "mean", "sum"):
            raise ValueError(f"Unsupported reduction mode: {reduction}")
        self.loss_weight = loss_weight
        self.reduction = reduction
        self.sample_wise = sample_wise

    def _elem(self, diff):
        raise NotImplementedError

    def __call__(self, pred_alpha, fg, bg, ori_merged, weight=None):
        pred_merged = pred_alpha * fg + (1.0 - pred_alpha) * bg
        if weight is not None:
            weight = jnp.broadcast_to(weight, pred_merged.shape)
        loss = self._elem(pred_merged - ori_merged)
        return self.loss_weight * _reduce(loss, weight, self.reduction,
                                          self.sample_wise)


@LOSSES.register_module()
class L1CompositionLoss(_CompositionLossBase):
    def _elem(self, diff):
        return jnp.abs(diff)


@LOSSES.register_module()
class MSECompositionLoss(_CompositionLossBase):
    def _elem(self, diff):
        return diff ** 2


@LOSSES.register_module()
class CharbonnierCompLoss(_CompositionLossBase):
    def __init__(self, loss_weight=1.0, reduction="mean", sample_wise=False,
                 eps=1e-12):
        super().__init__(loss_weight, reduction, sample_wise)
        self.eps = eps

    def _elem(self, diff):
        return jnp.sqrt(diff ** 2 + self.eps)


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


# torchvision VGG `features` layer plans: channel counts with 'M' maxpools;
# torch indexes convs/relus/pools sequentially, and mmedit keys features by
# that index (reference perceptual_loss.py:44-50 vgg_type + layer slicing)
_VGG_PLANS = {
    "vgg16": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"],
    "vgg19": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"],
}

_IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
_IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def _load_vgg_params(path_or_dict, vgg_type: str):
    """{'features.N.weight'/'bias'} (torch OIHW, .npz or state_dict-like)
    -> {N: (kernel HWIO, bias)} for the conv layers of the plan."""
    import numpy as np

    if isinstance(path_or_dict, str):
        src = dict(np.load(path_or_dict))
    else:
        src = {k: np.asarray(v) for k, v in path_or_dict.items()}
    src = {k[len("features."):] if k.startswith("features.") else k: v
           for k, v in src.items()}
    params = {}
    i = 0
    for c in _VGG_PLANS[vgg_type]:
        if c == "M":
            i += 1
            continue
        w = np.asarray(src[f"{i}.weight"], np.float32)
        b = np.asarray(src[f"{i}.bias"], np.float32)
        params[i] = (jnp.asarray(w.transpose(2, 3, 1, 0)), jnp.asarray(b))
        i += 2  # conv + relu
    return params


def _vgg_features(x, params, vgg_type: str, layer_indices):
    """x: (n, h, w, 3) in [0, 1] AFTER input norm.  Returns {idx: feat}."""
    feats = {}
    need = set(int(i) for i in layer_indices)
    last = max(need)
    i = 0
    for c in _VGG_PLANS[vgg_type]:
        if i > last:
            break
        if c == "M":
            # torch MaxPool2d(2, 2) with floor; match via pad-free reduce
            n, h, w, ch = x.shape
            x = x[:, : h - h % 2, : w - w % 2]
            x = x.reshape(n, (h // 2), 2, (w // 2), 2, ch).max(axis=(2, 4))
            if i in need:
                feats[i] = x
            i += 1
            continue
        kern, bias = params[i]
        x = jax.lax.conv_general_dilated(
            x, kern, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias
        if i in need:
            feats[i] = x
        i += 1
        x = jax.nn.relu(x)
        if i in need:
            feats[i] = x
        i += 1
    return feats


def _gram(x):
    """(n, h, w, c) -> (n, c, c) / (c * h * w) (reference _gram_mat)."""
    n, h, w, c = x.shape
    f = x.reshape(n, h * w, c)
    return jnp.einsum("npc,npd->ncd", f, f) / (c * h * w)


@LOSSES.register_module()
class PerceptualLoss:
    """VGG feature-space perceptual + style loss (reference
    ``mmedit/models/losses/perceptual_loss.py``), channels-last.

    Weights must be supplied (no network egress here): ``vgg_params`` is a
    .npz path or a dict of torchvision-style ``features.N.weight/bias``
    arrays.  ``layer_weights`` keys are torchvision ``features`` indices
    (as str or int), e.g. {'34': 1.0} for vgg19 conv5_4 pre-relu... the
    reference keys by the same indices.
    """

    def __init__(self, layer_weights, vgg_params, vgg_type: str = "vgg19",
                 use_input_norm: bool = True, perceptual_weight: float = 1.0,
                 style_weight: float = 0.0, norm_img: bool = True,
                 criterion: str = "l1"):
        if vgg_params is None:
            raise ValueError(
                "PerceptualLoss needs pretrained VGG weights; pass "
                "vgg_params (an .npz path or a features.N.weight dict) -- "
                "this environment cannot download them"
            )
        self.layer_weights = {int(k): float(v) for k, v in layer_weights.items()}
        self.vgg_type = vgg_type
        self.params = _load_vgg_params(vgg_params, vgg_type)
        self.use_input_norm = use_input_norm
        self.perceptual_weight = perceptual_weight
        self.style_weight = style_weight
        self.norm_img = norm_img
        if criterion == "l1":
            self.criterion = lambda a, b: jnp.mean(jnp.abs(a - b))
        elif criterion == "mse":
            self.criterion = lambda a, b: jnp.mean((a - b) ** 2)
        else:
            raise NotImplementedError(f"{criterion} criterion")

    def _features(self, x):
        if self.use_input_norm:
            x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
        return _vgg_features(x, self.params, self.vgg_type,
                             self.layer_weights.keys())

    def __call__(self, x, gt):
        """x, gt: (n, h, w, 3).  Returns (percep_loss, style_loss); each is
        None when its weight is 0 (reference forward contract)."""
        if self.norm_img:
            x = (x + 1.0) * 0.5
            gt = (gt + 1.0) * 0.5
        fx = self._features(x)
        fg = self._features(jax.lax.stop_gradient(gt))

        percep = None
        if self.perceptual_weight > 0:
            percep = sum(
                self.criterion(fx[k], fg[k]) * w
                for k, w in self.layer_weights.items()
            ) * self.perceptual_weight
        style = None
        if self.style_weight > 0:
            style = sum(
                self.criterion(_gram(fx[k]), _gram(fg[k])) * w
                for k, w in self.layer_weights.items()
            ) * self.style_weight
        return percep, style


@LOSSES.register_module()
class DiscShiftLoss:
    """Mean-square shift regularizer on discriminator logits
    (reference gan_loss.py:170, default weight 0.1)."""

    def __init__(self, loss_weight=0.1):
        self.loss_weight = loss_weight

    def __call__(self, x):
        return self.loss_weight * jnp.mean(x ** 2)


@LOSSES.register_module()
class GradientPenaltyLoss:
    """WGAN-GP gradient penalty (reference gan_loss.py:100-166).

    Functional form: pass the discriminator as ``disc_fn(x) -> logits``
    (close over params); the input gradient comes from jax.grad instead of
    torch.autograd.grad.  Channels-last: the 2-norm runs over the channel
    (last) axis like the reference's dim=1.
    """

    def __init__(self, loss_weight=1.0):
        self.loss_weight = loss_weight

    def __call__(self, disc_fn, real_data, fake_data, rng, mask=None):
        n = real_data.shape[0]
        alpha = jax.random.uniform(rng, (n,) + (1,) * (real_data.ndim - 1))
        interp = alpha * real_data + (1.0 - alpha) * fake_data

        grads = jax.grad(lambda v: jnp.sum(disc_fn(v)))(interp)
        if mask is not None:
            grads = grads * mask
        norms = jnp.sqrt(jnp.sum(grads ** 2, axis=-1) + 1e-24)
        penalty = jnp.mean((norms - 1.0) ** 2)
        if mask is not None:
            penalty = penalty / jnp.mean(mask)
        return self.loss_weight * penalty


def _bicubic_torch_resize(x, out_h, out_w):
    """torch ``F.interpolate(mode='bicubic', align_corners=False)``:
    half-pixel sampling with the Keys cubic kernel at A = -0.75 (jax's
    bicubic uses A = -0.5, which does not match bit-wise) and clamped
    borders.  x: (n, h, w, c)."""
    n, h, w, c = x.shape

    def weights(dst, src_size, out_size):
        scale = src_size / out_size
        f = (jnp.arange(out_size) + 0.5) * scale - 0.5
        i0 = jnp.floor(f).astype(jnp.int32)
        t = f - i0
        A = -0.75
        w0 = ((A * (t + 1) - 5 * A) * (t + 1) + 8 * A) * (t + 1) - 4 * A
        w1 = ((A + 2) * t - (A + 3)) * t * t + 1
        t2 = 1 - t
        w2 = ((A + 2) * t2 - (A + 3)) * t2 * t2 + 1
        w3 = ((A * (t2 + 1) - 5 * A) * (t2 + 1) + 8 * A) * (t2 + 1) - 4 * A
        idx = jnp.stack([i0 - 1, i0, i0 + 1, i0 + 2], 1)
        ws = jnp.stack([w0, w1, w2, w3], 1)
        return jnp.clip(idx, 0, src_size - 1), ws

    iy, wy = weights(None, h, out_h)
    ix, wx = weights(None, w, out_w)
    # rows: (n, out_h, 4, w, c) -> weighted sum
    rows = jnp.take(x, iy.reshape(-1), axis=1).reshape(n, out_h, 4, w, c)
    rows = jnp.einsum("nofwc,of->nowc", rows, wy)
    cols = jnp.take(rows, ix.reshape(-1), axis=2).reshape(
        n, out_h, out_w, 4, c)
    return jnp.einsum("nhofc,of->nhoc", cols, wx)


@LOSSES.register_module()
class TransferalPerceptualLoss:
    """TTSR transferal perceptual loss (reference perceptual_loss.py:212):
    per-level criterion between attention-weighted feature maps and
    transferred textures, the soft-attention map bicubically upsampled to
    each level."""

    def __init__(self, loss_weight=1.0, use_attention=True,
                 criterion="mse"):
        self.loss_weight = loss_weight
        self.use_attention = use_attention
        criterion = criterion.lower()
        if criterion == "l1":
            self.loss_function = lambda a, b: jnp.mean(jnp.abs(a - b))
        elif criterion == "mse":
            self.loss_function = lambda a, b: jnp.mean((a - b) ** 2)
        else:
            raise ValueError(f"criterion should be 'l1' or 'mse', "
                             f"got {criterion}")

    def __call__(self, maps, soft_attention, textures):
        """maps/textures: tuples of (n,h*2^i,w*2^i,c_i); soft_attention:
        (n,h,w,1)."""
        if self.use_attention:
            h, w = soft_attention.shape[1:3]
            # reference quirk (perceptual_loss.py:249-256): level 0 takes
            # sigmoid(attention) but levels > 0 upsample the RAW map
            softs = [jax.nn.sigmoid(soft_attention)]
            for i in range(1, len(maps)):
                softs.append(_bicubic_torch_resize(
                    soft_attention, h * 2 ** i, w * 2 ** i))
        else:
            softs = [1.0] * len(maps)
        loss = 0.0
        for fmap, soft, texture in zip(maps, softs, textures):
            loss = loss + self.loss_function(fmap * soft, texture * soft)
        return loss * self.loss_weight


@LOSSES.register_module()
class LightCNNFeatureLoss:
    """DICGAN feature loss through a frozen LightCNN trunk
    (reference feature_loss.py:53).  ``pretrained`` is the converted
    parameter tree of vmg_tpu.edit.components.LightCNN (no egress exists
    here for the original checkpoint; conversion goes through
    vmg_tpu.ckpt.torch_convert machinery)."""

    def __init__(self, pretrained, loss_weight=1.0, criterion="l1"):
        from vmg_tpu.edit.components import LightCNN

        self.model = LightCNN(3)
        self.params = pretrained
        self.loss_weight = loss_weight
        if criterion == "l1":
            self.criterion = lambda a, b: jnp.mean(jnp.abs(a - b))
        elif criterion == "mse":
            self.criterion = lambda a, b: jnp.mean((a - b) ** 2)
        else:
            raise ValueError(f"'criterion' should be 'l1' or 'mse', "
                             f"got {criterion}")

    def _features(self, x):
        return self.model.apply(self.params, x, features_only=True)

    def __call__(self, pred, gt):
        pred_feat = self._features(pred)
        gt_feat = jax.lax.stop_gradient(self._features(gt))
        return self.criterion(pred_feat, gt_feat) * self.loss_weight
