"""Inpainting / matting common op library, TPU-native (channels-last JAX).

Rebuilt from the behavior of the reference's vendored-mmedit op library
(``mmedit/models/common/``): contextual attention
(``contextual_attention.py:8``), guided contextual attention
(``gca_module.py:7``), partial convolution (``partial_conv.py:9``), gated
convolution (``gated_conv_module.py:8``), depthwise-separable conv
(``separable_conv_module.py:5``), ASPP (``aspp.py:30``), mask conv module
(``mask_conv_module.py:4``), linear module (``linear_module.py:5``), image
normalization (``img_normalize.py:5``) and the pix2pix/cyclegan generator
blocks + GAN image buffer (``generation_model_utils.py``).

Design notes (TPU-first, not a translation):

* everything is NHWC; the patch-attention modules express torch's
  per-sample grouped conv / conv_transpose tricks as a ``vmap`` over the
  batch of one plain XLA conv each -- identical math, MXU-friendly;
* ``unfold`` is built from static shifted slices (XLA fuses them), not a
  gather;
* transposed convs lower to ``lax.conv_general_dilated`` with lhs dilation
  and a spatially flipped kernel, exactly torch's ``conv_transpose2d``.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def nearest_downsample(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """torch ``F.interpolate(scale_factor=1/factor, mode='nearest')`` for
    integer factors: out[i] = in[factor*i] (floor sampling)."""
    return x[:, ::factor, ::factor, :]


def nearest_upsample(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """torch nearest upsample by an integer factor."""
    N, H, W, C = x.shape
    y = jnp.broadcast_to(x[:, :, None, :, None, :],
                         (N, H, factor, W, factor, C))
    return y.reshape(N, H * factor, W * factor, C)


def unfold_nhwc(x: jnp.ndarray, kernel_size: int, stride: int = 1,
                padding: int = 0, dilation: int = 1,
                pad_mode: str = "constant") -> jnp.ndarray:
    """torch ``F.unfold`` on NHWC input -> patches ``(N, Ho, Wo, kh, kw, C)``.

    Built from k*k static shifted strided slices; XLA fuses these into the
    consumer, so no patch tensor is materialized unless needed.
    """
    N, H, W, C = x.shape
    k, s, p, d = kernel_size, stride, padding, dilation
    if p:
        x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode=pad_mode)
    Hp, Wp = H + 2 * p, W + 2 * p
    Ho = (Hp - d * (k - 1) - 1) // s + 1
    Wo = (Wp - d * (k - 1) - 1) // s + 1
    rows = []
    for ki in range(k):
        cols = []
        for kj in range(k):
            sl = x[:, ki * d: ki * d + (Ho - 1) * s + 1: s,
                   kj * d: kj * d + (Wo - 1) * s + 1: s, :]
            cols.append(sl)
        rows.append(jnp.stack(cols, axis=3))  # (N, Ho, Wo, kw, C)
    return jnp.stack(rows, axis=3)  # (N, Ho, Wo, kh, kw, C)


def conv2d_nhwc(x, w_hwio, stride=1, padding=0, dilation=1, groups=1):
    """Plain NHWC conv with torch-style symmetric int padding."""
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    return jax.lax.conv_general_dilated(
        x, w_hwio, window_strides=(stride, stride), padding=padding,
        rhs_dilation=(dilation, dilation), feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_transpose2d_nhwc(x, w_hwio, stride=1, padding=0):
    """torch ``F.conv_transpose2d`` semantics: ``out[s*i + k - p] +=
    in[i] * w[k]``.  Lowered as an lhs-dilated conv with the kernel flipped
    spatially (the adjoint of a strided conv)."""
    k = w_hwio.shape[0]
    w_flip = w_hwio[::-1, ::-1]
    pad = k - 1 - padding
    return jax.lax.conv_general_dilated(
        x, w_flip, window_strides=(1, 1), padding=((pad, pad), (pad, pad)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _act(name: Optional[str]):
    if name is None:
        return lambda v: v
    return {
        "relu": jax.nn.relu,
        "leaky_relu": lambda v: jnp.where(v >= 0, v, 0.2 * v),
        "elu": jax.nn.elu,
        "sigmoid": jax.nn.sigmoid,
        "tanh": jnp.tanh,
    }[name.lower()]


# ---------------------------------------------------------------------------
# ContextualAttentionModule (reference contextual_attention.py:8)
# ---------------------------------------------------------------------------


class ContextualAttentionModule(nn.Module):
    """Contextual attention (DeepFill): match foreground patches against
    background patches by normalized cross-correlation, softmax-attend, and
    reassemble from raw-resolution patches with a transposed conv.

    Parameter-free; mirrors reference ``contextual_attention.py:74-143``
    step for step (downscale -> correlate -> fuse -> mask -> softmax ->
    deconv copy -> overlap renormalize) in channels-last layout.
    """

    unfold_raw_kernel_size: int = 4
    unfold_raw_stride: int = 2
    unfold_raw_padding: int = 1
    unfold_corr_kernel_size: int = 3
    unfold_corr_stride: int = 1
    unfold_corr_dilation: int = 1
    unfold_corr_padding: int = 1
    scale: float = 0.5
    fuse_kernel_size: int = 3
    softmax_scale: float = 10.0
    return_attention_score: bool = True

    @nn.compact
    def __call__(self, x, context, mask=None):
        """x/context: (n, h, w, c); mask: (n, h, w, 1), 1 = hole."""
        down = int(round(1.0 / self.scale))

        # raw patches used for reassembly: (n, Hu*Wu, kh, kw, c)
        raw_cols = unfold_nhwc(context, self.unfold_raw_kernel_size,
                               self.unfold_raw_stride,
                               self.unfold_raw_padding)
        n, Hr, Wr = raw_cols.shape[:3]
        raw_cols = raw_cols.reshape(n, Hr * Wr, *raw_cols.shape[3:])

        x = nearest_downsample(x, down)
        context = nearest_downsample(context, down)

        ctx_cols = unfold_nhwc(context, self.unfold_corr_kernel_size,
                               self.unfold_corr_stride,
                               self.unfold_corr_padding,
                               self.unfold_corr_dilation)
        h_unfold, w_unfold = ctx_cols.shape[1:3]
        L = h_unfold * w_unfold
        ctx_cols = ctx_cols.reshape(n, L, *ctx_cols.shape[3:])
        norm = jnp.sqrt(jnp.sum(ctx_cols ** 2, axis=(2, 3, 4), keepdims=True))
        ctx_cols = ctx_cols / jnp.maximum(norm, 1e-4)

        # correlation: per-sample conv of x with its own context patches
        def corr_one(xi, cols):  # (h,w,c), (L,kh,kw,c)
            w_hwio = cols.transpose(1, 2, 3, 0)  # (kh,kw,c,L)
            return conv2d_nhwc(xi[None], w_hwio,
                               stride=self.unfold_corr_stride,
                               padding=self.unfold_corr_padding,
                               dilation=self.unfold_corr_dilation)[0]

        correlation = jax.vmap(corr_one)(x, ctx_cols)  # (n, h', w', L)

        if self.fuse_kernel_size > 1:
            correlation = self._fuse_correlation(correlation, h_unfold,
                                                 w_unfold)

        if mask is not None:
            correlation = self._mask_correlation(correlation, mask, L)

        # softmax over the patch dim (torch dim=1 on (n, L, h, w))
        attn = jax.nn.softmax(correlation * self.softmax_scale, axis=-1)

        # reassemble at raw resolution with a per-sample transposed conv
        def copy_one(ai, cols):  # (h',w',L), (L,kh,kw,c)
            w_hwio = cols.transpose(1, 2, 0, 3)  # (kh,kw,L,c)
            return conv_transpose2d_nhwc(ai[None], w_hwio,
                                         stride=self.unfold_raw_stride,
                                         padding=self.unfold_raw_padding)[0]

        output = jax.vmap(copy_one)(attn, raw_cols)

        # overlap renormalization (reference :260-284)
        hs, ws = attn.shape[1:3]
        ones = jnp.ones((1, hs, ws, 1), output.dtype)
        ones_k = jnp.ones((self.unfold_raw_kernel_size,
                           self.unfold_raw_kernel_size, 1, 1), output.dtype)
        overlap = conv_transpose2d_nhwc(ones, ones_k,
                                        stride=self.unfold_raw_stride,
                                        padding=self.unfold_raw_padding)
        overlap = jnp.where(overlap == 0, 1.0, overlap)
        output = output / overlap

        if self.return_attention_score:
            score = attn.transpose(0, 3, 1, 2).reshape(
                n, h_unfold, w_unfold, hs, ws)
            return output, score
        return output

    def _fuse_correlation(self, correlation, h_unfold, w_unfold):
        """Diagonal 'eye-kernel' fusion enlarging consistent attention
        regions (reference :188-236), including its deliberate
        transposed-view reshape."""
        n, h_map, w_map, L = correlation.shape
        k = self.fuse_kernel_size
        p = (k - 1) // 2
        eye_k = jnp.eye(k, dtype=correlation.dtype).reshape(k, k, 1, 1)

        # horizontal: image rows = map pixels, cols = unfold pixels
        m = correlation.reshape(n, h_map * w_map, L, 1)
        m = conv2d_nhwc(m, eye_k, padding=p)
        # torch views the conv output (n, 1, hm*wm, hu*wu) as
        # (n, h_unfold, w_unfold, h_map, w_map) -- an intentional
        # "transposing" reshape; replicate it bit for bit
        corr = m.reshape(n, h_unfold, w_unfold, h_map, w_map)

        # vertical direction on the transposed pairing
        m = corr.transpose(0, 2, 1, 4, 3).reshape(n, L, h_map * w_map, 1)
        m = conv2d_nhwc(m, eye_k, padding=p)
        # rows were (aw, ah)-flattened map pixels, cols (lw, lh) patches;
        # bring map pixels to the spatial slots and patches to the channel
        # (channels-last counterpart of reference :230-234)
        corr = m.reshape(n, w_unfold, h_unfold, w_map, h_map)
        corr = corr.transpose(0, 2, 1, 4, 3)  # (n, ah, aw, lh, lw)
        return corr.reshape(n, h_map, w_map, L)

    def _mask_correlation(self, correlation, mask, L):
        down = int(round(1.0 / self.scale))
        mask = nearest_downsample(mask, down)
        mask_cols = unfold_nhwc(mask, self.unfold_corr_kernel_size,
                                self.unfold_corr_stride,
                                self.unfold_corr_padding,
                                self.unfold_corr_dilation)
        n = mask.shape[0]
        masked = (jnp.sum(mask_cols.reshape(n, L, -1), axis=-1) > 0)
        bias = jnp.where(masked, -jnp.inf, 0.0)  # (n, L)
        return correlation + bias[:, None, None, :]


# ---------------------------------------------------------------------------
# GCAModule (reference gca_module.py:7)
# ---------------------------------------------------------------------------


class GCAModule(nn.Module):
    """Guided contextual attention for matting: image-feature patches score
    the attention that propagates alpha-feature patches into the unknown
    region (reference ``gca_module.py:84-155``)."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    rate: int = 2
    interpolation: str = "nearest"
    penalty: float = -1e4
    eps: float = 1e-4

    @nn.compact
    def __call__(self, img_feat, alpha_feat, unknown=None,
                 softmax_scale=1.0, use_running_average: bool = True):
        """img_feat: (n,H,W,Ci); alpha_feat: (n,H/rate? ...) -- like the
        reference, alpha_feat spatial must equal img_feat spatial / rate
        after guidance downsampling; unknown: (n,H,W,1)."""
        n = img_feat.shape[0]

        img_feat = nn.Conv(self.in_channels // 2, (1, 1),
                           name="guidance_conv")(img_feat)
        img_feat = nearest_downsample(img_feat, self.rate)
        h, w = img_feat.shape[1:3]

        # unknown mask + per-sample softmax scales (reference :273-312)
        if unknown is not None:
            unknown = nearest_downsample(unknown, self.rate)
            unknown_mean = unknown.mean(axis=(1, 2, 3))  # (n,)
            known_mean = 1.0 - unknown_mean
            unknown_scale = jnp.clip(
                jnp.sqrt(unknown_mean / known_mean), 0.1, 10.0)
            known_scale = jnp.clip(
                jnp.sqrt(known_mean / unknown_mean), 0.1, 10.0)
            scales = jnp.stack([unknown_scale, known_scale], axis=1)
        else:
            unknown = jnp.ones((n, h, w, 1), img_feat.dtype)
            scales = jnp.full((n, 2), softmax_scale, img_feat.dtype)

        img_ps = self._extract_patches(img_feat, self.kernel_size,
                                       self.stride)  # (n,L,k,k,c)
        alpha_ps = self._extract_patches(alpha_feat, self.rate * 2,
                                         self.rate)
        unknown_ps = self._extract_patches(unknown, self.kernel_size,
                                           self.stride)
        unknown_ps = unknown_ps.mean(axis=(2, 3, 4))  # (n, L)

        # self-correlation mask: position l must not attend to itself
        self_mask = jnp.eye(h * w, dtype=img_feat.dtype) * self.penalty
        self_mask = self_mask.reshape(1, h, w, h * w)  # out (h,w) x patch L

        def one(img_i, img_ps_i, alpha_ps_i, unknown_ps_i, scale_i):
            # similarity: conv of img with its own normalized patches
            norm = jnp.sqrt(jnp.sum(img_ps_i ** 2, axis=(1, 2, 3),
                                    keepdims=True))
            kern = img_ps_i / jnp.maximum(norm, self.eps)
            xi = self._pad(img_i[None], self.kernel_size, self.stride)
            sim = conv2d_nhwc(xi, kern.transpose(1, 2, 3, 0))[0]  # (h,w,L)

            unknown_scale, known_scale = scale_i[0], scale_i[1]
            sel = jnp.where(unknown_ps_i > 0, unknown_scale, known_scale)
            out = sim * sel[None, None, :]
            out = out + self_mask[0] * unknown_ps_i[None, None, :]
            gca_score = jax.nn.softmax(out, axis=-1)

            # propagate alpha patches (reference :249-271)
            if self.rate == 1:
                sc = self._pad(gca_score[None], 2, 1)
                w_hwio = alpha_ps_i.transpose(1, 2, 0, 3)  # (k,k,L,c)
                return conv2d_nhwc(sc, w_hwio)[0] / 4.0
            w_hwio = alpha_ps_i.transpose(1, 2, 0, 3)  # (k,k,L,c)
            return conv_transpose2d_nhwc(gca_score[None], w_hwio,
                                         stride=self.rate, padding=1)[0] / 4.0

        out = jax.vmap(one)(img_feat, img_ps, alpha_ps, unknown_ps, scales)

        out = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                      name="out_conv")(out)
        out = nn.BatchNorm(use_running_average=use_running_average,
                           name="out_norm")(out)
        return out + alpha_feat

    def _pad(self, x, kernel_size, stride):
        left = (kernel_size - stride + 1) // 2
        right = (kernel_size - stride) // 2
        return jnp.pad(x, ((0, 0), (left, right), (left, right), (0, 0)),
                       mode="reflect")

    def _extract_patches(self, x, kernel_size, stride):
        x = self._pad(x, kernel_size, stride)
        cols = unfold_nhwc(x, kernel_size, stride)
        n, Ho, Wo = cols.shape[:3]
        return cols.reshape(n, Ho * Wo, kernel_size, kernel_size,
                            x.shape[-1])


# ---------------------------------------------------------------------------
# PartialConv2d (reference partial_conv.py:9)
# ---------------------------------------------------------------------------


class PartialConv2d(nn.Module):
    """Partial convolution: the conv is renormalized by the valid-mask
    fraction under the kernel and the mask is eroded forward."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True
    multi_channel: bool = False
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x, mask=None, return_mask: bool = True):
        """x: (n,h,w,c); mask: (n,h,w,c) if multi_channel else (n,h,w,1),
        1 = valid (NOTE: opposite of the inpainting hole masks)."""
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (k, k, self.in_channels, self.out_channels))
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.out_channels,))
                if self.use_bias else None)

        if mask is not None:
            mask_in = self.in_channels if self.multi_channel else 1
            mask_out = self.out_channels if self.multi_channel else 1
            w_mask = jnp.ones((k, k, mask_in, mask_out), x.dtype)
            updated = conv2d_nhwc(jax.lax.stop_gradient(mask), w_mask,
                                  self.stride, self.padding, self.dilation)
            numel = k * k * mask_in
            ratio = numel / (updated + self.eps)
            updated = jnp.clip(updated, 0.0, 1.0)
            ratio = ratio * updated
            x = x * mask

        raw = conv2d_nhwc(x, kernel, self.stride, self.padding,
                          self.dilation)

        if mask is None:
            out = raw + (bias if bias is not None else 0.0)
            return out

        if bias is None:
            out = raw * ratio
        else:
            out = (raw) * ratio + bias
            out = out * updated
        if return_mask:
            return out, updated
        return out


class MaskConvModule(nn.Module):
    """PartialConv + optional activation, mask threaded through
    (reference mask_conv_module.py:4)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    multi_channel: bool = False
    act: Optional[str] = "relu"

    @nn.compact
    def __call__(self, x, mask=None, return_mask: bool = True):
        conv = PartialConv2d(self.in_channels, self.out_channels,
                             self.kernel_size, self.stride, self.padding,
                             multi_channel=self.multi_channel, name="conv")
        if mask is not None and return_mask:
            x, updated = conv(x, mask, return_mask=True)
        else:
            x = conv(x, mask, return_mask=False)
            updated = None
        x = _act(self.act)(x)
        if return_mask and mask is not None:
            return x, updated
        return x


# ---------------------------------------------------------------------------
# SimpleGatedConvModule (reference gated_conv_module.py:8)
# ---------------------------------------------------------------------------


class SimpleGatedConvModule(nn.Module):
    """y = act(conv_feat(x)) * sigmoid(conv_gate(x)); one doubled conv."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    feat_act: Optional[str] = "elu"
    gate_act: Optional[str] = "sigmoid"

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.out_channels * 2,
                    (self.kernel_size, self.kernel_size),
                    strides=self.stride, padding=self.padding,
                    name="conv")(x)
        feat, gate = jnp.split(y, 2, axis=-1)
        return _act(self.feat_act)(feat) * _act(self.gate_act)(gate)


# ---------------------------------------------------------------------------
# DepthwiseSeparableConvModule / ASPP (reference separable_conv_module.py,
# aspp.py)
# ---------------------------------------------------------------------------


class DepthwiseSeparableConvModule(nn.Module):
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    dw_act: Optional[str] = "relu"
    pw_act: Optional[str] = "relu"
    use_norm: bool = False

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        x = nn.Conv(self.in_channels,
                    (self.kernel_size, self.kernel_size),
                    strides=self.stride, padding=self.padding,
                    kernel_dilation=self.dilation,
                    feature_group_count=self.in_channels,
                    name="depthwise_conv")(x)
        if self.use_norm:
            x = nn.BatchNorm(use_running_average=use_running_average,
                             name="dw_norm")(x)
        x = _act(self.dw_act)(x)
        x = nn.Conv(self.out_channels, (1, 1), name="pointwise_conv")(x)
        if self.use_norm:
            x = nn.BatchNorm(use_running_average=use_running_average,
                             name="pw_norm")(x)
        x = _act(self.pw_act)(x)
        return x


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (DeepLabV3), reference aspp.py:30."""

    in_channels: int
    out_channels: int = 256
    mid_channels: int = 256
    dilations: Sequence[int] = (12, 24, 36)
    separable_conv: bool = False

    @nn.compact
    def __call__(self, x, use_running_average: bool = True,
                 deterministic: bool = True):
        N, H, W, C = x.shape

        def bn_relu(v, name):
            v = nn.BatchNorm(use_running_average=use_running_average,
                             name=f"{name}_bn")(v)
            return jax.nn.relu(v)

        res = []
        y = nn.Conv(self.mid_channels, (1, 1), use_bias=False,
                    name="conv0")(x)
        res.append(bn_relu(y, "conv0"))
        for i, d in enumerate(self.dilations):
            if self.separable_conv:
                y = DepthwiseSeparableConvModule(
                    self.in_channels, self.mid_channels, 3, padding=d,
                    dilation=d, name=f"sep{i + 1}")(x, use_running_average)
            else:
                y = nn.Conv(self.mid_channels, (3, 3), padding=d,
                            kernel_dilation=(d, d), use_bias=False,
                            name=f"conv{i + 1}")(x)
                y = bn_relu(y, f"conv{i + 1}")
            res.append(y)

        # pooling branch: global pool -> 1x1 conv -> bilinear upsample
        g = x.mean(axis=(1, 2), keepdims=True)
        g = nn.Conv(self.mid_channels, (1, 1), use_bias=False,
                    name="pool_conv")(g)
        g = bn_relu(g, "pool_conv")
        g = jnp.broadcast_to(g, (N, H, W, self.mid_channels))
        res.append(g)

        y = jnp.concatenate(res, axis=-1)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    name="project")(y)
        y = bn_relu(y, "project")
        y = nn.Dropout(0.5, deterministic=deterministic,
                       name="dropout")(y)
        return y


# ---------------------------------------------------------------------------
# LinearModule / ImgNormalize (reference linear_module.py, img_normalize.py)
# ---------------------------------------------------------------------------


class LinearModule(nn.Module):
    in_features: int
    out_features: int
    use_bias: bool = True
    act: Optional[str] = "relu"
    order: Tuple[str, str] = ("linear", "act")

    @nn.compact
    def __call__(self, x, activate: bool = True):
        lin = nn.Dense(self.out_features, use_bias=self.use_bias,
                       name="linear")
        for layer in self.order:
            if layer == "linear":
                x = lin(x)
            elif layer == "act" and activate and self.act is not None:
                x = _act(self.act)(x)
        return x


def img_normalize(x, pixel_range: float, img_mean, img_std, sign: int = -1):
    """(x + sign * pixel_range * mean) / std per channel, the frozen-conv
    normalization of reference img_normalize.py:17."""
    mean = jnp.asarray(img_mean, x.dtype)
    std = jnp.asarray(img_std, x.dtype)
    return (x + sign * pixel_range * mean) / std


# ---------------------------------------------------------------------------
# pix2pix / cyclegan generator blocks + GAN image buffer
# (reference generation_model_utils.py)
# ---------------------------------------------------------------------------


def _make_norm(kind: str, name: str, use_running_average: bool = True):
    """'BN' -> BatchNorm; 'IN' -> InstanceNorm without affine params
    (torch nn.InstanceNorm2d default affine=False)."""
    if kind == "BN":
        return nn.BatchNorm(use_running_average=use_running_average,
                            name=name)
    if kind == "IN":
        return nn.GroupNorm(num_groups=None, group_size=1, use_scale=False,
                            use_bias=False, epsilon=1e-5, name=name)
    raise ValueError(f"unknown norm {kind!r}")


class TorchConvTranspose2d(nn.Module):
    """torch ``nn.ConvTranspose2d`` in NHWC: flax's ConvTranspose pads the
    dilated input differently, so use the exact adjoint-of-strided-conv
    lowering instead."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (k, k, self.in_channels, self.out_channels))
        y = conv_transpose2d_nhwc(x, kernel, self.stride, self.padding)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.out_channels,))
        return y


class ResidualBlockWithDropout(nn.Module):
    """conv-norm-relu-(dropout)-conv-norm with residual
    (reference generation_model_utils.py:231).  Bias follows the reference
    rule: only IN norm keeps conv bias."""

    channels: int
    padding_mode: str = "reflect"
    norm: str = "BN"
    use_dropout: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 use_running_average: bool = True):
        use_bias = self.norm == "IN"

        def block(v, name, act):
            v = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)),
                        mode=self.padding_mode)
            v = nn.Conv(self.channels, (3, 3), padding=0, use_bias=use_bias,
                        name=f"{name}_conv")(v)
            v = _make_norm(self.norm, f"{name}_norm", use_running_average)(v)
            if act:
                v = jax.nn.relu(v)
            return v

        y = block(x, "b0", act=True)
        if self.use_dropout:
            y = nn.Dropout(0.5, deterministic=deterministic)(y)
        y = block(y, "b1", act=False)
        return x + y


class UnetSkipConnectionBlock(nn.Module):
    """One U-Net level of the pix2pix generator
    (reference generation_model_utils.py:113): (lrelu ->) down conv
    (-> norm) -> submodule -> relu -> up deconv (-> norm), concatenating
    the input except at the outermost level."""

    outer_channels: int
    inner_channels: int
    in_channels: Optional[int] = None
    submodule: Optional[nn.Module] = None
    is_outermost: bool = False
    is_innermost: bool = False
    norm: str = "BN"
    use_dropout: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 use_running_average: bool = True):
        use_bias = self.norm == "IN"
        lrelu = _act("leaky_relu")

        down = x
        if not self.is_outermost:
            down = lrelu(down)
        down = nn.Conv(self.inner_channels, (4, 4), strides=2, padding=1,
                       use_bias=use_bias, name="down_conv")(down)
        if not (self.is_outermost or self.is_innermost):
            down = _make_norm(self.norm, "down_norm",
                              use_running_average)(down)

        mid = down
        if self.submodule is not None:
            mid = self.submodule(mid, deterministic, use_running_average)

        up_in = (self.inner_channels if self.is_innermost
                 else self.inner_channels * 2)
        up = jax.nn.relu(mid)
        up = TorchConvTranspose2d(
            up_in, self.outer_channels, 4, stride=2, padding=1,
            use_bias=True if self.is_outermost else use_bias,
            name="up_conv")(up)
        if self.is_outermost:
            return jnp.tanh(up)
        up = _make_norm(self.norm, "up_norm", use_running_average)(up)
        if self.use_dropout:
            up = nn.Dropout(0.5, deterministic=deterministic)(up)
        return jnp.concatenate([x, up], axis=-1)


class GANImageBuffer:
    """Host-side history buffer of generated images (reference
    generation_model_utils.py:56): with probability ``buffer_ratio`` return
    a stored image and swap in the new one."""

    def __init__(self, buffer_size: int, buffer_ratio: float = 0.5,
                 seed: int = 0):
        self.buffer_size = buffer_size
        self.buffer_ratio = buffer_ratio
        self.img_num = 0
        self.image_buffer = []
        self._rng = np.random.default_rng(seed)

    def query(self, images: np.ndarray) -> np.ndarray:
        if self.buffer_size == 0:
            return images
        out = []
        for image in np.asarray(images):
            if self.img_num < self.buffer_size:
                self.image_buffer.append(image)
                self.img_num += 1
                out.append(image)
            elif self._rng.uniform() > self.buffer_ratio:
                idx = int(self._rng.integers(0, self.buffer_size))
                stored = self.image_buffer[idx].copy()
                self.image_buffer[idx] = image
                out.append(stored)
            else:
                out.append(image)
        return np.stack(out, axis=0)
