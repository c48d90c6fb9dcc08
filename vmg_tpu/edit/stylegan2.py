"""StyleGAN2 generator / discriminator, TPU-native flax (reference
``mmedit/models/components/stylegan2/``: modules.py 945 LoC,
generator_discriminator.py 540 LoC).

Design notes (channels-last, XLA-first):

* **Equalized LR** (reference modules.py:62): instead of a forward
  pre-hook mutating the module, the stored parameter is the "orig" weight
  and the effective weight ``w * gain * sqrt(1/fan_in) * lr_mul`` is
  computed at use time -- pure function, same numerics.
* **Modulated conv** (reference modules.py:383): the reference builds one
  conv kernel PER SAMPLE and runs a grouped conv over the flattened batch.
  Because conv is linear in the kernel, ``conv(x, W * s[c_in])`` equals
  ``conv(x * s[c_in], W)`` and the demodulation is a per-(sample, c_out)
  scale of the output -- so this implementation scales activations
  instead, keeping one shared kernel and a plain batched XLA conv (MXU
  path, no per-sample weight materialization).
* **upfirdn2d** (mmcv.ops CUDA kernel) is zero-insert upsample -> pad ->
  FIR conv -> stride slice, expressed with stock XLA ops.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from vmg_tpu.edit.registry import COMPONENTS
from vmg_tpu.edit.common import conv2d_nhwc, conv_transpose2d_nhwc


def pixel_norm(x, eps=1e-6):
    """PGGAN pixel norm over the channel (last) dim
    (reference modules.py:18)."""
    norm = jnp.linalg.norm(x, ord=2, axis=-1, keepdims=True)
    norm = norm / jnp.sqrt(x.shape[-1])
    return x / (norm + eps)


def upfirdn2d(x, kernel, up=1, down=1, pad=(0, 0)):
    """mmcv.ops.upfirdn2d on NHWC: zero-insert upsample by ``up``, pad
    (possibly negative = crop), correlate with the flipped 2D FIR kernel,
    subsample by ``down``."""
    N, H, W, C = x.shape
    kh, kw = kernel.shape
    p0, p1 = pad

    if up > 1:
        y = jnp.zeros((N, H, up, W, up, C), x.dtype)
        y = y.at[:, :, 0, :, 0, :].set(x)
        x = y.reshape(N, H * up, W * up, C)
    # pad (negative pads crop)
    x = jnp.pad(x, ((0, 0), (max(p0, 0), max(p1, 0)),
                    (max(p0, 0), max(p1, 0)), (0, 0)))
    x = x[:, max(-p0, 0): x.shape[1] - max(-p1, 0),
          max(-p0, 0): x.shape[2] - max(-p1, 0), :]

    w = jnp.flip(kernel, (0, 1)).astype(x.dtype).reshape(kh, kw, 1, 1)
    x = jax.lax.conv_general_dilated(
        x, jnp.broadcast_to(w, (kh, kw, 1, C)),
        window_strides=(1, 1), padding="VALID",
        feature_group_count=C,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if down > 1:
        x = x[:, ::down, ::down, :]
    return x


def make_kernel(k):
    k = np.asarray(k, np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    return jnp.asarray(k / k.sum())


def fused_bias_leakyrelu(x, bias, negative_slope=0.2, scale=2 ** 0.5):
    """mmcv fused bias + leaky relu + sqrt(2) gain; bias indexes the
    channel (last) dim."""
    y = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
    return jnp.where(y >= 0, y, negative_slope * y) * scale


def _eqlr_scale(shape_in_fan, gain, lr_mul):
    return gain * math.sqrt(1.0 / shape_in_fan) * lr_mul


class EqualLinearActModule(nn.Module):
    """Equalized-LR linear with external bias and optional fused-lrelu
    (reference modules.py:251).  Weight init N(0, 1/lr_mul)."""

    in_features: int
    out_features: int
    gain: float = 1.0
    lr_mul: float = 1.0
    use_bias: bool = True
    bias_init: float = 0.0
    act: Optional[str] = None  # None | 'fused_bias'

    @nn.compact
    def __call__(self, x):
        if x.ndim >= 3:
            x = x.reshape(x.shape[0], -1)
        w = self.param("weight",
                       lambda k, s: jax.random.normal(k, s) / self.lr_mul,
                       (self.in_features, self.out_features))
        w = w * _eqlr_scale(self.in_features, self.gain, self.lr_mul)
        x = x @ w
        if self.use_bias:
            b = self.param("bias",
                           nn.initializers.constant(self.bias_init),
                           (self.out_features,))
            if self.act == "fused_bias":
                return fused_bias_leakyrelu(x, b * self.lr_mul)
            return x + b * self.lr_mul
        return x


class Blur(nn.Module):
    kernel: Tuple[int, ...] = (1, 3, 3, 1)
    pad: Tuple[int, int] = (0, 0)
    upsample_factor: int = 1

    @nn.compact
    def __call__(self, x):
        k = make_kernel(self.kernel)
        if self.upsample_factor > 1:
            k = k * (self.upsample_factor ** 2)
        return upfirdn2d(x, k, pad=self.pad)


class UpsampleUpFIRDn(nn.Module):
    kernel: Tuple[int, ...] = (1, 3, 3, 1)
    factor: int = 2

    @nn.compact
    def __call__(self, x):
        k = make_kernel(self.kernel) * (self.factor ** 2)
        p = k.shape[0] - self.factor
        pad0 = (p + 1) // 2 + self.factor - 1
        pad1 = p // 2
        # asymmetric pad needs the general path
        N, H, W, C = x.shape
        up = self.factor
        y = jnp.zeros((N, H, up, W, up, C), x.dtype)
        y = y.at[:, :, 0, :, 0, :].set(x)
        y = y.reshape(N, H * up, W * up, C)
        y = jnp.pad(y, ((0, 0), (pad0, pad1), (pad0, pad1), (0, 0)))
        kh, kw = k.shape
        w = jnp.flip(k, (0, 1)).astype(x.dtype).reshape(kh, kw, 1, 1)
        return jax.lax.conv_general_dilated(
            y, jnp.broadcast_to(w, (kh, kw, 1, C)),
            window_strides=(1, 1), padding="VALID", feature_group_count=C,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ModulatedConv2d(nn.Module):
    """Style-modulated conv (reference modules.py:383).  See module
    docstring: modulation/demodulation become activation scalings around a
    shared-kernel conv."""

    in_channels: int
    out_channels: int
    kernel_size: int
    style_channels: int
    demodulate: bool = True
    upsample: bool = False
    downsample: bool = False
    blur_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    gain: float = 1.0
    lr_mul: float = 1.0
    style_bias_init: float = 1.0
    style_bias: float = 0.0
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x, style):
        n, h, w_sp, c = x.shape
        k = self.kernel_size
        style = EqualLinearActModule(
            self.style_channels, self.in_channels, gain=1.0,
            bias_init=self.style_bias_init, name="style_modulation",
        )(style) + self.style_bias  # (n, c_in)

        weight = self.param(
            "weight", lambda kk, s: jax.random.normal(kk, s) / self.lr_mul,
            (k, k, self.in_channels, self.out_channels))
        fan_in = self.in_channels * k * k
        weight = weight * _eqlr_scale(fan_in, self.gain, self.lr_mul)

        if self.demodulate:
            # demod[n, o] = rsqrt(sum_{k,k,i} (W * s_i)^2 + eps)
            w2 = jnp.sum(weight ** 2, axis=(0, 1))  # (c_in, c_out)
            demod = jax.lax.rsqrt(
                jnp.einsum("ni,io->no", style ** 2, w2) + self.eps)

        x = x * style[:, None, None, :]

        if self.upsample:
            # torch conv_transpose2d(stride 2, padding 0) then blur
            y = conv_transpose2d_nhwc(x, weight, stride=2, padding=0)
            if self.demodulate:
                y = y * demod[:, None, None, :]
            factor = 2
            p = (len(self.blur_kernel) - factor) - (k - 1)
            pad0 = (p + 1) // 2 + factor - 1
            pad1 = p // 2 + 1
            y = Blur(tuple(self.blur_kernel), (pad0, pad1),
                     upsample_factor=factor, name="blur")(y)
        elif self.downsample:
            factor = 2
            p = (len(self.blur_kernel) - factor) + (k - 1)
            pad0 = (p + 1) // 2
            pad1 = p // 2
            x = Blur(tuple(self.blur_kernel), (pad0, pad1), name="blur")(x)
            y = conv2d_nhwc(x, weight, stride=2, padding=0)
            if self.demodulate:
                y = y * demod[:, None, None, :]
        else:
            y = conv2d_nhwc(x, weight, padding=k // 2)
            if self.demodulate:
                y = y * demod[:, None, None, :]
        return y


class NoiseInjection(nn.Module):
    """image + w * noise (reference modules.py:499)."""

    @nn.compact
    def __call__(self, image, noise=None, return_noise=False):
        w = self.param("weight", nn.initializers.zeros, (1,))
        if noise is None:
            rng = self.make_rng("noise")
            noise = jax.random.normal(
                rng, (image.shape[0], image.shape[1], image.shape[2], 1),
                image.dtype)
        out = image + w * noise
        if return_noise:
            return out, noise
        return out


class ConstantInput(nn.Module):
    channel: int
    size: int = 4

    @nn.compact
    def __call__(self, batch):
        inp = self.param("input", nn.initializers.normal(1.0),
                         (1, self.size, self.size, self.channel))
        return jnp.broadcast_to(inp, (batch, self.size, self.size,
                                      self.channel))


class ModulatedStyleConv(nn.Module):
    """ModulatedConv2d + noise injection + fused-bias lrelu
    (reference modules.py:688)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    style_channels: int
    upsample: bool = False
    blur_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    demodulate: bool = True

    @nn.compact
    def __call__(self, x, style, noise=None):
        out = ModulatedConv2d(
            self.in_channels, self.out_channels, self.kernel_size,
            self.style_channels, demodulate=self.demodulate,
            upsample=self.upsample, blur_kernel=self.blur_kernel,
            name="conv")(x, style)
        out = NoiseInjection(name="noise_injector")(out, noise)
        bias = self.param("activate_bias", nn.initializers.zeros,
                          (self.out_channels,))
        return fused_bias_leakyrelu(out, bias)


class ModulatedToRGB(nn.Module):
    """1x1 modulated conv (no demod) to RGB with skip upsampling
    (reference modules.py:780)."""

    in_channels: int
    style_channels: int
    out_channels: int = 3
    upsample: bool = True
    blur_kernel: Tuple[int, ...] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x, style, skip=None):
        out = ModulatedConv2d(
            self.in_channels, self.out_channels, 1, self.style_channels,
            demodulate=False, name="conv")(x, style)
        bias = self.param("bias", nn.initializers.zeros,
                          (1, 1, 1, self.out_channels))
        out = out + bias
        if skip is not None:
            skip = UpsampleUpFIRDn(tuple(self.blur_kernel),
                                   name="upsample")(skip)
            out = out + skip
        return out


class ConvDownLayer(nn.Module):
    """(blur +) eq-lr conv (+ fused-bias lrelu)
    (reference modules.py:817)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    downsample: bool = False
    blur_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    use_bias: bool = True
    fused_act: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        if self.downsample:
            factor = 2
            p = (len(self.blur_kernel) - factor) + (k - 1)
            x = Blur(tuple(self.blur_kernel),
                     ((p + 1) // 2, p // 2), name="blur")(x)
            stride, padding = 2, 0
        else:
            stride, padding = 1, k // 2

        weight = self.param("weight", nn.initializers.normal(1.0),
                            (k, k, self.in_channels, self.out_channels))
        fan_in = self.in_channels * k * k
        weight = weight * _eqlr_scale(fan_in, 1.0, 1.0)
        x = conv2d_nhwc(x, weight, stride=stride, padding=padding)
        if self.fused_act:
            bias = self.param("activate_bias", nn.initializers.zeros,
                              (self.out_channels,))
            return fused_bias_leakyrelu(x, bias)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.out_channels,))
            return x + bias
        return x


class ResBlock(nn.Module):
    """Residual down block of the discriminator
    (reference modules.py:867)."""

    in_channels: int
    out_channels: int
    blur_kernel: Tuple[int, ...] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x):
        out = ConvDownLayer(self.in_channels, self.in_channels, 3,
                            blur_kernel=self.blur_kernel, name="conv1")(x)
        out = ConvDownLayer(self.in_channels, self.out_channels, 3,
                            downsample=True, blur_kernel=self.blur_kernel,
                            name="conv2")(out)
        skip = ConvDownLayer(self.in_channels, self.out_channels, 1,
                             downsample=True, fused_act=False,
                             use_bias=False, blur_kernel=self.blur_kernel,
                             name="skip")(x)
        return (out + skip) / math.sqrt(2)


class ModMBStddevLayer(nn.Module):
    """Minibatch-stddev feature (reference modules.py:900)."""

    group_size: int = 4
    channel_groups: int = 1
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        if n > self.group_size and n % self.group_size != 0:
            raise ValueError(
                f"batch {n} must divide by group size {self.group_size}")
        g = min(n, self.group_size)
        cg = self.channel_groups
        y = x.reshape(g, n // g, h, w, cg, c // cg)
        y = jnp.var(y, axis=0)
        y = jnp.sqrt(y + self.eps)
        y = y.mean(axis=(1, 2, 4))  # (n//g, cg)
        y = y.reshape(n // g, 1, 1, cg)
        y = jnp.tile(y, (g, h, w, 1))
        return jnp.concatenate([x, y], axis=-1)


_CHANNELS = {4: 512, 8: 512, 16: 512, 32: 512}


def _channels(channel_multiplier):
    ch = dict(_CHANNELS)
    ch.update({64: 256 * channel_multiplier, 128: 128 * channel_multiplier,
               256: 64 * channel_multiplier, 512: 32 * channel_multiplier,
               1024: 16 * channel_multiplier})
    return ch


@COMPONENTS.register_module()
class StyleGANv2Generator(nn.Module):
    """Static StyleGAN2 generator (reference
    generator_discriminator.py:17): 8-MLP style mapping + constant input +
    modulated-conv synthesis pyramid with skip to-RGBs.

    ``__call__`` takes pre-sampled style codes (one or two, for mixing)
    and optional per-layer injected noise; the host-side sampling policy
    (mix_prob etc.) belongs to the trainer, keeping this module pure."""

    out_size: int
    style_channels: int
    num_mlps: int = 8
    channel_multiplier: int = 2
    blur_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    lr_mlp: float = 0.01

    @property
    def num_latents(self):
        return int(np.log2(self.out_size)) * 2 - 2

    @property
    def num_injected_noises(self):
        return self.num_latents - 1

    def setup(self):
        log_size = int(np.log2(self.out_size))
        channels = _channels(self.channel_multiplier)
        self.mapping = [EqualLinearActModule(
            self.style_channels, self.style_channels, gain=1.0,
            lr_mul=self.lr_mlp, act="fused_bias", name=f"style_mapping{i}")
            for i in range(self.num_mlps)]
        self.constant_input = ConstantInput(channels[4],
                                            name="constant_input")
        self.conv1 = ModulatedStyleConv(
            channels[4], channels[4], 3, self.style_channels,
            blur_kernel=self.blur_kernel, name="conv1")
        self.to_rgb1 = ModulatedToRGB(channels[4], self.style_channels,
                                      upsample=False, name="to_rgb1")
        convs, to_rgbs = [], []
        in_ch = channels[4]
        for i in range(3, log_size + 1):
            out_ch = channels[2 ** i]
            convs.append(ModulatedStyleConv(
                in_ch, out_ch, 3, self.style_channels, upsample=True,
                blur_kernel=self.blur_kernel, name=f"convs{2 * (i - 3)}"))
            convs.append(ModulatedStyleConv(
                out_ch, out_ch, 3, self.style_channels,
                blur_kernel=self.blur_kernel,
                name=f"convs{2 * (i - 3) + 1}"))
            to_rgbs.append(ModulatedToRGB(out_ch, self.style_channels,
                                          name=f"to_rgbs{i - 3}"))
            in_ch = out_ch
        self.convs = convs
        self.to_rgbs = to_rgbs

    def style_map(self, z):
        y = pixel_norm(z)
        for layer in self.mapping:
            y = layer(y)
        return y

    def __call__(self, styles, inject_index=None, truncation=1.0,
                 truncation_latent=None, input_is_latent=False,
                 injected_noise=None):
        """styles: list of (n, style_channels) arrays (1 = single, 2 = mix);
        injected_noise: list[num_injected_noises] of (n, h, w, 1) or None."""
        if not isinstance(styles, (list, tuple)):
            styles = [styles]

        if not input_is_latent:
            styles = [self.style_map(s) for s in styles]

        if injected_noise is None:
            injected_noise = [None] * self.num_injected_noises

        if truncation < 1:
            styles = [truncation_latent + truncation *
                      (s - truncation_latent) for s in styles]

        if len(styles) < 2:
            latent = jnp.repeat(styles[0][:, None], self.num_latents, axis=1)
        else:
            if inject_index is None:
                inject_index = self.num_latents // 2
            l1 = jnp.repeat(styles[0][:, None], inject_index, axis=1)
            l2 = jnp.repeat(styles[1][:, None],
                            self.num_latents - inject_index, axis=1)
            latent = jnp.concatenate([l1, l2], axis=1)

        n = latent.shape[0]
        out = self.constant_input(n)
        out = self.conv1(out, latent[:, 0], noise=injected_noise[0])
        skip = self.to_rgb1(out, latent[:, 1])

        idx = 1
        for up_conv, conv, to_rgb in zip(self.convs[::2], self.convs[1::2],
                                         self.to_rgbs):
            out = up_conv(out, latent[:, idx], noise=injected_noise[idx])
            out = conv(out, latent[:, idx + 1],
                       noise=injected_noise[idx + 1])
            skip = to_rgb(out, latent[:, idx + 2], skip)
            idx += 2
        return skip


@COMPONENTS.register_module()
class StyleGAN2Discriminator(nn.Module):
    """StyleGAN2 residual discriminator (reference
    generator_discriminator.py:406)."""

    in_size: int
    channel_multiplier: int = 2
    blur_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    mbstd_group_size: int = 4
    mbstd_channel_groups: int = 1

    @nn.compact
    def __call__(self, x):
        channels = _channels(self.channel_multiplier)
        log_size = int(np.log2(self.in_size))
        x = ConvDownLayer(3, channels[self.in_size], 1, name="conv0")(x)
        in_ch = channels[self.in_size]
        for j, i in enumerate(range(log_size, 2, -1)):
            out_ch = channels[2 ** (i - 1)]
            x = ResBlock(in_ch, out_ch, tuple(self.blur_kernel),
                         name=f"res{j}")(x)
            in_ch = out_ch
        x = ModMBStddevLayer(self.mbstd_group_size,
                             self.mbstd_channel_groups,
                             name="mbstd")(x)
        x = ConvDownLayer(in_ch + 1, channels[4], 3, name="final_conv")(x)
        x = x.reshape(x.shape[0], -1)
        x = EqualLinearActModule(channels[4] * 4 * 4, channels[4],
                                 act="fused_bias", name="final_linear0")(x)
        return EqualLinearActModule(channels[4], 1, name="final_linear1")(x)


def get_mean_latent(generator, params, num_samples=4096, seed=0,
                    batch=1024):
    """Mean W-space latent (reference stylegan2/common.py:25)."""
    outs = []
    done = 0
    key = jax.random.key(seed)
    while done < num_samples:
        n = min(batch, num_samples - done)
        key, sub = jax.random.split(key)
        z = jax.random.normal(sub, (n, generator.style_channels))
        w = generator.apply(params, z, method=generator.style_map)
        outs.append(np.asarray(w))
        done += n
    return jnp.asarray(np.concatenate(outs, 0).mean(0, keepdims=True))


def style_mixing(generator, params, n_source, n_target, inject_index=1,
                 truncation=1.0, truncation_latent=None, seed=0,
                 noise_seed=0):
    """Source/target style-mixing grid (reference stylegan2/common.py:55)."""
    k1, k2 = jax.random.split(jax.random.key(seed))
    src = jax.random.normal(k1, (n_source, generator.style_channels))
    tgt = jax.random.normal(k2, (n_target, generator.style_channels))
    rngs = {"noise": jax.random.key(noise_seed)}

    def gen(styles, **kw):
        return generator.apply(params, styles, rngs=rngs,
                               truncation=truncation,
                               truncation_latent=truncation_latent, **kw)

    src_imgs = gen([src])
    tgt_imgs = gen([tgt])
    rows = []
    for i in range(n_target):
        t = jnp.repeat(tgt[i:i + 1], n_source, axis=0)
        rows.append(gen([t, src], inject_index=inject_index))
    return src_imgs, tgt_imgs, jnp.concatenate(rows, 0)
