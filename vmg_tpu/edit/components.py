"""GAN components: discriminators and refiners, TPU-native flax
(reference ``mmedit/models/components/``).

Channels-last NHWC throughout.  These give the (already-implemented,
oracle-tested) GANLoss something to train against -- the reference uses
them for SRGAN/ESRGAN (ModifiedVGG), TTSR (TTSRDiscriminator), DICGAN
(LightCNN), pix2pix/cyclegan (PatchDiscriminator), Global&Local and
DeepFill inpainting (MultiLayerDiscriminator, GLDiscs,
DeepFillv1Discriminators) and matting/LIIF refinement (PlainRefiner,
MLPRefiner, DeepFillRefiner).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from vmg_tpu.edit.registry import COMPONENTS, build_from_cfg
from vmg_tpu.edit.common import (_act, _make_norm, ContextualAttentionModule,
                                 SimpleGatedConvModule, LinearModule)


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.2 * x)


@COMPONENTS.register_module()
class TTSRDiscriminator(nn.Module):
    """Plain VGG-style stack + 2-layer head (reference ttsr_disc.py:9)."""

    in_channels: int = 3
    in_size: int = 160

    @nn.compact
    def __call__(self, x):
        chans = [32, 32, 64, 64, 128, 128, 256, 256, 512, 512]
        for i, c in enumerate(chans):
            stride = 2 if i % 2 == 1 else 1
            x = nn.Conv(c, (3, 3), strides=stride, padding=1,
                        name=f"conv{i}")(x)
            x = _lrelu(x)
        x = x.reshape(x.shape[0], -1)
        x = _lrelu(nn.Dense(1024, name="fc1")(x))
        return nn.Dense(1, name="fc2")(x)


@COMPONENTS.register_module()
class PatchDiscriminator(nn.Module):
    """PatchGAN discriminator (reference patch_disc.py:11)."""

    in_channels: int
    base_channels: int = 64
    num_conv: int = 3
    norm: str = "BN"

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        use_bias = self.norm == "IN"
        x = nn.Conv(self.base_channels, (4, 4), strides=2, padding=1,
                    name="conv0")(x)
        x = _lrelu(x)
        mult = 1
        for n in range(1, self.num_conv):
            mult = min(2 ** n, 8)
            x = nn.Conv(self.base_channels * mult, (4, 4), strides=2,
                        padding=1, use_bias=use_bias, name=f"conv{n}")(x)
            x = _make_norm(self.norm, f"norm{n}", use_running_average)(x)
            x = _lrelu(x)
        mult = min(2 ** self.num_conv, 8)
        x = nn.Conv(self.base_channels * mult, (4, 4), strides=1, padding=1,
                    use_bias=use_bias, name=f"conv{self.num_conv}")(x)
        x = _make_norm(self.norm, f"norm{self.num_conv}",
                       use_running_average)(x)
        x = _lrelu(x)
        return nn.Conv(1, (4, 4), strides=1, padding=1, name="conv_out")(x)


@COMPONENTS.register_module()
class ModifiedVGG(nn.Module):
    """SRGAN/ESRGAN discriminator for 128x128 inputs
    (reference modified_vgg.py:9)."""

    in_channels: int = 3
    mid_channels: int = 64

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        if x.shape[1] != 128 or x.shape[2] != 128:
            raise ValueError(
                f"Input spatial size must be 128x128, got {x.shape}")
        m = self.mid_channels

        def block(v, c, stride, name, use_bias=False, norm=True):
            k = 4 if stride == 2 else 3
            v = nn.Conv(c, (k, k), strides=stride, padding=1,
                        use_bias=use_bias, name=f"conv{name}")(v)
            if norm:
                v = nn.BatchNorm(use_running_average=use_running_average,
                                 name=f"bn{name}")(v)
            return _lrelu(v)

        x = block(x, m, 1, "0_0", use_bias=True, norm=False)
        x = block(x, m, 2, "0_1")
        x = block(x, m * 2, 1, "1_0")
        x = block(x, m * 2, 2, "1_1")
        x = block(x, m * 4, 1, "2_0")
        x = block(x, m * 4, 2, "2_1")
        x = block(x, m * 8, 1, "3_0")
        x = block(x, m * 8, 2, "3_1")
        x = block(x, m * 8, 1, "4_0")
        x = block(x, m * 8, 2, "4_1")
        x = x.reshape(x.shape[0], -1)
        x = _lrelu(nn.Dense(100, name="linear1")(x))
        return nn.Dense(1, name="linear2")(x)


class MaxFeature(nn.Module):
    """Max-feature-map: double-width filter, elementwise max of halves
    (reference light_cnn.py:9)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    filter_type: str = "conv2d"

    @nn.compact
    def __call__(self, x):
        if self.filter_type == "conv2d":
            y = nn.Conv(2 * self.out_channels,
                        (self.kernel_size, self.kernel_size),
                        strides=self.stride, padding=self.padding,
                        name="filter")(x)
        elif self.filter_type == "linear":
            y = nn.Dense(2 * self.out_channels, name="filter")(x)
        else:
            raise ValueError(f"bad filter_type {self.filter_type!r}")
        a, b = jnp.split(y, 2, axis=-1)
        return jnp.maximum(a, b)


def _max_pool_ceil(x):
    """torch MaxPool2d(2, 2, ceil_mode=True) in NHWC."""
    H, W = x.shape[1:3]
    ph, pw = H % 2, W % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                    constant_values=-jnp.inf)
    return nn.max_pool(x, (2, 2), strides=(2, 2))


@COMPONENTS.register_module()
class LightCNN(nn.Module):
    """LightCNN discriminator for 128x128 (reference light_cnn.py:64)."""

    in_channels: int

    @nn.compact
    def __call__(self, x, features_only: bool = False):
        spec = [(48, 5, 2), "pool", (48, 1, 0), (96, 3, 1), "pool",
                (96, 1, 0), (192, 3, 1), "pool", (192, 1, 0), (128, 3, 1),
                (128, 1, 0), (128, 3, 1), "pool"]
        i = 0
        for s in spec:
            if s == "pool":
                x = _max_pool_ceil(x)
            else:
                c, k, p = s
                x = MaxFeature(c, k, 1, p, name=f"mf{i}")(x)
                i += 1
        if features_only:
            # the frozen feature trunk of LightCNNFeatureLoss
            # (reference feature_loss.py:10)
            return x
        x = x.reshape(x.shape[0], -1)
        x = MaxFeature(256, filter_type="linear", name="fc1")(x)
        x = _lrelu(x)
        return nn.Dense(1, name="fc2")(x)


@COMPONENTS.register_module()
class MultiLayerDiscriminator(nn.Module):
    """Stacked stride-2 convs with optional fc / out-conv heads
    (reference multi_layer_disc.py:11)."""

    in_channels: int
    max_channels: int
    num_convs: int = 5
    fc_in_channels: Optional[int] = None
    fc_out_channels: int = 1024
    kernel_size: int = 5
    norm: Optional[str] = None
    act: Optional[str] = "relu"
    out_act: Optional[str] = "relu"
    with_input_norm: bool = True
    with_out_convs: bool = False

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        with_fc = self.fc_in_channels is not None
        k = self.kernel_size
        for i in range(self.num_convs):
            out_ch = min(64 * 2 ** i, self.max_channels)
            norm, act = self.norm, self.act
            if i == 0 and not self.with_input_norm:
                norm = None
            elif (i == self.num_convs - 1 and not with_fc
                  and not self.with_out_convs):
                norm = None
                act = self.out_act
            x = nn.Conv(out_ch, (k, k), strides=2, padding=k // 2,
                        use_bias=norm is None, name=f"conv{i + 1}")(x)
            if norm is not None:
                x = _make_norm(norm, f"norm{i + 1}", use_running_average)(x)
            x = _act(act)(x)
        if self.with_out_convs:
            out_ch = min(64 * 2 ** self.num_convs, self.max_channels)
            x = nn.Conv(out_ch, (k, k), strides=1, padding=k // 2,
                        use_bias=self.norm is None,
                        name=f"conv{self.num_convs + 1}")(x)
            if self.norm is not None:
                x = _make_norm(self.norm, f"norm{self.num_convs + 1}",
                               use_running_average)(x)
            x = _act(self.act)(x)
            x = nn.Conv(1, (k, k), strides=1, padding=k // 2,
                        name=f"conv{self.num_convs + 2}")(x)
        if with_fc:
            x = x.reshape(x.shape[0], -1)
            x = LinearModule(self.fc_in_channels, self.fc_out_channels,
                             act=self.out_act, name="fc")(x)
        return x


@COMPONENTS.register_module()
class GLDiscs(nn.Module):
    """Global&Local pair of MultiLayerDiscriminators + joint fc
    (reference gl_disc.py:10)."""

    global_disc_cfg: dict
    local_disc_cfg: dict

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        g_img, l_img = x
        g = MultiLayerDiscriminator(**self.global_disc_cfg,
                                    name="global_disc")(
            g_img, use_running_average)
        l = MultiLayerDiscriminator(**self.local_disc_cfg,
                                    name="local_disc")(
            l_img, use_running_average)
        return nn.Dense(1, name="fc")(jnp.concatenate([g, l], axis=1))


@COMPONENTS.register_module()
class DeepFillv1Discriminators(nn.Module):
    """Independent global + local discriminators (reference
    deepfill_disc.py:10); sub-discriminators built from config dicts."""

    global_disc_cfg: dict
    local_disc_cfg: dict

    def setup(self):
        self.global_disc = build_from_cfg(dict(self.global_disc_cfg),
                                          COMPONENTS)
        self.local_disc = build_from_cfg(dict(self.local_disc_cfg),
                                         COMPONENTS)

    def __call__(self, x, use_running_average: bool = True):
        global_img, local_img = x
        return (self.global_disc(global_img, use_running_average),
                self.local_disc(local_img, use_running_average))


# ---------------------------------------------------------------------------
# refiners
# ---------------------------------------------------------------------------


@COMPONENTS.register_module()
class PlainRefiner(nn.Module):
    """Deep-Image-Matting alpha refiner (reference plain_refiner.py:9)."""

    conv_channels: int = 64

    @nn.compact
    def __call__(self, x, raw_alpha):
        out = jax.nn.relu(nn.Conv(self.conv_channels, (3, 3), padding=1,
                                  name="refine_conv1")(x))
        out = jax.nn.relu(nn.Conv(self.conv_channels, (3, 3), padding=1,
                                  name="refine_conv2")(out))
        out = jax.nn.relu(nn.Conv(self.conv_channels, (3, 3), padding=1,
                                  name="refine_conv3")(out))
        raw_refine = nn.Conv(1, (3, 3), padding=1, name="refine_pred")(out)
        return jax.nn.sigmoid(raw_alpha + raw_refine)


@COMPONENTS.register_module()
class MLPRefiner(nn.Module):
    """LIIF MLP decoder (reference mlp_refiner.py:9)."""

    in_dim: int
    out_dim: int
    hidden_list: Sequence[int] = ()

    @nn.compact
    def __call__(self, x):
        shape = x.shape[:-1]
        x = x.reshape(-1, x.shape[-1])
        for i, hidden in enumerate(self.hidden_list):
            x = jax.nn.relu(nn.Dense(hidden, name=f"fc{i}")(x))
        x = nn.Dense(self.out_dim, name=f"fc{len(self.hidden_list)}")(x)
        return x.reshape(*shape, -1)


class DeepFillEncoder(nn.Module):
    """Stage-2 DeepFill encoder: 6 gated/plain convs downsampling 4x.

    The reference's DeepFillRefiner builds `DeepFillEncoder` components
    that are NOT present in the vendored mmedit snapshot
    (``mmedit/models/backbones/`` contains only sr_backbones), so the
    reference class is un-instantiable as shipped; this is a working
    TPU-native equivalent following the DeepFill v1 paper topology.
    """

    out_channels: int = 128

    @nn.compact
    def __call__(self, x):
        c = self.out_channels
        x = SimpleGatedConvModule(x.shape[-1], c // 4, 5, padding=2,
                                  name="enc1")(x)
        x = SimpleGatedConvModule(c // 4, c // 2, 3, stride=2, padding=1,
                                  name="enc2")(x)
        x = SimpleGatedConvModule(c // 2, c // 2, 3, padding=1,
                                  name="enc3")(x)
        x = SimpleGatedConvModule(c // 2, c, 3, stride=2, padding=1,
                                  name="enc4")(x)
        x = SimpleGatedConvModule(c, c, 3, padding=1, name="enc5")(x)
        x = SimpleGatedConvModule(c, c, 3, padding=1, name="enc6")(x)
        return x


class GLDilationNeck(nn.Module):
    """4 dilated convs (Global&Local / DeepFill dilation branch)."""

    in_channels: int = 128

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate((2, 4, 8, 16)):
            x = jax.nn.elu(nn.Conv(self.in_channels, (3, 3), padding=d,
                                   kernel_dilation=(d, d),
                                   name=f"dil{i}")(x))
        return x


class ContextualAttentionNeck(nn.Module):
    """conv -> contextual attention -> conv (DeepFill attention branch)."""

    in_channels: int = 128

    @nn.compact
    def __call__(self, x, mask):
        x = jax.nn.elu(nn.Conv(self.in_channels, (3, 3), padding=1,
                               name="pre_conv")(x))
        x, offset = ContextualAttentionModule(name="ca")(x, x, mask)
        x = jax.nn.elu(nn.Conv(self.in_channels, (3, 3), padding=1,
                               name="post_conv")(x))
        return x, offset


class DeepFillDecoder(nn.Module):
    """Gated convs + 2x nearest upsamples back to image resolution."""

    in_channels: int = 256

    @nn.compact
    def __call__(self, x):
        from vmg_tpu.edit.common import nearest_upsample

        c = self.in_channels
        x = SimpleGatedConvModule(c, c // 2, 3, padding=1, name="dec1")(x)
        x = nearest_upsample(x, 2)
        x = SimpleGatedConvModule(c // 2, c // 4, 3, padding=1,
                                  name="dec2")(x)
        x = nearest_upsample(x, 2)
        x = SimpleGatedConvModule(c // 4, c // 8, 3, padding=1,
                                  name="dec3")(x)
        x = nn.Conv(3, (3, 3), padding=1, name="out_conv")(x)
        return x


@COMPONENTS.register_module()
class DeepFillRefiner(nn.Module):
    """Two-branch DeepFill stage-2 refiner (reference
    deepfill_refiner.py:10): conv branch (encoder + dilation neck) and
    attention branch (encoder + contextual attention), concatenated and
    decoded."""

    mid_channels: int = 128

    @nn.compact
    def __call__(self, x, mask):
        from vmg_tpu.edit.common import nearest_downsample

        conv_x = DeepFillEncoder(self.mid_channels, name="encoder_conv")(x)
        conv_x = GLDilationNeck(self.mid_channels, name="dilation_neck")(
            conv_x)

        attn_x = DeepFillEncoder(self.mid_channels,
                                 name="encoder_attention")(x)
        factor = x.shape[1] // attn_x.shape[1]
        resized_mask = nearest_downsample(mask, factor)
        attn_x, offset = ContextualAttentionNeck(
            self.mid_channels, name="contextual_attention_neck")(
            attn_x, resized_mask)

        y = jnp.concatenate([conv_x, attn_x], axis=-1)
        return DeepFillDecoder(2 * self.mid_channels, name="decoder")(y), \
            offset
