"""VMG block library: MorphFC axis mixers, FFN zoo, TAB.

Rebuilt from the behavior of reference ``models/function.py`` (TAB:1139,
Enhanced_MorphFCs:494, Enhanced_MorphFCs_decay:596, FFN variants:30-367)
with TPU-first layout: everything is channels-last (B, T, H, W, C), the
axis mixers are expressed as reshapes + one dense matmul so XLA tiles them
onto the MXU, and the retention decay is a constant matrix folded into the
weight at use time (never an in-place mutation -- see
``vmg_tpu.ops.decay``).
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from vmg_tpu.models.norms import TorchLayerNorm, RMSNorm
from vmg_tpu.ops.decay import morphfc_decay_matrix

# torch nn.GELU default is the exact erf form; that is the numerical
# contract all golden tests pin.  For bf16 serving, the erf polynomial is
# pure VPU time (~6 ms per stage-0 FFN activation, profiled) while its
# difference from the tanh form (<1.1e-3 absolute, at |x|~2.3) is far
# below bf16's own ~4e-3 relative rounding -- so serving entry points may
# opt in to the tanh approximation.  Trace-time constant: flip it BEFORE
# jitting (bench.py / eval serving paths do).
_GELU_APPROXIMATE = False
# NOTE: a degree-9 polynomial GELU (ops/group_conv.gelu_poly) was also
# wired here as a serving switch and MEASURED SLOWER than the tanh form
# on the full bench (15.79 vs 16.03 f/s, round 4) -- the switch is
# deleted; the kernel-side 'poly' flavor remains available and tested.


def set_fast_gelu(on: bool) -> bool:
    """Use tanh-approximate GELU in subsequently traced models.  Returns
    the previous setting.  Serving-only: leave off wherever bit-parity
    with the torch reference matters (all tests leave it off)."""
    global _GELU_APPROXIMATE
    prev = _GELU_APPROXIMATE
    _GELU_APPROXIMATE = bool(on)
    return prev


def gelu_exact(x):
    return jax.nn.gelu(x, approximate=_GELU_APPROXIMATE)


# trace-time override of every MlpCnn's impl (None = respect the module's
# own setting).  Lets benches/serving force 'xla' or 'pallas' without
# threading a flag through model construction.
_FFN_IMPL_OVERRIDE: Optional[str] = None


def set_ffn_impl(impl: Optional[str]) -> Optional[str]:
    """Override the grouped-FFN implementation in subsequently traced
    models: None (per-module), 'auto', 'xla', 'pallas', 'interpret'.
    Returns the previous override."""
    global _FFN_IMPL_OVERRIDE
    prev = _FFN_IMPL_OVERRIDE
    _FFN_IMPL_OVERRIDE = impl
    return prev


# same idea for the MorphFCDecay spatial mixer's fused kernels
_MORPH_IMPL_OVERRIDE: Optional[str] = None


def set_morph_impl(impl: Optional[str]) -> Optional[str]:
    """Override the MorphFCDecay implementation in subsequently traced
    models: None (per-module), 'auto', 'xla', 'pallas', 'interpret'.
    Returns the previous override."""
    global _MORPH_IMPL_OVERRIDE
    prev = _MORPH_IMPL_OVERRIDE
    _MORPH_IMPL_OVERRIDE = impl
    return prev


def _gelu_flavor() -> str:
    """Trace-time GELU flavor tag for fused kernels (matches gelu_exact)."""
    return "tanh" if _GELU_APPROXIMATE else "erf"


def leaky_relu(x, slope=0.01):
    return jnp.where(x >= 0, x, slope * x)


def symm_sigmoid(x):
    return jax.nn.sigmoid(x) - 0.5


_SYMM_ACTS = {
    "tanh": jnp.tanh,
    "sigmoid": symm_sigmoid,
    "relu": jax.nn.relu,
    "gelu": gelu_exact,
    "swish": jax.nn.silu,
}


def trunc_normal_init(std=0.02):
    # timm trunc_normal_: truncated at +/-2 std
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)
    return init


def torch_linear_init(in_features):
    """torch nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in))."""
    bound = 1.0 / math.sqrt(in_features)
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def torch_conv_kernel_init(scale: float = 1.0):
    """torch nn.Conv2d default init (kaiming uniform a=sqrt(5)) == U(+-1/sqrt(fan_in)).

    flax kernel shape is (kh, kw, cin/groups, cout); fan_in = kh*kw*cin_g.
    ``scale`` supports the reference's x0.1 residual-trunk scaling
    (``models/layers.py:14-31``).
    """
    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0] * shape[1] * shape[2]
        bound = 1.0 / math.sqrt(fan_in)
        return scale * jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm semantics, scale_by_keep=True)."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# ---------------------------------------------------------------------------
# FFN zoo (channel mixing; reference function.py:30-367)
# ---------------------------------------------------------------------------


class Mlp(nn.Module):
    """fc1 -> GELU -> fc2 (reference Mlp:30)."""

    dim: int
    hidden: Optional[int] = None
    out: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        hidden = self.hidden or self.dim
        out = self.out or self.dim
        x = nn.Dense(hidden, kernel_init=trunc_normal_init(), name="fc1")(x)
        x = gelu_exact(x)
        x = nn.Dense(out, kernel_init=trunc_normal_init(), name="fc2")(x)
        return x


class GroupedConv3x3(nn.Module):
    """Grouped 3x3 conv computed without XLA's feature_group_count.

    XLA's TPU lowering of feature_group_count produced NaNs for the
    stage-2 shape of the full model (groups=4, 224->1344 at 16x16) on
    v5e (and was measured slower than per-group convs where correct), so
    the op is built from plain convs.  Param layout matches
    nn.Conv(feature_group_count=g): kernel (3, 3, Cin/g, Cout), bias
    (Cout,).

    Two mathematically identical forms, chosen by shape:

    * ``Cin <= 128`` (the stage-0/6 family, Cin/g = 28): ONE dense conv
      with a block-diagonal kernel -- zeros outside each group's
      (Cin/g, Cout/g) block.  The per-group form's 28-deep contraction
      uses 28/128 of the MXU's sublanes (profiled ~26 TFLOP/s); the
      dense form pays g x the FLOPs in exact zeros but contracts over
      all Cin <= one full tile (~150 TFLOP/s), ~2x faster end-to-end.
    * wider inputs: per-group convs (the g x FLOPs would outweigh the
      tiling win once Cin/g >= 56).

    The FFN hot path does not go through this module on TPU: MlpCnn fuses
    the whole grouped FFN (conv + GELU + project) into one Pallas kernel
    (``ops/group_conv.fused_group_ffn``) with the same param tree.
    """

    features: int
    groups: int
    act: Optional[str] = None  # None or 'gelu' (flavor from module flags)

    @nn.compact
    def __call__(self, y):
        N, H, W, C = y.shape
        g = self.groups
        cg_in = C // g
        cg_out = self.features // g
        kernel = self.param("kernel", torch_conv_kernel_init(),
                            (3, 3, cg_in, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if C <= 128:
            blocks = jnp.zeros((3, 3, C, self.features), kernel.dtype)
            for gi in range(g):
                blocks = blocks.at[
                    :, :, gi * cg_in:(gi + 1) * cg_in,
                    gi * cg_out:(gi + 1) * cg_out,
                ].set(kernel[..., gi * cg_out:(gi + 1) * cg_out])
            out = jax.lax.conv_general_dilated(
                y, blocks, window_strides=(1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bias
        else:
            outs = []
            for gi in range(g):
                outs.append(jax.lax.conv_general_dilated(
                    y[..., gi * cg_in:(gi + 1) * cg_in],
                    kernel[..., gi * cg_out:(gi + 1) * cg_out],
                    window_strides=(1, 1), padding=((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ))
            out = jnp.concatenate(outs, axis=-1) + bias
        return gelu_exact(out) if self.act == "gelu" else out


class _GroupedConvParams(nn.Module):
    """Param-only twin of GroupedConv3x3 (same path/names/inits), so the
    fused FFN kernel can take over the compute without changing the
    checkpoint tree."""

    features: int
    groups: int

    @nn.compact
    def __call__(self, cin: int):
        kernel = self.param("kernel", torch_conv_kernel_init(),
                            (3, 3, cin // self.groups, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _DenseParams(nn.Module):
    """Param-only twin of nn.Dense(kernel_init=trunc_normal_init())."""

    features: int

    @nn.compact
    def __call__(self, cin: int):
        kernel = self.param("kernel", trunc_normal_init(),
                            (cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class MlpCnn(nn.Module):
    """3x3 conv expand -> GELU -> linear project (reference Mlp_cnn:50).

    The default ``ffn_cnn`` channel mixer of all shipped configs.

    Grouped variant on TPU: the whole FFN runs as ONE Pallas kernel
    (``ops/group_conv.fused_group_ffn``) -- the grouped conv at its true
    FLOPs with full MXU contraction depth, GELU on the f32 accumulator,
    and the projection contracting the hidden back down while it is still
    in VMEM (the 6x-wide hidden never touches HBM).  ``impl``: 'auto'
    (Pallas on TPU, XLA module path elsewhere -- CPU tests and goldens
    pin the module path) | 'xla' | 'pallas'.  The param tree is identical
    on both paths.
    """

    dim: int
    exp_r: float = 4.0
    n_groups: int = 1
    impl: str = "auto"

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        hidden = int(self.dim * self.exp_r)
        y = x.reshape(B * T, H, W, C)
        # explicit 'xla' pin (training) beats the global serving override
        impl = (self.impl if self.impl == "xla"
                else (_FFN_IMPL_OVERRIDE or self.impl))
        use_pallas = self.n_groups > 1 and (
            impl in ("pallas", "interpret") or
            (impl == "auto" and jax.default_backend() == "tpu"))
        if use_pallas:
            from vmg_tpu.ops.group_conv import fused_group_ffn
            k1, b1 = _GroupedConvParams(hidden, self.n_groups,
                                        name="fc1")(C)
            w2, b2 = _DenseParams(self.dim, name="fc2")(hidden)
            y = fused_group_ffn(y, k1, b1, w2, b2, groups=self.n_groups,
                                act=_gelu_flavor(),
                                interpret=impl == "interpret")
            return y.reshape(B, T, H, W, self.dim)
        if self.n_groups > 1:
            y = GroupedConv3x3(hidden, self.n_groups, act="gelu",
                               name="fc1")(y)
        else:
            y = nn.Conv(hidden, (3, 3), padding=1,
                        kernel_init=torch_conv_kernel_init(), name="fc1")(y)
            y = gelu_exact(y)
        y = y.reshape(B, T, H, W, hidden)
        y = nn.Dense(self.dim, kernel_init=trunc_normal_init(), name="fc2")(y)
        return y


class MlpGEGLU(nn.Module):
    """gelu(fc11) * fc12 -> fc2 (reference Mlp_GEGLU:1103)."""

    dim: int
    hidden: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        hidden = self.hidden or self.dim
        a = nn.Dense(hidden, kernel_init=trunc_normal_init(), name="fc11")(x)
        b = nn.Dense(hidden, kernel_init=trunc_normal_init(), name="fc12")(x)
        y = gelu_exact(a) * b
        return nn.Dense(self.dim, kernel_init=trunc_normal_init(), name="fc2")(y)


class MlpIr(nn.Module):
    """linear expand -> +gelu(dwconv) residual -> project (Mlp_ir:282).

    Reference quirk: through the TAB dispatch (function.py:1204) Mlp_ir is
    a latent crash as shipped — fc1 is built from the un-defaulted
    ``hidden_features`` argument (function.py:289) instead of the computed
    width.  This implements the intended semantics (hidden = dim * exp_r);
    module-golden vs the reference with the width passed explicitly."""

    dim: int
    exp_r: float = 4.0

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        hidden = int(self.dim * self.exp_r)
        y = nn.Dense(hidden, kernel_init=trunc_normal_init(), name="fc1")(x)
        y = gelu_exact(y)
        z = y.reshape(B * T, H, W, hidden)
        z = z + gelu_exact(
            nn.Conv(hidden, (3, 3), padding=1, feature_group_count=hidden, kernel_init=torch_conv_kernel_init(), name="fc2")(z)
        )
        y = z.reshape(B, T, H, W, hidden)
        return nn.Dense(self.dim, kernel_init=trunc_normal_init(), name="fc3")(y)


class MlpIrMulti(nn.Module):
    """Multi-kernel depthwise IR-FFN (reference Mlp_ir_multi:318).

    Reference quirk: a stray second ``forward`` (a copy-pasted trajectory
    recurrence, function.py:373-388) shadows the real one, so the shipped
    module crashes when called as an FFN.  This implements the shadowed
    (intended) forward; module-golden vs the reference's own submodules
    composed per that source (tests/test_ffn_zoo_golden.py)."""

    dim: int
    exp_r: float = 4.0
    stage_n: tuple = (1, 3, 5, 7)

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        hidden = int(self.dim * self.exp_r)
        n = len(self.stage_n)
        cg = hidden // n
        y = nn.Dense(hidden, kernel_init=trunc_normal_init(), name="fc1")(x)
        y = gelu_exact(y)
        z = y.reshape(B * T, H, W, hidden)
        parts = []
        for i, k in enumerate(self.stage_n):
            seg = z[..., i * cg : (i + 1) * cg]
            parts.append(
                nn.Conv(cg, (k, k), padding=k // 2, feature_group_count=cg, kernel_init=torch_conv_kernel_init(), name=f"fc2_multi{i}")(seg)
            )
        z = jnp.concatenate(parts, axis=-1)
        z = z + gelu_exact(z)
        y = z.reshape(B, T, H, W, hidden)
        return nn.Dense(self.dim, kernel_init=trunc_normal_init(), name="fc3")(y)


class PatchShift2D(nn.Module):
    """9-way channel-chunk spatial shift (reference PatchShift2D:197)."""

    inv: bool = False

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        n = 9
        Cp = -(-C // n) * n
        x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (0, Cp - C)))
        chunks = jnp.split(x, n, axis=-1)
        mult = -1 if self.inv else 1
        shift_tab = [(1, 1), (1, 0), (1, -1), (0, 1), (0, 0), (0, -1), (-1, 1), (-1, 0), (-1, -1)]
        shifted = [
            jnp.roll(c, (mult * sh, mult * sw), axis=(-3, -2))
            for c, (sh, sw) in zip(chunks, shift_tab)
        ]
        out = jnp.concatenate(shifted, axis=-1)
        return out[:, :, 1 : H + 1, 1 : W + 1, :C]


class MlpCnnShift(nn.Module):
    """Shift-FFN with 2-branch softmax reweight (reference Mlp_cnn_shift:239)."""

    dim: int
    exp_r: float = 2.0

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        hidden = int(self.dim * self.exp_r)
        y = nn.Dense(hidden, kernel_init=trunc_normal_init(), name="fc")(x)
        y = gelu_exact(y)
        h = PatchShift2D(inv=True, name="shift_inv")(
            gelu_exact(nn.Dense(self.dim, kernel_init=trunc_normal_init(), name="fc1")(
                PatchShift2D(name="shift")(y)))
        )
        w = gelu_exact(nn.Dense(self.dim, kernel_init=trunc_normal_init(), name="fc2")(y))
        a = (h + w).mean(axis=(1, 2, 3))  # (B, C)
        a = Mlp(self.dim, self.dim // 4, self.dim * 2, name="reweight")(a)
        a = a.reshape(B, C, 2).transpose(2, 0, 1)
        a = jax.nn.softmax(a, axis=0)[..., None, None, None, :].reshape(2, B, 1, 1, 1, C)
        y = h * a[0] + w * a[1]
        return nn.Dense(self.dim, kernel_init=trunc_normal_init(), name="proj")(y)


def make_ffn(ffn_type: str, dim: int, mlp_ratio: float, n_groups: int, name: str,
             impl: str = "auto"):
    if ffn_type == "vanilla":
        return Mlp(dim, int(dim * mlp_ratio), name=name)
    if ffn_type == "ffn_cnn":
        return MlpCnn(dim, exp_r=mlp_ratio, n_groups=n_groups, impl=impl,
                      name=name)
    if ffn_type == "ffn_cnn_shift":
        return MlpCnnShift(dim, exp_r=mlp_ratio, name=name)
    if ffn_type == "irffn_single":
        return MlpIr(dim, exp_r=mlp_ratio, name=name)
    if ffn_type == "irffn_multi":
        return MlpIrMulti(dim, exp_r=mlp_ratio, name=name)
    raise ValueError(f"unknown ffn_type {ffn_type!r}")


# ---------------------------------------------------------------------------
# channel attention (RCAB, reference function.py:542-583)
# ---------------------------------------------------------------------------


class CALayer(nn.Module):
    channel: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x, mean=None):  # (N, H, W, C)
        """``mean``: precomputed (N, 1, 1, C) global pool (the fused RCAB
        kernel emits it as f32 partial sums); defaults to pooling x."""
        y = x.mean(axis=(1, 2), keepdims=True) if mean is None else mean
        y = nn.Conv(self.channel // self.reduction, (1, 1), kernel_init=torch_conv_kernel_init(), name="conv_du0")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(self.channel, (1, 1), kernel_init=torch_conv_kernel_init(), name="conv_du1")(y)
        y = jax.nn.sigmoid(y)
        return x * y


class _Conv3x3Params(nn.Module):
    """Param-only twin of nn.Conv(3x3, torch_conv_kernel_init()) so fused
    kernels can take over the compute on an identical checkpoint tree."""

    features: int

    @nn.compact
    def __call__(self, cin: int):
        kernel = self.param("kernel", torch_conv_kernel_init(),
                            (3, 3, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class RCAB(nn.Module):
    """conv-ReLU-conv + SE, residual (reference RCAB:561, reduction=8).

    ``impl``: 'xla' (module convs; training/CPU default) | 'auto'/'pallas'
    (serving: both 3x3 convs + the SE pooling sums in ONE fused Pallas
    pass, ops/conv_chain -- the round-4 trace had these convs riding XLA
    transposed layouts between two Pallas calls at ~2x roofline) |
    'interpret'.  Kernel path requires C <= 128; no VJP (serving only).
    """

    n_feat: int
    reduction: int = 8
    impl: str = "xla"

    @nn.compact
    def __call__(self, x):  # (B, T, H, W, C)
        B, T, H, W, C = x.shape
        y = x.reshape(B * T, H, W, C)
        use_pallas = self.n_feat <= 128 and (
            self.impl in ("pallas", "interpret")
            or (self.impl == "auto" and jax.default_backend() == "tpu"))
        if use_pallas:
            from vmg_tpu.ops.conv_chain import fused_conv_chain
            k1, b1 = _Conv3x3Params(self.n_feat, name="body0")(C)
            k2, b2 = _Conv3x3Params(self.n_feat, name="body1")(C)
            res, psum = fused_conv_chain(
                y, k1, b1, k2, b2, emit_psum=True,
                interpret=self.impl == "interpret")
            mean = (psum / float(H * W)).astype(y.dtype).reshape(
                B * T, 1, 1, C)
            res = CALayer(self.n_feat, self.reduction, name="ca")(
                res, mean=mean)
            return (y + res).reshape(B, T, H, W, C)
        res = nn.Conv(self.n_feat, (3, 3), padding=1, kernel_init=torch_conv_kernel_init(), name="body0")(y)
        res = jax.nn.relu(res)
        res = nn.Conv(self.n_feat, (3, 3), padding=1, kernel_init=torch_conv_kernel_init(), name="body1")(res)
        res = CALayer(self.n_feat, self.reduction, name="ca")(res)
        y = y + res
        return y.reshape(B, T, H, W, C)


# ---------------------------------------------------------------------------
# MBConv spatial mixer (reference models/CNNs.py:136-201)
# ---------------------------------------------------------------------------


class InvertedResidual(nn.Module):
    dim: int
    expansion: int = 4

    @nn.compact
    def __call__(self, x):  # (B, T, H, W, C)
        B, T, H, W, C = x.shape
        mid = int(self.dim * self.expansion)
        y = x.reshape(B * T, H, W, C)
        y = jax.nn.relu6(nn.Conv(mid, (1, 1), kernel_init=torch_conv_kernel_init(), name="pw")(y))
        y = jax.nn.relu6(
            nn.Conv(mid, (3, 3), padding=1, feature_group_count=mid, kernel_init=torch_conv_kernel_init(), name="dw")(y)
        )
        y = nn.Conv(self.dim, (1, 1), kernel_init=torch_conv_kernel_init(), name="pw_linear")(y)
        return x + y.reshape(B, T, H, W, C)


class MultiMBConv(nn.Module):
    dim: int
    num_blocks: int = 10
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_blocks):
            x = InvertedResidual(self.dim, self.expansion, name=f"block{i}")(x)
        return x


# ---------------------------------------------------------------------------
# MorphFC axis mixers
# ---------------------------------------------------------------------------


def _morph_mix_h(x, fc_apply, chunk_h, Ch):
    """Height-axis morph mixing: tokens are channel chunks, features are
    (position-in-chunk x channel-segment)."""
    B, T, H, W, C = x.shape
    S = Ch // chunk_h
    Hp = -(-H // chunk_h) * chunk_h
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, Hp - H), (0, 0), (0, Ch - C)))
    G = Hp // chunk_h
    y = xp.reshape(B, T, G, chunk_h, W, chunk_h, S)  # (.., g, pos, W, q, S)
    y = y.transpose(0, 1, 2, 4, 5, 3, 6)  # (.., g, W, q, pos, S)
    y = y.reshape(B, T, G, W, chunk_h, chunk_h * S)
    y = fc_apply(y)
    y = y.reshape(B, T, G, W, chunk_h, chunk_h, S)
    y = y.transpose(0, 1, 2, 5, 3, 4, 6)  # (.., g, pos, W, q, S)
    y = y.reshape(B, T, Hp, W, Ch)
    return y[:, :, :H, :, :C]


def _morph_mix_w(x, fc_apply, chunk_w, Cw):
    B, T, H, W, C = x.shape
    S = Cw // chunk_w
    Wp = -(-W // chunk_w) * chunk_w
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, Wp - W), (0, Cw - C)))
    G = Wp // chunk_w
    y = xp.reshape(B, T, H, G, chunk_w, chunk_w, S)  # (.., H, g, pos, q, S)
    y = y.transpose(0, 1, 2, 3, 5, 4, 6)  # (.., H, g, q, pos, S)
    y = y.reshape(B, T, H, G, chunk_w, chunk_w * S)
    y = fc_apply(y)
    y = y.reshape(B, T, H, G, chunk_w, chunk_w, S)
    y = y.transpose(0, 1, 2, 3, 5, 4, 6)
    y = y.reshape(B, T, H, Wp, Cw)
    return y[:, :, :, :W, :C]


class _DecayedAxisFC(nn.Module):
    """Dense layer whose kernel is scaled elementwise by the retention-decay
    matrix at use time, with optional ReLU (reference function.py:623-644,
    766-783 -- functionalized)."""

    features: int
    chunk: int
    use_bias: bool = True
    non_linear: bool = True
    decay: bool = True

    @nn.compact
    def __call__(self, x):
        # the reference re-inits every nn.Linear with trunc_normal(0.02) and
        # zero bias via VMG._init_weights (models/vmg.py:415-424)
        kernel = self.param(
            "kernel", trunc_normal_init(), (self.features, self.features)
        )
        if self.decay:
            gamma = morphfc_decay_matrix(self.chunk, self.features // self.chunk)
            kernel = kernel * gamma.astype(kernel.dtype)
        y = x @ kernel
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        if self.non_linear:
            y = jax.nn.relu(y)
        return y


class _FusedDecayedAxisFC(nn.Module):
    """Transpose-free morph-axis FC.

    The straightforward formulation of the morph mix (``_morph_mix_w``)
    relayouts ``(..., g, pos, q, S) -> (..., g, q, pos, S)`` before a small
    (Cw x Cw) matmul; on TPU that relayout is a bf16 sublane transpose with a
    14-element inner run, profiled at 34 GB/s and 15.5% of total serving
    time (NOTES_ROUND3 xplane split).  This module instead folds the layout
    permutation into the kernel: tokens stay in their NATIVE flattened
    ``(pos, q, S)`` order and multiply one block-diagonal matrix

        bigK[(p,q,s), (P,q',Z)] = K[(p,s), (P,Z)] * delta(q, q')

    of shape ``(chunk*Cw, chunk*Cw)`` -- a single large MXU matmul with
    ``chunk``x the FLOPs (zeros in 7/8 of the blocks) but zero copies.  At
    stage-0 shapes the extra FLOPs cost ~1 ms where the transposes cost ~8;
    numerics are identical up to fp32 summation order (the extra terms are
    exact zeros).  Parameter names/shapes match ``_DecayedAxisFC``.
    """

    features: int
    chunk: int
    use_bias: bool = True
    non_linear: bool = True
    decay: bool = True

    @nn.compact
    def __call__(self, tokens):
        """tokens: (..., chunk*features) flattened (pos, q, S) -> same shape
        flattened (pos', q, S')."""
        f, ch = self.features, self.chunk
        S = f // ch
        kernel = self.param("kernel", trunc_normal_init(), (f, f))
        if self.decay:
            gamma = morphfc_decay_matrix(ch, S)
            kernel = kernel * gamma.astype(kernel.dtype)
        k4 = kernel.reshape(ch, S, ch, S)  # (p, s, P, Z)
        eye = jnp.eye(ch, dtype=kernel.dtype)
        big = jnp.einsum("psPZ,qr->pqsPrZ", k4, eye).reshape(ch * f, ch * f)
        y = jax.lax.dot_general(
            tokens, big, (((tokens.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(tokens.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (f,))
            # output features are flattened (P, q, Z); bias indexes (P, Z)
            bias_b = jnp.broadcast_to(
                bias.reshape(ch, 1, S), (ch, ch, S)
            ).reshape(ch * f)
            y = y + bias_b
        if self.non_linear:
            y = jax.nn.relu(y)
        return y


class _AxisFCParams(nn.Module):
    """Param-only twin of _DecayedAxisFC (same path/names/shapes/inits),
    so the fused MorphFC kernels can take over the compute without
    changing the checkpoint tree."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", trunc_normal_init(),
                            (self.features, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        return kernel, bias


def _morph_mix_w_fused(x, fc_apply, chunk_w, Cw):
    """W-axis morph mixing with tokens left in native (pos, q, S) order --
    pure reshapes around one block-diagonal matmul (see _FusedDecayedAxisFC)."""
    B, T, H, W, C = x.shape
    Wp = -(-W // chunk_w) * chunk_w
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, Wp - W), (0, Cw - C)))
    G = Wp // chunk_w
    y = xp.reshape(B, T, H, G, chunk_w * Cw)  # trailing = (pos, q, S)
    y = fc_apply(y)
    y = y.reshape(B, T, H, Wp, Cw)
    return y[:, :, :, :W, :C]


def _morph_mix_h_fused(x, fc_apply, chunk_h, Ch):
    """H-axis morph mixing via one coarse-grained H<->W transpose (C-major
    inner runs, near-memcpy on TPU) around the fused W-axis form."""
    xt = x.swapaxes(2, 3)
    yt = _morph_mix_w_fused(xt, fc_apply, chunk_h, Ch)
    return yt.swapaxes(2, 3)


class MorphFCDecay(nn.Module):
    """Enhanced_MorphFCs_decay (reference function.py:596-805).

    Three branches (H-axis FC, W-axis FC, channel mixer) with retention
    decay on the axis FCs, per-branch 1/C scaling (or RMSNorm), squeeze-mean
    softmax reweighting, projection, and a symmetric-activation gate.
    """

    dim: int
    chunk_h: int = 8
    chunk_w: int = 8
    qkv_bias: bool = True
    non_linear: bool = True
    gating: bool = True
    symm: bool = True
    symm_act: str = "tanh"
    relu_scale: bool = True
    relu_scale_norm: bool = False
    channel_mixer: str = "vanilla"
    decay: bool = True
    # fold the (pos, q) relayout into a block-diagonal kernel (one MXU
    # matmul, no sublane transposes); falls back to the reshape/transpose
    # form under relu_scale_norm, whose RMSNorm needs the (q)-token layout
    fused: bool = True
    # fused Pallas kernels (ops/morphfc_fused): both axis branches + the
    # reweight partial sums in one pass over x, and weighted-sum + proj +
    # gate in a second -- no HBM transposes, no re-read reductions.
    # 'auto' = kernels on TPU when the shape qualifies; serving-only
    # (TAB constructs the mixer with impl='xla' when training).
    impl: str = "auto"

    def _pallas_mode(self, x, impl: str):
        """None (XLA module path) | 'full' (axes+combine kernels) |
        'hybrid' (XLA axis branches + reduce/combine kernels -- for wide
        stages where the axes kernel's weight form does not fit VMEM or
        the chunk does not divide C)."""
        B, T, H, W, C = x.shape
        if not (impl in ("pallas", "interpret")
                or (impl == "auto" and jax.default_backend() == "tpu")):
            return None
        if impl != "interpret" and x.dtype != jnp.bfloat16:
            # f32 doubles the VMEM working set; XLA path.  An explicit
            # 'pallas' request falling through here would silently
            # measure the wrong path -- say so (ADVICE r4).
            if impl == "pallas":
                import warnings
                warnings.warn(
                    f"MorphFCDecay impl='pallas' requested but input dtype "
                    f"is {x.dtype}; falling back to the XLA module path "
                    f"(kernels are bf16-only)", stacklevel=3)
            return None
        if not (self.gating and self.symm and self.relu_scale
                and not self.relu_scale_norm
                and self.symm_act in ("tanh", "sigmoid", "relu")):
            return None
        if (C % self.chunk_h == 0 and C % self.chunk_w == 0
                and W % self.chunk_w == 0
                and self.chunk_h * C <= 1024 and self.chunk_w * C <= 1024):
            return "full"
        return "hybrid"

    def _pallas_ok(self, x, impl: str) -> bool:
        return self._pallas_mode(x, impl) is not None

    def _pallas_forward(self, x, residual, res_scale, interpret: bool):
        """Kernel-fused forward (same params, same math; see
        ops/morphfc_fused for the design and numerics notes)."""
        from vmg_tpu.ops.morphfc_fused import fused_morphfc_axes
        B, T, H, W, C = x.shape
        N = B * T
        xf = x.reshape(N, H, W, C)

        kh_raw, bh_raw = _AxisFCParams(C, self.qkv_bias, name="mlp_h")()
        kw_raw, bw_raw = _AxisFCParams(C, self.qkv_bias, name="mlp_w")()

        if self.channel_mixer == "rcab":
            # The fused RCAB conv-chain kernel (ops/conv_chain) was
            # MEASURED SLOWER here -- 6.73 vs 4.10 ms standalone
            # (marginal), 16.06 -> 15.62 f/s on the full bench: XLA's
            # dense 112-lane convs already run near the MXU ceiling
            # (~122 TF/s isolated-dot bound), so the kernel's copy/mask
            # overhead has nothing to win back (docs/PERF.md round 5).
            # VMG_RCAB_KERNEL=1 re-enables for A/B.
            import os
            rcab_impl = ("interpret" if interpret else
                         ("auto" if os.environ.get("VMG_RCAB_KERNEL",
                                                   "0") == "1"
                          else "xla"))
            c = RCAB(self.dim, impl=rcab_impl, name="mlp_c")(x)
        else:
            c = nn.Dense(self.dim, use_bias=self.qkv_bias,
                         kernel_init=trunc_normal_init(), name="mlp_c")(x)
            if self.non_linear:
                c = jax.nn.relu(c)
        c = (c / C).reshape(N, H, W, C)  # relu_scale (guaranteed by gate)

        h, w, psum = fused_morphfc_axes(
            xf, c, kh_raw, bh_raw, kw_raw, bw_raw, chunk_h=self.chunk_h,
            chunk_w=self.chunk_w, decay=self.decay,
            non_linear=self.non_linear, interpret=interpret)
        return self._combine_tail(xf, h, w, c, psum, x.shape,
                                  residual, res_scale, interpret)

    def _combine_tail(self, xf, hf, wf, cf, psum, shape5, residual,
                      res_scale, interpret):
        """Shared kernel tail: squeeze-mean softmax reweight (fp32 sums
        already reduced to psum (N, C)) + fused combine/proj/gate
        (+ the TAB residual trunk when the caller folds it in)."""
        from vmg_tpu.ops.morphfc_fused import fused_morphfc_combine
        B, T, H, W, C = shape5
        N = B * T
        a = psum.reshape(B, T, C).sum(axis=1) / float(T * H * W)
        a = Mlp(self.dim, self.dim // 4, self.dim * 3, name="reweight")(
            a.astype(xf.dtype))
        a = a.reshape(B, C, 3).transpose(2, 0, 1).astype(jnp.float32)
        a = jax.nn.softmax(a, axis=0).astype(xf.dtype)  # (3, B, C)
        a_n = jnp.broadcast_to(
            a.transpose(1, 0, 2)[:, None], (B, T, 3, C)).reshape(N, 3, C)

        pk, pb = _DenseParams(self.dim, name="proj")(C)
        res = (None if residual is None
               else residual.reshape(N, H, W, C))
        y = fused_morphfc_combine(xf, hf, wf, cf, a_n, pk, pb,
                                  act=self.symm_act, residual=res,
                                  res_scale=res_scale, interpret=interpret)
        return y.reshape(B, T, H, W, C)

    @nn.compact
    def __call__(self, x, residual=None, res_scale: float = 1.0):
        """``residual``: optional TAB trunk; when given the output is
        ``residual + res_scale * mixed`` (the caller skips its own
        residual add), letting the kernel paths fold the block residual
        into their final store instead of a separate full pass."""
        B, T, H, W, C = x.shape
        Ch = -(-C // self.chunk_h) * self.chunk_h
        Cw = -(-C // self.chunk_w) * self.chunk_w

        # The global override is a serving/profiling knob; an explicit
        # per-module 'xla' pin (TAB sets it when training -- the kernels
        # have no VJP) always wins, so set_morph_impl('pallas') cannot
        # push a training trace onto a kernel with no backward.
        impl = (self.impl if self.impl == "xla"
                else (_MORPH_IMPL_OVERRIDE or self.impl))
        mode = self._pallas_mode(x, impl)
        if mode == "full":
            return self._pallas_forward(x, residual, res_scale,
                                        interpret=impl == "interpret")

        x_short = x
        fused = self.fused and not self.relu_scale_norm
        fc_cls = _FusedDecayedAxisFC if fused else _DecayedAxisFC

        fc_h = fc_cls(
            Ch, self.chunk_h, self.qkv_bias, self.non_linear, self.decay, name="mlp_h"
        )
        fc_w = fc_cls(
            Cw, self.chunk_w, self.qkv_bias, self.non_linear, self.decay, name="mlp_w"
        )

        if self.relu_scale_norm:
            scale_h = RMSNorm(Ch, name="scale_h")
            scale_w = RMSNorm(Cw, name="scale_w")
            scale_c = RMSNorm(C, name="scale_c")
        elif self.relu_scale:
            scale_h = lambda v: v / Ch
            scale_w = lambda v: v / Cw
            scale_c = lambda v: v / C
        else:
            scale_h = scale_w = scale_c = lambda v: v

        if fused:
            h = _morph_mix_h_fused(x, lambda v: scale_h(fc_h(v)),
                                   self.chunk_h, Ch)
            w = _morph_mix_w_fused(x, lambda v: scale_w(fc_w(v)),
                                   self.chunk_w, Cw)
        else:
            h = _morph_mix_h(x, lambda v: scale_h(fc_h(v)), self.chunk_h, Ch)
            w = _morph_mix_w(x, lambda v: scale_w(fc_w(v)), self.chunk_w, Cw)

        if self.channel_mixer == "rcab":
            c = RCAB(self.dim, name="mlp_c")(x)
        else:
            c = nn.Dense(
                self.dim, use_bias=self.qkv_bias,
                kernel_init=trunc_normal_init(), name="mlp_c",
            )(x)
            if self.non_linear:
                c = jax.nn.relu(c)
        c = scale_c(c)

        if mode == "hybrid":
            # wide stages (chunk*C past the axes kernel's lane budget or
            # chunk not dividing C): XLA computes the branches, but the
            # reweight mean and the weighted-sum/proj/gate tail still run
            # as single-pass kernels instead of XLA's re-read fusions
            from vmg_tpu.ops.morphfc_fused import fused_morphfc_reduce
            N = B * T
            xf = x_short.reshape(N, H, W, C)
            hf = h.reshape(N, H, W, C)
            wf = w.reshape(N, H, W, C)
            cf = c.reshape(N, H, W, C)
            psum = fused_morphfc_reduce(hf, wf, cf,
                                        interpret=impl == "interpret")
            return self._combine_tail(xf, hf, wf, cf, psum, x.shape,
                                      residual, res_scale,
                                      impl == "interpret")

        # squeeze-mean + branch softmax in fp32 (bf16 means over T*H*W drift)
        a = (h + w + c).astype(jnp.float32).mean(axis=(1, 2, 3))  # (B, C)
        a = Mlp(self.dim, self.dim // 4, self.dim * 3, name="reweight")(
            a.astype(h.dtype)
        )
        a = a.reshape(B, C, 3).transpose(2, 0, 1).astype(jnp.float32)
        a = jax.nn.softmax(a, axis=0).reshape(3, B, 1, 1, 1, C).astype(h.dtype)
        y = h * a[0] + w * a[1] + c * a[2]
        y = nn.Dense(self.dim, kernel_init=trunc_normal_init(), name="proj")(y)

        if self.gating:
            if self.symm:
                gate = _SYMM_ACTS[self.symm_act](y)
                y = (x_short + y) * gate
            else:
                gate = jax.nn.silu(nn.Dense(self.dim, name="gating_fc")(x_short))
                y = gate * gelu_exact(y)
        if residual is not None:
            y = residual + res_scale * y
        return y


class MorphFC(nn.Module):
    """Enhanced_MorphFCs without decay/gating (reference function.py:494)."""

    dim: int
    chunk_h: int = 8
    chunk_w: int = 8
    qkv_bias: bool = True
    fused: bool = True

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        Ch = -(-C // self.chunk_h) * self.chunk_h
        Cw = -(-C // self.chunk_w) * self.chunk_w

        if self.fused:
            fc_h = _FusedDecayedAxisFC(Ch, self.chunk_h, self.qkv_bias,
                                       non_linear=False, decay=False,
                                       name="mlp_h")
            fc_w = _FusedDecayedAxisFC(Cw, self.chunk_w, self.qkv_bias,
                                       non_linear=False, decay=False,
                                       name="mlp_w")
            h = _morph_mix_h_fused(x, fc_h, self.chunk_h, Ch)
            w = _morph_mix_w_fused(x, fc_w, self.chunk_w, Cw)
        else:
            def mk_fc(feat, name):
                return nn.Dense(
                    feat, use_bias=self.qkv_bias,
                    kernel_init=trunc_normal_init(), name=name,
                )

            h = _morph_mix_h(x, mk_fc(Ch, "mlp_h"), self.chunk_h, Ch)
            w = _morph_mix_w(x, mk_fc(Cw, "mlp_w"), self.chunk_w, Cw)
        c = nn.Dense(self.dim, use_bias=self.qkv_bias,
                     kernel_init=trunc_normal_init(), name="mlp_c")(x)
        a = (h + w + c).astype(jnp.float32).mean(axis=(1, 2, 3))
        a = Mlp(self.dim, self.dim // 4, self.dim * 3, name="reweight")(
            a.astype(h.dtype)
        )
        a = a.reshape(B, C, 3).transpose(2, 0, 1).astype(jnp.float32)
        a = jax.nn.softmax(a, axis=0).reshape(3, B, 1, 1, 1, C).astype(h.dtype)
        y = h * a[0] + w * a[1] + c * a[2]
        return nn.Dense(self.dim, kernel_init=trunc_normal_init(), name="proj")(y)


# ---------------------------------------------------------------------------
# TAB: the token-mixing block (reference function.py:1139-1217)
# ---------------------------------------------------------------------------


class TAB(nn.Module):
    dim: int
    chunk_h: int = 8
    chunk_w: int = 8
    mlp_ratio: float = 2.0
    n_groups: int = 1
    qkv_bias: bool = True
    drop_path: float = 0.0
    if_decay: bool = True
    non_linear: bool = True
    gating: bool = True
    symm: bool = True
    symm_act: str = "tanh"
    relu_scale: bool = True
    relu_scale_norm: bool = False
    ffn_type: str = "ffn_cnn"
    mixer_type: str = "mlps"
    mixer_n: Optional[int] = None
    mixer_scaling: float = 1.0
    channel_mixer: str = "vanilla"
    morph_fused: bool = True  # axis-FC form (see MorphFCDecay.fused)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.mixer_type == "mlps":
            if self.if_decay:
                # training pins the XLA module path (the fused kernels
                # have no VJP; serving is where their fusion wins)
                mixer = MorphFCDecay(
                    self.dim, self.chunk_h, self.chunk_w, self.qkv_bias,
                    self.non_linear, self.gating, self.symm, self.symm_act,
                    self.relu_scale, self.relu_scale_norm, self.channel_mixer,
                    fused=self.morph_fused,
                    impl="auto" if deterministic else "xla",
                    name="spatial_mixing",
                )
            else:
                mixer = MorphFC(self.dim, self.chunk_h, self.chunk_w, self.qkv_bias,
                                name="spatial_mixing")
        elif self.mixer_type == "mbconv":
            mixer = MultiMBConv(self.dim, num_blocks=self.mixer_n or 2,
                                name="spatial_mixing")
        else:
            raise ValueError(f"unknown mixer_type {self.mixer_type!r}")

        dp = DropPath(self.drop_path, name="drop_path")
        xn = TorchLayerNorm(self.dim, name="norm2")(x)
        if deterministic and isinstance(mixer, MorphFCDecay):
            # fold the block residual into the mixer (its kernel paths
            # apply it in their final store; DropPath is identity here)
            x = mixer(xn, residual=x, res_scale=self.mixer_scaling)
        else:
            x = x + dp(mixer(xn), deterministic) * self.mixer_scaling
        # deterministic == eval/serving.  Training pins the XLA module
        # path: the fused kernel's backward (vjp of the per-group-matmul
        # XLA formulation) measured 4.5x slower per train step than XLA's
        # conv transpose kernels at 64x64 crop shapes (NOTES_ROUND4), while
        # the serving forward is where the kernel wins.
        ffn = make_ffn(self.ffn_type, self.dim, self.mlp_ratio, self.n_groups,
                       name="channel_mixing",
                       impl="auto" if deterministic else "xla")
        y = ffn(TorchLayerNorm(self.dim, name="norm3")(x))
        x = x + dp(y, deterministic) * self.mixer_scaling
        return x
