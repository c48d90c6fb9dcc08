"""Dependency stubs that let the *reference* model (at /root/reference)
import on torch-CPU for golden-parity testing.

The reference needs timm / mmcv / mmedit / torchvision / thop, none of
which are installed here.  Only tiny glue is required: an init helper, a
conv+act container with a ``.conv`` child (so state_dict names match), a
no-op checkpoint loader, and an eval-mode DropPath.  Nothing here is used
by the vmg_tpu framework itself.
"""

from __future__ import annotations

import math
import sys
import types

import torch
import torch.nn as nn


def _trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
    with torch.no_grad():
        tensor.normal_(mean, std)
        tensor.clamp_(mean + a * std, mean + b * std)
    return tensor


def _to_2tuple(x):
    return x if isinstance(x, tuple) else (x, x)


class _DropPath(nn.Module):
    def __init__(self, drop_prob=0.0):
        super().__init__()
        self.drop_prob = drop_prob

    def forward(self, x):
        if self.drop_prob == 0.0 or not self.training:
            return x
        keep = 1 - self.drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = torch.bernoulli(torch.full(shape, keep, device=x.device))
        return x / keep * mask


class _ConvModule(nn.Module):
    """conv (+ optional ReLU), with the child named 'conv' so state_dict
    keys look like mmcv's ConvModule."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, norm_cfg=None, act_cfg=None, **kw):
        super().__init__()
        assert norm_cfg is None, "stub supports norm_cfg=None only"
        self.conv = nn.Conv2d(in_channels, out_channels, kernel_size,
                              stride=stride, padding=padding)
        self.act = nn.ReLU() if (act_cfg or {}).get("type") == "ReLU" else None

    def forward(self, x):
        x = self.conv(x)
        return self.act(x) if self.act is not None else x


def _kaiming_init(module, a=0, mode="fan_in", nonlinearity="leaky_relu",
                  bias=0, distribution="normal"):
    if distribution == "normal":
        nn.init.kaiming_normal_(module.weight, a=a, mode=mode)
    else:
        nn.init.kaiming_uniform_(module.weight, a=a, mode=mode)
    if hasattr(module, "bias") and module.bias is not None:
        nn.init.constant_(module.bias, bias)


def _constant_init(module, val, bias=0):
    nn.init.constant_(module.weight, val)
    if hasattr(module, "bias") and module.bias is not None:
        nn.init.constant_(module.bias, bias)


def install_stubs():
    """Register stub modules in sys.modules (idempotent)."""
    if "timm" in sys.modules and hasattr(sys.modules.get("timm"), "_vmg_stub"):
        return

    timm = types.ModuleType("timm")
    timm._vmg_stub = True
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")
    timm_layers.DropPath = _DropPath
    timm_layers.trunc_normal_ = _trunc_normal_
    timm_layers.to_2tuple = _to_2tuple
    timm.models = timm_models
    timm_models.layers = timm_layers
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = timm_models
    sys.modules["timm.models.layers"] = timm_layers

    mmcv = types.ModuleType("mmcv")
    mmcv_runner = types.ModuleType("mmcv.runner")
    mmcv_runner.load_checkpoint = lambda *a, **k: None
    mmcv_cnn = types.ModuleType("mmcv.cnn")
    mmcv_cnn.ConvModule = _ConvModule
    mmcv_cnn.kaiming_init = _kaiming_init
    mmcv_cnn.constant_init = _constant_init
    mmcv.runner = mmcv_runner
    mmcv.cnn = mmcv_cnn
    sys.modules["mmcv"] = mmcv
    sys.modules["mmcv.runner"] = mmcv_runner
    sys.modules["mmcv.cnn"] = mmcv_cnn

    mmedit = types.ModuleType("mmedit")
    mmedit_utils = types.ModuleType("mmedit.utils")
    import logging

    mmedit_utils.get_root_logger = lambda *a, **k: logging.getLogger("ref")
    mmedit.utils = mmedit_utils
    sys.modules["mmedit"] = mmedit
    sys.modules["mmedit.utils"] = mmedit_utils

    def _deform_conv2d(input, offset, weight, bias=None, stride=(1, 1),
                       padding=(0, 0), dilation=(1, 1), mask=None):
        """torchvision.ops.deform_conv2d semantics in pure torch: offset
        pairs are (dy, dx) per (group, tap); bilinear sampling with zeros
        outside; mask multiplies each tap."""
        import torch.nn.functional as F

        N, Cin, H, W = input.shape
        Cout, _, kh, kw = weight.shape
        K = kh * kw
        G = offset.shape[1] // (2 * K)
        Cg = Cin // G
        sh = stride if isinstance(stride, int) else stride[0]
        ph = padding if isinstance(padding, int) else padding[0]
        dil = dilation if isinstance(dilation, int) else dilation[0]
        assert sh == 1 and dil == 1, "stub supports stride=dilation=1"

        off = offset.view(N, G, K, 2, H, W)
        msk = (mask.view(N, G, K, H, W) if mask is not None
               else torch.ones(N, G, K, H, W, dtype=input.dtype))
        ys = torch.arange(H, dtype=input.dtype).view(1, 1, H, 1)
        xs = torch.arange(W, dtype=input.dtype).view(1, 1, 1, W)
        xg = input.view(N, G, Cg, H, W)

        cols = []
        for ki in range(kh):
            for kj in range(kw):
                k = ki * kw + kj
                py = ys + (ki - ph) + off[:, :, k, 0]
                px = xs + (kj - ph) + off[:, :, k, 1]
                gy = 2.0 * py / max(H - 1, 1) - 1.0
                gx = 2.0 * px / max(W - 1, 1) - 1.0
                grid = torch.stack([gx, gy], dim=-1).view(N * G, H, W, 2)
                v = F.grid_sample(xg.reshape(N * G, Cg, H, W), grid,
                                  mode="bilinear", padding_mode="zeros",
                                  align_corners=True)
                v = v.view(N, G, Cg, H, W) * msk[:, :, k : k + 1]
                cols.append(v.reshape(N, Cin, H, W))
        col = torch.stack(cols, dim=2)  # (N, Cin, K, H, W)
        out = torch.einsum("nckhw,ock->nohw",
                           col, weight.view(Cout, Cin, K))
        if bias is not None:
            out = out + bias.view(1, -1, 1, 1)
        return out

    tv = types.ModuleType("torchvision")
    tv_ops = types.ModuleType("torchvision.ops")
    tv_ops.deform_conv2d = _deform_conv2d
    tv_ops_dc = types.ModuleType("torchvision.ops.deform_conv")
    tv_ops_dc.deform_conv2d = _deform_conv2d
    tv.ops = tv_ops
    tv_ops.deform_conv = tv_ops_dc
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = tv_ops
    sys.modules["torchvision.ops.deform_conv"] = tv_ops_dc

    thop = types.ModuleType("thop")
    thop.profile = lambda *a, **k: (0, 0)
    sys.modules["thop"] = thop

    fvcore = types.ModuleType("fvcore")
    fvcore_nn = types.ModuleType("fvcore.nn")
    fvcore_nn.FlopCountAnalysis = lambda *a, **k: None
    fvcore_nn.parameter_count_table = lambda *a, **k: ""
    fvcore.nn = fvcore_nn
    sys.modules["fvcore"] = fvcore
    sys.modules["fvcore.nn"] = fvcore_nn

    import numpy as _np

    def _psnr(a, b, data_range=None):
        a = _np.asarray(a, _np.float64)
        b = _np.asarray(b, _np.float64)
        dr = data_range if data_range is not None else 1.0
        err = _np.mean((a - b) ** 2)
        if err == 0:
            return float("inf")
        import math
        return 10 * math.log10(dr ** 2 / err)

    skimage = types.ModuleType("skimage")
    skimage_metrics = types.ModuleType("skimage.metrics")
    skimage_metrics.peak_signal_noise_ratio = _psnr
    skimage_color = types.ModuleType("skimage.color")
    skimage.metrics = skimage_metrics
    skimage.color = skimage_color
    sys.modules["skimage"] = skimage
    sys.modules["skimage.metrics"] = skimage_metrics
    sys.modules["skimage.color"] = skimage_color


def import_reference_models():
    """Import the reference 'models' package from /root/reference."""
    install_stubs()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import models.vmg as ref_vmg  # noqa

    return ref_vmg


class _ConvModuleFull(nn.Module):
    """mmcv ConvModule stub with BN/IN norm, act zoo, Deconv, order, and
    padding_mode -- enough for the mmedit common/components modules."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, bias="auto", conv_cfg=None,
                 norm_cfg=None, act_cfg=dict(type="ReLU"),
                 padding_mode="zeros", order=("conv", "norm", "act"), **kw):
        super().__init__()
        self.order = tuple(order)
        self.with_norm = norm_cfg is not None
        self.with_activation = act_cfg is not None
        if bias == "auto":
            bias = not self.with_norm
        conv_type = (conv_cfg or {}).get("type", "Conv2d")
        if conv_type == "Deconv":
            self.conv = nn.ConvTranspose2d(in_channels, out_channels,
                                           kernel_size, stride=stride,
                                           padding=padding, bias=bias)
        else:
            self.conv = nn.Conv2d(in_channels, out_channels, kernel_size,
                                  stride=stride, padding=padding,
                                  dilation=dilation, groups=groups, bias=bias,
                                  padding_mode=padding_mode)
        if self.with_norm:
            kind = norm_cfg["type"]
            if kind == "BN":
                self.bn = nn.BatchNorm2d(out_channels)
            elif kind == "IN":
                self.bn = nn.InstanceNorm2d(out_channels)
            else:
                raise NotImplementedError(kind)
        if self.with_activation:
            self.activate = _build_activation_layer(act_cfg)

    @property
    def norm(self):
        return self.bn

    def forward(self, x, activate=True, norm=True):
        for layer in self.order:
            if layer == "conv":
                x = self.conv(x)
            elif layer == "norm" and norm and self.with_norm:
                x = self.bn(x)
            elif layer == "act" and activate and self.with_activation:
                x = self.activate(x)
        return x


def _build_activation_layer(cfg):
    cfg = dict(cfg)
    kind = cfg.pop("type")
    cfg.pop("inplace", None)
    table = {
        "ReLU": nn.ReLU,
        "LeakyReLU": lambda negative_slope=0.01: nn.LeakyReLU(negative_slope),
        "ELU": nn.ELU,
        "Sigmoid": nn.Sigmoid,
        "Tanh": nn.Tanh,
    }
    return table[kind](**cfg)


class _Registry:
    def register_module(self, *a, **k):
        def deco(cls):
            return cls
        return deco


def _xavier_init(module, gain=1, bias=0, distribution="normal"):
    if distribution == "uniform":
        nn.init.xavier_uniform_(module.weight, gain=gain)
    else:
        nn.init.xavier_normal_(module.weight, gain=gain)
    if hasattr(module, "bias") and module.bias is not None:
        nn.init.constant_(module.bias, bias)


def import_reference_common():
    """Import /root/reference/mmedit/models/common as a standalone package
    (the stubbed top-level 'mmedit' module is not a package), upgrading the
    mmcv.cnn stub with what these files need."""
    install_stubs()
    import numpy as _np
    if not hasattr(_np, "asscalar"):  # removed in numpy >= 1.23
        _np.asscalar = lambda a: a.item()
    mmcv_cnn = sys.modules["mmcv.cnn"]
    mmcv_cnn.ConvModule = _ConvModuleFull
    mmcv_cnn.CONV_LAYERS = _Registry()
    mmcv_cnn.build_activation_layer = _build_activation_layer
    mmcv_cnn.xavier_init = _xavier_init

    def _normal_init(module, mean=0, std=1, bias=0):
        nn.init.normal_(module.weight, mean, std)
        if hasattr(module, "bias") and module.bias is not None:
            nn.init.constant_(module.bias, bias)

    mmcv_cnn.normal_init = _normal_init
    mmcv_cnn.build_norm_layer = lambda cfg, num: (
        "bn", nn.BatchNorm2d(num) if cfg["type"] == "BN"
        else nn.InstanceNorm2d(num))
    mmcv_cnn.build_conv_layer = lambda cfg, *a, **k: nn.Conv2d(*a, **k)

    mmcv = sys.modules["mmcv"]
    mmcv_utils = types.ModuleType("mmcv.utils")
    mmcv_pw = types.ModuleType("mmcv.utils.parrots_wrapper")
    mmcv_pw._BatchNorm = nn.modules.batchnorm._BatchNorm
    mmcv_pw._InstanceNorm = nn.modules.instancenorm._InstanceNorm
    mmcv_utils.parrots_wrapper = mmcv_pw
    mmcv.utils = mmcv_utils
    sys.modules["mmcv.utils"] = mmcv_utils
    sys.modules["mmcv.utils.parrots_wrapper"] = mmcv_pw

    import importlib.util
    import os

    name = "ref_mmedit_common"
    if name in sys.modules:
        return sys.modules[name]
    path = "/root/reference/mmedit/models/common"
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(path, "__init__.py"),
        submodule_search_locations=[path])
    pkg = importlib.util.module_from_spec(spec)
    sys.modules[name] = pkg
    try:
        spec.loader.exec_module(pkg)
    except Exception:
        del sys.modules[name]
        raise
    return pkg


def _upfirdn2d_native(input, kernel, up_x, up_y, down_x, down_y,
                      pad_x0, pad_x1, pad_y0, pad_y1):
    """Reference upfirdn2d (rosinality native form) in pure torch."""
    import torch.nn.functional as F

    _, channel, in_h, in_w = input.shape
    input = input.reshape(-1, in_h, in_w, 1)
    minor = 1
    kernel_h, kernel_w = kernel.shape

    out = input.view(-1, in_h, 1, in_w, 1, minor)
    out = F.pad(out, [0, 0, 0, up_x - 1, 0, 0, 0, up_y - 1])
    out = out.view(-1, in_h * up_y, in_w * up_x, minor)

    out = F.pad(out, [0, 0, max(pad_x0, 0), max(pad_x1, 0),
                      max(pad_y0, 0), max(pad_y1, 0)])
    out = out[:, max(-pad_y0, 0): out.shape[1] - max(-pad_y1, 0),
              max(-pad_x0, 0): out.shape[2] - max(-pad_x1, 0), :]

    out = out.permute(0, 3, 1, 2)
    out = out.reshape(
        [-1, 1, in_h * up_y + pad_y0 + pad_y1, in_w * up_x + pad_x0 + pad_x1])
    w = torch.flip(kernel, [0, 1]).view(1, 1, kernel_h, kernel_w)
    out = torch.nn.functional.conv2d(out, w)
    out = out.reshape(-1, minor,
                      in_h * up_y + pad_y0 + pad_y1 - kernel_h + 1,
                      in_w * up_x + pad_x0 + pad_x1 - kernel_w + 1)
    out = out.permute(0, 2, 3, 1)
    out = out[:, ::down_y, ::down_x, :]
    out_h = (in_h * up_y + pad_y0 + pad_y1 - kernel_h) // down_y + 1
    out_w = (in_w * up_x + pad_x0 + pad_x1 - kernel_w) // down_x + 1
    return out.view(-1, channel, out_h, out_w)


def _upfirdn2d(input, kernel, up=1, down=1, pad=(0, 0)):
    return _upfirdn2d_native(input, kernel, up, up, down, down,
                             pad[0], pad[1], pad[0], pad[1])


def _fused_bias_leakyrelu(x, bias, negative_slope=0.2, scale=2 ** 0.5):
    import torch.nn.functional as F

    shape = [1, -1] + [1] * (x.ndim - 2)
    return F.leaky_relu(x + bias.view(*shape), negative_slope) * scale


class _FusedBiasLeakyReLU(nn.Module):
    def __init__(self, num_channels, negative_slope=0.2, scale=2 ** 0.5):
        super().__init__()
        self.bias = nn.Parameter(torch.zeros(num_channels))
        self.negative_slope = negative_slope
        self.scale = scale

    def forward(self, x):
        return _fused_bias_leakyrelu(x, self.bias, self.negative_slope,
                                     self.scale)


def import_reference_stylegan2():
    """Load the reference stylegan2 files standalone, with mmcv.ops stubs."""
    install_stubs()
    import_reference_common()  # upgrades mmcv.cnn (ConvModule, act builder)
    import importlib.util
    import os

    name = "ref_stylegan2"
    if name in sys.modules:
        return sys.modules[name]

    mmcv = sys.modules["mmcv"]
    mmcv.is_seq_of = lambda seq, t: isinstance(seq, (list, tuple)) and all(
        isinstance(s, t) for s in seq)
    mmcv.print_log = lambda *a, **k: None
    mmcv_cnn = sys.modules["mmcv.cnn"]
    bricks = types.ModuleType("mmcv.cnn.bricks")
    bricks_act = types.ModuleType("mmcv.cnn.bricks.activation")
    bricks_act.build_activation_layer = mmcv_cnn.build_activation_layer
    bricks.activation = bricks_act
    sys.modules["mmcv.cnn.bricks"] = bricks
    sys.modules["mmcv.cnn.bricks.activation"] = bricks_act
    cnn_utils = sys.modules.setdefault("mmcv.cnn.utils",
                                       types.ModuleType("mmcv.cnn.utils"))

    def _normal_init_mod(module, mean=0, std=1, bias=0):
        nn.init.normal_(module.weight, mean, std)
        if getattr(module, "bias", None) is not None:
            nn.init.constant_(module.bias, bias)

    cnn_utils.normal_init = _normal_init_mod
    mmcv_cnn.utils = cnn_utils
    ops = types.ModuleType("mmcv.ops")
    ops_fblr = types.ModuleType("mmcv.ops.fused_bias_leakyrelu")
    ops_fblr.FusedBiasLeakyReLU = _FusedBiasLeakyReLU
    ops_fblr.fused_bias_leakyrelu = _fused_bias_leakyrelu
    ops_up = types.ModuleType("mmcv.ops.upfirdn2d")
    ops_up.upfirdn2d = _upfirdn2d
    ops.fused_bias_leakyrelu = ops_fblr
    ops.upfirdn2d = ops_up
    sys.modules["mmcv.ops"] = ops
    sys.modules["mmcv.ops.fused_bias_leakyrelu"] = ops_fblr
    sys.modules["mmcv.ops.upfirdn2d"] = ops_up
    runner = sys.modules["mmcv.runner"]
    ckpt_mod = types.ModuleType("mmcv.runner.checkpoint")
    ckpt_mod._load_checkpoint_with_prefix = lambda *a, **k: {}
    runner.checkpoint = ckpt_mod
    sys.modules["mmcv.runner.checkpoint"] = ckpt_mod

    # minimal mmedit.models.registry (may already exist from other loaders)
    if "mmedit.models.registry" not in sys.modules:
        mmedit = sys.modules["mmedit"]
        models = types.ModuleType("mmedit.models")

        class _Reg:
            def register_module(self, *a, **k):
                return lambda cls: cls

        registry = types.ModuleType("mmedit.models.registry")
        registry.COMPONENTS = _Reg()
        models.registry = registry
        mmedit.models = models
        sys.modules["mmedit.models"] = models
        sys.modules["mmedit.models.registry"] = registry

    base = "/root/reference/mmedit/models/components/stylegan2"
    pkg = types.ModuleType(name)
    pkg.__path__ = [base]
    sys.modules[name] = pkg
    for sub in ("modules", "common", "generator_discriminator"):
        spec = importlib.util.spec_from_file_location(
            f"{name}.{sub}", os.path.join(base, f"{sub}.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"{name}.{sub}"] = mod
        spec.loader.exec_module(mod)
        setattr(pkg, sub, mod)
    return pkg


def import_reference_matting_metrics():
    """Load /root/reference/mmedit/core/evaluation/metrics.py standalone.

    Needs era shims: np.int (removed numpy 1.24), scipy.ndimage.filters
    (removed scipy 1.15), and a synthetic parent package so the relative
    metric_utils import resolves."""
    install_stubs()
    import importlib.util
    import os
    import numpy as _np
    import scipy.ndimage

    name = "ref_mmedit_eval"
    if f"{name}.metrics" in sys.modules:
        return sys.modules[f"{name}.metrics"]

    if not hasattr(_np, "int"):
        _np.int = int
    if "scipy.ndimage.filters" not in sys.modules:
        filters = types.ModuleType("scipy.ndimage.filters")
        filters.convolve = scipy.ndimage.convolve
        sys.modules["scipy.ndimage.filters"] = filters

    path = "/root/reference/mmedit/core/evaluation"
    pkg = types.ModuleType(name)
    pkg.__path__ = [path]
    sys.modules[name] = pkg
    for sub in ("metric_utils", "metrics"):
        spec = importlib.util.spec_from_file_location(
            f"{name}.{sub}", os.path.join(path, f"{sub}.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"{name}.{sub}"] = mod
        spec.loader.exec_module(mod)
        setattr(pkg, sub, mod)
    return sys.modules[f"{name}.metrics"]
