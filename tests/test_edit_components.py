"""Oracle tests: vmg_tpu.edit.components vs the reference discriminators /
refiners (``mmedit/models/components/``), run in torch via ref_stubs."""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from ref_stubs import install_stubs, import_reference_common, _ConvModuleFull
from vmg_tpu.edit import components as C


def _load_ref_components():
    """Load the reference discriminator/refiner files standalone (their
    package __init__ pulls in the full mmedit model zoo)."""
    install_stubs()
    import_reference_common()  # upgrades mmcv.cnn stub
    name = "ref_components"
    if name in sys.modules:
        return sys.modules[name]

    # synthetic mmedit.models.* so `from mmedit.models.registry import ...`
    # and `from mmedit.models.common import ...` resolve
    mmedit = sys.modules["mmedit"]
    models = types.ModuleType("mmedit.models")

    class _Reg:
        def register_module(self, *a, **k):
            return lambda cls: cls

    registry = types.ModuleType("mmedit.models.registry")
    registry.COMPONENTS = _Reg()
    models.registry = registry
    models.common = sys.modules["ref_mmedit_common"]
    models.builder = types.ModuleType("mmedit.models.builder")
    models.builder.build_component = lambda cfg: None
    models.build_component = models.builder.build_component
    mmedit.models = models
    sys.modules["mmedit.models"] = models
    sys.modules["mmedit.models.registry"] = registry
    sys.modules["mmedit.models.common"] = models.common
    sys.modules["mmedit.models.builder"] = models.builder

    mmcv_runner = sys.modules["mmcv.runner"]
    mmcv_cnn = sys.modules["mmcv.cnn"]
    cnn_utils = types.ModuleType("mmcv.cnn.utils")
    wi = types.ModuleType("mmcv.cnn.utils.weight_init")
    wi.xavier_init = mmcv_cnn.xavier_init
    cnn_utils.weight_init = wi
    sys.modules["mmcv.cnn.utils"] = cnn_utils
    sys.modules["mmcv.cnn.utils.weight_init"] = wi
    del mmcv_runner

    pkg = types.ModuleType(name)
    base = "/root/reference/mmedit/models/components"
    for sub, fname in [
        ("ttsr_disc", "discriminators/ttsr_disc.py"),
        ("patch_disc", "discriminators/patch_disc.py"),
        ("modified_vgg", "discriminators/modified_vgg.py"),
        ("light_cnn", "discriminators/light_cnn.py"),
        ("multi_layer_disc", "discriminators/multi_layer_disc.py"),
        ("gl_disc", "discriminators/gl_disc.py"),
        ("plain_refiner", "refiners/plain_refiner.py"),
        ("mlp_refiner", "refiners/mlp_refiner.py"),
    ]:
        spec = importlib.util.spec_from_file_location(
            f"{name}.{sub}", os.path.join(base, fname))
        mod = importlib.util.module_from_spec(spec)
        # gl_disc does `from .multi_layer_disc import ...`
        sys.modules[f"{name}.{sub}"] = mod
        if sub == "gl_disc":
            sys.modules["ref_components.multi_layer_disc"] = \
                sys.modules[f"{name}.multi_layer_disc"]
        spec.loader.exec_module(mod)
        setattr(pkg, sub, mod)
    sys.modules[name] = pkg
    return pkg


refc = _load_ref_components()


def t2j(x):
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))


def conv_w(t):
    return jnp.asarray(t.detach().numpy().transpose(2, 3, 1, 0))


def lin_w(t):
    return jnp.asarray(t.detach().numpy().T)


def b(t):
    return jnp.asarray(t.detach().numpy())


def _nchw_flat_to_nhwc_fc(w_t, c, h, w):
    """torch flattens conv features NCHW; ours flattens NHWC.  Permute the
    fc input weight accordingly: torch rows indexed (c, h, w) -> (h, w, c)."""
    wt = w_t.detach().numpy()  # (out, c*h*w)
    wt = wt.reshape(-1, c, h, w).transpose(0, 2, 3, 1).reshape(wt.shape[0], -1)
    return jnp.asarray(wt.T)


def test_ttsr_discriminator_oracle():
    torch.manual_seed(0)
    rm = refc.ttsr_disc.TTSRDiscriminator(in_channels=3, in_size=32).eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        out_t = rm(x)
    jm = C.TTSRDiscriminator(in_channels=3, in_size=32)
    params = {}
    convs = [m for m in rm.body if isinstance(m, torch.nn.Conv2d)]
    for i, cv in enumerate(convs):
        params[f"conv{i}"] = {"kernel": conv_w(cv.weight),
                              "bias": b(cv.bias)}
    fc1, fc2 = rm.last[0], rm.last[2]
    params["fc1"] = {"kernel": _nchw_flat_to_nhwc_fc(fc1.weight, 512, 1, 1),
                     "bias": b(fc1.bias)}
    params["fc2"] = {"kernel": lin_w(fc2.weight), "bias": b(fc2.bias)}
    out_j = jm.apply({"params": params}, t2j(x))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=1e-4,
                               rtol=1e-4)


def test_patch_discriminator_oracle():
    torch.manual_seed(1)
    rm = refc.patch_disc.PatchDiscriminator(
        in_channels=3, base_channels=8, num_conv=3,
        norm_cfg=dict(type="IN")).eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        out_t = rm(x)
    jm = C.PatchDiscriminator(in_channels=3, base_channels=8, num_conv=3,
                              norm="IN")
    params = {}
    mods = list(rm.model)
    # ConvModule x4 then plain Conv2d
    for i in range(4):
        cv = mods[i].conv
        params[f"conv{i}"] = {"kernel": conv_w(cv.weight)}
        if cv.bias is not None:
            params[f"conv{i}"]["bias"] = b(cv.bias)
    params["conv_out"] = {"kernel": conv_w(mods[4].weight),
                          "bias": b(mods[4].bias)}
    out_j = jm.apply({"params": params}, t2j(x))
    np.testing.assert_allclose(np.asarray(out_j).transpose(0, 3, 1, 2),
                               out_t.numpy(), atol=1e-4, rtol=1e-4)


def test_modified_vgg_oracle():
    torch.manual_seed(2)
    rm = refc.modified_vgg.ModifiedVGG(3, 8).eval()
    for m in rm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.3)
            m.running_var.uniform_(0.5, 1.5)
    x = torch.randn(1, 3, 128, 128)
    with torch.no_grad():
        out_t = rm(x)
    jm = C.ModifiedVGG(3, 8)
    params, stats = {}, {}
    for name in ["0_0", "0_1", "1_0", "1_1", "2_0", "2_1", "3_0", "3_1",
                 "4_0", "4_1"]:
        cv = getattr(rm, f"conv{name}")
        params[f"conv{name}"] = {"kernel": conv_w(cv.weight)}
        if cv.bias is not None:
            params[f"conv{name}"]["bias"] = b(cv.bias)
        if hasattr(rm, f"bn{name}"):
            bn = getattr(rm, f"bn{name}")
            params[f"bn{name}"] = {"scale": b(bn.weight), "bias": b(bn.bias)}
            stats[f"bn{name}"] = {"mean": b(bn.running_mean),
                                  "var": b(bn.running_var)}
    params["linear1"] = {
        "kernel": _nchw_flat_to_nhwc_fc(rm.linear1.weight, 64, 4, 4),
        "bias": b(rm.linear1.bias)}
    params["linear2"] = {"kernel": lin_w(rm.linear2.weight),
                         "bias": b(rm.linear2.bias)}
    out_j = jm.apply({"params": params, "batch_stats": stats}, t2j(x))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=2e-3,
                               rtol=2e-3)


def test_light_cnn_oracle():
    torch.manual_seed(3)
    rm = refc.light_cnn.LightCNN(3).eval()
    x = torch.randn(1, 3, 128, 128)
    with torch.no_grad():
        out_t = rm(x)
    jm = C.LightCNN(3)
    params = {}
    mf_idx = 0
    for m in rm.features:
        if isinstance(m, refc.light_cnn.MaxFeature):
            f = m.filter
            params[f"mf{mf_idx}"] = {"filter": {"kernel": conv_w(f.weight),
                                                "bias": b(f.bias)}}
            mf_idx += 1
    fc1 = rm.classifier[0].filter
    params["fc1"] = {"filter": {
        "kernel": _nchw_flat_to_nhwc_fc(fc1.weight, 128, 8, 8),
        "bias": b(fc1.bias)}}
    fc2 = rm.classifier[2]
    params["fc2"] = {"kernel": lin_w(fc2.weight), "bias": b(fc2.bias)}
    out_j = jm.apply({"params": params}, t2j(x))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=1e-4,
                               rtol=1e-4)


def test_multi_layer_discriminator_oracle():
    torch.manual_seed(4)
    rm = refc.multi_layer_disc.MultiLayerDiscriminator(
        3, 256, num_convs=4, fc_in_channels=256 * 4 * 4,
        fc_out_channels=64).eval()
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        out_t = rm(x)
    jm = C.MultiLayerDiscriminator(3, 256, num_convs=4,
                                   fc_in_channels=256 * 4 * 4,
                                   fc_out_channels=64)
    params = {}
    for i in range(1, 5):
        cv = getattr(rm, f"conv{i}").conv
        params[f"conv{i}"] = {"kernel": conv_w(cv.weight),
                              "bias": b(cv.bias)}
    params["fc"] = {"linear": {
        "kernel": _nchw_flat_to_nhwc_fc(rm.fc.linear.weight, 256, 4, 4),
        "bias": b(rm.fc.linear.bias)}}
    out_j = jm.apply({"params": params}, t2j(x))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=1e-4,
                               rtol=1e-4)


def test_gl_discs_oracle():
    torch.manual_seed(5)
    cfg_g = dict(in_channels=3, max_channels=64, num_convs=3,
                 fc_in_channels=64 * 4 * 4, fc_out_channels=1024)
    cfg_l = dict(in_channels=3, max_channels=64, num_convs=3,
                 fc_in_channels=64 * 2 * 2, fc_out_channels=1024)
    rm = refc.gl_disc.GLDiscs(cfg_g, cfg_l).eval()
    g = torch.randn(2, 3, 32, 32)
    l = torch.randn(2, 3, 16, 16)
    with torch.no_grad():
        out_t = rm((g, l))
    jm = C.GLDiscs(global_disc_cfg=cfg_g, local_disc_cfg=cfg_l)

    def mld_params(tm, spatial):
        p = {}
        for i in range(1, 4):
            cv = getattr(tm, f"conv{i}").conv
            p[f"conv{i}"] = {"kernel": conv_w(cv.weight), "bias": b(cv.bias)}
        p["fc"] = {"linear": {
            "kernel": _nchw_flat_to_nhwc_fc(tm.fc.linear.weight, 64,
                                            spatial, spatial),
            "bias": b(tm.fc.linear.bias)}}
        return p

    params = {"global_disc": mld_params(rm.global_disc, 4),
              "local_disc": mld_params(rm.local_disc, 2),
              "fc": {"kernel": lin_w(rm.fc.weight), "bias": b(rm.fc.bias)}}
    out_j = jm.apply({"params": params}, (t2j(g), t2j(l)))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=1e-4,
                               rtol=1e-4)


def test_plain_refiner_oracle():
    torch.manual_seed(6)
    rm = refc.plain_refiner.PlainRefiner(conv_channels=16).eval()
    x = torch.randn(2, 4, 16, 16)
    raw = torch.randn(2, 1, 16, 16)
    with torch.no_grad():
        out_t = rm(x, raw)
    jm = C.PlainRefiner(conv_channels=16)
    params = {}
    for name in ["refine_conv1", "refine_conv2", "refine_conv3",
                 "refine_pred"]:
        cv = getattr(rm, name)
        params[name] = {"kernel": conv_w(cv.weight), "bias": b(cv.bias)}
    out_j = jm.apply({"params": params}, t2j(x), t2j(raw))
    np.testing.assert_allclose(np.asarray(out_j).transpose(0, 3, 1, 2),
                               out_t.numpy(), atol=1e-5, rtol=1e-5)


def test_mlp_refiner_oracle():
    torch.manual_seed(7)
    rm = refc.mlp_refiner.MLPRefiner(8, 3, [16, 16]).eval()
    x = torch.randn(4, 5, 8)
    with torch.no_grad():
        out_t = rm(x)
    jm = C.MLPRefiner(8, 3, (16, 16))
    lins = [m for m in rm.layers if isinstance(m, torch.nn.Linear)]
    params = {f"fc{i}": {"kernel": lin_w(m.weight), "bias": b(m.bias)}
              for i, m in enumerate(lins)}
    out_j = jm.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=1e-5,
                               rtol=1e-5)


def test_deepfill_refiner_runs():
    """The reference DeepFillRefiner cannot be instantiated from the
    vendored snapshot (its DeepFillEncoder/... components are absent from
    mmedit/models/backbones), so there is no torch oracle; check the
    TPU-native equivalent end to end."""
    jm = C.DeepFillRefiner(mid_channels=16)
    x = jnp.zeros((1, 32, 32, 3))
    mask = jnp.zeros((1, 32, 32, 1)).at[:, 8:16, 8:16].set(1.0)
    params = jm.init(jax.random.key(0), x, mask)
    out, offset = jm.apply(params, x, mask)
    assert out.shape == (1, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_deepfill_v1_discriminators_pair():
    cfg = dict(type="MultiLayerDiscriminator", in_channels=3,
               max_channels=64, num_convs=2, fc_in_channels=None)
    jm = C.DeepFillv1Discriminators(global_disc_cfg=cfg, local_disc_cfg=cfg)
    g = jnp.zeros((1, 16, 16, 3))
    l = jnp.zeros((1, 8, 8, 3))
    params = jm.init(jax.random.key(0), (g, l))
    og, ol = jm.apply(params, (g, l))
    assert og.shape[0] == 1 and ol.shape[0] == 1
