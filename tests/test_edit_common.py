"""Oracle tests: vmg_tpu.edit.common vs the reference mmedit common ops
(``/root/reference/mmedit/models/common/``), run directly in torch via
tests/ref_stubs.import_reference_common."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from ref_stubs import import_reference_common
from vmg_tpu.edit import common as C

ref = import_reference_common()


def t2j(x):
    """torch NCHW -> jax NHWC."""
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))


def j2n(x):
    """jax NHWC -> numpy NCHW."""
    return np.asarray(x).transpose(0, 3, 1, 2)


def conv_w(t):
    """torch conv weight (Co,Ci,kh,kw) -> flax (kh,kw,Ci,Co)."""
    return jnp.asarray(t.detach().numpy().transpose(2, 3, 1, 0))


def deconv_w(t):
    """torch conv-transpose weight (Ci,Co,kh,kw) -> (kh,kw,Ci,Co)."""
    return jnp.asarray(t.detach().numpy().transpose(2, 3, 0, 1))


def bias(t):
    return jnp.asarray(t.detach().numpy())


@pytest.mark.parametrize("with_mask", [False, True])
def test_contextual_attention_oracle(with_mask):
    torch.manual_seed(0)
    rm = ref.ContextualAttentionModule()
    x = torch.randn(2, 6, 16, 16)
    ctx = torch.randn(2, 6, 16, 16)
    mask = None
    if with_mask:
        mask = torch.zeros(2, 1, 16, 16)
        mask[:, :, 4:10, 6:12] = 1.0
    with torch.no_grad():
        out_t, score_t = rm(x, ctx, mask)

    jm = C.ContextualAttentionModule()
    args = (t2j(x), t2j(ctx), t2j(mask) if with_mask else None)
    out_j, score_j = jm.apply({}, *args)
    np.testing.assert_allclose(j2n(out_j), out_t.numpy(), atol=2e-5,
                               rtol=2e-5)
    # score: ref (n, hu, wu, h', w') == ours
    np.testing.assert_allclose(np.asarray(score_j), score_t.numpy(),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("rate,with_unknown", [(2, True), (2, False),
                                               (1, True)])
def test_gca_module_oracle(rate, with_unknown):
    torch.manual_seed(1)
    rm = ref.GCAModule(8, 4, rate=rate).eval()
    n, h, w = 2, 16, 16
    img = torch.randn(n, 8, h, w)
    alpha = torch.randn(n, 4, h, w)
    unknown = None
    if with_unknown:
        unknown = (torch.rand(n, 1, h, w) > 0.5).float()
    with torch.no_grad():
        out_t = rm(img, alpha, unknown)

    jm = C.GCAModule(8, 4, rate=rate)
    params = {
        "params": {
            "guidance_conv": {"kernel": conv_w(rm.guidance_conv.weight),
                              "bias": bias(rm.guidance_conv.bias)},
            "out_conv": {"kernel": conv_w(rm.out_conv.conv.weight)},
            "out_norm": {"scale": bias(rm.out_conv.bn.weight),
                         "bias": bias(rm.out_conv.bn.bias)},
        },
        "batch_stats": {
            "out_norm": {"mean": bias(rm.out_conv.bn.running_mean),
                         "var": bias(rm.out_conv.bn.running_var)},
        },
    }
    out_j = jm.apply(params, t2j(img), t2j(alpha),
                     t2j(unknown) if with_unknown else None)
    np.testing.assert_allclose(j2n(out_j), out_t.numpy(), atol=5e-5,
                               rtol=5e-5)


@pytest.mark.parametrize("multi_channel,use_bias,with_mask",
                         [(False, True, True), (True, True, True),
                          (True, False, True), (False, True, False)])
def test_partial_conv_oracle(multi_channel, use_bias, with_mask):
    torch.manual_seed(2)
    rm = ref.PartialConv2d(5, 7, 3, padding=1, multi_channel=multi_channel,
                           bias=use_bias)
    x = torch.randn(2, 5, 12, 12)
    mask = None
    if with_mask:
        mc = 5 if multi_channel else 1
        mask = (torch.rand(2, mc, 12, 12) > 0.4).float()
    with torch.no_grad():
        if with_mask:
            out_t, m_t = rm(x, mask)
        else:
            out_t = rm(x, None)

    jm = C.PartialConv2d(5, 7, 3, padding=1, multi_channel=multi_channel,
                         use_bias=use_bias)
    p = {"kernel": conv_w(rm.weight)}
    if use_bias:
        p["bias"] = bias(rm.bias)
    if with_mask:
        out_j, m_j = jm.apply({"params": p}, t2j(x), t2j(mask))
        np.testing.assert_allclose(j2n(m_j), m_t.numpy(), atol=1e-6)
    else:
        out_j = jm.apply({"params": p}, t2j(x), None)
    np.testing.assert_allclose(j2n(out_j), out_t.numpy(), atol=2e-5,
                               rtol=2e-5)


def test_gated_conv_oracle():
    torch.manual_seed(3)
    rm = ref.SimpleGatedConvModule(4, 6, 3, padding=1)
    x = torch.randn(2, 4, 10, 10)
    with torch.no_grad():
        out_t = rm(x)
    jm = C.SimpleGatedConvModule(4, 6, 3, padding=1)
    params = {"params": {"conv": {"kernel": conv_w(rm.conv.conv.weight),
                                  "bias": bias(rm.conv.conv.bias)}}}
    out_j = jm.apply(params, t2j(x))
    np.testing.assert_allclose(j2n(out_j), out_t.numpy(), atol=2e-5,
                               rtol=2e-5)


def test_separable_conv_oracle():
    torch.manual_seed(4)
    rm = ref.DepthwiseSeparableConvModule(6, 10, 3, padding=1)
    x = torch.randn(2, 6, 9, 9)
    with torch.no_grad():
        out_t = rm(x)
    jm = C.DepthwiseSeparableConvModule(6, 10, 3, padding=1)
    params = {"params": {
        "depthwise_conv": {
            "kernel": conv_w(rm.depthwise_conv.conv.weight),
            "bias": bias(rm.depthwise_conv.conv.bias)},
        "pointwise_conv": {
            "kernel": conv_w(rm.pointwise_conv.conv.weight),
            "bias": bias(rm.pointwise_conv.conv.bias)},
    }}
    out_j = jm.apply(params, t2j(x))
    np.testing.assert_allclose(j2n(out_j), out_t.numpy(), atol=2e-5,
                               rtol=2e-5)


def test_aspp_oracle():
    torch.manual_seed(5)
    rm = ref.ASPP(8, out_channels=12, mid_channels=6,
                  dilations=(2, 4, 6)).eval()
    # randomize BN running stats for a stronger check
    for m in rm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.3)
            m.running_var.uniform_(0.5, 1.5)
    x = torch.randn(2, 8, 13, 11)
    with torch.no_grad():
        out_t = rm(x)

    jm = C.ASPP(8, out_channels=12, mid_channels=6, dilations=(2, 4, 6))
    convs = list(rm.convs)
    params, stats = {}, {}

    def put(name, conv, bn):
        params[name] = {"kernel": conv_w(conv.weight)}
        params[f"{name}_bn"] = {"scale": bias(bn.weight),
                                "bias": bias(bn.bias)}
        stats[f"{name}_bn"] = {"mean": bias(bn.running_mean),
                               "var": bias(bn.running_var)}

    put("conv0", convs[0].conv, convs[0].bn)
    for i in range(1, 4):
        put(f"conv{i}", convs[i].conv, convs[i].bn)
    pool_cm = convs[4][1]
    put("pool_conv", pool_cm.conv, pool_cm.bn)
    proj = rm.project[0]
    put("project", proj.conv, proj.bn)

    out_j = jm.apply({"params": params, "batch_stats": stats}, t2j(x))
    np.testing.assert_allclose(j2n(out_j), out_t.numpy(), atol=5e-5,
                               rtol=5e-5)


def test_residual_block_with_dropout_oracle():
    torch.manual_seed(6)
    rm = ref.ResidualBlockWithDropout(6, "reflect",
                                      norm_cfg=dict(type="IN")).eval()
    x = torch.randn(2, 6, 10, 10)
    with torch.no_grad():
        out_t = rm(x)
    jm = C.ResidualBlockWithDropout(6, "reflect", norm="IN")
    cm0, cm1 = rm.block[0], rm.block[2]
    params = {"params": {
        "b0_conv": {"kernel": conv_w(cm0.conv.weight),
                    "bias": bias(cm0.conv.bias)},
        "b1_conv": {"kernel": conv_w(cm1.conv.weight),
                    "bias": bias(cm1.conv.bias)},
    }}
    out_j = jm.apply(params, t2j(x))
    np.testing.assert_allclose(j2n(out_j), out_t.numpy(), atol=2e-5,
                               rtol=2e-5)


def test_unet_skip_connection_block_oracle():
    torch.manual_seed(7)
    inner_t = ref.UnetSkipConnectionBlock(
        4, 8, is_innermost=True, norm_cfg=dict(type="IN"))
    outer_t = ref.UnetSkipConnectionBlock(
        3, 4, submodule=inner_t, is_outermost=True,
        norm_cfg=dict(type="IN")).eval()
    x = torch.randn(2, 3, 16, 16)
    with torch.no_grad():
        out_t = outer_t(x)

    inner_j = C.UnetSkipConnectionBlock(4, 8, is_innermost=True, norm="IN",
                                        name="submodule")
    outer_j = C.UnetSkipConnectionBlock(3, 4, submodule=inner_j,
                                        is_outermost=True, norm="IN")
    # ref structure: outer.model = [down ConvModule, inner, up ConvModule,
    # Tanh]; inner.model = [down ConvModule, up ConvModule]
    od, inner_m, ou = outer_t.model[0], outer_t.model[1], outer_t.model[2]
    idn, iup = inner_m.model[0], inner_m.model[1]
    params = {"params": {
        "down_conv": {"kernel": conv_w(od.conv.weight),
                      "bias": bias(od.conv.bias)},
        "up_conv": {"kernel": deconv_w(ou.conv.weight),
                    "bias": bias(ou.conv.bias)},
        "submodule": {
            "down_conv": {"kernel": conv_w(idn.conv.weight),
                          "bias": bias(idn.conv.bias)},
            "up_conv": {"kernel": deconv_w(iup.conv.weight),
                        "bias": bias(iup.conv.bias)},
        },
    }}
    out_j = outer_j.apply(params, t2j(x))
    np.testing.assert_allclose(j2n(out_j), out_t.numpy(), atol=2e-5,
                               rtol=2e-5)


def test_img_normalize_oracle():
    torch.manual_seed(8)
    rm = ref.ImgNormalize(1.0, (0.4, 0.5, 0.6), (0.2, 0.25, 0.3))
    x = torch.randn(2, 3, 6, 6)
    with torch.no_grad():
        out_t = rm(x)
    out_j = C.img_normalize(t2j(x), 1.0, (0.4, 0.5, 0.6), (0.2, 0.25, 0.3))
    np.testing.assert_allclose(j2n(out_j), out_t.numpy(), atol=1e-5,
                               rtol=1e-5)


def test_linear_module_oracle():
    torch.manual_seed(9)
    rm = ref.LinearModule(5, 7)
    x = torch.randn(3, 5)
    with torch.no_grad():
        out_t = rm(x)
    jm = C.LinearModule(5, 7)
    params = {"params": {"linear": {
        "kernel": jnp.asarray(rm.linear.weight.detach().numpy().T),
        "bias": bias(rm.linear.bias)}}}
    out_j = jm.apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=2e-5,
                               rtol=2e-5)


def test_mask_conv_module_composes_partial_conv():
    """MaskConvModule == PartialConv + act with mask threading (the
    reference wrapper adds no math, mask_conv_module.py:43)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 4, 8, 8)), jnp.float32)
    x = x.transpose(0, 2, 3, 1)
    mask = jnp.asarray((rng.random((1, 8, 8, 1)) > 0.3), jnp.float32)
    m = C.MaskConvModule(4, 6, 3, padding=1, act="relu")
    params = m.init(jax.random.key(0), x, mask)
    out, updated = m.apply(params, x, mask)
    pc = C.PartialConv2d(4, 6, 3, padding=1)
    raw, upd2 = pc.apply({"params": params["params"]["conv"]}, x, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(jax.nn.relu(raw)),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(updated), np.asarray(upd2))


def test_gan_image_buffer():
    buf = C.GANImageBuffer(buffer_size=2, buffer_ratio=0.5, seed=0)
    imgs1 = np.arange(8, dtype=np.float32).reshape(2, 2, 2)
    out1 = buf.query(imgs1)
    np.testing.assert_array_equal(out1, imgs1)  # buffer filling: passthrough
    imgs2 = imgs1 + 100
    out2 = buf.query(imgs2)
    assert out2.shape == imgs2.shape
    # every returned image is either the new one or one previously stored
    pool = np.concatenate([imgs1, imgs2], axis=0)
    for img in out2:
        assert any(np.array_equal(img, p) for p in pool)
