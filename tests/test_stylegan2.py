"""Oracle tests: vmg_tpu.edit.stylegan2 vs the reference stylegan2
components run in torch (tests/ref_stubs.import_reference_stylegan2)."""

import numpy as np
import torch
import jax
import jax.numpy as jnp
import pytest

from ref_stubs import import_reference_stylegan2
from vmg_tpu.edit import stylegan2 as S

ref = import_reference_stylegan2()


def t2j(x):
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))


def j2n(x):
    return np.asarray(x).transpose(0, 3, 1, 2)


def a(t):
    return jnp.asarray(t.detach().numpy())


def modconv_params(tm):
    """Transfer reference ModulatedConv2d weights."""
    return {
        "weight": jnp.asarray(
            tm.weight_orig[0].detach().numpy().transpose(2, 3, 1, 0)),
        "style_modulation": {
            "weight": jnp.asarray(
                tm.style_modulation.linear.weight_orig.detach().numpy().T),
            "bias": a(tm.style_modulation.bias),
        },
    }


def styleconv_params(tm):
    return {
        "conv": modconv_params(tm.conv),
        "noise_injector": {"weight": a(tm.noise_injector.weight)},
        "activate_bias": a(tm.activate.bias),
    }


def torgb_params(tm):
    return {
        "conv": modconv_params(tm.conv),
        "bias": jnp.asarray(
            tm.bias.detach().numpy().transpose(0, 2, 3, 1)),
    }


def convdown_params(tm, fused=True):
    """ConvDownLayer Sequential -> params dict."""
    mods = list(tm)
    eq = [m for m in mods if hasattr(m, "conv")][0]
    p = {"weight": jnp.asarray(
        eq.conv.weight_orig.detach().numpy().transpose(2, 3, 1, 0))}
    if fused:
        fb = mods[-1]
        p["activate_bias"] = a(fb.bias)
    elif eq.conv.bias is not None:
        p["bias"] = a(eq.conv.bias)
    return p


@pytest.mark.parametrize("up,down,pad", [(1, 1, (1, 1)), (2, 1, (2, 1)),
                                         (1, 2, (2, 2))])
def test_upfirdn2d_oracle(up, down, pad):
    torch.manual_seed(0)
    x = torch.randn(2, 3, 8, 8)
    k = ref.modules._make_kernel([1, 3, 3, 1])
    out_t = ref.modules.upfirdn2d(x, k, up=up, down=down, pad=pad)
    out_j = S.upfirdn2d(t2j(x), jnp.asarray(k.numpy()), up=up, down=down,
                        pad=pad)
    np.testing.assert_allclose(j2n(out_j), out_t.numpy(), atol=1e-5,
                               rtol=1e-5)


def test_equal_linear_act_oracle():
    torch.manual_seed(1)
    rm = ref.modules.EqualLinearActModule(
        8, 16, equalized_lr_cfg=dict(lr_mul=0.01, gain=1.0),
        act_cfg=dict(type="fused_bias"))
    x = torch.randn(3, 8)
    with torch.no_grad():
        out_t = rm(x)
    jm = S.EqualLinearActModule(8, 16, gain=1.0, lr_mul=0.01,
                                act="fused_bias")
    params = {"params": {
        "weight": jnp.asarray(rm.linear.weight_orig.detach().numpy().T),
        "bias": a(rm.bias)}}
    out_j = jm.apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=1e-5,
                               rtol=1e-5)


@pytest.mark.parametrize("mode", ["plain", "up", "down"])
def test_modulated_conv2d_oracle(mode):
    torch.manual_seed(2)
    rm = ref.modules.ModulatedConv2d(
        8, 12, 3, 16, upsample=mode == "up", downsample=mode == "down")
    x = torch.randn(2, 8, 8, 8)
    style = torch.randn(2, 16)
    with torch.no_grad():
        out_t = rm(x, style)
    jm = S.ModulatedConv2d(8, 12, 3, 16, upsample=mode == "up",
                           downsample=mode == "down")
    out_j = jm.apply({"params": modconv_params(rm)}, t2j(x),
                     jnp.asarray(style.numpy()))
    np.testing.assert_allclose(j2n(out_j), out_t.numpy(), atol=2e-4,
                               rtol=2e-4)


def test_modulated_style_conv_and_torgb_oracle():
    torch.manual_seed(3)
    rm = ref.modules.ModulatedStyleConv(8, 12, 3, 16, upsample=True)
    rt = ref.modules.ModulatedToRGB(12, 16, upsample=True)
    x = torch.randn(2, 8, 4, 4)
    style = torch.randn(2, 16)
    noise = torch.randn(2, 1, 8, 8)
    skip = torch.randn(2, 3, 4, 4)
    with torch.no_grad():
        mid_t = rm(x, style, noise=noise)
        out_t = rt(mid_t, style, skip)

    jm = S.ModulatedStyleConv(8, 12, 3, 16, upsample=True)
    mid_j = jm.apply({"params": styleconv_params(rm)}, t2j(x),
                     jnp.asarray(style.numpy()), noise=t2j(noise))
    np.testing.assert_allclose(j2n(mid_j), mid_t.numpy(), atol=2e-4,
                               rtol=2e-4)
    jt = S.ModulatedToRGB(12, 16, upsample=True)
    out_j = jt.apply({"params": torgb_params(rt)}, mid_j,
                     jnp.asarray(style.numpy()), t2j(skip))
    np.testing.assert_allclose(j2n(out_j), out_t.numpy(), atol=2e-4,
                               rtol=2e-4)


def test_mbstddev_oracle():
    torch.manual_seed(4)
    rm = ref.modules.ModMBStddevLayer(group_size=2)
    x = torch.randn(4, 6, 5, 5)
    with torch.no_grad():
        out_t = rm(x)
    jm = S.ModMBStddevLayer(group_size=2)
    out_j = jm.apply({}, t2j(x))
    np.testing.assert_allclose(j2n(out_j), out_t.numpy(), atol=1e-5,
                               rtol=1e-5)


def _gen_pair(out_size=16, style=32, mlps=2):
    torch.manual_seed(5)
    rm = ref.generator_discriminator.StyleGANv2Generator(
        out_size, style, num_mlps=mlps, channel_multiplier=1).eval()
    jm = S.StyleGANv2Generator(out_size, style, num_mlps=mlps,
                               channel_multiplier=1)
    params = {}
    for i in range(mlps):
        lin = rm.style_mapping[i + 1]
        params[f"style_mapping{i}"] = {
            "weight": jnp.asarray(
                lin.linear.weight_orig.detach().numpy().T),
            "bias": a(lin.bias)}
    params["constant_input"] = {"input": jnp.asarray(
        rm.constant_input.input.detach().numpy().transpose(0, 2, 3, 1))}
    params["conv1"] = styleconv_params(rm.conv1)
    params["to_rgb1"] = torgb_params(rm.to_rgb1)
    for i, conv in enumerate(rm.convs):
        params[f"convs{i}"] = styleconv_params(conv)
    for i, trgb in enumerate(rm.to_rgbs):
        params[f"to_rgbs{i}"] = torgb_params(trgb)
    return rm, jm, {"params": params}


def test_stylegan2_generator_oracle():
    rm, jm, params = _gen_pair()
    z = torch.randn(2, 32)
    noises = [getattr(rm, f"injected_noise_{i}")
              for i in range(rm.num_injected_noises)]
    with torch.no_grad():
        img_t = rm([z], randomize_noise=False)
    img_j = jm.apply(params, [jnp.asarray(z.numpy())],
                     injected_noise=[t2j(n) for n in noises])
    np.testing.assert_allclose(j2n(img_j), img_t.numpy(), atol=5e-4,
                               rtol=5e-4)


def test_stylegan2_generator_style_mixing_oracle():
    rm, jm, params = _gen_pair()
    z1, z2 = torch.randn(2, 32), torch.randn(2, 32)
    noises = [getattr(rm, f"injected_noise_{i}")
              for i in range(rm.num_injected_noises)]
    with torch.no_grad():
        img_t = rm([z1, z2], inject_index=2, randomize_noise=False)
    img_j = jm.apply(params, [jnp.asarray(z1.numpy()),
                              jnp.asarray(z2.numpy())],
                     inject_index=2,
                     injected_noise=[t2j(n) for n in noises])
    np.testing.assert_allclose(j2n(img_j), img_t.numpy(), atol=5e-4,
                               rtol=5e-4)


def test_stylegan2_discriminator_oracle():
    torch.manual_seed(6)
    rm = ref.generator_discriminator.StyleGAN2Discriminator(
        16, channel_multiplier=1).eval()
    jm = S.StyleGAN2Discriminator(16, channel_multiplier=1,
                                  mbstd_group_size=2)
    x = torch.randn(2, 3, 16, 16)
    with torch.no_grad():
        out_t = rm(x)

    params = {"conv0": convdown_params(rm.convs[0])}
    n_res = len(rm.convs) - 1
    for i in range(n_res):
        rb = rm.convs[i + 1]
        params[f"res{i}"] = {
            "conv1": convdown_params(rb.conv1),
            "conv2": convdown_params(rb.conv2),
            "skip": convdown_params(rb.skip, fused=False),
        }
    params["final_conv"] = convdown_params(rm.final_conv)
    fl0, fl1 = rm.final_linear[0], rm.final_linear[1]
    # torch flattens NCHW; ours NHWC -- permute the fc rows
    w0 = fl0.linear.weight_orig.detach().numpy()  # (out, 512*4*4)
    w0 = w0.reshape(-1, 512, 4, 4).transpose(0, 2, 3, 1).reshape(
        w0.shape[0], -1).T
    params["final_linear0"] = {"weight": jnp.asarray(w0),
                               "bias": a(fl0.bias)}
    params["final_linear1"] = {
        "weight": jnp.asarray(fl1.linear.weight_orig.detach().numpy().T),
        "bias": a(fl1.bias)}
    # reference mbstd group_size=4 with batch 2 -> group = min(2, 4) = 2
    out_j = jm.apply({"params": params}, t2j(x))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=2e-3,
                               rtol=2e-3)


def test_get_mean_latent_and_style_mixing_run():
    _, jm, params = _gen_pair()
    mean = S.get_mean_latent(jm, params, num_samples=64, batch=32)
    assert mean.shape == (1, 32)
    src, tgt, mixed = S.style_mixing(jm, params, n_source=2, n_target=2,
                                     truncation=0.7, truncation_latent=mean)
    assert src.shape == (2, 16, 16, 3)
    assert mixed.shape == (4, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(mixed)))
