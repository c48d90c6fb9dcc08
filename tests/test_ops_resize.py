"""Resize/pool parity vs torch + reference MATLAB bicubic oracle."""

import importlib.util

import numpy as np
import pytest
import torch
import torch.nn.functional as TF
import jax.numpy as jnp

from vmg_tpu.ops.resize import (
    resize_bilinear,
    upsample_trilinear_frames,
    avg_pool2d,
    adaptive_avg_pool2d,
    adaptive_max_pool2d,
    imresize_matlab,
)
from vmg_tpu.ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle


def _torch_img(x):
    return torch.from_numpy(x).permute(0, 3, 1, 2)


def _from_torch(t):
    return t.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize("shape", [((7, 9), (14, 18)), ((12, 16), (5, 7)), ((6, 6), (192, 192))])
def test_resize_bilinear_matches_torch(rng, align, shape):
    (h, w), (oh, ow) = shape
    x = rng.standard_normal((2, h, w, 3)).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), oh, ow, align_corners=align))
    want = _from_torch(
        TF.interpolate(_torch_img(x), size=(oh, ow), mode="bilinear", align_corners=align)
    )
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_trilinear_frames_matches_torch(rng):
    b, t, h, w, c = 1, 3, 6, 8, 3
    x = rng.standard_normal((b, t, h, w, c)).astype(np.float32)
    got = np.asarray(upsample_trilinear_frames(jnp.asarray(x), 4))
    xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)  # B C T H W
    want = (
        TF.interpolate(xt, (t, h * 4, w * 4), mode="trilinear", align_corners=False)
        .permute(0, 2, 3, 4, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_avg_pool_matches_torch(rng):
    x = rng.standard_normal((2, 12, 16, 3)).astype(np.float32)
    got = np.asarray(avg_pool2d(jnp.asarray(x), 2))
    want = _from_torch(TF.avg_pool2d(_torch_img(x), 2, 2, count_include_pad=False))
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("out", [(6, 8), (5, 7), (1, 1)])
def test_adaptive_avg_pool_matches_torch(rng, out):
    x = rng.standard_normal((2, 12, 16, 3)).astype(np.float32)
    got = np.asarray(adaptive_avg_pool2d(jnp.asarray(x), *out))
    want = _from_torch(TF.adaptive_avg_pool2d(_torch_img(x), out))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("out", [(3, 4), (5, 7)])
def test_adaptive_max_pool_matches_torch(rng, out):
    x = rng.standard_normal((2, 12, 16, 3)).astype(np.float32)
    got = np.asarray(adaptive_max_pool2d(jnp.asarray(x), *out))
    want = _from_torch(TF.adaptive_max_pool2d(_torch_img(x), out))
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("r", [2, 4])
def test_pixel_shuffle_matches_torch(rng, r):
    x = rng.standard_normal((2, 5, 6, 8 * r * r)).astype(np.float32)
    got = np.asarray(pixel_shuffle(jnp.asarray(x), r))
    want = _from_torch(TF.pixel_shuffle(_torch_img(x), r))
    np.testing.assert_allclose(got, want, atol=0)
    back = np.asarray(pixel_unshuffle(jnp.asarray(got), r))
    np.testing.assert_allclose(back, x, atol=0)


@pytest.mark.parametrize("scale", [0.25, 0.5, 2.0])
def test_imresize_matches_reference_matlab(rng, scale):
    spec = importlib.util.spec_from_file_location(
        "ref_imresize", "/root/reference/utils/image_resize.py"
    )
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    x = rng.random((32, 40, 3)).astype(np.float64)
    got = np.asarray(imresize_matlab(jnp.asarray(x.astype(np.float32)), scale))
    want = ref.imresize_np(x, scale, antialiasing=True)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
