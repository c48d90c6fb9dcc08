"""Deformable conv identities + retention decay closed-form checks."""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF
import jax.numpy as jnp

from vmg_tpu.ops.deform import modulated_deform_conv2d
from vmg_tpu.ops.decay import morphfc_decay_matrix, ltam_temporal_decay


def _run_dcn(x, offset, mask, weight, bias):
    return np.asarray(
        modulated_deform_conv2d(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), jnp.asarray(bias),
        )
    )


def test_deform_conv_zero_offset_equals_conv(rng):
    """mask=1, offset=0 => plain 3x3 conv (torch oracle)."""
    n, h, w, cin, cout, g = 2, 10, 12, 8, 6, 4
    x = rng.standard_normal((n, h, w, cin)).astype(np.float32)
    wt = rng.standard_normal((cout, cin, 3, 3)).astype(np.float32) * 0.2
    b = rng.standard_normal((cout,)).astype(np.float32)
    offset = np.zeros((n, h, w, g, 9, 2), np.float32)
    mask = np.ones((n, h, w, g, 9), np.float32)
    # our weight layout: (K, Cin, Cout), tap k = kh*3+kw
    w_ours = wt.transpose(2, 3, 1, 0).reshape(9, cin, cout)

    got = _run_dcn(x, offset, mask, w_ours, b)
    want = (
        TF.conv2d(torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(wt),
                  torch.from_numpy(b), padding=1)
        .permute(0, 2, 3, 1).numpy()
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_deform_conv_integer_offset_shifts_taps(rng):
    """Integer offset (dy=0, dx=1) on every tap == conv over x shifted left."""
    n, h, w, cin, cout, g = 1, 8, 9, 4, 4, 2
    x = rng.standard_normal((n, h, w, cin)).astype(np.float32)
    wt = rng.standard_normal((cout, cin, 3, 3)).astype(np.float32) * 0.2
    b = np.zeros((cout,), np.float32)
    offset = np.zeros((n, h, w, g, 9, 2), np.float32)
    offset[..., 1] = 1.0  # dx = +1
    mask = np.ones((n, h, w, g, 9), np.float32)
    w_ours = wt.transpose(2, 3, 1, 0).reshape(9, cin, cout)
    got = _run_dcn(x, offset, mask, w_ours, b)

    x_shift = np.zeros_like(x)
    x_shift[:, :, :-1] = x[:, :, 1:]  # sample at x+1 == image shifted left
    want = (
        TF.conv2d(torch.from_numpy(x_shift).permute(0, 3, 1, 2), torch.from_numpy(wt), padding=1)
        .permute(0, 2, 3, 1).numpy()
    )
    # interior only: border taps differ (zero-pad of conv vs shifted content)
    np.testing.assert_allclose(got[:, 1:-1, 1:-2], want[:, 1:-1, 1:-2], atol=2e-4, rtol=1e-4)


def test_deform_conv_mask_scales_taps(rng):
    """mask=0 everywhere => output is just the bias."""
    n, h, w, cin, cout, g = 1, 6, 6, 4, 5, 1
    x = rng.standard_normal((n, h, w, cin)).astype(np.float32)
    wt = rng.standard_normal((9, cin, cout)).astype(np.float32)
    b = rng.standard_normal((cout,)).astype(np.float32)
    got = _run_dcn(x, np.zeros((n, h, w, g, 9, 2), np.float32),
                   np.zeros((n, h, w, g, 9), np.float32), wt, b)
    np.testing.assert_allclose(got, np.broadcast_to(b, got.shape), atol=1e-5)


def test_morphfc_decay_matches_stepwise_construction():
    """Closed form == the reference's roll/stack construction
    (models/function.py:684-733), re-derived step by step in torch."""
    chunk, seg = 4, 3
    # stepwise: decay rates, cumulative powers, toeplitz shifts, mean over q
    decay = 1 - 2.0 ** (-5 - torch.arange(chunk - 1, -1, -1, dtype=torch.float64))
    gamma = decay[:, None] ** torch.arange(1, chunk + 1)[None, :]  # (q, j): decay^ (j+1)
    Ch = chunk * seg
    want = torch.zeros(Ch, Ch, dtype=torch.float64)
    for a in range(Ch):
        for bb in range(Ch):
            jdist = abs(a // seg - bb // seg)
            want[a, bb] = gamma[:, jdist].mean()
    got = np.asarray(morphfc_decay_matrix(chunk, seg))
    np.testing.assert_allclose(got, want.numpy(), atol=1e-6)


def test_ltam_decay_shape_and_monotonic():
    heads, t = 4, 5
    d = np.asarray(ltam_temporal_decay(heads, t))
    assert d.shape == (heads, t)
    # older keyframes decay more
    assert np.all(np.diff(d, axis=1) > 0)
    # newest slot = decay_v ** 1
    decay_v = 1 - 2.0 ** (-5 - np.arange(heads - 1, -1, -1))
    np.testing.assert_allclose(d[:, -1], decay_v, atol=1e-7)


def test_grouped_conv_equals_feature_group_count(rng):
    """GroupedConv3x3 (the TPU grouped-conv workaround) == nn.Conv with
    feature_group_count, same params."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from vmg_tpu.models.blocks import GroupedConv3x3

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
    mine = GroupedConv3x3(32, 4)
    params = mine.init(jax.random.key(0), x)
    ref = nn.Conv(32, (3, 3), padding=1, feature_group_count=4)
    got = mine.apply(params, x)
    want = ref.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
