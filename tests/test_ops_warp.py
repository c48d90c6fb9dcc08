"""grid_sample / flow_warp parity vs torch (the CUDA kernels the reference
relies on -- reference models/vmg.py:679, models/trajectory.py:110,566)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF
import jax.numpy as jnp

from vmg_tpu.ops.warp import grid_sample, flow_warp


def _rand_grid(rng, n, h, w, margin=1.3):
    return (rng.random((n, h, w, 2), dtype=np.float64) * 2 - 1) * margin


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("padding", ["zeros", "border"])
def test_grid_sample_matches_torch(rng, mode, padding):
    n, h, w, c = 2, 9, 13, 5
    x = rng.standard_normal((n, h, w, c)).astype(np.float32)
    grid = _rand_grid(rng, n, 7, 11).astype(np.float32)

    got = np.asarray(grid_sample(jnp.asarray(x), jnp.asarray(grid), mode, padding))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = TF.grid_sample(
        xt, torch.from_numpy(grid), mode=mode, padding_mode=padding, align_corners=True
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("interp,pad", [("bilinear", "border"), ("nearest", "border"), ("bilinear", "zeros")])
def test_flow_warp_matches_torch(rng, interp, pad):
    n, h, w, c = 2, 12, 10, 4
    x = rng.standard_normal((n, h, w, c)).astype(np.float32)
    flow = (rng.standard_normal((n, h, w, 2)) * 3).astype(np.float32)

    got = np.asarray(flow_warp(jnp.asarray(x), jnp.asarray(flow), interp, pad))

    # torch oracle: identical convention to reference flow_warp
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    gy, gx = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    grid = torch.stack((gx, gy), 2).float()[None] + torch.from_numpy(flow)
    gxn = 2.0 * grid[..., 0] / max(w - 1, 1) - 1.0
    gyn = 2.0 * grid[..., 1] / max(h - 1, 1) - 1.0
    want = TF.grid_sample(
        xt,
        torch.stack((gxn, gyn), dim=3),
        mode=interp,
        padding_mode=pad,
        align_corners=True,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("padding", ["zeros", "border"])
def test_bilinear_packed4_equals_per_tap(rng, padding, monkeypatch):
    """The packed single-gather bilinear path (used below the row-byte
    threshold, e.g. the SPyNet 3-channel pyramid warps) must match the
    per-tap 4-gather path bit-for-bit: identical tap values, weights,
    and summation order."""
    import vmg_tpu.ops.warp as warp_mod

    n, h, w, c = 2, 11, 14, 6
    x = rng.standard_normal((n, h, w, c)).astype(np.float32)
    grid = _rand_grid(rng, n, 9, 12).astype(np.float32)

    monkeypatch.setattr(warp_mod, "_PACK4_MAX_ROW_BYTES", 10 ** 9)
    packed = np.asarray(
        warp_mod.grid_sample.__wrapped__(jnp.asarray(x), jnp.asarray(grid),
                                         "bilinear", padding))
    monkeypatch.setattr(warp_mod, "_PACK4_MAX_ROW_BYTES", 0)
    per_tap = np.asarray(
        warp_mod.grid_sample.__wrapped__(jnp.asarray(x), jnp.asarray(grid),
                                         "bilinear", padding))
    np.testing.assert_array_equal(packed, per_tap)


def test_flow_warp_zero_flow_identity(rng):
    x = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
    out = np.asarray(flow_warp(jnp.asarray(x), jnp.zeros((1, 8, 8, 2), np.float32)))
    np.testing.assert_allclose(out, x, atol=1e-6)
