"""Backward warping / grid sampling for TPU.

XLA has no native grid_sample; we build it from gathers, which XLA lowers to
efficient dynamic-gather HLO.  Everything here is channels-last (NHWC) --
the layout the rest of the framework uses on TPU.

Semantics match ``torch.nn.functional.grid_sample`` with
``align_corners=True`` (the only setting the reference uses; see
reference ``models/vmg.py:640-685`` flow_warp and
``models/trajectory.py:566-581`` LTAM resampling):

  * grid values in [-1, 1] map to pixel coords ``(g + 1) / 2 * (size - 1)``
  * ``padding_mode='zeros'``: out-of-bounds taps contribute 0
  * ``padding_mode='border'``: coords clamp to the valid range
  * ``mode='nearest'`` rounds half-to-even (torch uses nearbyint)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _gather_2d(img: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray) -> jnp.ndarray:
    """Gather pixels at integer coords.

    img: (N, H, W, C); ix/iy: (N, Ho, Wo) int32 (already clipped in-range).
    Returns (N, Ho, Wo, C).
    """
    N, H, W, C = img.shape
    flat = img.reshape(N, H * W, C)
    idx = iy * W + ix  # (N, Ho, Wo)
    n, ho, wo = idx.shape
    out = jnp.take_along_axis(flat, idx.reshape(N, ho * wo, 1), axis=1)
    return out.reshape(N, ho, wo, C)


@functools.partial(jax.jit, static_argnames=("mode", "padding_mode"))
def grid_sample(
    img: jnp.ndarray,
    grid: jnp.ndarray,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Sample ``img`` (N,H,W,C) at normalized ``grid`` (N,Ho,Wo,2), xy order.

    align_corners=True semantics throughout (the reference never uses False
    for sampling).  Returns (N,Ho,Wo,C) in img.dtype.
    """
    if mode not in ("bilinear", "nearest"):
        raise ValueError(f"unsupported mode {mode!r}")
    if padding_mode not in ("zeros", "border"):
        raise ValueError(f"unsupported padding_mode {padding_mode!r}")

    N, H, W, C = img.shape
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    # unnormalize (align_corners=True)
    fx = (gx + 1.0) * 0.5 * (W - 1)
    fy = (gy + 1.0) * 0.5 * (H - 1)

    if mode == "nearest":
        # torch uses nearbyint = round half to even, same as jnp.round.
        rx = jnp.round(fx)
        ry = jnp.round(fy)
        if padding_mode == "zeros":
            valid = (rx >= 0) & (rx <= W - 1) & (ry >= 0) & (ry <= H - 1)
            ix = jnp.clip(rx, 0, W - 1).astype(jnp.int32)
            iy = jnp.clip(ry, 0, H - 1).astype(jnp.int32)
            out = _gather_2d(img, ix, iy)
            return jnp.where(valid[..., None], out, jnp.zeros((), img.dtype))
        ix = jnp.clip(rx, 0, W - 1).astype(jnp.int32)
        iy = jnp.clip(ry, 0, H - 1).astype(jnp.int32)
        return _gather_2d(img, ix, iy)

    # bilinear
    if padding_mode == "border":
        fx = jnp.clip(fx, 0.0, W - 1)
        fy = jnp.clip(fy, 0.0, H - 1)

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    x1 = x0 + 1.0
    y1 = y0 + 1.0
    wx1 = fx - x0
    wy1 = fy - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def tap(xc, yc, w):
        if padding_mode == "zeros":
            valid = (xc >= 0) & (xc <= W - 1) & (yc >= 0) & (yc <= H - 1)
            w = jnp.where(valid, w, 0.0)
        ix = jnp.clip(xc, 0, W - 1).astype(jnp.int32)
        iy = jnp.clip(yc, 0, H - 1).astype(jnp.int32)
        v = _gather_2d(img, ix, iy).astype(jnp.float32)
        return v * w[..., None]

    out = (
        tap(x0, y0, wx0 * wy0)
        + tap(x1, y0, wx1 * wy0)
        + tap(x0, y1, wx0 * wy1)
        + tap(x1, y1, wx1 * wy1)
    )
    return out.astype(img.dtype)


def flow_warp(
    x: jnp.ndarray,
    flow: jnp.ndarray,
    interpolation: str = "bilinear",
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Warp ``x`` (N,H,W,C) backward along ``flow`` (N,H,W,2).

    flow[..., 0] is the x (width) offset in pixels, flow[..., 1] the y
    offset -- unnormalized, identical convention to the reference
    ``flow_warp`` (reference ``models/vmg.py:640``).
    """
    N, H, W, C = x.shape
    if flow.shape[1] != H or flow.shape[2] != W:
        raise ValueError(f"flow spatial {flow.shape[1:3]} != input {x.shape[1:3]}")
    gy, gx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij"
    )
    fx = gx[None] + flow[..., 0].astype(jnp.float32)
    fy = gy[None] + flow[..., 1].astype(jnp.float32)
    nx = 2.0 * fx / max(W - 1, 1) - 1.0
    ny = 2.0 * fy / max(H - 1, 1) - 1.0
    grid = jnp.stack([nx, ny], axis=-1)
    return grid_sample(x, grid, mode=interpolation, padding_mode=padding_mode)
