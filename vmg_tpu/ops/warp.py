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

# Bilinear sampling of narrow-channel images (SPyNet warps 3-channel f32
# frames: 12-byte gather rows) is gather-granularity-bound on TPU -- the
# xplane trace showed the 4 per-tap gathers of the SPyNet pyramid warps
# running at ~3.5 GB/s (NOTES_ROUND4).  Below this row-byte threshold the
# bilinear path packs all 4 neighbor taps as channels of one zero-padded
# image and issues ONE gather with 4x wider rows (identical tap values,
# weights, and summation order -- see _bilinear_packed4).
_PACK4_MAX_ROW_BYTES = 64


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

    if C * img.dtype.itemsize <= _PACK4_MAX_ROW_BYTES:
        return _bilinear_packed4(img, fx, fy, padding_mode)

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


def _bilinear_packed4(img, fx, fy, padding_mode):
    """Bilinear sampling via ONE gather of all 4 taps.

    ``P[a, b] = (imgp[a, b], imgp[a, b+1], imgp[a+1, b], imgp[a+1, b+1])``
    on the 1-pixel zero-padded image, so the single gather at
    ``(y0+1, x0+1)`` fetches the whole 2x2 neighborhood as one
    4C-channel row.  Any tap with nonzero weight implies
    ``y0 in [-1, H-1]`` and ``x0 in [-1, W-1]`` (in 'zeros' mode weights
    outside that are masked to 0 exactly as in the per-tap path; in
    'border' mode the coords are pre-clipped), so the clipped gather
    index is exact wherever the weight is nonzero.  Tap values, weights,
    and the left-to-right summation order match the per-tap path
    bit-for-bit."""
    N, H, W, C = img.shape
    imgp = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)))
    packed = jnp.concatenate(
        [imgp[:, :-1, :-1], imgp[:, :-1, 1:],
         imgp[:, 1:, :-1], imgp[:, 1:, 1:]], axis=-1)  # (N, H+1, W+1, 4C)

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx1 = fx - x0
    wy1 = fy - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    # per-tap weights in the same order the packed channels hold the taps
    weights = [wx0 * wy0, wx1 * wy0, wx0 * wy1, wx1 * wy1]
    if padding_mode == "zeros":
        coords = [(x0, y0), (x0 + 1.0, y0), (x0, y0 + 1.0),
                  (x0 + 1.0, y0 + 1.0)]
        weights = [
            jnp.where((xc >= 0) & (xc <= W - 1) & (yc >= 0) & (yc <= H - 1),
                      w, 0.0)
            for (xc, yc), w in zip(coords, weights)
        ]

    b = jnp.clip(x0, -1, W - 1).astype(jnp.int32) + 1  # = clip(x0+1, 0, W)
    a = jnp.clip(y0, -1, H - 1).astype(jnp.int32) + 1
    v = _gather_2d(packed, b, a).astype(jnp.float32)  # (N, Ho, Wo, 4C)
    out = (
        v[..., 0 * C:1 * C] * weights[0][..., None]
        + v[..., 1 * C:2 * C] * weights[1][..., None]
        + v[..., 2 * C:3 * C] * weights[2][..., None]
        + v[..., 3 * C:4 * C] * weights[3][..., None]
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
