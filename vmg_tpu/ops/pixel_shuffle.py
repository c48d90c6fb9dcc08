"""Pixel shuffle / unshuffle, channels-last, torch channel ordering.

torch ``nn.PixelShuffle(r)`` maps input channel ``c*r^2 + i*r + j`` to output
channel ``c`` at spatial offset ``(i, j)`` (reference recon head,
``models/vmg.py:380,629-630``).  We keep that exact channel ordering so
converted torch checkpoints line up.
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(..., H, W, C*r^2) -> (..., H*r, W*r, C)."""
    *lead, H, W, Cr2 = x.shape
    C = Cr2 // (r * r)
    y = x.reshape(*lead, H, W, C, r, r)
    # (..., H, W, C, i, j) -> (..., H, i, W, j, C)
    nd = len(lead)
    perm = tuple(range(nd)) + (nd, nd + 3, nd + 1, nd + 4, nd + 2)
    y = y.transpose(perm)
    return y.reshape(*lead, H * r, W * r, C)


def conv_pixel_shuffle(x, kernel, bias, r: int,
                       padding: int = 1) -> jnp.ndarray:
    """conv2d (NHWC) followed by PixelShuffle(r), with the channel reorder
    FOLDED INTO THE KERNEL.

    The plain ``pixel_shuffle`` transpose reads channels (c*r^2 + i*r + j)
    with stride r^2 -- a 2-byte-granularity sublane shuffle that shows up
    as copy time in the serving trace (NOTES_ROUND3: recon-head
    pixel-shuffle copies).  Permuting the conv's output channels to
    ((i*r + j)*C + c) costs nothing (a static kernel permute) and turns
    the data movement into a coarse transpose whose inner contiguous run
    is j*C elements.  ``kernel``/``bias`` keep the torch layout
    (out channel = c*r^2 + i*r + j), so converted checkpoints line up.
    """
    import jax

    kh, kw, cin, cr2 = kernel.shape
    C = cr2 // (r * r)
    k = kernel.reshape(kh, kw, cin, C, r, r)
    k = k.transpose(0, 1, 2, 4, 5, 3).reshape(kh, kw, cin, cr2)
    b = bias.reshape(C, r, r).transpose(1, 2, 0).reshape(cr2)
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    N, H, W, _ = y.shape
    y = y.reshape(N, H, W, r, r, C)
    y = y.transpose(0, 1, 3, 2, 4, 5)  # (N, H, i, W, j, C)
    return y.reshape(N, H * r, W * r, C)


def shuffle2_lanes(y: jnp.ndarray) -> jnp.ndarray:
    """PixelShuffle(2) of a ``conv_pixel_shuffle``-ordered tensor
    ((i, j, c) channel blocks) expressed as lane slices: even/odd output
    rows are the first/second half of the lane dim reshaped
    (W, 2C) -> (2W, C), interleaved with one stack.  Bit-identical to the
    transpose form; gives XLA a coarser relayout.

    (A Pallas single-pass form of the same lane-slice math does NOT
    compile on v5e: Mosaic rejects the in-register lane reshape
    (W, 2C) -> (2W, C) as an "unsupported shape cast" -- the relayout has
    to go through XLA either way.)"""
    n, h, w, c4 = y.shape
    c = c4 // 4
    even = y[..., : 2 * c].reshape(n, h, 2 * w, c)
    odd = y[..., 2 * c:].reshape(n, h, 2 * w, c)
    return jnp.stack([even, odd], axis=2).reshape(n, 2 * h, 2 * w, c)


def pixel_unshuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(..., H*r, W*r, C) -> (..., H, W, C*r^2); inverse of pixel_shuffle."""
    *lead, Hr, Wr, C = x.shape
    H, W = Hr // r, Wr // r
    y = x.reshape(*lead, H, r, W, r, C)
    nd = len(lead)
    # (..., H, i, W, j, C) -> (..., H, W, C, i, j)
    perm = tuple(range(nd)) + (nd, nd + 2, nd + 4, nd + 1, nd + 3)
    y = y.transpose(perm)
    return y.reshape(*lead, H, W, C * r * r)
