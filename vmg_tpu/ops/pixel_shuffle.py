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
