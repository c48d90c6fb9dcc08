"""Training losses (reference ``utils/loss.py``).

Charbonnier with eps inside the sqrt (mean form) plus the optional
Laplacian-edge auxiliary term: gaussian-blur (k=5), decimate, zero-stuffed
x4 re-upsample, blur again, difference -- Charbonnier on the difference,
averaged over frames (reference ``utils/loss.py:45-81``).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_EDGE_K = np.asarray([0.05, 0.25, 0.4, 0.25, 0.05], np.float32)
_EDGE_KERNEL = np.outer(_EDGE_K, _EDGE_K)  # (5, 5)


def charbonnier_loss(x, y, eps: float = 1e-12):
    diff = x.astype(jnp.float32) - y.astype(jnp.float32)
    return jnp.mean(jnp.sqrt(diff * diff + eps))


def _gauss_blur(img):
    """Depthwise 5x5 gaussian with replicate padding; img: (N, H, W, C)."""
    N, H, W, C = img.shape
    k = jnp.asarray(_EDGE_KERNEL).reshape(5, 5, 1, 1)
    k = jnp.tile(k, (1, 1, 1, C))  # HWIO depthwise
    padded = jnp.pad(img, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="edge")
    return jax.lax.conv_general_dilated(
        padded, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def _laplacian(img):
    filtered = _gauss_blur(img)
    down = filtered[:, ::2, ::2]
    up = jnp.zeros_like(filtered)
    up = up.at[:, ::2, ::2].set(down * 4.0)
    return img - _gauss_blur(up)


def edge_loss(x, y, eps: float = 1e-12):
    """x, y: (B, T, H, W, C); per-frame Laplacian Charbonnier, mean over T."""
    B, T, H, W, C = x.shape
    lx = _laplacian(x.astype(jnp.float32).reshape(B * T, H, W, C))
    ly = _laplacian(y.astype(jnp.float32).reshape(B * T, H, W, C))
    lx = lx.reshape(B, T, H, W, C)
    ly = ly.reshape(B, T, H, W, C)
    per_frame = jnp.mean(
        jnp.sqrt((lx - ly) ** 2 + eps), axis=(0, 2, 3, 4)
    )  # (T,)
    return jnp.mean(per_frame)


def total_loss(pred, target, eps: float = 1e-12, if_aux: bool = True,
               aux_ratio: float = 0.005):
    loss = charbonnier_loss(pred, target, eps)
    if if_aux:
        loss = loss + aux_ratio * edge_loss(pred, target, eps)
    return loss
