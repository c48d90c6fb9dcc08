"""Normalization layers with torch-matching numerics."""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn


class TorchLayerNorm(nn.Module):
    """LayerNorm over the trailing dim, torch defaults (eps=1e-5, affine)."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=-1, keepdims=True)
        var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
        y = (xf - mean) / jnp.sqrt(var + self.eps)
        return (y * scale + bias).astype(x.dtype)


class RMSNorm(nn.Module):
    """RMSNorm matching reference ``models/norm_store.py:5`` (eps=1e-6)."""

    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        xf = x.astype(jnp.float32)
        y = xf / jnp.sqrt((xf * xf).mean(axis=-1, keepdims=True) + self.eps)
        return (y * scale).astype(x.dtype)
