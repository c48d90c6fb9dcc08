"""Normalization layers with torch-matching numerics."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


def _dot_ones(v):
    """Row sums over the trailing (lane) dim on the MXU, f32 accumulation."""
    ones = jnp.ones((v.shape[-1], 1), v.dtype)
    return jax.lax.dot_general(
        v, ones, (((v.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[..., 0]


class TorchLayerNorm(nn.Module):
    """LayerNorm over the trailing dim, torch defaults (eps=1e-5, affine).

    For bf16 inputs the moments are computed with MXU dot products against
    a ones vector (one-pass var = E[x^2] - mean^2, f32 accumulation)
    instead of XLA's VPU lane-reduction lowering, which the serving trace
    put at ~5 ms per 66 MB activation (~15x memory bound, the 90 ms
    ``convert_reduce_fusion`` bucket in NOTES_ROUND4).  At bf16 input
    precision the one-pass variance is exact to well below output
    rounding: quantization alone bounds var/mean^2 >= ~4e-6 while the f32
    cancellation error is ~1e-7 (measured: max output delta vs the f32
    two-pass reference is identical to the two-pass path, = bf16 rounding,
    tools/exp_layernorm.py).  f32 inputs keep the exact reference path so
    golden tests are bit-stable.
    """

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        if x.dtype == jnp.bfloat16:
            inv_c = 1.0 / self.dim
            mean = _dot_ones(x) * inv_c
            var = _dot_ones(x * x) * inv_c - mean * mean
            rstd = jax.lax.rsqrt(var + self.eps)
            y = (x.astype(jnp.float32) - mean[..., None]) * rstd[..., None]
        else:
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
        if x.dtype == jnp.bfloat16:
            ms = _dot_ones(x * x) * (1.0 / self.dim)
            y = x.astype(jnp.float32) * jax.lax.rsqrt(ms + self.eps)[..., None]
        else:
            xf = x.astype(jnp.float32)
            y = xf / jnp.sqrt((xf * xf).mean(axis=-1, keepdims=True) + self.eps)
        return (y * scale).astype(x.dtype)
