"""Normalization layers with torch-matching numerics."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


def _dot_ones(v):
    """Row sums over the trailing (lane) dim on the MXU, f32 accumulation."""
    ones = jnp.ones((v.shape[-1], 1), v.dtype)
    return jax.lax.dot_general(
        v, ones, (((v.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[..., 0]


# trace-time override of the bf16 norm lowering: None = auto (fused Pallas
# kernel on the TPU backend, MXU-moment XLA elsewhere), or force
# 'xla' | 'pallas' | 'interpret' (CPU equivalence tests).
_NORM_IMPL: Optional[str] = None


def set_norm_impl(impl: Optional[str]) -> Optional[str]:
    """Override the bf16 norm lowering in subsequently traced models.
    Returns the previous setting."""
    global _NORM_IMPL
    prev = _NORM_IMPL
    _NORM_IMPL = impl
    return prev


def _use_fused(dim: int) -> Optional[bool]:
    """None -> XLA path; True/False -> fused kernel (interpret?)."""
    impl = _NORM_IMPL
    if impl == "xla":
        return None
    if impl == "pallas":
        return False
    if impl == "interpret":
        return True
    # auto: XLA.  The fused kernel wins big in ISOLATION (measured on-chip
    # at the model shapes, tools/exp_layernorm.py: C=224 LN 15.4 -> 8.7 ms)
    # but is a net LOSS in the full model: bench 15.68 -> 15.50 f/s with a
    # global swap and 15.44 gated to C>=224 -- at 100% device busy the
    # convert/reduce fusions co-run with async weight prefetches, and the
    # custom-call boundaries break neighbor fusions (+copy_bitcast/+add in
    # the trace diff) by more than the reduce time saved (NOTES_ROUND4).
    # Kept as an explicit opt-in for shapes/configs where the balance
    # differs.
    return None


class TorchLayerNorm(nn.Module):
    """LayerNorm over the trailing dim, torch defaults (eps=1e-5, affine).

    For bf16 inputs the norm runs as ONE fused Pallas pass on TPU
    (ops/fused_norm: read + moments + normalize + affine + write; XLA's
    lowering of the same graph costs ~15x the HBM floor in convert/reduce
    fusions -- NOTES_ROUND4 trace) and as MXU dot-against-ones moments
    elsewhere.  Both compute f32 one-pass moments (E[x^2] - mean^2, exact
    to well below bf16 output rounding -- tools/exp_layernorm.py).  f32
    inputs keep the exact two-pass reference path so golden tests are
    bit-stable.
    """

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        if x.dtype == jnp.bfloat16:
            fused = _use_fused(self.dim)
            if fused is not None:
                from vmg_tpu.ops.fused_norm import fused_norm
                return fused_norm(x, scale, bias, eps=self.eps,
                                  interpret=fused)
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
            fused = _use_fused(self.dim)
            if fused is not None:
                from vmg_tpu.ops.fused_norm import fused_norm
                return fused_norm(x, scale, None, eps=self.eps, rms=True,
                                  interpret=fused)
            ms = _dot_ones(x * x) * (1.0 / self.dim)
            y = x.astype(jnp.float32) * jax.lax.rsqrt(ms + self.eps)[..., None]
        else:
            xf = x.astype(jnp.float32)
            y = xf / jnp.sqrt((xf * xf).mean(axis=-1, keepdims=True) + self.eps)
        return (y * scale).astype(x.dtype)
