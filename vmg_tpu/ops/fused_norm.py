"""Fused single-pass Pallas LayerNorm / RMSNorm over the trailing (lane)
dim.

The serving trace (round-3 final; see NOTES_ROUND4) shows every
trailing-dim norm on a bf16 activation lowering to a ``convert_reduce``
VPU fusion at ~2.6 ms per 66 MB stage-1 activation plus f32 normalize
chains -- ~15x the HBM floor.  The MXU dot-against-ones moments
(models/norms.py) recovered part of it, but XLA still materializes the
f32 intermediate chains and schedules the lane reductions as separate
fusions (the ``convert_reduce_fusion`` bucket is 66 ms of the 1009 ms
serving timeline).

This kernel does the whole norm in ONE pass over one VMEM-resident row
block: read (RB, C) bf16, compute f32 sum / sum-of-squares per row with
lane masking (C need not be a multiple of 128), normalize, apply
scale/bias, write bf16.  Traffic is exactly read + write.

Numerics: moments accumulate in f32 with a one-pass variance
(E[x^2] - mean^2); at bf16 input precision the cancellation error is
orders below output rounding (measured in tools/exp_layernorm.py -- the
one-pass MXU variant was already output-identical to the two-pass f32
reference).  The op carries a custom VJP whose backward recomputes the
moments with the XLA formulation (exact same math), so the kernel is
safe under jax.grad / nn.remat.

Reference capability: torch ``nn.LayerNorm`` semantics as used by the
reference TABs (models/function.py Enhanced_MorphFCs / Mlp blocks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LANE = 128


def _row_block(n_rows: int, c: int) -> int:
    """Largest row-block from a fixed candidate list that divides n_rows
    and keeps the f32 working set comfortably inside scoped VMEM."""
    budget = 4 * 1024 * 1024  # bytes of f32 temporaries we allow per block
    for rb in (2048, 1536, 1024, 920, 896, 768, 640, 512, 460, 384, 320,
               256, 230, 184, 160, 128, 92, 80, 64, 46, 40, 32, 16, 8):
        if n_rows % rb == 0 and rb * max(c, LANE) * 4 * 3 <= budget:
            return rb
    return 0


def _norm_kernel(x_ref, g_ref, b_ref, o_ref, *, c: int, eps: float,
                 rms: bool):
    x = x_ref[...]
    xf = x.astype(jnp.float32)
    cp = xf.shape[-1]
    if cp != c:
        lane = jax.lax.broadcasted_iota(jnp.int32, xf.shape, xf.ndim - 1)
        xf = jnp.where(lane < c, xf, 0.0)
    inv_c = 1.0 / c
    if rms:
        ms = jnp.sum(xf * xf, axis=-1, keepdims=True) * inv_c
        y = xf * jax.lax.rsqrt(ms + eps)
    else:
        mean = jnp.sum(xf, axis=-1, keepdims=True) * inv_c
        var = jnp.sum(xf * xf, axis=-1, keepdims=True) * inv_c - mean * mean
        y = (xf - mean) * jax.lax.rsqrt(var + eps)
    g = g_ref[...].astype(jnp.float32)
    y = y * g[None, :]
    if b_ref is not None:
        y = y + b_ref[...].astype(jnp.float32)[None, :]
    o_ref[...] = y.astype(o_ref.dtype)


def _norm_xla(x2, g, b, *, c: int, eps: float, rms: bool):
    """The exact same math in XLA (MXU moments) -- backward source and
    fallback when no row block divides the input."""
    ones = jnp.ones((c, 1), x2.dtype)
    dots = lambda v: jax.lax.dot_general(
        v, ones, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    inv_c = 1.0 / c
    xf = x2.astype(jnp.float32)
    if rms:
        ms = dots(x2 * x2) * inv_c
        y = xf * jax.lax.rsqrt(ms + eps)
    else:
        mean = dots(x2) * inv_c
        var = dots(x2 * x2) * inv_c - mean * mean
        y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * g.astype(jnp.float32)[None, :]
    if b is not None:
        y = y + b.astype(jnp.float32)[None, :]
    return y.astype(x2.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _fused_norm2d(x2, g, b, c, eps, rms, interpret):
    return _fused_norm2d_impl(x2, g, b, c, eps, rms, interpret)


def _fused_norm2d_impl(x2, g, b, c, eps, rms, interpret):
    rows = x2.shape[0]
    rb = _row_block(rows, c)
    if rb == 0:
        return _norm_xla(x2, g, b, c=c, eps=eps, rms=rms)
    kernel = functools.partial(_norm_kernel, c=c, eps=eps, rms=rms)
    in_specs = [
        pl.BlockSpec((rb, x2.shape[1]), lambda i: (i, 0)),
        pl.BlockSpec((x2.shape[1],), lambda i: (0,)),
    ]
    args = [x2, g]
    if b is not None:
        in_specs.append(pl.BlockSpec((x2.shape[1],), lambda i: (0,)))
        args.append(b)
    else:
        kernel = functools.partial(_norm_kernel_nobias, c=c, eps=eps,
                                   rms=rms)
    return pl.pallas_call(
        kernel,
        grid=(rows // rb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rb, x2.shape[1]), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        interpret=interpret,
    )(*args)


def _norm_kernel_nobias(x_ref, g_ref, o_ref, *, c, eps, rms):
    _norm_kernel(x_ref, g_ref, None, o_ref, c=c, eps=eps, rms=rms)


def _fused_norm2d_fwd(x2, g, b, c, eps, rms, interpret):
    return _fused_norm2d_impl(x2, g, b, c, eps, rms, interpret), (x2, g, b)


def _fused_norm2d_bwd(c, eps, rms, interpret, res, dy):
    x2, g, b = res
    if b is None:
        f = lambda xx, gg: _norm_xla(xx, gg, None, c=c, eps=eps, rms=rms)
        _, vjp = jax.vjp(f, x2, g)
        dx, dg = vjp(dy)
        return dx, dg, None
    f = lambda xx, gg, bb: _norm_xla(xx, gg, bb, c=c, eps=eps, rms=rms)
    _, vjp = jax.vjp(f, x2, g, b)
    return vjp(dy)


_fused_norm2d.defvjp(_fused_norm2d_fwd, _fused_norm2d_bwd)


def fused_norm(x, scale, bias=None, *, eps: float, rms: bool = False,
               interpret: bool = False):
    """Normalize ``x`` over its trailing dim with the fused kernel.

    x: (..., C) bf16 (any leading shape); scale/bias: (C,).  Returns the
    same shape/dtype.  Falls back to the XLA MXU-moment formulation when
    no supported row block divides the flattened leading size.
    """
    c = x.shape[-1]
    x2 = x.reshape(-1, c)
    y = _fused_norm2d(x2, scale, bias, c, eps, rms, interpret)
    return y.reshape(x.shape)
