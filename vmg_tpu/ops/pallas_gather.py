"""Pallas TPU row-gather kernel.

``gather_rows(x, idx)``: out[n, p, :] = x[n, idx[n, p], :] -- the primitive
under nearest-neighbor warping and LTAM location resampling.

Measured on v5e (16 images of 16384x128 f32): XLA's gather runs ~25-30 GB/s
(far off the ~800 GB/s HBM roofline -- TPUs have no vectorized arbitrary
gather); this kernel reaches ~36 GB/s by keeping the source image resident
in VMEM (one DMA per image) and streaming output rows with an unrolled
scalar-indexed copy loop, indices served from SMEM.

The ~1.2x win is not yet worth routing the model through (the in-scan
gathers fuse with neighbors under XLA), so this stays opt-in
infrastructure: the path to a real speedup is a vectorized in-register
shuffle (tpu.dynamic_gather is currently limited to one vreg along the
gather dim) or SparseCore offload.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUB, _BLOCK, _UNROLL = 8, 512, 8


def _kernel(idx_ref, x_hbm, out_ref, x_vmem, sem):
    n = pl.program_id(0)
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _():
        cp = pltpu.make_async_copy(x_hbm.at[n], x_vmem, sem)
        cp.start()
        cp.wait()

    def body(i, _):
        j = i // (_BLOCK // _UNROLL)
        k = (i % (_BLOCK // _UNROLL)) * _UNROLL
        base = j * _BLOCK + k
        for u in range(_UNROLL):
            out_ref[0, base + u, :] = x_vmem[idx_ref[0, j, k + u], :]
        return ()

    jax.lax.fori_loop(0, _SUB * (_BLOCK // _UNROLL), body, ())


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows(x: jnp.ndarray, idx: jnp.ndarray,
                interpret: bool = False) -> jnp.ndarray:
    """x: (N, R, C), idx: (N, R) int32 in [0, R) -> (N, R, C).

    Requires R % 4096 == 0 and C % 128 == 0 (pad the lane dim if needed);
    source image (R, C) f32 must fit VMEM (R*C <= ~3M elements).
    """
    N, R, C = x.shape
    if R % (_SUB * _BLOCK) != 0 or C % 128 != 0:
        raise ValueError(f"gather_rows needs R % {_SUB*_BLOCK} == 0 and "
                         f"C % 128 == 0, got {(R, C)}")
    idx3 = idx.reshape(N, R // _BLOCK, _BLOCK)
    return pl.pallas_call(
        _kernel,
        grid=(N, R // (_SUB * _BLOCK)),
        in_specs=[
            pl.BlockSpec((1, _SUB, _BLOCK), lambda n, b: (n, b, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, _SUB * _BLOCK, C), lambda n, b: (n, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, R, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((R, C), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(idx3, x)
