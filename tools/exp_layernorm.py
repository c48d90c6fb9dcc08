#!/usr/bin/env python
"""On-chip experiment: LayerNorm-over-lanes variants at the stage-0 TAB
shape.  The serving trace (NOTES_ROUND4) shows each LN fusion at ~5 ms for
a 66 MB activation (~15x memory bound): XLA lowers the trailing-dim (lane)
reduction + f32 convert as a slow VPU loop.  Candidates compute the
moments with MXU dot products against a ones vector instead.

  current : f32 convert, mean/var lane reductions (exact reference path)
  mxu1    : one-pass  mean = x@1/C, var = (x*x)@1/C - mean^2  (bf16 square)
  mxu2    : two-pass  mean = x@1/C, d = x - mean (bf16), var = (d*d)@1/C

Prints wall ms per variant and max |y - y_f32_reference| to judge whether
the bf16 squaring error stays below bf16 output rounding.
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    from vmg_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vmg_tpu.utils.profiling import timed

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="16,184,320,112")
    a = ap.parse_args()
    N, H, W, C = map(int, a.shape.split(","))
    eps = 1e-5
    rng = np.random.default_rng(0)
    # activation-like data: nonzero mean per pixel to exercise cancellation
    xh = (rng.standard_normal((N, H, W, C)).astype(np.float32)
          + 0.5 * rng.standard_normal((N, H, W, 1)).astype(np.float32))
    x = jnp.asarray(xh, jnp.bfloat16)
    g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(C).astype(np.float32))
    b = jnp.asarray(0.1 * rng.standard_normal(C).astype(np.float32))

    def ln_current(x):
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=-1, keepdims=True)
        var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
        y = (xf - mean) / jnp.sqrt(var + eps)
        return (y * g + b).astype(x.dtype)

    def _dot_ones(v):
        ones = jnp.ones((v.shape[-1], 1), v.dtype)
        return jax.lax.dot_general(
            v, ones, (((v.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[..., 0]

    def ln_mxu1(x):
        mean = _dot_ones(x) * (1.0 / C)
        sq = _dot_ones(x * x) * (1.0 / C)
        var = sq - mean * mean
        rstd = jax.lax.rsqrt(var + eps)
        xf = x.astype(jnp.float32)
        y = (xf - mean[..., None]) * rstd[..., None]
        return (y * g + b).astype(x.dtype)

    def ln_mxu2(x):
        mean = _dot_ones(x) * (1.0 / C)
        d = (x.astype(jnp.float32) - mean[..., None]).astype(x.dtype)
        var = _dot_ones(d * d) * (1.0 / C)
        rstd = jax.lax.rsqrt(var + eps)
        y = d.astype(jnp.float32) * rstd[..., None]
        return (y * g + b).astype(x.dtype)

    # f32 reference for accuracy
    ref = np.asarray(jax.jit(ln_current)(jnp.asarray(xh)))

    from vmg_tpu.ops.fused_norm import fused_norm

    def ln_pallas(x):
        return fused_norm(x, g.astype(x.dtype), b.astype(x.dtype), eps=eps)

    for name, fn in [("current", ln_current), ("mxu1", ln_mxu1),
                     ("mxu2", ln_mxu2), ("pallas", ln_pallas)]:
        f = jax.jit(fn)
        y = np.asarray(f(x), np.float32)
        ms = timed(f, x) * 1e3
        print(f"{name:8s} {ms:7.3f} ms   max|dy| vs f32 ref = "
              f"{np.abs(y - ref).max():.3e}")


if __name__ == "__main__":
    main()
