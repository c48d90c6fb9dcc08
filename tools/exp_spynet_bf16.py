#!/usr/bin/env python
"""On-chip experiment: SPyNet serving fast-math (bf16 basic-module convs).

Measures (a) wall time of a 15-pair SPyNet call at the bench protocol
size, exact-f32 vs fast mode, and (b) the flow delta between the two on
smooth synthetic frames with known sub-pixel motion (the realistic use:
flows feed warp coordinates, so the delta is reported in PIXELS).
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def make_frames(n, h, w, rng):
    """Smooth random images translated by ~1.7 px (bilinear shift)."""
    import numpy as np

    base = rng.standard_normal((n, h // 8 + 2, w // 8 + 2, 3)).astype(np.float32)
    img = np.kron(base, np.ones((1, 8, 8, 1), np.float32))[:, : h + 8, : w + 8]
    a = img[:, 2: 2 + h, 3: 3 + w]
    # shift by (1.5, 0.75): bilinear mix
    b = (0.5 * img[:, 3: 3 + h, 3: 3 + w] + 0.5 * img[:, 4: 4 + h, 3: 3 + w])
    b = 0.75 * b + 0.25 * np.roll(b, -1, axis=2)
    norm = lambda v: (v - v.min()) / max(v.max() - v.min(), 1e-6)
    return norm(a), norm(b)


def main():
    from vmg_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vmg_tpu.models.spynet import SPyNet, set_fast_flow
    from vmg_tpu.utils.profiling import timed

    N, H, W = 15, 180, 320
    rng = np.random.default_rng(0)
    a, b = make_frames(N, H, W, rng)
    a, b = jnp.asarray(a), jnp.asarray(b)

    spynet = SPyNet()
    params = jax.jit(spynet.init)(jax.random.key(0), a, b)

    set_fast_flow(False)
    f_exact = jax.jit(lambda p, x, y: spynet.apply(p, x, y))
    flow_exact = np.asarray(f_exact(params, a, b))
    ms_exact = timed(f_exact, params, a, b) * 1e3

    set_fast_flow(True)
    try:
        f_fast = jax.jit(lambda p, x, y: spynet.apply(p, x, y))
        flow_fast = np.asarray(f_fast(params, a, b))
        ms_fast = timed(f_fast, params, a, b) * 1e3
    finally:
        set_fast_flow(False)

    d = np.abs(flow_fast - flow_exact)
    print(f"exact: {ms_exact:7.2f} ms   fast: {ms_fast:7.2f} ms")
    print(f"flow delta px: max {d.max():.4f}  mean {d.mean():.5f}  "
          f"p99 {np.percentile(d, 99):.4f}")
    print(f"exact flow magnitude: mean {np.abs(flow_exact).mean():.3f}  "
          f"max {np.abs(flow_exact).max():.3f}")


if __name__ == "__main__":
    main()
