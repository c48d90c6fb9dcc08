#!/usr/bin/env python
"""On-chip experiment: x4 bilinear residual upsample variants at the
serving shape.  The trace (NOTES_ROUND4, 15.67 f/s state) shows the
conv_last+residual-add fusion at 12 ms reading the W-resized tensor
through a strided transpose at ~39 GB/s.  Candidates:

  current : resize_bilinear (explicit flatten/transpose matmul form)
  einsum  : contractions on native axes, layouts left to XLA
  phase   : per-phase 2-tap blends at LR + depth-to-space interleave

Each variant is measured fused with a stand-in conv_last consumer
(bf16 HR tensor + add -> f32 out) to capture the layout interaction.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    from vmg_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vmg_tpu.ops.resize import _linear_weights, resize_bilinear
    from vmg_tpu.utils.profiling import timed

    B, T, H, W, C = 1, 16, 180, 320, 3
    S = 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, T, H, W, C), dtype=np.float32))
    hr = jnp.asarray(rng.random((B, T, H * S, W * S, C), dtype=np.float32),
                     jnp.bfloat16)

    wh = jnp.asarray(_linear_weights(H, H * S, False))
    ww = jnp.asarray(_linear_weights(W, W * S, False))

    def v_current(x, hr):
        return resize_bilinear(x, H * S, W * S) + hr.astype(jnp.float32)

    def v_einsum(x, hr):
        y = jnp.einsum("oh,bthwc->btowc", wh, x,
                       preferred_element_type=jnp.float32)
        y = jnp.einsum("pw,btowc->btopc", ww, y,
                       preferred_element_type=jnp.float32)
        return y + hr.astype(jnp.float32)

    # phase form: out[4i+p] touches x[i+o] and x[i+o+1] with fixed weights
    def _phases(w_mat, n_in):
        # rows 4k+p of w_mat have two taps at columns k+off[p], k+off[p]+1
        w = np.asarray(w_mat)
        offs, w0s, w1s = [], [], []
        for p in range(S):
            row = w[S * 16 + p]  # away from the clamped boundary
            cols = np.nonzero(row)[0]
            offs.append(int(cols[0]) - 16)
            w0s.append(float(row[cols[0]]))
            w1s.append(float(row[cols[-1]]) if len(cols) > 1 else 0.0)
        return offs, w0s, w1s

    oh, h0, h1 = _phases(wh, H)
    ow_, w0, w1 = _phases(ww, W)

    def _axis_phase(x, axis, offs, a, b, n):
        # returns stacked phases along a new trailing-phase axis
        pads = [(0, 0)] * x.ndim
        pads[axis] = (1, 1)
        xp = jnp.pad(x, pads, mode="edge")
        outs = []
        for p in range(S):
            lo = 1 + offs[p]
            sl0 = jax.lax.slice_in_dim(xp, lo, lo + n, axis=axis)
            sl1 = jax.lax.slice_in_dim(xp, lo + 1, lo + 1 + n, axis=axis)
            outs.append(a[p] * sl0 + b[p] * sl1)
        return jnp.stack(outs, axis=axis + 1)  # (..., n, S, ...)

    def v_phase(x, hr):
        y = _axis_phase(x, 2, oh, h0, h1, H)      # (B,T,H,S,W,C)
        y = _axis_phase(y, 4, ow_, w0, w1, W)     # (B,T,H,S,W,S,C)
        y = y.reshape(B, T, H * S, W * S, C)
        return y + hr.astype(jnp.float32)

    ref = None
    for name, fn in [("current", v_current), ("einsum", v_einsum),
                     ("phase", v_phase)]:
        f = jax.jit(fn)
        y = np.asarray(f(x, hr))
        if ref is None:
            ref = y
        # interior-only compare for the phase form (boundary clamp differs)
        d = np.abs(y - ref)[:, :, 8:-8, 8:-8]
        ms = timed(f, x, hr) * 1e3
        print(f"{name:8s} {ms:7.3f} ms   interior max|dy| = {d.max():.3e}")


if __name__ == "__main__":
    main()
