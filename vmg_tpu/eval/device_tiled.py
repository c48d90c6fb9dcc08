"""On-device spatial tiled inference.

The reference's tiled eval (``Tester.test_image:108-143``) loops tiles in
Python: one CUDA call + host transfer per tile.  Here the whole tile loop
runs inside ONE jitted call: a ``lax.scan`` over static tile positions
dynamic-slices the LR patch, applies the model, trims the overlap borders
(the reference's SR-space ``ov // 2`` trim, reproduced exactly), and
accumulates output and weight masks with dynamic-update-slices -- no
host round-trips, one compile for all tiles.

Semantics match ``SlidingEvaluator.test_image`` bit-for-near (same
accumulation order: h-major, then w).
"""

from __future__ import annotations

from typing import Callable, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _starts(full: int, win: int, stride: int):
    return list(range(0, full - win, stride)) + [max(0, full - win)]


def make_device_tiled_forward(
    apply_fn: Callable,
    scale: int,
    wins: Tuple[int, int],
    overlap: int,
    image_hw: Tuple[int, int],
):
    """Returns jitted (params, x) -> (B, T, sH, sW, C) for fixed LR size
    ``image_hw``.  ``apply_fn(params, patch)`` is the model forward on an
    LR patch of ``wins``."""
    win_h, win_w = wins
    H, W = image_hw
    ov = overlap
    s = scale
    h_list = _starts(H, win_h, win_h - ov)
    w_list = _starts(W, win_w, win_w - ov)
    positions = np.asarray(
        [(h, w) for h in h_list for w in w_list], np.int32
    )
    h_last, w_last = h_list[-1], w_list[-1]

    @jax.jit
    def run(params, x):
        B, T, _, _, C = x.shape
        E = jnp.zeros((B, T, H * s, W * s, C), jnp.float32)
        Wacc = jnp.zeros_like(E)

        def body(carry, pos):
            E, Wa = carry
            hy, wx = pos[0], pos[1]
            patch = jax.lax.dynamic_slice(
                x, (0, 0, hy, wx, 0), (B, T, win_h, win_w, C))
            out = apply_fn(params, patch).astype(jnp.float32)
            mask = jnp.ones_like(out)
            # border trims (reference Tester.py:128-139): zero ov//2 SR
            # pixels on sides that have a neighbouring tile
            tt = ov // 2
            if tt > 0:
                rows = jnp.arange(win_h * s)
                cols = jnp.arange(win_w * s)
                keep_r = jnp.ones((win_h * s,), bool)
                keep_r &= jnp.where(hy < h_last, rows < win_h * s - tt, True)
                keep_r &= jnp.where(hy > h_list[0], rows >= tt, True)
                keep_c = jnp.ones((win_w * s,), bool)
                keep_c &= jnp.where(wx < w_last, cols < win_w * s - tt, True)
                keep_c &= jnp.where(wx > w_list[0], cols >= tt, True)
                keep = keep_r[:, None] & keep_c[None, :]
                out = jnp.where(keep[None, None, :, :, None], out, 0.0)
                mask = jnp.where(keep[None, None, :, :, None], mask, 0.0)
            idx = (0, 0, hy * s, wx * s, 0)
            cur_E = jax.lax.dynamic_slice(
                E, idx, (B, T, win_h * s, win_w * s, C))
            cur_W = jax.lax.dynamic_slice(
                Wa, idx, (B, T, win_h * s, win_w * s, C))
            E = jax.lax.dynamic_update_slice(E, cur_E + out, idx)
            Wa = jax.lax.dynamic_update_slice(Wa, cur_W + mask, idx)
            return (E, Wa), None

        (E, Wacc), _ = jax.lax.scan(body, (E, Wacc), jnp.asarray(positions))
        return E / Wacc

    return run
