#!/usr/bin/env python
"""On-chip experiment: PixelShuffle(2) relayout variants at the recon-head
shapes.  The serving trace (round-3 final) shows the folded-kernel shuffle
still paying an 11.2 ms copy at (16,360,640,256) (~21 GB/s) plus a 5.8 ms
pre-copy -- XLA lowers the (H,2,W,2,C) transpose as a small-granularity
relayout.

Variants (all bit-identical given the conv_pixel_shuffle channel order
(i, j, c)):
  transpose : reshape (H,W,2,2,C) -> transpose -> reshape  (current)
  lanes     : even/odd rows are LANE slices [0:2C], [2C:4C] reshaped
              (W,2C)->(2W,C); rows interleave with one stack
  (a Pallas single-pass lane-slice form was tried and REMOVED: Mosaic
  rejects the (W,2C)->(2W,C) lane reshape as an unsupported shape cast)
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
    from vmg_tpu.ops.pixel_shuffle import shuffle2_lanes

    rng = np.random.default_rng(0)
    for N, H, W, C4 in [(16, 360, 640, 64), (16, 180, 320, 112)]:
        x = jnp.asarray(
            rng.standard_normal((N, H, W, 4 * C4)).astype(np.float32),
            jnp.bfloat16)

        def f_transpose(y):
            n, h, w, _ = y.shape
            y = y.reshape(n, h, w, 2, 2, C4)
            y = y.transpose(0, 1, 3, 2, 4, 5)
            return y.reshape(n, 2 * h, 2 * w, C4)

        outs = {}
        print(f"-- ({N},{H},{W},{4*C4}) -> ({N},{2*H},{2*W},{C4})")
        for name, fn in [("transpose", f_transpose),
                         ("lanes", shuffle2_lanes)]:
            f = jax.jit(fn)
            outs[name] = np.asarray(f(x))
            ms = timed(f, x) * 1e3
            print(f"  {name:10s} {ms:7.3f} ms")
        for name in ("lanes",):
            same = np.array_equal(outs[name], outs["transpose"])
            print(f"  {name} bit-identical: {same}")


if __name__ == "__main__":
    main()
