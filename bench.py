#!/usr/bin/env python
"""Headline benchmark: REDS4-protocol 4x SR throughput of the flagship
(full 7-stage) VMG on one TPU chip.

Protocol mirrors the reference eval (``configs/VMG-eval-REDS4.yml`` +
``tools/Tester.py:108-143``): 180x320 LR frames, 128x128 spatial tiles
with 20px overlap, clip of 16 frames.  Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}.

The reference repo commits no machine-readable baseline (BASELINE.md);
``vs_baseline`` is null until a measured reference number exists.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    from vmg_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from vmg_tpu.configs import FULL_PRESET
    from vmg_tpu.models import create_model

    T, H, W = 16, 180, 320
    WIN, OV = 128, 20

    model = create_model(FULL_PRESET, is_train=False)
    rng = np.random.default_rng(0)
    tile = jnp.asarray(rng.random((1, T, WIN, WIN, 3), dtype=np.float32))
    params = jax.jit(model.init)(jax.random.key(0), tile)

    fwd = jax.jit(lambda p, x: model.apply(p, x))

    # tile grid of the reference protocol
    stride = WIN - OV
    h_idx = list(range(0, H - WIN, stride)) + [max(0, H - WIN)]
    w_idx = list(range(0, W - WIN, stride)) + [max(0, W - WIN)]
    n_tiles = len(h_idx) * len(w_idx)

    tiles = [
        jnp.asarray(rng.random((1, T, WIN, WIN, 3), dtype=np.float32))
        for _ in range(n_tiles)
    ]

    def finish(o):
        # on the tunneled TPU runtime block_until_ready can report early;
        # a host fetch of one element is a true completion fence
        return float(o[0, 0, 0, 0, 0])

    # warmup/compile + one discard round
    finish(fwd(params, tile))
    for t in tiles:
        finish(fwd(params, t))

    reps = 2
    t0 = time.time()
    for _ in range(reps):
        for k in range(n_tiles):
            out = fwd(params, tiles[k])
        finish(out)
    dt = time.time() - t0
    fps = T * reps / dt

    print(json.dumps({
        "metric": "REDS4-protocol 4x VSR throughput (full VMG, 180x320, "
                  "128x128 tiles, T=16)",
        "value": round(fps, 4),
        "unit": "frames/sec/chip",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
