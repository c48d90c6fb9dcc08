#!/usr/bin/env python
"""Micro-benchmarks of the round-3 fused layouts vs the straightforward
forms, at the bench protocol shapes (one stage-0 TAB block; one
trajectory tail).  Prints one JSON line of milliseconds."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="tab,traj",
                    help="comma list: tab, traj")
    args = ap.parse_args()
    what = set(args.what.split(","))

    from vmg_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vmg_tpu.models.blocks import TAB
    from vmg_tpu.models.trajectory import TrajectoryMultiHead
    from vmg_tpu.train.precision import cast_params_for_compute
    from vmg_tpu.utils.profiling import timed

    T, H, W, C0 = 16, 180, 320, 112
    rng = np.random.default_rng(0)
    out = {}

    if "tab" in what:
        # full-model stage-0 TAB: chunks 8x8 (image_size 64 x ratio 1/8)
        for fused in (False, True):
            tab = TAB(dim=C0, chunk_h=8, chunk_w=8, mlp_ratio=6.0,
                      n_groups=4, if_decay=True, channel_mixer="rcab",
                      relu_scale=True)
            xtab = jnp.asarray(rng.random((1, T, H, W, C0),
                                          dtype=np.float32), jnp.bfloat16)
            # monkey-flag: MorphFCDecay fused attr comes from TAB? TAB
            # hard-instantiates fused=True; patch via env is ugly -- build
            # the mixer directly instead
            from vmg_tpu.models.blocks import MorphFCDecay
            m = MorphFCDecay(C0, 8, 8, channel_mixer="rcab", fused=fused)
            p = jax.jit(m.init)(jax.random.key(0), xtab)
            p = cast_params_for_compute(p, jnp.bfloat16)
            fn = jax.jit(m.apply)
            out[f"morphfc_fused{int(fused)}_ms"] = timed(fn, p, xtab) * 1e3

    if "traj" in what:
        for impl in ("windows", "strided"):
            traj = TrajectoryMultiHead(
                embed_dim=C0, num_blocks=15, keyframe_stride=3, head=4,
                mode="wins", head_scale=True, r_scaling=0.1, twins=(2, 2),
                ltam=True, traj_win=16, win_impl=impl)
            xt = jnp.asarray(rng.random((1, T, H, W, C0),
                                        dtype=np.float32), jnp.bfloat16)
            ff = jnp.asarray(rng.random((1, T - 1, H, W, 2),
                                        dtype=np.float32))
            fb = jnp.asarray(rng.random((1, T - 1, H, W, 2),
                                        dtype=np.float32))
            tp = jax.jit(traj.init)(jax.random.key(1), xt, ff, fb)
            tp = cast_params_for_compute(tp, jnp.bfloat16)
            fn = jax.jit(lambda p, a, b, c, _t=traj: _t.apply(p, a, b, c))
            out[f"traj_{impl}_ms"] = timed(fn, tp, xt, ff, fb) * 1e3

    print(json.dumps({k: round(v, 2) for k, v in out.items()}))


if __name__ == "__main__":
    main()
