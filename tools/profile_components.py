#!/usr/bin/env python
"""Component-level serving-time breakdown at the bench protocol
(full VMG, 180x320, T=16, bf16).  Times each hot subsystem in isolation
with fenced wall-clock; prints one JSON line (milliseconds per clip).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    from vmg_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vmg_tpu.configs import FULL_PRESET
    from vmg_tpu.models import create_model
    from vmg_tpu.models.trajectory import TrajectoryMultiHead
    from vmg_tpu.models.blocks import TAB
    from vmg_tpu.models.spynet import SPyNet
    from vmg_tpu.train.precision import cast_params_for_compute
    from vmg_tpu.utils.profiling import timed

    T, H, W = 16, 180, 320
    C0 = 112
    rng = np.random.default_rng(0)
    out = {}

    def bf16(t):
        return jnp.asarray(t, jnp.bfloat16)

    # --- full model ----------------------------------------------------
    model = create_model(FULL_PRESET, is_train=False, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.random((1, T, H, W, 3), dtype=np.float32))
    model_f32 = create_model(FULL_PRESET, is_train=False)
    params = jax.jit(model_f32.init)(jax.random.key(0), x)
    params_bf16 = cast_params_for_compute(params, jnp.bfloat16)
    fwd = jax.jit(lambda p, v: model.apply(p, v))
    out["full_model_ms"] = timed(fwd, params_bf16, x) * 1e3

    # --- trajectory stage-0 tail ----------------------------------------
    traj = TrajectoryMultiHead(embed_dim=C0, num_blocks=15,
                               keyframe_stride=3, head=4, mode="wins",
                               head_scale=True, r_scaling=0.1, twins=(2, 2),
                               ltam=True, traj_win=16)
    xt = bf16(rng.random((1, T, H, W, C0), dtype=np.float32))
    ff = jnp.asarray(rng.random((1, T - 1, H, W, 2), dtype=np.float32))
    fb = jnp.asarray(rng.random((1, T - 1, H, W, 2), dtype=np.float32))
    tp = jax.jit(traj.init)(jax.random.key(1), xt, ff, fb)
    tp = cast_params_for_compute(tp, jnp.bfloat16)
    traj_fn = jax.jit(lambda p, a, b, c: traj.apply(p, a, b, c))
    # x2: the model runs this tail at stage 0 AND stage 6
    out["trajectory_x2_ms"] = timed(traj_fn, tp, xt, ff, fb) * 2e3

    # --- one stage-0 TAB block x (4 + 4 blocks at stages 0/6) -----------
    tab = TAB(dim=C0, chunk_h=int(45 * 0.125), chunk_w=int(80 * 0.125),
              mlp_ratio=6.0, n_groups=4, qkv_bias=True, if_decay=True,
              non_linear=True, gating=True, symm=True, symm_act="tanh",
              relu_scale=True, relu_scale_norm=False, ffn_type="ffn_cnn",
              mixer_type="mlps", mixer_n=None, mixer_scaling=1.0,
              channel_mixer="rcab")
    xtab = bf16(rng.random((1, T, H, W, C0), dtype=np.float32))
    tabp = jax.jit(lambda k, v: tab.init(k, v, True))(jax.random.key(2), xtab)
    tabp = cast_params_for_compute(tabp, jnp.bfloat16)
    tab_fn = jax.jit(lambda p, v: tab.apply(p, v, True))
    out["tab_stage0_x8_ms"] = timed(tab_fn, tabp, xtab) * 8e3

    # --- SPyNet level 0 --------------------------------------------------
    spy = SPyNet()
    a = jnp.asarray(rng.random((T - 1, H + 12, W, 3), dtype=np.float32))
    sp = jax.jit(spy.init)(jax.random.key(3), a, a)
    spy_fn = jax.jit(lambda p, u, v: spy.apply(p, u, v))
    out["spynet_fwd_ms"] = timed(spy_fn, sp, a, a) * 1e3

    for k, v in out.items():
        out[k] = round(v, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
