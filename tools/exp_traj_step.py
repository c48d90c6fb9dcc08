#!/usr/bin/env python
"""Per-step cost split of the trajectory scan body at the serving shape.

The full-model trace shows the 20 trajectory whiles at 333 ms/clip
(~5.2 ms per step-unit) while the 30-conv resblock chain alone measures
2.94 ms standalone -- this times each body component standalone to
locate the remaining ~2.2 ms (warps? LTAM? scan/layout overhead?).
Components (see vmg_tpu/models/trajectory.py _TrajStep, carry_impl
'warped' + pallas LTAM):

  1. bilinear flow_warp of feat_prop        (1, 184, 320, 112)
  2. nearest  flow_warp of the K-slot buffer (1, 184, 320, K*2*128)
  3. LTAM wins-attention kernel              (q=lr, kv_packed)
  4. input conv (concat lr+feat_prop 224 -> 112) + 15 resblocks
Prints JSON lines; marginal timing via x1-vs-x4 repetition to cancel
the ~10 ms tunnel dispatch overhead.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def marginal(fn, *args, reps=4):
    """(t(reps) - t(1)) / (reps - 1), chaining fn on its own output."""
    import jax
    from vmg_tpu.utils.profiling import timed

    def chain(n):
        def f(x, *rest):
            y = x
            for _ in range(n):
                y = fn(y, *rest)
            return y
        return jax.jit(f)

    t1 = timed(chain(1), *args)
    tn = timed(chain(reps), *args)
    return (tn - t1) / (reps - 1)


def main():
    from vmg_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vmg_tpu.ops.warp import flow_warp
    from vmg_tpu.utils.profiling import timed

    rng = np.random.default_rng(0)
    H, W, C, K = 184, 320, 112, 3
    CP = 128
    dt = jnp.bfloat16

    feat = jnp.asarray(rng.random((1, H, W, C), np.float32) - 0.5, dt)
    buf = jnp.asarray(rng.random((1, H, W, K * 2 * CP), np.float32) - 0.5, dt)
    flow = jnp.asarray(rng.random((1, H, W, 2), np.float32) * 4 - 2)

    t_bil = marginal(lambda x, f: flow_warp(x, f, "bilinear", "border"),
                     feat, flow) * 1e3
    print(json.dumps({"component": "bilinear_warp_feat", "ms": round(t_bil, 3)}),
          flush=True)

    t_nr = marginal(lambda x, f: flow_warp(x, f, "nearest", "border"),
                    buf, flow) * 1e3
    print(json.dumps({"component": f"nearest_warp_buf_K{K}",
                      "ms": round(t_nr, 3)}), flush=True)

    # LTAM fused kernel forward (serving config: wins 2x2, head 4)
    from vmg_tpu.models.trajectory import LTAM
    lr = jnp.asarray(rng.random((1, H, W, C), np.float32) - 0.5, dt)
    ltam = LTAM(embed_dim=C, head=4, mode="wins", twins=(2, 2),
                if_scale=True, keys_prenormalized=True, presampled=True,
                win_impl="pallas")
    p = jax.jit(lambda k: ltam.init(k, lr, None, feat, None, None,
                                    kv_packed=buf))(jax.random.key(0))
    f_ltam = jax.jit(lambda q, fp, kv: ltam.apply(p, q, None, fp, None, None,
                                                  kv_packed=kv))
    t1 = timed(f_ltam, lr, feat, buf)
    print(json.dumps({"component": "ltam_kernel_fwd_incl_dispatch",
                      "ms": round(t1 * 1e3, 3)}), flush=True)

    # input conv + resblock chain (ResidualBlocksWithInputConv)
    from vmg_tpu.models.trajectory import ResidualBlocksWithInputConv
    rb = ResidualBlocksWithInputConv(C, 15, 0.1)
    xcat = jnp.asarray(rng.random((1, H, W, 2 * C), np.float32) - 0.5, dt)
    prb = jax.jit(rb.init)(jax.random.key(1), xcat)

    def rb_apply(x):
        return rb.apply(prb, x)

    def rb_chain(x2):
        # keep shapes closed under repetition: pad output back to 2C
        y = rb_apply(x2)
        return jnp.concatenate([y, y], axis=-1)

    t_rb = marginal(rb_chain, xcat) * 1e3
    print(json.dumps({"component": "inputconv_plus_15_resblocks",
                      "ms": round(t_rb, 3),
                      "note": "includes a concat per rep (~0.1 ms)"}),
          flush=True)


if __name__ == "__main__":
    main()
