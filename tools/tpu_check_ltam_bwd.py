#!/usr/bin/env python
"""Real-TPU (Mosaic) compile + numerics check of the fused LTAM attention
kernel's backward pass (ops/ltam_attention custom VJP).

The forward kernel is already proven on the chip (it carries the round-3
serving bench); interpret-mode tests pin fwd+bwd numerics on CPU
(tests/test_fused_layouts.py).  This script closes the remaining gap:
compile the BACKWARD kernel with Mosaic on the real chip and compare its
gradients against the XLA 'windows' formulation's autodiff through the
full trajectory module at a bench-family shape (H multiple of the row
tile, C=112 -> one 128-lane tile).

Run: python tools/tpu_check_ltam_bwd.py   (axon TPU default platform)
Prints one JSON line with the max grad diffs.
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
    from vmg_tpu.models.trajectory import TrajectoryMultiHead

    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    rng = np.random.default_rng(19)
    B, T, H, W, C = 1, 7, 24, 32, 112
    x = jnp.asarray(rng.standard_normal((B, T, H, W, C)), jnp.float32)
    ff = jnp.asarray(rng.standard_normal((B, T - 1, H, W, 2)), jnp.float32)
    fb = jnp.asarray(rng.standard_normal((B, T - 1, H, W, 2)), jnp.float32)

    def mk(impl):
        return TrajectoryMultiHead(
            embed_dim=C, num_blocks=2, keyframe_stride=3, head=4,
            mode="wins", r_scaling=0.1, ltam=True, carry_impl="warped",
            win_impl=impl)

    a, b = mk("windows"), mk("pallas")
    params = jax.jit(a.init)(jax.random.key(18), x, ff, fb)

    def loss(m):
        return lambda p, xx: jnp.mean(m.apply(p, xx, ff, fb) ** 2)

    ga, gxa = jax.jit(jax.grad(loss(a), argnums=(0, 1)))(params, x)
    gb, gxb = jax.jit(jax.grad(loss(b), argnums=(0, 1)))(params, x)

    dx = float(np.max(np.abs(np.asarray(gxa) - np.asarray(gxb))))
    dp = max(
        float(np.max(np.abs(np.asarray(u) - np.asarray(v))))
        for u, v in zip(jax.tree.leaves(ga), jax.tree.leaves(gb))
    )
    ok = dx < 1e-4 and dp < 1e-4
    print(json.dumps({
        "mosaic_bwd_compile": "ok",
        "grad_max_diff_input": dx,
        "grad_max_diff_params": dp,
        "ok": ok,
    }))


if __name__ == "__main__":
    main()
