#!/usr/bin/env python
"""On-chip check of the fused conv-chain kernel (ops/conv_chain): Mosaic
compile + parity vs the XLA module path + isolated timing at the two
serving shapes (RCAB c-branch 16x180x320x112, in-scan resblock
1x184x320x112).  CPU equivalence is tests/test_conv_chain.py; this is the
real-hardware gate (same pattern as tools/tpu_check_groupconv.py).
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
    from vmg_tpu.utils.profiling import timed

    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)

    from vmg_tpu.models.blocks import RCAB
    from vmg_tpu.models.trajectory import ResidualBlockNoBN
    from vmg_tpu.train.precision import cast_params_for_compute

    # --- RCAB at the stage-0 mixer shape ---
    T, H, W, C = 16, 180, 320, 112
    x = jnp.asarray(rng.random((1, T, H, W, C), np.float32) - 0.5,
                    jnp.bfloat16)
    m_x = RCAB(C, impl="xla")
    m_k = RCAB(C, impl="pallas")
    p = jax.jit(m_x.init)(jax.random.key(0), x)
    p = cast_params_for_compute(p, jnp.bfloat16)
    f_x = jax.jit(m_x.apply)
    f_k = jax.jit(m_k.apply)
    y_x = np.asarray(f_x(p, x), np.float32)
    y_k = np.asarray(f_k(p, x), np.float32)
    scale = max(1e-3, np.abs(y_x).max())
    rel = np.abs(y_k - y_x).max() / scale
    t_x = timed(f_x, p, x) * 1e3
    t_k = timed(f_k, p, x) * 1e3
    print(f"RCAB  (1,{T},{H},{W},{C}): rel_err {rel:.2e}  "
          f"xla {t_x:.2f} ms -> kernel {t_k:.2f} ms")
    assert rel < 2e-2, rel  # bf16 rounding, different tap order

    # --- resblock at the in-scan shape ---
    H2, W2 = 184, 320
    x2 = jnp.asarray(rng.random((1, H2, W2, C), np.float32) - 0.5,
                     jnp.bfloat16)
    r_x = ResidualBlockNoBN(C, res_scale=0.1, impl="xla")
    r_k = ResidualBlockNoBN(C, res_scale=0.1, impl="pallas")
    p2 = jax.jit(r_x.init)(jax.random.key(1), x2)
    p2 = cast_params_for_compute(p2, jnp.bfloat16)
    g_x = jax.jit(r_x.apply)
    g_k = jax.jit(r_k.apply)
    z_x = np.asarray(g_x(p2, x2), np.float32)
    z_k = np.asarray(g_k(p2, x2), np.float32)
    scale = max(1e-3, np.abs(z_x).max())
    rel2 = np.abs(z_k - z_x).max() / scale
    # chain 8 blocks to amortize the ~10 ms tunnel dispatch
    def chain(apply):
        def f(v):
            for _ in range(8):
                v = apply(p2, v)
            return v
        return jax.jit(f)
    t_x8 = timed(chain(r_x.apply), x2) * 1e3 / 8
    t_k8 = timed(chain(r_k.apply), x2) * 1e3 / 8
    print(f"resblock (1,{H2},{W2},{C}): rel_err {rel2:.2e}  "
          f"xla {t_x8:.3f} ms/blk -> kernel {t_k8:.3f} ms/blk (x8 chain)")
    assert rel2 < 2e-2, rel2
    print("OK")


if __name__ == "__main__":
    main()
