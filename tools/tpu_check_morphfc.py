#!/usr/bin/env python
"""On-chip checks + timings for the fused MorphFC Pallas kernels
(ops/morphfc_fused.py): Mosaic compile, parity vs the XLA module path at
the stage-0 serving shape, and end-to-end module timing both ways.
Prints JSON lines.  Run on the real TPU (JAX_PLATFORMS default)."""

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
    from vmg_tpu.utils.profiling import timed
    from vmg_tpu.models.blocks import MorphFCDecay
    from vmg_tpu.train.precision import cast_params_for_compute

    rng = np.random.default_rng(0)
    T, H, W, C = 16, 180, 320, 112

    x = jnp.asarray(rng.random((1, T, H, W, C), np.float32) - 0.5,
                    jnp.bfloat16)
    kw = dict(dim=C, chunk_h=8, chunk_w=8, channel_mixer="rcab")
    m_ref = MorphFCDecay(**kw, impl="xla")
    p = jax.jit(m_ref.init)(jax.random.key(0), x)
    p = cast_params_for_compute(p, jnp.bfloat16)

    f_ref = jax.jit(m_ref.apply)
    m_pal = MorphFCDecay(**kw, impl="pallas")
    f_pal = jax.jit(m_pal.apply)

    y_ref = np.asarray(f_ref(p, x), np.float32)
    y_pal = np.asarray(f_pal(p, x), np.float32)
    scale = float(np.abs(y_ref).mean())
    err = float(np.abs(y_pal - y_ref).max())
    rel = err / max(scale, 1e-9)
    print(json.dumps({"check": "parity_stage0", "max_abs": err,
                      "mean_abs_ref": scale, "rel": rel}), flush=True)
    assert np.isfinite(y_pal).all(), "non-finite kernel output"

    t_ref = timed(f_ref, p, x) * 1e3
    t_pal = timed(f_pal, p, x) * 1e3
    print(json.dumps({"check": "timing_stage0_ms",
                      "xla": round(t_ref, 2), "pallas": round(t_pal, 2),
                      "speedup": round(t_ref / t_pal, 3)}), flush=True)


if __name__ == "__main__":
    main()
