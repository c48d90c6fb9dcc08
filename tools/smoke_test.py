#!/usr/bin/env python
"""CPU/TPU smoke test (replaces reference ``tools/cpu_test.sh`` +
``models/vmg.py.__main__``): build a small 3-stage VMG, run one forward,
print parameter count and FLOPs."""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--size", nargs=2, type=int, default=[64, 64])
    args = p.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from vmg_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np
    from vmg_tpu.configs import FEW_LEVELS_PRESET
    from vmg_tpu.models import create_model
    from vmg_tpu.utils import count_params
    from vmg_tpu.eval.flops import model_flops

    model = create_model(FEW_LEVELS_PRESET, is_train=False)
    h, w = args.size
    x = jnp.asarray(
        np.random.default_rng(0).random((1, args.frames, h, w, 3),
                                        dtype=np.float32)
    )
    t0 = time.time()
    params = jax.jit(model.init)(jax.random.key(0), x)
    out = jax.jit(lambda p, v: model.apply(p, v))(params, x)
    out.block_until_ready()
    print(f"devices: {jax.devices()}")
    print(f"#Params : {count_params(params) / 1e6:.4f} [M]")
    print(f"forward : {tuple(x.shape)} -> {tuple(out.shape)} "
          f"({time.time() - t0:.1f}s incl. compile)")
    print(f"FLOPs   : {model_flops(model, params, x) / 1e9:.2f} G")


if __name__ == "__main__":
    main()
