#!/usr/bin/env python
"""On-chip checks + timings for the fused grouped-FFN Pallas kernel
(ops/group_conv.py): Mosaic compile, parity vs the XLA module path,
timings vs the shipped form at the stage-0/1 bench shapes, GELU flavor
costs, and the backward.  One process (tunnel sessions are expensive);
prints JSON lines."""

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
    from vmg_tpu.ops.group_conv import fused_group_ffn
    from vmg_tpu.models.blocks import GroupedConv3x3

    g = 4
    rng = np.random.default_rng(0)

    # --- kernel parity + timing per shape --------------------------------
    # (N, H, W, C, F): stage-0 and stage-1 TAB FFN shapes of FULL_PRESET
    shapes = {
        "s0": (16, 184, 320, 112, 672),
        "s1": (16, 92, 160, 224, 1344),
    }
    for sname, (N, H, W, C, F) in shapes.items():
        x = jnp.asarray(rng.random((N, H, W, C), np.float32), jnp.bfloat16)
        kernel = jnp.asarray(
            rng.standard_normal((3, 3, C // g, F)).astype(np.float32) * 0.05,
            jnp.bfloat16)
        bias = jnp.asarray(rng.standard_normal((F,)).astype(np.float32) * 0.1,
                           jnp.bfloat16)
        w2 = jnp.asarray(
            rng.standard_normal((F, C)).astype(np.float32) * 0.05,
            jnp.bfloat16)
        b2 = jnp.asarray(rng.standard_normal((C,)).astype(np.float32) * 0.1,
                         jnp.bfloat16)

        def xla_module(x, kernel, bias, w2, b2):
            m = GroupedConv3x3(F, g, act="gelu")
            p = {"params": {"kernel": kernel, "bias": bias}}
            h = m.apply(p, x)
            return h @ w2 + b2

        jref = jax.jit(xla_module)
        ref = jref(x, kernel, bias, w2, b2)
        rec = {"xla_module_ms": round(
            timed(jref, x, kernel, bias, w2, b2) * 1e3, 2)}

        for rows in (4, 8, 16):
            try:
                jpal = jax.jit(lambda a, k, b, v, c, _r=rows: fused_group_ffn(
                    a, k, b, v, c, groups=g, act="erf", impl="pallas",
                    rows=_r))
                y = jpal(x, kernel, bias, w2, b2)
                diff = float(jnp.max(jnp.abs(
                    y.astype(jnp.float32) - ref.astype(jnp.float32))))
                rec[f"pallas_r{rows}_ms"] = round(
                    timed(jpal, x, kernel, bias, w2, b2) * 1e3, 2)
                rec[f"pallas_r{rows}_maxdiff"] = round(diff, 5)
            except Exception as e:  # noqa: BLE001
                rec[f"pallas_r{rows}"] = f"ERR {type(e).__name__}: {e}"[:300]

        # fused act variants at auto rows
        for act in ("tanh", "poly"):
            try:
                jact = jax.jit(lambda a, k, b, v, c, _a=act: fused_group_ffn(
                    a, k, b, v, c, groups=g, act=_a, impl="pallas"))
                jact(x, kernel, bias, w2, b2)
                rec[f"pallas_{act}_ms"] = round(
                    timed(jact, x, kernel, bias, w2, b2) * 1e3, 2)
            except Exception as e:  # noqa: BLE001
                rec[f"pallas_{act}"] = f"ERR {type(e).__name__}: {e}"[:200]
        print(json.dumps({sname: rec}), flush=True)

    # --- backward compile + step timing at stage-0 -----------------------
    N, H, W, C, F = shapes["s0"]
    x = jnp.asarray(rng.random((N, H, W, C), np.float32), jnp.bfloat16)
    kernel = jnp.asarray(
        rng.standard_normal((3, 3, C // g, F)).astype(np.float32) * 0.05,
        jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((F,)).astype(np.float32) * 0.1,
                       jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((F, C)).astype(np.float32) * 0.05,
                     jnp.bfloat16)
    b2 = jnp.asarray(rng.standard_normal((C,)).astype(np.float32) * 0.1,
                     jnp.bfloat16)

    def loss(k, b, v, c):
        y = fused_group_ffn(x, k, b, v, c, groups=g, act="erf",
                            impl="pallas")
        return jnp.sum(y.astype(jnp.float32) ** 2)

    try:
        jgrad = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
        grads = jgrad(kernel, bias, w2, b2)
        print(json.dumps({
            "bwd": {"ms": round(timed(jgrad, kernel, bias, w2, b2) * 1e3, 2),
                    "finite": bool(all(
                        jnp.all(jnp.isfinite(gr.astype(jnp.float32)))
                        for gr in grads))}}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"bwd": f"ERR {type(e).__name__}: {e}"[:300]}),
              flush=True)


if __name__ == "__main__":
    main()
