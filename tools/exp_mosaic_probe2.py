#!/usr/bin/env python
"""Probe round 2: can Mosaic assemble an im2col patch along LANES in
VMEM?  Tests lane-offset stores (strides 28 / 32 / 128) and in-kernel
lane concatenate, then times a one-group patch-assembled deep dot vs a
tap-accumulated shallow dot at the stage-0 tile shape."""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def probe(name, fn):
    try:
        r = fn()
        print(json.dumps({name: r if r is not None else "ok"}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({name: f"ERR {type(e).__name__}: {e}"[:160]}),
              flush=True)


def main():
    from vmg_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from vmg_tpu.utils.profiling import timed

    rng = np.random.default_rng(0)

    def lane_store(cg):
        """Store 9 tap chunks at lane offsets t*cg into (8, 320, 9*cg)."""
        x = jnp.asarray(rng.random((8, 328, cg), np.float32), jnp.bfloat16)

        def kernel(x_ref, o_ref):
            for t in range(9):
                o_ref[:, :, t * cg:(t + 1) * cg] = x_ref[:, t:t + 320, :]

        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 320, 9 * cg), x.dtype),
        )
        y = jax.jit(f)(x)
        ref = jnp.concatenate([x[:, t:t + 320] for t in range(9)], axis=-1)
        return {"maxdiff": float(jnp.max(jnp.abs(
            (y - ref).astype(jnp.float32))))}

    probe("lane_store_cg28", lambda: lane_store(28))
    probe("lane_store_cg32", lambda: lane_store(32))
    probe("lane_store_cg128", lambda: lane_store(128))

    def lane_concat():
        x = jnp.asarray(rng.random((8, 328, 28), np.float32), jnp.bfloat16)

        def kernel(x_ref, o_ref):
            o_ref[...] = jnp.concatenate(
                [x_ref[:, t:t + 320, :] for t in range(9)], axis=-1)

        f = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((8, 320, 252), x.dtype))
        y = jax.jit(f)(x)
        ref = jnp.concatenate([x[:, t:t + 320] for t in range(9)], axis=-1)
        return {"maxdiff": float(jnp.max(jnp.abs(
            (y - ref).astype(jnp.float32))))}

    probe("lane_concat_cg28", lane_concat)

    # --- one-group stage-0 tile: assembled deep dot vs accumulated taps ---
    R, W, cg, fg = 8, 320, 28, 168

    def tile_assembled(stride):
        x = jnp.asarray(rng.random((R + 2, 328, 128), np.float32),
                        jnp.bfloat16)
        w = jnp.asarray(
            rng.standard_normal((9 * stride, fg)).astype(np.float32) * 0.05,
            jnp.bfloat16)

        def kernel(x_ref, w_ref, o_ref, patch):
            for dy in range(3):
                for dx in range(3):
                    t = dy * 3 + dx
                    patch[:, :, t * stride:t * stride + cg] = (
                        x_ref[dy:dy + R, dx:dx + W, :cg])
            acc = jax.lax.dot_general(
                patch[...].reshape(R * W, 9 * stride), w_ref[...],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[...] = acc.reshape(R, W, fg).astype(o_ref.dtype)

        f = jax.jit(pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, W, fg), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((R, W, 9 * stride), jnp.bfloat16)],
        ))
        f(x, w)
        return {"ms": round(timed(f, x, w, iters=20) * 1e3, 3)}

    probe("tile_assembled_s28", lambda: tile_assembled(28))
    probe("tile_assembled_s32", lambda: tile_assembled(32))

    def tile_accum():
        x = jnp.asarray(rng.random((R + 2, 328, 128), np.float32),
                        jnp.bfloat16)
        w = jnp.asarray(
            rng.standard_normal((9, cg, fg)).astype(np.float32) * 0.05,
            jnp.bfloat16)

        def kernel(x_ref, w_ref, o_ref):
            acc = jnp.zeros((R * W, fg), jnp.float32)
            for dy in range(3):
                for dx in range(3):
                    t = dy * 3 + dx
                    lhs = x_ref[dy:dy + R, dx:dx + W, :cg].reshape(R * W, cg)
                    acc = acc + jax.lax.dot_general(
                        lhs, w_ref[t], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            o_ref[...] = acc.reshape(R, W, fg).astype(o_ref.dtype)

        f = jax.jit(pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, W, fg), jnp.bfloat16),
        ))
        f(x, w)
        return {"ms": round(timed(f, x, w, iters=20) * 1e3, 3)}

    probe("tile_accum_taps", tile_accum)

    # dy-packed 3-dot variant at the same tile (what v2 does per tile,
    # minus the host pack): lanes pre-packed (dx, c) -> here just use 84
    # contiguous lanes as a stand-in to time the dot shape.
    def tile_3dot():
        x = jnp.asarray(rng.random((R + 2, 320, 128), np.float32),
                        jnp.bfloat16)
        w = jnp.asarray(
            rng.standard_normal((3, 128, fg)).astype(np.float32) * 0.05,
            jnp.bfloat16)

        def kernel(x_ref, w_ref, o_ref):
            acc = jnp.zeros((R * W, fg), jnp.float32)
            for dy in range(3):
                lhs = x_ref[dy:dy + R].reshape(R * W, 128)
                acc = acc + jax.lax.dot_general(
                    lhs, w_ref[dy], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            o_ref[...] = acc.reshape(R, W, fg).astype(o_ref.dtype)

        f = jax.jit(pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, W, fg), jnp.bfloat16),
        ))
        f(x, w)
        return {"ms": round(timed(f, x, w, iters=20) * 1e3, 3)}

    probe("tile_3dot_K128", tile_3dot)


if __name__ == "__main__":
    main()
