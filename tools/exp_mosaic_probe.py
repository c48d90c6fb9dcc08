#!/usr/bin/env python
"""Probe Mosaic lowering constraints that gate the grouped-conv kernel
design (ops/group_conv.py): which HBM->VMEM DMA slice shapes compile,
whether unaligned sublane reads / lane-offset stores lower, and how fast
the candidate inner matmuls run.  Tiny shapes; one JSON line per probe.
"""

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
        print(json.dumps({name: f"ERR {type(e).__name__}: {e}"[:200]}),
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

    def dma_probe(H2, Wp, C, R=6):
        """Manual DMA of a halo'd row slab (R, Wp, C) out of (N, H2, Wp, C)."""
        x = jnp.asarray(rng.random((2, H2, Wp, C), np.float32), jnp.bfloat16)

        def kernel(x_ref, o_ref, xs, sem):
            i = pl.program_id(0)
            cp = pltpu.make_async_copy(x_ref.at[0, pl.ds(i * (R - 2), R)],
                                       xs, sem)
            cp.start()
            cp.wait()
            o_ref[0] = xs[1:R - 1]

        f = pl.pallas_call(
            kernel,
            grid=(2,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, R - 2, Wp, C), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((2, R - 2, Wp, C), x.dtype),
            scratch_shapes=[pltpu.VMEM((R, Wp, C), x.dtype),
                            pltpu.SemaphoreType.DMA(())],
        )
        y = jax.jit(f)(x)
        ref = jnp.stack([x[0, 1:R - 1], x[0, R - 1:2 * R - 3]])
        return {"maxdiff": float(jnp.max(jnp.abs(
            (y - ref).astype(jnp.float32))))}

    probe("dma_sub328_lane112", lambda: dma_probe(20, 328, 112))
    probe("dma_sub322_lane112", lambda: dma_probe(20, 322, 112))
    probe("dma_sub328_lane28", lambda: dma_probe(20, 328, 28))
    probe("dma_sub328_lane128", lambda: dma_probe(20, 328, 128))

    def vmem_subshift(off):
        """Unaligned sublane read: (8, 328, 128) -> rows [off:off+320)."""
        x = jnp.asarray(rng.random((8, 328, 128), np.float32), jnp.bfloat16)

        def kernel(x_ref, o_ref):
            o_ref[...] = x_ref[:, off:off + 320, :]

        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 320, 128), x.dtype),
        )
        y = jax.jit(f)(x)
        return {"maxdiff": float(jnp.max(jnp.abs(
            (y - x[:, off:off + 320]).astype(jnp.float32))))}

    probe("vmem_subshift1", lambda: vmem_subshift(1))
    probe("vmem_subshift2", lambda: vmem_subshift(2))

    def vmem_lane_store(cg):
        """Store 9 tap chunks at lane offsets t*cg into (8,320,9*cg)."""
        x = jnp.asarray(rng.random((8, 322, cg), np.float32), jnp.bfloat16)

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

    probe("lane_store_cg28", lambda: vmem_lane_store(28))
    probe("lane_store_cg32", lambda: vmem_lane_store(32))

    def vmem_lane_read():
        """Read at lane offset 28 (group slice): (8,320,112)->(8,320,28)."""
        x = jnp.asarray(rng.random((8, 320, 112), np.float32), jnp.bfloat16)

        def kernel(x_ref, o_ref):
            o_ref[...] = x_ref[:, :, 28:56]

        f = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((8, 320, 28), x.dtype))
        y = jax.jit(f)(x)
        return {"maxdiff": float(jnp.max(jnp.abs(
            (y - x[:, :, 28:56]).astype(jnp.float32))))}

    probe("lane_read_off28", vmem_lane_read)

    def roll_lane():
        x = jnp.asarray(rng.random((8, 128, 384), np.float32), jnp.bfloat16)

        def kernel(x_ref, o_ref):
            o_ref[...] = pltpu.roll(x_ref[...], 1, 2)

        f = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((8, 128, 384), x.dtype))
        y = jax.jit(f)(x)
        return {"maxdiff": float(jnp.max(jnp.abs(
            (y - jnp.roll(x, 1, 2)).astype(jnp.float32))))}

    probe("roll_lane", roll_lane)

    def subdim_store(off):
        """Store at sublane offset t*32 (group-packed patch rows)."""
        x = jnp.asarray(rng.random((32, 384), np.float32), jnp.bfloat16)

        def kernel(x_ref, o_ref):
            for t in range(9):
                o_ref[t * 32:(t + 1) * 32, :] = x_ref[...]

        f = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((288, 384), x.dtype))
        y = jax.jit(f)(x)
        return {"maxdiff": float(jnp.max(jnp.abs(
            (y - jnp.tile(x, (9, 1))).astype(jnp.float32))))}

    probe("sublane_store_t32", lambda: subdim_store(32))

    # --- inner matmul micro-times (kernel v2 candidates) ------------------
    def mm_time(shape_lhs, shape_rhs, contract):
        a = jnp.asarray(rng.random(shape_lhs, np.float32), jnp.bfloat16)
        b = jnp.asarray(rng.random(shape_rhs, np.float32), jnp.bfloat16)

        def kernel(a_ref, b_ref, o_ref):
            o_ref[...] = jax.lax.dot_general(
                a_ref[...], b_ref[...], (contract, ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype)

        la, lb = contract[0][0], contract[1][0]
        out_shape = tuple(d for i, d in enumerate(shape_lhs) if i != la) + \
            tuple(d for i, d in enumerate(shape_rhs) if i != lb)
        f = jax.jit(pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct(out_shape, jnp.bfloat16)))
        f(a, b)
        ms = timed(f, a, b) * 1e3
        flops = 2 * np.prod(out_shape) * shape_lhs[la]
        return {"ms": round(ms, 3), "tf_s": round(flops / ms / 1e9, 1)}

    # (R,288,384) x (288,168): contract dim1 with dim0 (kernel v2 inner)
    probe("mm_R8_288x384_168",
          lambda: mm_time((8, 288, 384), (288, 168), (((1,), (0,)))))
    probe("mm_R16_288x384_168",
          lambda: mm_time((16, 288, 384), (288, 168), (((1,), (0,)))))
    # flat patch matmul (R*W, 252)x(252,168) (kernel v1 inner)
    probe("mm_2560x252_168",
          lambda: mm_time((2560, 252), (252, 168), (((1,), (0,)))))


if __name__ == "__main__":
    main()
