#!/usr/bin/env python
"""Experiment: alternatives for the FFN grouped 3x3 conv (MlpCnn fc1,
reference function.py:50 with groups=4).

The shipped form (GroupedConv3x3, C<=128) is a dense conv with a
block-diagonal kernel: 4x the true FLOPs in exact zeros, ~15.8 ms at the
stage-0 shape.  Candidates measured here:

  dense_blockdiag  -- current single dense conv, zeros outside blocks
  pergroup_conv    -- g separate convs (28-deep contraction, known slow)
  im2col_group     -- per-group patches (9 shifted slices -> 9*cg lanes)
                      + one deep dot_general (true FLOPs, full MXU depth)
  im2col_pair      -- groups paired: 2x FLOPs, 2x contraction depth
  batchgroup       -- lax.conv batch_group_count=g on regrouped batch

Prints one JSON line of ms per variant per shape (bf16).
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
    from vmg_tpu.utils.profiling import timed

    g = 4
    shapes = {
        "s0": (16, 180, 320, 112, 672),
        "s1": (16, 90, 160, 224, 1344),
    }
    rng = np.random.default_rng(0)
    out = {}

    def dense_blockdiag(x, kernel):
        N, H, W, C = x.shape
        F = kernel.shape[-1]
        cg, fg = C // g, F // g
        blocks = jnp.zeros((3, 3, C, F), kernel.dtype)
        for gi in range(g):
            blocks = blocks.at[:, :, gi * cg:(gi + 1) * cg,
                               gi * fg:(gi + 1) * fg].set(
                kernel[..., gi * fg:(gi + 1) * fg])
        return jax.lax.conv_general_dilated(
            x, blocks, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def pergroup_conv(x, kernel):
        N, H, W, C = x.shape
        F = kernel.shape[-1]
        cg, fg = C // g, F // g
        outs = []
        for gi in range(g):
            outs.append(jax.lax.conv_general_dilated(
                x[..., gi * cg:(gi + 1) * cg],
                kernel[..., gi * fg:(gi + 1) * fg],
                (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
        return jnp.concatenate(outs, axis=-1)

    def _im2col(x, kernel, ng):
        """ng = groups per matmul block (1 = true FLOPs, 2 = 2x in zeros)."""
        N, H, W, C = x.shape
        F = kernel.shape[-1]
        cg, fg = C // g, F // g
        cb, fb = cg * ng, fg * ng  # per-block widths
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        outs = []
        for b in range(g // ng):
            xg = xp[..., b * cb:(b + 1) * cb]
            taps = [xg[:, dy:dy + H, dx:dx + W, :]
                    for dy in range(3) for dx in range(3)]
            patch = jnp.concatenate(taps, axis=-1)  # (N,H,W,9*cb)
            # weight block: (3,3,cb,fb) block-diagonal over ng sub-groups
            wblk = jnp.zeros((3, 3, cb, fb), kernel.dtype)
            for k in range(ng):
                gi = b * ng + k
                wblk = wblk.at[:, :, k * cg:(k + 1) * cg,
                               k * fg:(k + 1) * fg].set(
                    kernel[..., gi * fg:(gi + 1) * fg])
            wmat = wblk.reshape(9 * cb, fb)
            outs.append(jax.lax.dot_general(
                patch, wmat, (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(x.dtype))
        return jnp.concatenate(outs, axis=-1)

    def im2col_group(x, kernel):
        return _im2col(x, kernel, 1)

    def im2col_pair(x, kernel):
        return _im2col(x, kernel, 2)

    def batchgroup(x, kernel):
        N, H, W, C = x.shape
        F = kernel.shape[-1]
        cg, fg = C // g, F // g
        xg = x.reshape(N, H, W, g, cg).transpose(3, 0, 1, 2, 4)
        xg = xg.reshape(g * N, H, W, cg)
        y = jax.lax.conv_general_dilated(
            xg, kernel, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            batch_group_count=g)
        # out: (N, H, W, F) with feature group gi fed by batch group gi
        return y

    variants = [dense_blockdiag, pergroup_conv, im2col_group, im2col_pair,
                batchgroup]

    for sname, (N, H, W, C, F) in shapes.items():
        x = jnp.asarray(rng.random((N, H, W, C), np.float32), jnp.bfloat16)
        kernel = jnp.asarray(
            rng.standard_normal((3, 3, C // g, F)).astype(np.float32) * 0.05,
            jnp.bfloat16)
        ref = None
        for fn in variants:
            name = fn.__name__
            try:
                jfn = jax.jit(fn)
                y = jfn(x, kernel)
                if y.shape != (N, H, W, F):
                    out[f"{sname}.{name}"] = f"shape {y.shape}"
                    continue
                if ref is None:
                    ref = np.asarray(y, np.float32)
                    err = 0.0
                else:
                    err = float(np.max(np.abs(np.asarray(y, np.float32) - ref)))
                ms = timed(jfn, x, kernel) * 1e3
                out[f"{sname}.{name}"] = {"ms": round(ms, 2),
                                          "maxdiff": round(err, 5)}
            except Exception as e:  # noqa: BLE001
                out[f"{sname}.{name}"] = f"ERR {type(e).__name__}: {e}"[:120]
        print(json.dumps({sname: {k.split('.', 1)[1]: v for k, v in out.items()
                                  if k.startswith(sname)}}), flush=True)


if __name__ == "__main__":
    main()
