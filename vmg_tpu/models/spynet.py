"""SPyNet optical flow in JAX (reference ``models/vmg.py:18-173``).

Six-level coarse-to-fine pyramid; each level refines an upsampled flow with
a 5-layer 7x7 conv stack over [ref, warp(supp, flow), flow].  Flow math is
kept in float32 regardless of the surrounding compute dtype -- flow fields
feed gather coordinates, where bf16 rounding visibly shifts samples.

Weights load from the OpenMMLab BasicVSR SPyNet checkpoint through
``vmg_tpu.ckpt.torch_convert``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from vmg_tpu.ops.warp import flow_warp
from vmg_tpu.ops.resize import resize_bilinear, avg_pool2d

_MEAN = (0.485, 0.456, 0.406)
_STD = (0.229, 0.224, 0.225)

# Serving fast-math (trace-time constant, like blocks.set_fast_gelu): run
# the basic-module CONVS in bf16.  The fp32-flow policy pins SPyNet params
# to f32 (train/precision.py), which makes XLA lower the 7x7 convs as f32
# convolutions at ~1/8 MXU rate -- the round-3 serving trace shows them at
# 11-23 TFLOP/s, ~40 ms/clip across both directions.  In fast mode conv
# inputs/kernels round to bf16 (MXU accumulates f32 regardless) while ALL
# flow arithmetic -- upsampling, the residual add, warp coordinates --
# stays f32.  Measured flow delta on demo frames is well under 0.05 px
# (tools/exp_spynet_bf16.py); golden tests leave the flag off.
_FAST_FLOW = False


def set_fast_flow(on: bool) -> bool:
    """bf16 basic-module convs in subsequently traced models (serving
    only).  Returns the previous setting."""
    global _FAST_FLOW
    prev = _FAST_FLOW
    _FAST_FLOW = bool(on)
    return prev


class SPyNetBasicModule(nn.Module):
    """conv(8->32->64->32->16->2), k=7, ReLU between (none after last)."""

    @nn.compact
    def __call__(self, x):
        widths = (32, 64, 32, 16, 2)
        dtype = jnp.bfloat16 if _FAST_FLOW else None
        if dtype is not None:
            x = x.astype(dtype)
        for i, w in enumerate(widths):
            x = nn.Conv(w, (7, 7), padding=3, dtype=dtype,
                        name=f"conv{i}")(x)
            if i < len(widths) - 1:
                x = nn.relu(x)
        return x.astype(jnp.float32)


class SPyNet(nn.Module):
    """Flow from ref -> supp for (N, H, W, 3) RGB in [0, 1]."""

    levels: int = 6

    def setup(self):
        self.basic_module = [SPyNetBasicModule(name=f"basic_module{i}") for i in range(self.levels)]

    def compute_flow(self, ref, supp):
        n, h, w, _ = ref.shape
        mean = jnp.asarray(_MEAN, jnp.float32)
        std = jnp.asarray(_STD, jnp.float32)
        refs = [(ref.astype(jnp.float32) - mean) / std]
        supps = [(supp.astype(jnp.float32) - mean) / std]
        for _ in range(self.levels - 1):
            refs.append(avg_pool2d(refs[-1], 2))
            supps.append(avg_pool2d(supps[-1], 2))
        refs = refs[::-1]
        supps = supps[::-1]

        if _FAST_FLOW:
            # bf16 image pyramids: halves the gather rows of the warps
            # (the packed single-gather bilinear reads whole pixel rows);
            # flow itself stays f32 below
            refs = [r.astype(jnp.bfloat16) for r in refs]
            supps = [s.astype(jnp.bfloat16) for s in supps]

        flow = jnp.zeros((n, h // 32, w // 32, 2), jnp.float32)
        for level in range(self.levels):
            if level == 0:
                flow_up = flow
            else:
                lh, lw = refs[level].shape[1:3]
                flow_up = resize_bilinear(flow, lh, lw, align_corners=True) * 2.0
            warped = flow_warp(supps[level], flow_up, padding_mode="border")
            feats = [refs[level], warped, flow_up]
            if _FAST_FLOW:
                feats = [f.astype(jnp.bfloat16) for f in feats]
            inp = jnp.concatenate(feats, axis=-1)
            flow = flow_up + self.basic_module[level](inp)
        return flow

    def __call__(self, ref, supp):
        h, w = ref.shape[1:3]
        w_up = w if w % 32 == 0 else 32 * (w // 32 + 1)
        h_up = h if h % 32 == 0 else 32 * (h // 32 + 1)
        ref_r = resize_bilinear(ref, h_up, w_up, align_corners=False)
        supp_r = resize_bilinear(supp, h_up, w_up, align_corners=False)
        flow = self.compute_flow(ref_r, supp_r)
        flow = resize_bilinear(flow, h, w, align_corners=False)
        flow = flow * jnp.asarray([w / w_up, h / h_up], jnp.float32)
        return flow
