"""Parity of the fixed-buffer lax.scan trajectory against a straight-line
re-execution with dynamically-growing buffers (the reference's semantics,
models/trajectory.py:300-490).  Same parameters, same math -- if masking,
slot bookkeeping, or decay exponents are off, these diverge."""

import numpy as np
import jax
import jax.numpy as jnp

from vmg_tpu.models.trajectory import (
    TrajectoryMultiHead,
    LTAM,
    ResidualBlocksWithInputConv,
)
from vmg_tpu.ops.warp import flow_warp
import flax.linen as nn


def _unrolled_direction(params, frames, flows, stride, embed_dim, num_blocks,
                        r_scaling, heads, twins):
    """Reference-style loop: buffers grow; LTAM sees exactly `count` slots."""
    ltam_params = {"params": params["params"]["step"]["LTAM"]}
    res_params = {"params": params["params"]["step"]["resblocks"]}
    res_mod = ResidualBlocksWithInputConv(embed_dim, num_blocks, r_scaling)

    B, H, W, C = frames[0].shape
    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    grid = jnp.asarray(
        np.broadcast_to(np.stack([gx, gy], -1)[None], (B, H, W, 2)), jnp.float32
    )

    feat_prop = jnp.zeros((B, H, W, C), jnp.float32)
    loc_slots = [grid]
    sparse, index = [], []
    outs = []
    T = len(frames)
    for s in range(T):
        lr = frames[s]
        if s > 0:
            flow = flows[s]
            feat_prop = flow_warp(feat_prop, flow, "bilinear", "border")
            loc_slots = [flow_warp(l, flow, "nearest", "border") for l in loc_slots]
            ltam = LTAM(embed_dim=embed_dim, head=heads, mode="wins",
                        if_scale=True, twins=twins)
            feat_prop = ltam.apply(
                ltam_params, lr, jnp.stack(index, 1), feat_prop,
                jnp.stack(sparse, 1), jnp.stack(loc_slots, 1),
            )
            if s % stride == 0:
                loc_slots.append(grid)
        feat_prop = res_mod.apply(res_params, jnp.concatenate([lr, feat_prop], -1))
        if s % stride == 0:
            sparse.append(feat_prop)
            index.append(lr)
        outs.append(feat_prop)
    return outs


def test_scan_matches_unrolled_reference_semantics():
    B, T, H, W, C = 1, 7, 8, 8, 8
    stride, heads, twins = 3, 2, (2, 2)
    num_blocks, r_scaling = 2, 0.1

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, H, W, C)).astype(np.float32))
    ff = jnp.asarray((rng.standard_normal((B, T - 1, H, W, 2)) * 1.5).astype(np.float32))
    fb = jnp.asarray((rng.standard_normal((B, T - 1, H, W, 2)) * 1.5).astype(np.float32))

    mod = TrajectoryMultiHead(
        embed_dim=C, num_blocks=num_blocks, keyframe_stride=stride, head=heads,
        mode="wins", head_scale=True, r_scaling=r_scaling, twins=twins, ltam=True,
    )
    params = mod.init(jax.random.key(0), x, ff, fb)
    got = np.asarray(mod.apply(params, x, ff, fb))

    # backward direction: frames T-1..0; step s>=1 warps with fb[T-1-s]
    frames_b = [x[:, i] for i in range(T - 1, -1, -1)]
    flows_b = [None] + [fb[:, T - 1 - s] for s in range(1, T)]
    outs_b = _unrolled_direction(params, frames_b, flows_b, stride, C,
                                 num_blocks, r_scaling, heads, twins)
    outputs_back = outs_b[::-1]

    frames_f = [x[:, i] for i in range(T)]
    flows_f = [None] + [ff[:, s - 1] for s in range(1, T)]
    outs_f = _unrolled_direction(params, frames_f, flows_f, stride, C,
                                 num_blocks, r_scaling, heads, twins)

    fused = jnp.stack(
        [jnp.concatenate([outputs_back[i], x[:, i], outs_f[i]], -1) for i in range(T)],
        axis=1,
    ).reshape(B * T, H, W, 3 * C)
    conv = nn.Conv(C, (1, 1))
    out_ref = conv.apply({"params": params["params"]["fusion"]}, fused)
    out_ref = jnp.where(out_ref >= 0, out_ref, 0.1 * out_ref)
    want = np.asarray(out_ref.reshape(B, T, H, W, C))

    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_ltam_mode_max_runs():
    B, T, H, W, C = 1, 5, 8, 8, 8
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, T, H, W, C)).astype(np.float32))
    ff = jnp.zeros((B, T - 1, H, W, 2), jnp.float32)
    fb = jnp.zeros((B, T - 1, H, W, 2), jnp.float32)
    mod = TrajectoryMultiHead(embed_dim=C, num_blocks=1, keyframe_stride=2,
                              head=2, mode="max", ltam=True)
    params = mod.init(jax.random.key(0), x, ff, fb)
    out = np.asarray(mod.apply(params, x, ff, fb))
    assert out.shape == (B, T, H, W, C)
    assert np.isfinite(out).all()


def test_no_ltam_path():
    B, T, H, W, C = 1, 4, 8, 8, 8
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((B, T, H, W, C)).astype(np.float32))
    ff = jnp.zeros((B, T - 1, H, W, 2), jnp.float32)
    fb = jnp.zeros((B, T - 1, H, W, 2), jnp.float32)
    mod = TrajectoryMultiHead(embed_dim=C, num_blocks=1, keyframe_stride=2,
                              head=2, ltam=False)
    params = mod.init(jax.random.key(0), x, ff, fb)
    out = np.asarray(mod.apply(params, x, ff, fb))
    assert np.isfinite(out).all()
