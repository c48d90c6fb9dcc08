"""Trajectory-aware bidirectional propagation (TTVSR-style) as a lax.scan.

Re-design of the reference's Python-loop recurrence
(``models/trajectory.py:226-490`` Trajectory_multi_head,
``:493-807`` LTAM_multi_head) for XLA:

  * the T-step recurrence in each direction is ONE ``nn.scan`` body --
    compile time is O(1) in T instead of an unrolled graph;
  * the dynamically-growing keyframe buffers (sparse features, index
    features, tracked locations) become fixed-size ring-free buffers of
    K = ceil(T / keyframe_stride) slots plus a valid-count; invalid slots
    are masked out of the attention with -1e9 logits;
  * both directions share one scanned step module (weight sharing matches
    the reference, which reuses ``resblocks``/``LTAM`` across passes);
  * the per-frame fusion conv runs vectorized over T after the scans
    (it does not participate in the recurrence).

Numerics notes: cosine features are L2-normalized over the full channel dim
before the head split (reference ``trajectory.py:620-627``), the temporal
decay exponent is (count - slot) so the newest keyframe decays least
(``trajectory.py:534-547``), and location maps warp with *nearest* sampling
on border padding (``trajectory.py:332-333``).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from vmg_tpu.ops.warp import flow_warp
from vmg_tpu.models.blocks import leaky_relu, torch_conv_kernel_init, trunc_normal_init


class ResidualBlockNoBN(nn.Module):
    """conv-ReLU-conv with scaled residual (reference trajectory.py:165)."""

    mid_channels: int
    res_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        out = nn.Conv(self.mid_channels, (3, 3), padding=1,
                      kernel_init=torch_conv_kernel_init(), name="conv1")(x)
        out = jax.nn.relu(out)
        out = nn.Conv(self.mid_channels, (3, 3), padding=1,
                      kernel_init=torch_conv_kernel_init(), name="conv2")(out)
        return x + out * self.res_scale


class ResidualBlocksWithInputConv(nn.Module):
    """conv + lrelu(0.1) + N residual blocks (reference trajectory.py:16)."""

    out_channels: int
    num_blocks: int
    res_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_channels, (3, 3), padding=1,
                    kernel_init=torch_conv_kernel_init(), name="conv_in")(x)
        x = leaky_relu(x, 0.1)
        for i in range(self.num_blocks):
            x = ResidualBlockNoBN(self.out_channels, self.res_scale, name=f"block{i}")(x)
        return x


def _normalize(v, axis=-1, eps=1e-12):
    """torch F.normalize: v / max(||v||, eps)."""
    n = jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=True))
    return v / jnp.maximum(n, eps)


class LTAM(nn.Module):
    """Location-guided temporal attention over keyframe buffers.

    ``mode='wins'`` (config default): windowed softmax attention over
    (K slots x twins window) keys with RetNet decay x learned relative
    position bias.  ``mode='max'``: per-head hard max over slots.
    """

    embed_dim: int
    head: int = 4
    mode: str = "wins"
    if_scale: bool = True
    twins: tuple = (2, 2)
    max_keyframes: int = 4

    @nn.compact
    def __call__(self, curr, index_buf, anchor, sparse_buf, loc, count):
        """curr/anchor: (n,h,w,c); index/sparse bufs: (n,K,h,w,c);
        loc: (n,K,h,w,2) absolute pixel coords; count: () int32 valid slots."""
        n, h, w, c = curr.shape
        K = self.max_keyframes
        head = self.head
        d = c // head

        # resample keyframe buffers at tracked locations (nearest, zeros);
        # both buffers share indices, so one fused 2C gather -- TPU gather
        # cost is per-row, so this halves the dominant LTAM cost
        gx = 2.0 * loc[..., 0] / max(w - 1, 1) - 1.0
        gy = 2.0 * loc[..., 1] / max(h - 1, 1) - 1.0
        grid = jnp.stack([gx, gy], axis=-1).reshape(n * K, h, w, 2)
        both = jnp.concatenate([sparse_buf, index_buf], axis=-1)
        samp = flow_grid_sample(both.reshape(n * K, h, w, 2 * c), grid)
        samp = samp.reshape(n, K, h, w, 2 * c)
        samp_sparse = samp[..., :c]
        samp_index = samp[..., c:]

        # cosine features: normalize over the FULL channel dim, then split heads
        curr_n = _normalize(curr.astype(jnp.float32))
        index_n = _normalize(samp_index.astype(jnp.float32))

        scale = (d ** -0.5) if (self.if_scale and self.mode == "wins") else 1.0
        slot_valid = jnp.arange(K) < count  # (K,)

        if self.mode == "wins":
            wh, ww = self.twins
            q_n = wh * ww
            nh, nw = h // wh, w // ww

            def to_windows(v, channels):
                # (n, K, h, w, C) -> (n, nWin, head, K*q_n, d) key order slot-major
                v = v.reshape(n, K, nh, wh, nw, ww, head, channels)
                v = v.transpose(0, 2, 4, 6, 1, 3, 5, 7)  # n nh nw head K wh ww d
                return v.reshape(n, nh * nw, head, K * q_n, channels)

            q = curr_n.reshape(n, nh, wh, nw, ww, head, d)
            q = q.transpose(0, 1, 3, 5, 2, 4, 6).reshape(n, nh * nw, head, q_n, d)
            k = to_windows(index_n, d)
            v = to_windows(samp_sparse.astype(jnp.float32), d)

            logits = jnp.einsum("bwhqd,bwhkd->bwhqk", q * scale, k,
                                preferred_element_type=jnp.float32)

            # decay x learned relative position bias
            rpe = self.param("relative_pos_encoding", trunc_normal_init(),
                             (head, q_n, q_n))
            decay_v = 1.0 - 2.0 ** (-5.0 - jnp.arange(head - 1, -1, -1, dtype=jnp.float32))
            expo = (count - jnp.arange(K)).astype(jnp.float32)  # (K,)
            slot_decay = jnp.power(decay_v[:, None], expo[None, :])  # (head, K)
            pe = slot_decay[:, None, :, None] * rpe[:, :, None, :]  # (head, q, K, kpos)
            pe = pe.reshape(head, q_n, K * q_n)
            logits = logits + pe[None, None]

            key_mask = jnp.repeat(slot_valid, q_n)  # (K*q_n,)
            logits = jnp.where(key_mask[None, None, None, None, :], logits, -1e9)
            attn = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum("bwhqk,bwhkd->bwhqd", attn, v,
                             preferred_element_type=jnp.float32)
            out = out.reshape(n, nh, nw, head, wh, ww, d)
            out = out.transpose(0, 1, 4, 2, 5, 3, 6).reshape(n, h, w, c)
        elif self.mode == "max":
            qf = curr_n.reshape(n, h * w, head, d)
            kf = index_n.reshape(n, K, h * w, head, d)
            sim = jnp.einsum("bphd,bkphd->bpkh", qf, kf)  # (n, hw, K, head)
            sim = jnp.where(slot_valid[None, None, :, None], sim, -1e9)
            corr_soft = sim.max(axis=2)  # (n, hw, head)
            corr_idx = sim.argmax(axis=2)  # (n, hw, head)
            vals = samp_sparse.reshape(n, K, h * w, head, d).astype(jnp.float32)
            gathered = jnp.take_along_axis(
                vals, corr_idx[:, None, :, :, None], axis=1
            )[:, 0]  # (n, hw, head, d)
            out = gathered * corr_soft[..., None]
            out = out.reshape(n, h, w, c)
        else:
            raise ValueError(f"unknown LTAM mode {self.mode!r}")

        out = nn.Dense(self.embed_dim, kernel_init=trunc_normal_init(), name="proj")(out)
        return (out + anchor.astype(jnp.float32)).astype(curr.dtype)


def flow_grid_sample(x, grid):
    """grid_sample wrapper (nearest, zeros) used for location resampling."""
    from vmg_tpu.ops.warp import grid_sample

    return grid_sample(x, grid, mode="nearest", padding_mode="zeros")


class _TrajStep(nn.Module):
    """One recurrence step; nn.scan-ed over time, shared by both passes."""

    embed_dim: int
    num_blocks: int
    r_scaling: float
    max_keyframes: int
    ltam: bool
    ltam_cfg: dict

    @nn.compact
    def __call__(self, carry, xs):
        feat_prop, loc, sparse_buf, index_buf, count = carry
        lr = xs["feat"]
        flow = xs["flow"]
        nf = xs["not_first"]  # () float: 1.0 after the first step
        kf = xs["kf"]  # () float: keyframe flag
        n, h, w, c = lr.shape
        K = self.max_keyframes

        warped_prop = flow_warp(feat_prop, flow, "bilinear", "border")
        flow_rep = jnp.broadcast_to(flow[:, None], (n, K, h, w, 2)).reshape(n * K, h, w, 2)
        warped_loc = flow_warp(
            loc.reshape(n * K, h, w, 2), flow_rep, "nearest", "border"
        ).reshape(n, K, h, w, 2)
        feat_prop = jnp.where(nf > 0, warped_prop, feat_prop)
        loc = jnp.where(nf > 0, warped_loc, loc)

        if self.ltam:
            ltam_out = LTAM(
                embed_dim=self.embed_dim,
                max_keyframes=K,
                **self.ltam_cfg,
                name="LTAM",
            )(lr, index_buf, feat_prop, sparse_buf, loc, count)
            feat_prop = jnp.where(nf > 0, ltam_out, feat_prop)

        # append identity-grid location slot at keyframes (after LTAM,
        # before resblocks; skipped on the first step -- slot 0 is the init)
        gy, gx = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
            indexing="ij",
        )
        grid0 = jnp.broadcast_to(jnp.stack([gx, gy], -1)[None], (n, h, w, 2))
        loc_sel = (jnp.arange(K) == count) & (kf > 0) & (nf > 0)
        loc = jnp.where(loc_sel[None, :, None, None, None], grid0[:, None], loc)

        feat_prop = ResidualBlocksWithInputConv(
            self.embed_dim, self.num_blocks, self.r_scaling, name="resblocks"
        )(jnp.concatenate([lr, feat_prop], axis=-1))

        buf_sel = (jnp.arange(K) == count) & (kf > 0)
        sparse_buf = jnp.where(buf_sel[None, :, None, None, None],
                               feat_prop[:, None], sparse_buf)
        index_buf = jnp.where(buf_sel[None, :, None, None, None],
                              lr[:, None], index_buf)
        count = count + kf.astype(jnp.int32)

        return (feat_prop, loc, sparse_buf, index_buf, count), feat_prop


class TrajectoryMultiHead(nn.Module):
    """Bidirectional trajectory propagation (reference trajectory.py:226)."""

    embed_dim: int
    num_blocks: int = 10
    keyframe_stride: int = 3
    head: int = 4
    mode: str = "wins"
    head_scale: bool = True
    r_scaling: float = 1.0
    twins: tuple = (2, 2)
    ltam: bool = True

    @nn.compact
    def __call__(self, x, flows_forward, flows_backward):
        """x: (B, T, H, W, C); flows: (B, T-1, H, W, 2)."""
        B, T, H, W, C = x.shape
        K = -(-T // self.keyframe_stride)  # ceil

        step = nn.scan(
            _TrajStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )(
            embed_dim=self.embed_dim,
            num_blocks=self.num_blocks,
            r_scaling=self.r_scaling,
            max_keyframes=K,
            ltam=self.ltam,
            ltam_cfg=dict(
                head=self.head,
                mode=self.mode,
                if_scale=self.head_scale,
                twins=tuple(self.twins),
            ),
            name="step",
        )

        gy, gx = jnp.meshgrid(
            jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
            indexing="ij",
        )
        grid0 = jnp.broadcast_to(jnp.stack([gx, gy], -1)[None, None], (B, K, H, W, 2))

        def init_carry():
            return (
                jnp.zeros((B, H, W, C), x.dtype),
                grid0.astype(jnp.float32),
                jnp.zeros((B, K, H, W, C), x.dtype),
                jnp.zeros((B, K, H, W, C), x.dtype),
                jnp.asarray(0, jnp.int32),
            )

        steps = np.arange(T)
        kf_flags = jnp.asarray((steps % self.keyframe_stride) == 0, jnp.float32)
        not_first = jnp.asarray(steps > 0, jnp.float32)
        zero_flow = jnp.zeros((1, B, H, W, 2), jnp.float32)

        # backward pass: frames T-1 .. 0, flow_backward[i] warps i+1 -> i
        feats_b = x[:, ::-1].transpose(1, 0, 2, 3, 4)  # (T, B, H, W, C)
        flows_b = jnp.concatenate(
            [zero_flow, flows_backward[:, ::-1].transpose(1, 0, 2, 3, 4)], axis=0
        )
        xs_b = {"feat": feats_b, "flow": flows_b, "not_first": not_first, "kf": kf_flags}
        _, ys_b = step(init_carry(), xs_b)
        outputs_back = ys_b[::-1].transpose(1, 0, 2, 3, 4)  # (B, T, H, W, C)

        # forward pass: frames 0 .. T-1, flow_forward[i-1] warps i-1 -> i
        feats_f = x.transpose(1, 0, 2, 3, 4)
        flows_f = jnp.concatenate(
            [zero_flow, flows_forward.transpose(1, 0, 2, 3, 4)], axis=0
        )
        xs_f = {"feat": feats_f, "flow": flows_f, "not_first": not_first, "kf": kf_flags}
        _, ys_f = step(init_carry(), xs_f)
        outputs_fwd = ys_f.transpose(1, 0, 2, 3, 4)

        fused = jnp.concatenate([outputs_back, x, outputs_fwd], axis=-1)
        out = nn.Conv(self.embed_dim, (1, 1),
                      kernel_init=torch_conv_kernel_init(), name="fusion")(
            fused.reshape(B * T, H, W, 3 * C)
        )
        out = leaky_relu(out, 0.1)
        return out.reshape(B, T, H, W, C)
