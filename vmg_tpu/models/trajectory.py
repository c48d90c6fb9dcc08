"""Trajectory-aware bidirectional propagation (TTVSR-style) as a lax.scan.

Re-design of the reference's Python-loop recurrence
(``models/trajectory.py:226-490`` Trajectory_multi_head,
``:493-807`` LTAM_multi_head) for XLA:

  * the T-step recurrence in each direction is ONE ``nn.scan`` body --
    compile time is O(1) in T instead of an unrolled graph;
  * the dynamically-growing keyframe buffers become fixed-size buffers of
    K = ceil(T / keyframe_stride) slots plus a valid-count; invalid slots
    are masked out of the attention with -1e9 logits;
  * both directions share one scanned step module (weight sharing matches
    the reference, which reuses ``resblocks``/``LTAM`` across passes);
  * everything that does not depend on the recurrent state is HOISTED out
    of the scan ('wins' mode): the tracked-location maps evolve only with
    the flows, and the attention keys are the (static) keyframe input
    features resampled at those locations -- so location tracking runs as
    a cheap pre-scan and the cosine key logits are computed in one batched
    einsum over all T steps.  Only the value resampling (keyframe outputs,
    produced inside the recurrence), decay-bias softmax, and the weighted
    sum remain in the scan body.

Numerics notes: cosine features are L2-normalized over the full channel dim
before the head split (reference ``trajectory.py:620-627``), the temporal
decay exponent is (count - slot) so the newest keyframe decays least
(``trajectory.py:534-547``), and location maps warp with *nearest* sampling
on border padding (``trajectory.py:332-333``).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from vmg_tpu.ops.warp import flow_warp, grid_sample
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
    """torch F.normalize: v / max(||v||, eps).

    Written as rsqrt(max(||v||^2, eps^2)) so the gradient at v = 0 is 0
    (as in torch) instead of NaN -- zeros-padded gather outputs hit this
    (sqrt has an infinite derivative at 0 and 0 * inf = NaN in the vjp).
    """
    n2 = jnp.sum(v * v, axis=axis, keepdims=True)
    return v * jax.lax.rsqrt(jnp.maximum(n2, eps * eps))


def _loc_grid_sample(x, loc, h, w, mode="nearest"):
    """Sample x (N,H,W,C) at absolute pixel locations loc (N,H,W,2)."""
    gx = 2.0 * loc[..., 0] / max(w - 1, 1) - 1.0
    gy = 2.0 * loc[..., 1] / max(h - 1, 1) - 1.0
    return grid_sample(x, jnp.stack([gx, gy], -1), mode=mode,
                       padding_mode="zeros")


def _to_key_windows(v, n, K, h, w, head, ch, wh, ww):
    """(n, K, h, w, head*ch) -> (n, nWin, head, K*wh*ww, ch), slot-major."""
    nh, nw = h // wh, w // ww
    v = v.reshape(n, K, nh, wh, nw, ww, head, ch)
    v = v.transpose(0, 2, 4, 6, 1, 3, 5, 7)  # n nh nw head K wh ww ch
    return v.reshape(n, nh * nw, head, K * wh * ww, ch)


def _to_query_windows(q, n, h, w, head, ch, wh, ww):
    nh, nw = h // wh, w // ww
    q = q.reshape(n, nh, wh, nw, ww, head, ch)
    return q.transpose(0, 1, 3, 5, 2, 4, 6).reshape(n, nh * nw, head,
                                                    wh * ww, ch)


class LTAM(nn.Module):
    """Location-guided temporal attention over keyframe buffers.

    ``mode='wins'`` (config default): windowed softmax attention over
    (K slots x twins window) keys with RetNet decay x learned relative
    position bias.  ``mode='max'``: per-head hard max over slots.

    When ``key_logits`` is supplied ('wins' fast path), the index-buffer
    resampling and cosine similarities were precomputed outside the scan;
    only decay bias, masking, softmax, value gather, and the weighted sum
    run here.
    """

    embed_dim: int
    head: int = 4
    mode: str = "wins"
    if_scale: bool = True
    twins: tuple = (2, 2)
    max_keyframes: int = 4

    @nn.compact
    def __call__(self, curr, index_buf, anchor, sparse_buf, loc, count,
                 key_logits=None):
        """curr/anchor: (n,h,w,c); index/sparse bufs: (n,K,h,w,c);
        loc: (n,K,h,w,2) absolute pixel coords; count: () int32 valid slots;
        key_logits: optional (n, nWin, head, q_n, K*q_n) precomputed."""
        n, h, w, c = curr.shape
        K = self.max_keyframes
        head = self.head
        d = c // head

        scale = (d ** -0.5) if (self.if_scale and self.mode == "wins") else 1.0
        slot_valid = jnp.arange(K) < count  # (K,)

        if self.mode == "wins":
            wh, ww = self.twins
            q_n = wh * ww

            if key_logits is None:
                # both buffers share indices: one fused 2C gather (TPU
                # gather cost is per-element but the fused form fuses
                # surrounding ops better; measured faster than split)
                both = jnp.concatenate([sparse_buf, index_buf], axis=-1)
                samp = _loc_grid_sample(
                    both.reshape(n * K, h, w, 2 * c),
                    loc.reshape(n * K, h, w, 2), h, w,
                ).reshape(n, K, h, w, 2 * c)
                samp_sparse = samp[..., :c]
                samp_index = samp[..., c:]
                v = _to_key_windows(samp_sparse.astype(jnp.float32), n, K,
                                    h, w, head, d, wh, ww)
                curr_n = _normalize(curr.astype(jnp.float32))
                index_n = _normalize(samp_index.astype(jnp.float32))
                q = _to_query_windows(curr_n, n, h, w, head, d, wh, ww)
                k = _to_key_windows(index_n, n, K, h, w, head, d, wh, ww)
                logits = jnp.einsum("bwhqd,bwhkd->bwhqk", q * scale, k,
                                    preferred_element_type=jnp.float32)
            else:
                samp_sparse = _loc_grid_sample(
                    sparse_buf.reshape(n * K, h, w, c),
                    loc.reshape(n * K, h, w, 2), h, w,
                ).reshape(n, K, h, w, c)
                v = _to_key_windows(samp_sparse.astype(jnp.float32), n, K,
                                    h, w, head, d, wh, ww)
                logits = key_logits.astype(jnp.float32)

            # decay x learned relative position bias
            rpe = self.param("relative_pos_encoding", trunc_normal_init(),
                             (head, q_n, q_n))
            decay_v = 1.0 - 2.0 ** (-5.0 - jnp.arange(head - 1, -1, -1,
                                                      dtype=jnp.float32))
            expo = (count - jnp.arange(K)).astype(jnp.float32)  # (K,)
            slot_decay = jnp.power(decay_v[:, None], expo[None, :])
            pe = slot_decay[:, None, :, None] * rpe[:, :, None, :]
            pe = pe.reshape(head, q_n, K * q_n)
            logits = logits + pe[None, None]

            key_mask = jnp.repeat(slot_valid, q_n)
            logits = jnp.where(key_mask[None, None, None, None, :], logits, -1e9)
            attn = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum("bwhqk,bwhkd->bwhqd", attn, v,
                             preferred_element_type=jnp.float32)
            nh, nw = h // wh, w // ww
            out = out.reshape(n, nh, nw, head, wh, ww, d)
            out = out.transpose(0, 1, 4, 2, 5, 3, 6).reshape(n, h, w, c)
        elif self.mode == "max":
            both = jnp.concatenate([sparse_buf, index_buf], axis=-1)
            samp = _loc_grid_sample(
                both.reshape(n * K, h, w, 2 * c), loc.reshape(n * K, h, w, 2),
                h, w,
            ).reshape(n, K, h, w, 2 * c)
            samp_sparse = samp[..., :c]
            samp_index = samp[..., c:]
            curr_n = _normalize(curr.astype(jnp.float32))
            index_n = _normalize(samp_index.astype(jnp.float32))
            qf = curr_n.reshape(n, h * w, head, d)
            kf = index_n.reshape(n, K, h * w, head, d)
            sim = jnp.einsum("bphd,bkphd->bpkh", qf, kf)
            sim = jnp.where(slot_valid[None, None, :, None], sim, -1e9)
            corr_soft = sim.max(axis=2)
            corr_idx = sim.argmax(axis=2)
            vals = samp_sparse.reshape(n, K, h * w, head, d).astype(jnp.float32)
            gathered = jnp.take_along_axis(
                vals, corr_idx[:, None, :, :, None], axis=1
            )[:, 0]
            out = (gathered * corr_soft[..., None]).reshape(n, h, w, c)
        else:
            raise ValueError(f"unknown LTAM mode {self.mode!r}")

        out = nn.Dense(self.embed_dim, kernel_init=trunc_normal_init(), name="proj")(out)
        return (out + anchor.astype(jnp.float32)).astype(curr.dtype)


class _TrajStep(nn.Module):
    """One recurrence step; nn.scan-ed over time, shared by both passes."""

    embed_dim: int
    num_blocks: int
    r_scaling: float
    max_keyframes: int
    ltam: bool
    hoisted: bool
    ltam_cfg: dict

    @nn.compact
    def __call__(self, carry, xs):
        feat_prop, sparse_buf, index_buf, count = carry
        lr = xs["feat"]
        flow = xs["flow"]
        loc = xs["loc"]  # (n, K, h, w, 2): location state at this step
        nf = xs["not_first"]
        kf = xs["kf"]
        n, h, w, c = lr.shape
        K = self.max_keyframes

        warped_prop = flow_warp(feat_prop, flow, "bilinear", "border")
        feat_prop = jnp.where(nf > 0, warped_prop, feat_prop)

        if self.ltam:
            ltam_out = LTAM(
                embed_dim=self.embed_dim,
                max_keyframes=K,
                **self.ltam_cfg,
                name="LTAM",
            )(lr, index_buf, feat_prop, sparse_buf, loc, count,
              key_logits=xs.get("key_logits"))
            feat_prop = jnp.where(nf > 0, ltam_out, feat_prop)

        feat_prop = ResidualBlocksWithInputConv(
            self.embed_dim, self.num_blocks, self.r_scaling, name="resblocks"
        )(jnp.concatenate([lr, feat_prop], axis=-1))

        buf_sel = (jnp.arange(K) == count) & (kf > 0)
        sparse_buf = jnp.where(buf_sel[None, :, None, None, None],
                               feat_prop[:, None], sparse_buf)
        if not self.hoisted:
            index_buf = jnp.where(buf_sel[None, :, None, None, None],
                                  lr[:, None], index_buf)
        count = count + kf.astype(jnp.int32)

        return (feat_prop, sparse_buf, index_buf, count), feat_prop


def _location_prescan(flows, kf_flags, not_first, B, K, H, W):
    """Evolve the tracked-location maps over time (no parameters).

    flows: (T, B, H, W, 2) in processing order (step s uses flows[s]).
    Returns (T, B, K, H, W, 2): the location state visible to LTAM at each
    step (after warping, before the keyframe-slot append).
    """
    gy, gx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    grid0 = jnp.broadcast_to(jnp.stack([gx, gy], -1)[None, None],
                             (B, K, H, W, 2)).astype(jnp.float32)

    def step(carry, xs):
        loc, count = carry
        flow, nf, kf = xs
        flow_rep = jnp.broadcast_to(flow[:, None], (B, K, H, W, 2))
        warped = flow_warp(loc.reshape(B * K, H, W, 2),
                           flow_rep.reshape(B * K, H, W, 2),
                           "nearest", "border").reshape(B, K, H, W, 2)
        loc = jnp.where(nf > 0, warped, loc)
        ys = loc
        sel = (jnp.arange(K) == count) & (kf > 0) & (nf > 0)
        loc = jnp.where(sel[None, :, None, None, None], grid0, loc)
        count = count + kf.astype(jnp.int32)
        return (loc, count), ys

    (_, _), locs = jax.lax.scan(
        step, (grid0, jnp.asarray(0, jnp.int32)), (flows, not_first, kf_flags)
    )
    return locs


def _precompute_key_logits(x_dir, locs, kf_steps, head, scale, twins):
    """Batched cosine key logits for every step ('wins' mode).

    x_dir: (T, B, H, W, C); locs: (T, B, K, H, W, 2); kf_steps: static
    indices of keyframe steps (len K).  Returns (T, B, nWin, head, q_n,
    K*q_n) in x_dir.dtype.
    """
    T, B, H, W, C = x_dir.shape
    K = len(kf_steps)
    wh, ww = twins
    d = C // head

    index_flat = _normalize(
        x_dir[jnp.asarray(kf_steps)].astype(jnp.float32)
    ).transpose(1, 0, 2, 3, 4).reshape(B * K, H, W, C)

    def sample_one(loc_t):
        return _loc_grid_sample(index_flat, loc_t.reshape(B * K, H, W, 2), H, W)

    samp = jax.vmap(sample_one)(locs)  # (T, B*K, H, W, C), normalized values
    k = samp.reshape(T * B, K, H, W, C)
    k = _to_key_windows(k, T * B, K, H, W, head, d, wh, ww)

    q = _normalize(x_dir.astype(jnp.float32)).reshape(T * B, H, W, C)
    q = _to_query_windows(q, T * B, H, W, head, d, wh, ww)

    logits = jnp.einsum("bwhqd,bwhkd->bwhqk", q * scale, k,
                        preferred_element_type=jnp.float32)
    nwin = logits.shape[1]
    return logits.reshape(T, B, nwin, head, wh * ww, K * wh * ww).astype(
        x_dir.dtype
    )


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
    # temporal window partition (reference trajectory.py:278-298
    # windows_partition/windows_merge, gated there on the constructor-only
    # ``if_win_par`` flag): when traj_win < T, the clip splits into T/traj_win
    # independent windows batched together -- the recurrence, keyframe
    # buffers, and LTAM all run per-window; cross-window flows are dropped
    # exactly as the reference's ``flows[:, i:i+traj_win-1]`` slicing does.
    traj_win: int | None = None
    # hoist key-logit computation out of the scan: measured slightly SLOWER
    # on v5e (loses the fused 2C gather and materializes the logits to
    # HBM), so off by default; kept for larger-K / multi-chip regimes
    hoist_logits: bool = False
    # checkpoint the scan step in the backward pass (training memory)
    remat: bool = False

    @nn.compact
    def __call__(self, x, flows_forward, flows_backward):
        """x: (B, T, H, W, C); flows: (B, T-1, H, W, 2)."""
        B_in, T_in = x.shape[:2]
        partitioned = (self.traj_win is not None and 0 < self.traj_win < T_in)
        if partitioned:
            tw = int(self.traj_win)
            if T_in % tw != 0:
                raise ValueError(
                    f"traj_win={tw} must divide the clip length T={T_in} "
                    "(reference trajectory.py:281 windows_partition)"
                )
            s = T_in // tw
            x = x.reshape(B_in * s, tw, *x.shape[2:])
            # window i keeps flows i .. i+tw-2; the flow crossing into the
            # next window is dropped (reference trajectory.py:285-289)
            widx = (np.arange(s)[:, None] * tw
                    + np.arange(tw - 1)[None, :]).reshape(-1)
            flows_forward = flows_forward[:, widx].reshape(
                B_in * s, tw - 1, *flows_forward.shape[2:])
            flows_backward = flows_backward[:, widx].reshape(
                B_in * s, tw - 1, *flows_backward.shape[2:])

        B, T, H, W, C = x.shape
        K = -(-T // self.keyframe_stride)  # ceil
        hoisted = self.hoist_logits and self.ltam and self.mode == "wins"

        step_cls = nn.remat(_TrajStep, prevent_cse=False) if self.remat \
            else _TrajStep
        step = nn.scan(
            step_cls,
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
            hoisted=hoisted,
            ltam_cfg=dict(
                head=self.head,
                mode=self.mode,
                if_scale=self.head_scale,
                twins=tuple(self.twins),
            ),
            name="step",
        )

        steps = np.arange(T)
        kf_steps = [int(s) for s in steps[steps % self.keyframe_stride == 0]]
        kf_flags = jnp.asarray((steps % self.keyframe_stride) == 0, jnp.float32)
        not_first = jnp.asarray(steps > 0, jnp.float32)
        zero_flow = jnp.zeros((1, B, H, W, 2), jnp.float32)
        d = C // self.head
        scale = (d ** -0.5) if self.head_scale else 1.0

        def init_carry():
            # with hoisted key logits the index buffer is never touched;
            # keep a token array so the carry stays small
            index_init = (jnp.zeros((1,), x.dtype) if hoisted
                          else jnp.zeros((B, K, H, W, C), x.dtype))
            return (
                jnp.zeros((B, H, W, C), x.dtype),
                jnp.zeros((B, K, H, W, C), x.dtype),
                index_init,
                jnp.asarray(0, jnp.int32),
            )

        def run_direction(feats_dir, flows_dir):
            """feats_dir: (T, B, H, W, C); flows_dir: (T, B, H, W, 2)."""
            locs = _location_prescan(flows_dir, kf_flags, not_first,
                                     B, K, H, W)
            xs = {
                "feat": feats_dir,
                "flow": flows_dir,
                "loc": locs,
                "not_first": not_first,
                "kf": kf_flags,
            }
            if hoisted:
                xs["key_logits"] = _precompute_key_logits(
                    feats_dir, locs, kf_steps, self.head, scale,
                    tuple(self.twins),
                )
            _, ys = step(init_carry(), xs)
            return ys

        # backward pass: frames T-1 .. 0, flow_backward[i] warps i+1 -> i
        feats_b = x[:, ::-1].transpose(1, 0, 2, 3, 4)
        flows_b = jnp.concatenate(
            [zero_flow, flows_backward[:, ::-1].transpose(1, 0, 2, 3, 4)], axis=0
        )
        outputs_back = run_direction(feats_b, flows_b)[::-1].transpose(1, 0, 2, 3, 4)

        # forward pass: frames 0 .. T-1, flow_forward[i-1] warps i-1 -> i
        feats_f = x.transpose(1, 0, 2, 3, 4)
        flows_f = jnp.concatenate(
            [zero_flow, flows_forward.transpose(1, 0, 2, 3, 4)], axis=0
        )
        outputs_fwd = run_direction(feats_f, flows_f).transpose(1, 0, 2, 3, 4)

        fused = jnp.concatenate([outputs_back, x, outputs_fwd], axis=-1)
        out = nn.Conv(self.embed_dim, (1, 1),
                      kernel_init=torch_conv_kernel_init(), name="fusion")(
            fused.reshape(B * T, H, W, 3 * C)
        )
        out = leaky_relu(out, 0.1)
        # windows_merge (reference trajectory.py:294-298) is a pure reshape
        return out.reshape(B_in, T_in, H, W, C)
