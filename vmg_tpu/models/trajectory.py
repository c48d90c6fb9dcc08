"""Trajectory-aware bidirectional propagation (TTVSR-style) as segmented
lax.scans.

Re-design of the reference's Python-loop recurrence
(``models/trajectory.py:226-490`` Trajectory_multi_head,
``:493-807`` LTAM_multi_head) for XLA, exploiting a property the reference
never uses: **the keyframe-slot count at every step is statically known**
(slots are appended at the fixed stride, ``trajectory.py:309-310``), so
instead of one scan over T steps carrying max-size zero-padded buffers and
masking invalid slots out of the attention, the recurrence splits into
segments between keyframe appends:

  * within a segment the keyframe buffers are **scan constants** (appended
    only at segment ends), carried outside the scan as exactly-c-slot
    stacks -- no (B, K, H, W, C) buffer carry, no -1e9 slot masking, no
    conditional buffer writes;
  * each step gathers and attends over exactly the valid slots: for the
    paper config (T=16, stride 3) that is 45 slot-resamplings per
    direction instead of 96 -- a >2x cut in gather traffic, the profiled
    bottleneck (NOTES_ROUND2: XLA TPU gather runs 25-30 GB/s);
  * the RetNet temporal-decay exponent (count - slot) becomes a static
    constant per segment;
  * one shared step module (name ``step``) serves every segment and both
    directions -- weight sharing matches the reference, which reuses
    ``resblocks``/``LTAM`` across passes, and checkpoint key paths are
    unchanged.

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

from vmg_tpu.ops.warp import flow_warp, grid_sample
from vmg_tpu.models.blocks import leaky_relu, torch_conv_kernel_init, trunc_normal_init


class ResidualBlockNoBN(nn.Module):
    """conv-ReLU-conv with scaled residual (reference trajectory.py:165).

    ``impl``: 'xla' (module convs; training/CPU) | 'auto'/'pallas'
    (serving: the whole block as ONE fused Pallas pass, ops/conv_chain).
    Inside the trajectory scan XLA pins the carry layout W-major and
    drags ~1/3 of these convs to 2.3x their standalone cost
    (NOTES_ROUND5); the pallas_call boundary forces row-major operands
    -- the layout pin the scan body needs.  No VJP: training keeps 'xla'.
    """

    mid_channels: int
    res_scale: float = 1.0
    impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        use_pallas = self.mid_channels <= 128 and (
            self.impl in ("pallas", "interpret")
            or (self.impl == "auto" and jax.default_backend() == "tpu"))
        if use_pallas:
            from vmg_tpu.models.blocks import _Conv3x3Params
            from vmg_tpu.ops.conv_chain import fused_conv_chain
            C = x.shape[-1]
            k1, b1 = _Conv3x3Params(self.mid_channels, name="conv1")(C)
            k2, b2 = _Conv3x3Params(self.mid_channels, name="conv2")(C)
            return fused_conv_chain(x, k1, b1, k2, b2,
                                    res_scale=self.res_scale,
                                    interpret=self.impl == "interpret")
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
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_channels, (3, 3), padding=1,
                    kernel_init=torch_conv_kernel_init(), name="conv_in")(x)
        x = leaky_relu(x, 0.1)
        for i in range(self.num_blocks):
            x = ResidualBlockNoBN(self.out_channels, self.res_scale,
                                  impl=self.conv_impl,
                                  name=f"block{i}")(x)
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


def _field_context(feat, stride: int, ratio: float):
    """Multi-scale context feature for en_field keyframe buffers
    (reference trajectory.py:367-379): per stride-aligned patch grid, take
    the surrounding int(ratio*stride) patch (the reference's
    unfold->fold-to-(ratio*h, ratio*w)) and adaptive-average-pool back to
    (h, w).  feat: (N, H, W, C) with H % stride == W % stride == 0."""
    from vmg_tpu.ops.resize import adaptive_avg_pool2d

    N, H, W, C = feat.shape
    k = int(ratio * stride)
    pad = (k - stride) // 2
    nh, nw = H // stride, W // stride
    xp = jnp.pad(feat, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    rows = (np.arange(nh)[:, None] * stride + np.arange(k)[None, :]).reshape(-1)
    cols = (np.arange(nw)[:, None] * stride + np.arange(k)[None, :]).reshape(-1)
    y = xp[:, rows][:, :, cols]  # (N, nh*k = ratio*H, nw*k, C)
    return adaptive_avg_pool2d(y, H, W)


def _wins_attention_strided(q_full, k_full, v_full, rpe, slot_decay, scale,
                            n, K, h, w, head, d, wh, ww):
    """Transpose-free twins-window attention.

    The window form (`_to_key_windows`) relayouts (n,K,h,w,c) into
    per-window token stacks -- on TPU those are small-granularity sublane
    transposes costing ~2 ms per slot-step (NOTES_ROUND3 xplane: the 3.1
    ms/slot marginal is ~1 ms gather + ~2 ms window transforms).  This form
    never leaves the image layout: each of the wh*ww window key positions is
    one strided slice broadcast back to full resolution, logits/softmax/
    weighted-sum run on (K, t, h, w, head) arrays with reductions over the
    leading (K, t) axes.  Same FLOPs, zero relayouts; numerics identical up
    to fp32 reduction order.
    """
    q5 = (q_full * scale).reshape(n, h, w, head, d)
    k6 = k_full.reshape(n, K, h, w, head, d)
    v6 = v_full.reshape(n, K, h, w, head, d)
    nh, nw = h // wh, w // ww
    tn = wh * ww

    def _broadcast_sel(x6, ki, kj):
        sel = x6[:, :, ki::wh, kj::ww]  # (n,K,nh,nw,e,d)
        return jnp.broadcast_to(
            sel[:, :, :, None, :, None],
            (n, K, nh, wh, nw, ww, head, d),
        ).reshape(n, K, h, w, head, d)

    logits = jnp.stack(
        [(q5[:, None] * _broadcast_sel(k6, ki, kj)).sum(-1)
         for ki in range(wh) for kj in range(ww)],
        axis=2,
    )  # (n, K, t, h, w, e)

    # pe[e, K, q, k'] = slot_decay[e, K] * rpe[e, q, k'], tiled so every
    # pixel sees the bias of its in-window query position
    pe = slot_decay[:, :, None, None] * rpe[:, None]  # (e, K, q_n, t)
    pe = pe.transpose(1, 3, 2, 0).reshape(K, tn, wh, ww, head)
    pe = jnp.broadcast_to(
        pe[:, :, None, :, None, :, :], (K, tn, nh, wh, nw, ww, head)
    ).reshape(K, tn, h, w, head)
    logits = logits + pe[None]

    m = logits.max(axis=(1, 2), keepdims=True)
    ex = jnp.exp(logits - m)
    attn = ex / ex.sum(axis=(1, 2), keepdims=True)

    out = jnp.zeros((n, h, w, head, d), jnp.float32)
    t = 0
    for ki in range(wh):
        for kj in range(ww):
            out = out + (attn[:, :, t, ..., None]
                         * _broadcast_sel(v6, ki, kj)).sum(axis=1)
            t += 1
    return out.reshape(n, h, w, head * d)


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

    All K = sparse_buf.shape[1] slots are valid by construction (the
    segmented recurrence passes exactly the appended keyframes), so the
    decay exponent (count - slot) is the static (K - slot) and no slot
    masking exists -- the reference reaches identical numerics through a
    dynamically grown buffer list (``trajectory.py:553-560``).
    """

    embed_dim: int
    head: int = 4
    mode: str = "wins"
    if_scale: bool = True
    twins: tuple = (2, 2)
    # the key features (index_buf) are nearest-gathered and L2-normalize is
    # per-pixel, so normalization commutes exactly with the gather (zeros
    # padding maps 0 -> 0 either way); the segmented recurrence
    # pre-normalizes the static index buffers once per segment instead of
    # normalizing the gathered copy every step
    keys_prenormalized: bool = False
    # en_field multi-scale keyframe buffers (reference trajectory.py
    # forward_max s2/s3 path): only mode='max' supports them -- the
    # reference's 'wins' + en_field path crashes on an undefined variable
    # (trajectory.py:782 ``mid_r``), reproduced as an explicit error
    en_field: bool = False
    # 'windows': window-relayout attention (the fast path: measured 432 ms
    # per direction at bench shapes); 'strided': the transpose-free
    # formulation -- equivalence-tested but 3.2x SLOWER on v5e (XLA
    # materializes the (n,K,h,w,head,d) broadcasts instead of fusing them
    # into the mul-reduce; tools/bench_micro.py --what traj), kept as an
    # option and a future Pallas-fusion target
    win_impl: str = "windows"
    # presampled=True: the recurrence carries WARPED buffer copies (see
    # TrajectoryMultiHead carry_impl='warped'), so sparse_buf/index_buf/
    # sparse_s2/s3 arrive already resampled with shape (n, h, w, K, c) and
    # loc is ignored.  presampled=False keeps the reference-shaped gather
    # of (n, K, h, w, c) buffers at per-slot locations.
    presampled: bool = False
    # run the fused kv_packed attention kernel in Pallas interpret mode
    # (CPU equivalence tests only)
    pallas_interpret: bool = False

    @nn.compact
    def __call__(self, curr, index_buf, anchor, sparse_buf, loc,
                 sparse_s2=None, sparse_s3=None, kv_packed=None):
        """curr/anchor: (n,h,w,c); index/sparse bufs: (n,K,h,w,c);
        loc: (n,K,h,w,2) absolute pixel coords; sparse_s2/s3: optional
        en_field context buffers (n,K,h,w,c).

        ``kv_packed`` (win_impl='pallas' fast path): instead of
        index/sparse bufs, the warped keyframe buffers in the
        lane-aligned layout of ops/ltam_attention -- (n, h, w, K*2*CP)
        with per slot CP value lanes then CP normalized-key lanes,
        CP = ceil(c/128)*128, zero-padded beyond c."""
        n, h, w, c = curr.shape
        head = self.head
        d = c // head

        if kv_packed is not None:
            if self.mode != "wins" or tuple(self.twins) != (2, 2):
                raise ValueError("kv_packed needs mode='wins', twins=(2,2)")
            from vmg_tpu.ops.ltam_attention import ltam_attention_2x2, cpad
            CP = cpad(c)
            K = kv_packed.shape[-1] // (2 * CP)
            scale = (d ** -0.5) if self.if_scale else 1.0
            rpe = self.param("relative_pos_encoding", trunc_normal_init(),
                             (head, 4, 4))
            decay_v = 1.0 - 2.0 ** (-5.0 - jnp.arange(head - 1, -1, -1,
                                                      dtype=jnp.float32))
            expo = (K - jnp.arange(K)).astype(jnp.float32)
            slot_decay = jnp.power(decay_v[:, None], expo[None, :])
            pef = jnp.exp(jnp.einsum("ek,ept->ktpe", slot_decay,
                                     rpe.astype(jnp.float32)))
            q = _normalize(curr.astype(jnp.float32)) * scale
            q = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, CP - c)))
            out = ltam_attention_2x2(
                q, kv_packed, pef, K=K, heads=head, C=c,
                interpret=self.pallas_interpret)[..., :c]
            out = nn.Dense(self.embed_dim, kernel_init=trunc_normal_init(),
                           name="proj")(out)
            return (out + anchor.astype(jnp.float32)).astype(curr.dtype)

        if self.en_field and self.mode == "wins":
            raise NotImplementedError(
                "en_field with mode='wins' is a latent crash in the "
                "reference (trajectory.py:782 uses undefined mid_r); "
                "use mode='max'"
            )

        scale = (d ** -0.5) if (self.if_scale and self.mode == "wins") else 1.0

        if self.presampled:
            # buffers arrive (n, h, w, K, c) -- already warped along the
            # trajectory; bring them to the (n, K, h, w, c) layout the
            # attention code uses (XLA fuses this into the consumers)
            K = sparse_buf.shape[3]
            samp_sparse = sparse_buf.transpose(0, 3, 1, 2, 4)
            samp_index = index_buf.transpose(0, 3, 1, 2, 4)
            samp_extra = [
                v.transpose(0, 3, 1, 2, 4)
                for v in (sparse_s2, sparse_s3) if v is not None
            ]
        else:
            K = sparse_buf.shape[1]
            # all buffers share indices: one fused wide gather (TPU gather
            # cost is per-element but the fused form fuses surrounding ops
            # better; measured faster than split)
            parts = [sparse_buf, index_buf]
            if self.en_field and sparse_s2 is not None:
                parts += [sparse_s2, sparse_s3]
            both = jnp.concatenate(parts, axis=-1)
            nc = both.shape[-1]
            samp = _loc_grid_sample(
                both.reshape(n * K, h, w, nc),
                loc.reshape(n * K, h, w, 2), h, w,
            ).reshape(n, K, h, w, nc)
            samp_sparse = samp[..., :c]
            samp_index = samp[..., c:2 * c]
            samp_extra = [samp[..., (2 + j) * c: (3 + j) * c]
                          for j in range(2)] if (
                self.en_field and sparse_s2 is not None) else []

        if self.mode == "wins":
            wh, ww = self.twins
            q_n = wh * ww

            # decay x learned relative position bias; exponent is static
            rpe = self.param("relative_pos_encoding", trunc_normal_init(),
                             (head, q_n, q_n))
            decay_v = 1.0 - 2.0 ** (-5.0 - jnp.arange(head - 1, -1, -1,
                                                      dtype=jnp.float32))
            expo = (K - jnp.arange(K)).astype(jnp.float32)  # (K,)
            slot_decay = jnp.power(decay_v[:, None], expo[None, :])

            curr_n = _normalize(curr.astype(jnp.float32))
            index_n = (samp_index.astype(jnp.float32) if self.keys_prenormalized
                       else _normalize(samp_index.astype(jnp.float32)))

            if self.win_impl == "strided":
                out = _wins_attention_strided(
                    curr_n, index_n, samp_sparse.astype(jnp.float32),
                    rpe, slot_decay, scale, n, K, h, w, head, d, wh, ww)
            else:
                # relayout in the NATIVE dtype (bf16 in serving): the window
                # transposes are the profiled cost of this branch and the
                # f32 cast doubled their bytes; the einsums accumulate in
                # f32 regardless (preferred_element_type), and fp32 inputs
                # keep exact fp32 numerics (dtype-follow)
                v = _to_key_windows(samp_sparse, n, K, h, w, head, d,
                                    wh, ww)
                q = _to_query_windows(curr_n.astype(curr.dtype), n, h, w,
                                      head, d, wh, ww)
                k = _to_key_windows(index_n.astype(curr.dtype), n, K, h, w,
                                    head, d, wh, ww)
                logits = jnp.einsum("bwhqd,bwhkd->bwhqk", q * scale, k,
                                    preferred_element_type=jnp.float32)
                logits = logits.astype(jnp.float32)
                pe = slot_decay[:, None, :, None] * rpe[:, :, None, :]
                pe = pe.reshape(head, q_n, K * q_n)
                logits = logits + pe[None, None]

                attn = jax.nn.softmax(logits, axis=-1)
                out = jnp.einsum("bwhqk,bwhkd->bwhqd", attn,
                                 v.astype(jnp.float32),
                                 preferred_element_type=jnp.float32)
                nh, nw = h // wh, w // ww
                out = out.reshape(n, nh, nw, head, wh, ww, d)
                out = out.transpose(0, 1, 4, 2, 5, 3, 6).reshape(n, h, w, c)
        elif self.mode == "max":
            curr_n = _normalize(curr.astype(jnp.float32))
            index_n = (samp_index.astype(jnp.float32) if self.keys_prenormalized
                       else _normalize(samp_index.astype(jnp.float32)))
            qf = curr_n.reshape(n, h * w, head, d)
            kf = index_n.reshape(n, K, h * w, head, d)
            sim = jnp.einsum("bphd,bkphd->bpkh", qf, kf)
            corr_soft = sim.max(axis=2)
            corr_idx = sim.argmax(axis=2)
            vals = samp_sparse.reshape(n, K, h * w, head, d).astype(jnp.float32)
            gathered = jnp.take_along_axis(
                vals, corr_idx[:, None, :, :, None], axis=1
            )[:, 0]
            if self.en_field and sparse_s2 is not None:
                # hard-select the same argmax slot from the context scales
                # and fuse [s1, s2, s3] before the corr_soft scaling
                # (reference forward_max:651-667)
                outs = [gathered.reshape(n, h, w, c)]
                for vj in samp_extra:
                    vj = vj.reshape(n, K, h * w, head, d).astype(jnp.float32)
                    gj = jnp.take_along_axis(
                        vj, corr_idx[:, None, :, :, None], axis=1)[:, 0]
                    outs.append(gj.reshape(n, h, w, c))
                fused = nn.Conv(self.embed_dim, (1, 1),
                                kernel_init=torch_conv_kernel_init(),
                                name="fusion")(
                    jnp.concatenate(outs, axis=-1))
                out = fused * corr_soft.reshape(n, h, w, head)[
                    ..., :, None].repeat(d, axis=-1).reshape(n, h, w, c)
            else:
                out = (gathered * corr_soft[..., None]).reshape(n, h, w, c)
        else:
            raise ValueError(f"unknown LTAM mode {self.mode!r}")

        out = nn.Dense(self.embed_dim, kernel_init=trunc_normal_init(), name="proj")(out)
        return (out + anchor.astype(jnp.float32)).astype(curr.dtype)


class _TrajStep(nn.Module):
    """One recurrence step, nn.scan-ed over a constant-count segment.

    The slot count is derived from shapes, so ONE shared instance (name
    ``step``) serves every segment and both directions.  Slot count 0 is
    the first step: no warp history, no LTAM (reference
    ``trajectory.py:324-333`` i > 0 branch).

    Two carry disciplines (TrajectoryMultiHead.carry_impl):

    * ``'warped'`` (default): carry the keyframe buffers THEMSELVES,
      nearest-warped along the trajectory.  Nearest resampling composes
      exactly -- ``gather(buf, loc_t) == warp(gather(buf, loc_{t-1}),
      flow_t)`` since location maps hold in-range coords of the original
      grid -- so per step ONE (H, W, K*S*C)-channel nearest warp replaces
      K per-slot 448-byte-row gathers: ~S*K*C-element rows amortize the
      TPU gather's per-row cost (the profiled LTAM bottleneck,
      NOTES_ROUND3: gathers at 25-30 GB/s).
    * ``'loc'``: the reference-shaped discipline -- carry per-slot integer
      location maps and gather the (scan-constant) buffers each step.
    """

    embed_dim: int
    num_blocks: int
    r_scaling: float
    ltam: bool
    ltam_cfg: dict
    carry_impl: str = "warped"
    # lane-aligned buffer layout + fused Pallas attention (see
    # TrajectoryMultiHead.win_impl='auto'): the carried buffer holds, per
    # slot, CP=cpad(C) value lanes then CP normalized-key lanes
    pallas_attn: bool = False
    pallas_interpret: bool = False
    # carry tensors cross the scan boundary flattened to (B, H*W, C*):
    # XLA's layout assignment was observed pinning the 4D carry W-major
    # ({3,1,2,0}), which drags ~a third of the in-scan resblock convs to
    # ~0.30 ms each vs 0.13 standalone; the rank-3 carry leaves the body
    # free to pick row-major (experimental flag, A/B in xprof traj)
    flat_carry: bool = False
    conv_impl: str = "xla"  # resblock impl (ResidualBlockNoBN.impl)

    @nn.compact
    def __call__(self, carry, xs, sparse_buf, index_buf, sparse_s2,
                 sparse_s3):
        lr = xs["feat"]
        flow = xs["flow"]
        B, H, W, C = lr.shape
        en_field = self.ltam_cfg.get("en_field", False)

        if self.carry_impl == "warped" and self.pallas_attn:
            from vmg_tpu.ops.ltam_attention import cpad
            feat_prop, warped = carry  # (B,H,W,C), (B,H,W,K*2*CP)
            if self.flat_carry:
                feat_prop = feat_prop.reshape(B, H, W, C)
                warped = warped.reshape(B, H, W, -1)
            K = warped.shape[-1] // (2 * cpad(C))
            if K:
                feat_prop = flow_warp(feat_prop, flow, "bilinear", "border")
                warped = flow_warp(warped, flow, "nearest", "border")
                if self.ltam:
                    feat_prop = LTAM(
                        embed_dim=self.embed_dim, **self.ltam_cfg,
                        keys_prenormalized=True, presampled=True,
                        pallas_interpret=self.pallas_interpret,
                        name="LTAM",
                    )(lr, None, feat_prop, None, None, kv_packed=warped)
            rest = warped
        elif self.carry_impl == "warped":
            feat_prop, warped = carry  # (B,H,W,C), (B,H,W,K*S*C)
            S = 4 if en_field else 2
            K = warped.shape[-1] // (S * C)
            if K:
                feat_prop = flow_warp(feat_prop, flow, "bilinear", "border")
                warped = flow_warp(warped, flow, "nearest", "border")
                if self.ltam:
                    w5 = warped.reshape(B, H, W, K, S * C)
                    feat_prop = LTAM(
                        embed_dim=self.embed_dim, **self.ltam_cfg,
                        keys_prenormalized=True, presampled=True,
                        name="LTAM",
                    )(lr, w5[..., C:2 * C], feat_prop, w5[..., :C], None,
                      sparse_s2=w5[..., 2 * C:3 * C] if en_field else None,
                      sparse_s3=w5[..., 3 * C:4 * C] if en_field else None)
            rest = warped
        else:
            feat_prop, loc = carry  # (B,H,W,C), (B,c,H,W,2)
            c = loc.shape[1]
            if c:  # steps after the first: warp history + attend
                feat_prop = flow_warp(feat_prop, flow, "bilinear", "border")
                flow_rep = jnp.broadcast_to(flow[:, None], (B, c, H, W, 2))
                loc = flow_warp(
                    loc.reshape(B * c, H, W, 2),
                    flow_rep.reshape(B * c, H, W, 2),
                    "nearest", "border",
                ).reshape(B, c, H, W, 2)
                if self.ltam:
                    feat_prop = LTAM(
                        embed_dim=self.embed_dim, **self.ltam_cfg,
                        keys_prenormalized=True, name="LTAM",
                    )(lr, index_buf, feat_prop, sparse_buf, loc,
                      sparse_s2=sparse_s2, sparse_s3=sparse_s3)
            rest = loc

        rb_in = jnp.concatenate([lr, feat_prop], axis=-1)
        if self.conv_impl == "barrier":
            # identity Pallas pass: pins the scan-local tensor to the
            # default row-major layout before the conv chain (one extra
            # read+write; A/B vs the W-major carry penalty)
            from vmg_tpu.ops.conv_chain import layout_pin
            rb_in = layout_pin(rb_in)
        feat_prop = ResidualBlocksWithInputConv(
            self.embed_dim, self.num_blocks, self.r_scaling,
            conv_impl=("xla" if self.conv_impl in ("barrier", "barrier_out")
                       else self.conv_impl), name="resblocks"
        )(rb_in)
        if self.conv_impl == "barrier_out":
            # pin the chain OUTPUT instead: layout assignment propagates
            # backward from the consumer (the W-major carry), so a
            # row-major pin here should free the chain's internal convs
            from vmg_tpu.ops.conv_chain import layout_pin
            feat_prop = layout_pin(feat_prop)

        # pin the carry dtype to the feature dtype: under mixed init (bf16
        # input, fp32 params) the conv output promotes to fp32 and the
        # scan would reject the carry
        feat_prop = feat_prop.astype(lr.dtype)
        if self.flat_carry and self.carry_impl == "warped" \
                and self.pallas_attn:
            return (feat_prop.reshape(B, H * W, C),
                    rest.reshape(B, H * W, -1)), feat_prop
        return (feat_prop, rest), feat_prop


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
    # en_field: append 1.5x / 2x context features of each keyframe as extra
    # buffers, hard-selected by the same argmax and fused (reference
    # trajectory.py:367-379, forward_max s2/s3; requires mode='max')
    en_field: bool = False
    field_stride: int = 4
    # checkpoint the scan step in the backward pass (training memory)
    remat: bool = False
    # jax.checkpoint_policies name for the scan-step remat (None = save
    # nothing inside the step)
    remat_policy: Optional[str] = None
    # LTAM wins-attention implementation (see LTAM.win_impl).  'auto'
    # resolves to the fused Pallas kernel (ops/ltam_attention) when the
    # shape family supports it AND the runtime backend is TPU; 'pallas'
    # forces the kernel; 'windows'/'strided' are the XLA formulations.
    # The kernel differentiates through a fused backward kernel (custom
    # VJP in ops/ltam_attention), so training resolves to it too.
    win_impl: str = "windows"
    # run the Pallas kernel in interpret mode (CPU equivalence tests)
    pallas_interpret: bool = False
    # recurrence carry discipline (see _TrajStep): 'warped' carries the
    # nearest-warped keyframe buffers (one wide-row warp per step, the
    # serving fast path); 'loc' carries per-slot location maps and gathers
    # the static buffers each step (reference-shaped; equivalence oracle)
    carry_impl: str = "warped"
    # rank-3 scan carries (see _TrajStep.flat_carry); experimental
    flat_carry: bool = False
    # resblock conv implementation inside the scan (see ResidualBlockNoBN
    # .impl): 'auto' = fused conv-chain Pallas kernel on TPU (serving; no
    # VJP -- the model passes 'xla' when training)
    conv_impl: str = "xla"

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
        stride = self.keyframe_stride

        # resolve 'auto'/'pallas' -> the fused lane-aligned attention
        # kernel (fwd + custom-VJP bwd; 'auto' additionally requires the TPU
        # backend so CPU tests/dryruns keep the XLA windows path)
        pallas_attn = (
            self.carry_impl == "warped" and self.mode == "wins"
            and self.ltam and not self.en_field
            and tuple(self.twins) == (2, 2)
            and H % 2 == 0 and W % 2 == 0
            and (self.win_impl == "pallas"
                 or (self.win_impl == "auto"
                     and jax.default_backend() == "tpu"))
        )
        win_impl = self.win_impl if self.win_impl in ("windows", "strided") \
            else "windows"

        pol = (getattr(jax.checkpoint_policies, self.remat_policy)
               if self.remat_policy else None)
        # prevent_cse=True keeps jax.checkpoint's recompute barriers --
        # see the memory note at the TAB remat site (models/vmg.py)
        step_cls = (nn.remat(_TrajStep, prevent_cse=True, policy=pol)
                    if self.remat else _TrajStep)
        step = nn.scan(
            step_cls,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(0, nn.broadcast, nn.broadcast, nn.broadcast,
                     nn.broadcast),
            out_axes=0,
        )(
            embed_dim=self.embed_dim,
            num_blocks=self.num_blocks,
            r_scaling=self.r_scaling,
            ltam=self.ltam,
            ltam_cfg=dict(
                head=self.head,
                mode=self.mode,
                if_scale=self.head_scale,
                twins=tuple(self.twins),
                en_field=self.en_field,
                win_impl=win_impl,
            ),
            carry_impl=self.carry_impl,
            pallas_attn=pallas_attn,
            pallas_interpret=self.pallas_interpret,
            flat_carry=self.flat_carry and pallas_attn,
            conv_impl=self.conv_impl,
            name="step",
        )
        flat_active = (self.flat_carry and pallas_attn
                       and self.carry_impl == "warped")

        # segment boundaries: [0] alone (count 0), then runs of `stride`
        # steps each ending at a keyframe step (count constant inside)
        segments = [(0, 0)]
        s = 1
        while s < T:
            nk = ((s - 1) // stride + 1) * stride  # next keyframe step >= s
            e = min(nk, T - 1)
            segments.append((s, e))
            s = e + 1

        gy, gx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                              jnp.arange(W, dtype=jnp.float32), indexing="ij")
        ident = jnp.stack([gx, gy], -1)[None, None]  # (1, 1, H, W, 2)

        warped_mode = self.carry_impl == "warped"

        def run_direction(feats_dir, flows_dir):
            """feats_dir: (T, N, H, W, C); flows_dir: (T, N, H, W, 2)
            (flows_dir[0] is zero; step s >= 1 warps with flows_dir[s])."""
            N = feats_dir.shape[1]
            grid0 = jnp.broadcast_to(ident, (N, 1, H, W, 2)).astype(jnp.float32)
            feat_prop = jnp.zeros((N, H, W, C), x.dtype)
            loc = jnp.zeros((N, 0, H, W, 2), jnp.float32)
            sparse = jnp.zeros((N, 0, H, W, C), x.dtype)
            index = jnp.zeros((N, 0, H, W, C), x.dtype)
            s2 = s3 = jnp.zeros((N, 0, H, W, C), x.dtype)
            warped = jnp.zeros((N, H, W, 0), x.dtype)
            outs = []
            for a, b in segments:
                xs = {"feat": feats_dir[a:b + 1], "flow": flows_dir[a:b + 1]}
                rest = warped if warped_mode else loc
                if flat_active:
                    carry_in = (feat_prop.reshape(N, H * W, C),
                                rest.reshape(N, H * W, -1))
                else:
                    carry_in = (feat_prop, rest)
                (feat_prop, rest), ys = step(carry_in, xs,
                                             sparse, index, s2, s3)
                if flat_active:
                    feat_prop = feat_prop.reshape(N, H, W, C)
                    rest = rest.reshape(N, H, W, -1)
                if warped_mode:
                    warped = rest
                else:
                    loc = rest
                outs.append(ys)
                if b % stride == 0:  # keyframe: append a slot
                    # keys pre-normalized once here instead of per step
                    kf_norm = _normalize(
                        feats_dir[b].astype(jnp.float32)).astype(x.dtype)
                    fields = ()
                    if self.en_field:
                        fs = self.field_stride
                        fields = (_field_context(ys[-1], fs, 1.5),
                                  _field_context(ys[-1], fs, 2.0))
                    if warped_mode and pallas_attn:
                        # lane-aligned slot entry: CP value lanes then CP
                        # key lanes, zero-padded (ops/ltam_attention)
                        from vmg_tpu.ops.ltam_attention import cpad
                        padw = ((0, 0),) * 3 + ((0, cpad(C) - C),)
                        entry = jnp.concatenate(
                            (jnp.pad(ys[-1], padw), jnp.pad(kf_norm, padw)),
                            axis=-1)
                        warped = jnp.concatenate([warped, entry], axis=-1)
                    elif warped_mode:
                        # new slot starts un-warped (identity locations)
                        entry = jnp.concatenate(
                            (ys[-1], kf_norm) + fields, axis=-1)
                        warped = jnp.concatenate([warped, entry], axis=-1)
                    else:
                        sparse = jnp.concatenate(
                            [sparse, ys[-1][:, None]], axis=1)
                        index = jnp.concatenate(
                            [index, kf_norm[:, None]], axis=1)
                        loc = jnp.concatenate([loc, grid0], axis=1)
                        if self.en_field:
                            s2 = jnp.concatenate(
                                [s2, fields[0][:, None]], axis=1)
                            s3 = jnp.concatenate(
                                [s3, fields[1][:, None]], axis=1)
            return jnp.concatenate(outs, axis=0)

        zero_flow = jnp.zeros((1, B, H, W, 2), jnp.float32)

        # NOTE: batching the two (weight-shared, independent) directions
        # through one 2B recurrence was tried and measured SLOWER on v5e
        # (7.72 vs 8.48 f/s full-model: the chip is already saturated per
        # step and the doubled working set hurts); they run sequentially.
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
