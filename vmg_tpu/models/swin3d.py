"""3D shifted-window cross-slice attention (reference ``models/swin_3d.py``).

Used as the temporal tail of a U-Net stage when ``temporal_type`` is None
and ``temporal_empty`` is false.  The reference's rWindowAttention loops
over temporal slices, each slice's queries attending to all *other* slices'
keys (``swin_3d.py:187-209``).  That is mathematically one full N x N
window attention with same-time-slice keys masked out -- which is how we
implement it: a single batched matmul with an additive exclusion mask, a
much better MXU shape than wt separate small attentions.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from vmg_tpu.models.blocks import Mlp, DropPath, trunc_normal_init
from vmg_tpu.models.norms import TorchLayerNorm
from vmg_tpu.ops.window import (
    window_partition_3d,
    window_reverse_3d,
    get_window_size,
    compute_shift_mask_3d,
)


@functools.lru_cache(maxsize=None)
def _relative_position_index_3d(window_size: Tuple[int, int, int]) -> np.ndarray:
    wd, wh, ww = window_size
    coords = np.stack(
        np.meshgrid(np.arange(wd), np.arange(wh), np.arange(ww), indexing="ij")
    ).reshape(3, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wd - 1
    rel[:, :, 1] += wh - 1
    rel[:, :, 2] += ww - 1
    rel[:, :, 0] *= (2 * wh - 1) * (2 * ww - 1)
    rel[:, :, 1] *= 2 * ww - 1
    return rel.sum(-1)


@functools.lru_cache(maxsize=None)
def _cross_slice_mask(window_size: Tuple[int, int, int]) -> np.ndarray:
    """(N, N) additive mask excluding keys in the query's own time slice."""
    wd, wh, ww = window_size
    n = wd * wh * ww
    slice_id = np.arange(n) // (wh * ww)
    same = slice_id[:, None] == slice_id[None, :]
    return np.where(same, -1e9, 0.0).astype(np.float32)


class RWindowAttention(nn.Module):
    """Cross-time-slice window MSA with 3D relative position bias.

    ``only_one=True`` is the reference's ``attention_oo`` hard-selection
    variant (``swin_3d.py:254-301``): after the masked softmax, instead of
    the full weighted sum each query gathers only its top
    ``window_size[0]-1`` keys (or, with ``align_mask=True``, the single
    argmax key) and sums them weighted by their attention probabilities.
    The separate ``kv`` input carries the unfold-KV branch's features
    (``swin_3d.py:729-739``).

    The reference loops over temporal slices (queries = one slice,
    keys = the others); the -1e9 same-slice exclusion mask makes those
    softmax probabilities exactly 0 in fp32, so one masked N x N MSA is
    bit-equivalent and a far better MXU shape -- the top-k then never
    selects a same-slice key because N - q_n >= k other-slice keys exist
    with strictly larger probability.
    """

    dim: int
    window_size: Tuple[int, int, int]
    num_heads: int
    qkv_bias: bool = True
    only_one: bool = False
    align_mask: bool = False

    @nn.compact
    def __call__(self, x, kv_src=None, mask=None):
        """x: (B_, N, C) windowed tokens; kv_src: optional (B_, N, C) key/
        value source (defaults to x); mask: (nW, N, N) shift mask."""
        B_, N, C = x.shape
        h = self.num_heads
        d = C // h
        scale = d ** -0.5
        kv_in = x if kv_src is None else kv_src

        q = nn.Dense(C, use_bias=self.qkv_bias, kernel_init=trunc_normal_init(), name="q")(x)
        kv = nn.Dense(2 * C, use_bias=self.qkv_bias, kernel_init=trunc_normal_init(), name="kv")(kv_in)
        q = q.reshape(B_, N, h, d).transpose(0, 2, 1, 3)
        k = kv[..., :C].reshape(B_, N, h, d).transpose(0, 2, 1, 3)
        v = kv[..., C:].reshape(B_, N, h, d).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                          preferred_element_type=jnp.float32)

        table = self.param(
            "relative_position_bias_table",
            trunc_normal_init(),
            ((2 * self.window_size[0] - 1)
             * (2 * self.window_size[1] - 1)
             * (2 * self.window_size[2] - 1), h),
        )
        idx = jnp.asarray(_relative_position_index_3d(tuple(self.window_size)))
        bias = table[idx.reshape(-1)].reshape(N, N, h).transpose(2, 0, 1)
        attn = attn + bias[None]

        excl = jnp.asarray(_cross_slice_mask(tuple(self.window_size)))
        attn = attn + excl[None, None]

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, h, N, N) + mask[None, :, None]
            attn = attn.reshape(B_, h, N, N)

        attn = jax.nn.softmax(attn, axis=-1)
        if self.only_one:
            # hard selection (attention_oo): top-k / argmax over keys
            kk = 1 if self.align_mask else max(1, self.window_size[0] - 1)
            w_top, i_top = jax.lax.top_k(attn, kk)  # (B_, h, N, kk)
            g = jnp.take_along_axis(
                v[:, :, None], i_top[..., None], axis=3
            )  # (B_, h, N, kk, d)
            out = (g * w_top[..., None].astype(v.dtype)).sum(axis=3)
        else:
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                             preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B_, N, C)
        return nn.Dense(C, kernel_init=trunc_normal_init(), name="proj")(out)


def _unfold_kv_feature(x, wh: int, ww: int):
    """The reference's unfold-KV context features (swin_3d.py:748-760
    unfold_feature): per (wh, ww) output window, the surrounding
    (2wh, 2ww) patch (pad wh/2, ww/2) 2x2-mean-pooled back to window size.

    x: (N, H, W, C) with H % wh == 0, W % ww == 0."""
    N, H, W, C = x.shape
    nh, nw = H // wh, W // ww
    xp = jnp.pad(x, ((0, 0), (wh // 2, wh // 2), (ww // 2, ww // 2), (0, 0)))
    rows = (np.arange(nh)[:, None] * wh + np.arange(2 * wh)[None, :])
    cols = (np.arange(nw)[:, None] * ww + np.arange(2 * ww)[None, :])
    y = xp[:, rows.reshape(-1)]          # (N, nh*2wh, W+ww, C)
    y = y[:, :, cols.reshape(-1)]        # (N, nh*2wh, nw*2ww, C)
    y = y.reshape(N, nh, wh, 2, nw, ww, 2, C).mean(axis=(3, 6))
    return y.reshape(N, H, W, C)


class EncoderBlockOnOnetoken(nn.Module):
    """Shifted-window block: cross-slice attention + GEGLU MLP
    (reference swin_3d.py:687-855).

    ``if_unfold=True`` adds the unfold-KV branch (swin_3d.py:729-756): a
    second, hard-selection attention whose keys/values come from 2x-context
    pooled features, fused with the main branch through a 2C->C linear.
    Passing ``flow_f``/``flow_b`` enables the flow-aligned residual
    (swin_3d.py:758-770,830-831): even/odd frames warped toward each other
    are added to the attention output.  Both are constructor-reachable but
    config-off in the reference, matching semantics here.
    """

    dim: int
    num_heads: int
    window_size: Tuple[int, int, int] = (3, 8, 8)
    shift_size: Tuple[int, int, int] = (0, 0, 0)
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    drop_path: float = 0.0
    if_unfold: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True, flow_f=None, flow_b=None):
        B, D, H, W, C = x.shape
        window_size, shift_size = get_window_size(
            (D, H, W), self.window_size, self.shift_size
        )

        y = TorchLayerNorm(self.dim, name="norm1")(x)

        flow_x = None
        if flow_f is not None:
            flow_x = self._flow_alignment(y, flow_f, flow_b)

        pad_d = (-D) % window_size[0]
        pad_b = (-H) % window_size[1]
        pad_r = (-W) % window_size[2]
        y = jnp.pad(y, ((0, 0), (0, pad_d), (0, pad_b), (0, pad_r), (0, 0)))
        _, Dp, Hp, Wp, _ = y.shape

        if any(s > 0 for s in shift_size):
            y = jnp.roll(y, (-shift_size[0], -shift_size[1], -shift_size[2]),
                         axis=(1, 2, 3))
            mask = compute_shift_mask_3d(Dp, Hp, Wp, window_size, shift_size)
        else:
            mask = None

        windows = window_partition_3d(y, window_size)
        attn = RWindowAttention(self.dim, tuple(window_size), self.num_heads,
                                self.qkv_bias, name="attn")(
            windows, mask=mask)
        if self.if_unfold:
            ctx = _unfold_kv_feature(
                y.reshape(B * Dp, Hp, Wp, C), window_size[1], window_size[2]
            ).reshape(B, Dp, Hp, Wp, C)
            kv_windows = window_partition_3d(ctx, window_size)
            attn1 = RWindowAttention(
                self.dim, tuple(window_size), self.num_heads, self.qkv_bias,
                only_one=True, align_mask=True, name="attn1",
            )(windows, kv_src=kv_windows, mask=mask)
            attn = nn.Dense(self.dim, kernel_init=trunc_normal_init(),
                            name="proj")(
                jnp.concatenate([attn, attn1], axis=-1)
            )
        y = window_reverse_3d(attn, window_size, B, Dp, Hp, Wp)

        if any(s > 0 for s in shift_size):
            y = jnp.roll(y, (shift_size[0], shift_size[1], shift_size[2]),
                         axis=(1, 2, 3))
        y = y[:, :D, :H, :W, :]

        if flow_x is not None:
            y = y + flow_x

        dp = DropPath(self.drop_path, name="drop_path")
        x = x + dp(y, deterministic)
        if self.num_heads > 0:
            # the reference block's "Mlp_GEGLU" (swin_3d.py:35) is, despite
            # the name, a plain fc1 -> GELU -> fc2 MLP
            z = Mlp(self.dim, int(self.dim * self.mlp_ratio), name="mlp")(
                TorchLayerNorm(self.dim, name="norm2")(x)
            )
            x = x + dp(z, deterministic)
        return x

    def _flow_alignment(self, x, flow_f, flow_b):
        """Even/odd frames warped toward each other and re-interleaved
        (reference swin_3d.py:758-770): out[2i] = warp(x[2i+1], flow_b[i]),
        out[2i+1] = warp(x[2i], flow_f[i]).  flows: (B, D//2, H, W, 2)."""
        from vmg_tpu.ops.warp import flow_warp

        B, D, H, W, C = x.shape
        F2 = flow_f.shape[1]
        assert D == 2 * F2, "flow_alignment needs D == 2 * flow frames"
        f1 = x[:, ::2].reshape(B * F2, H, W, C)
        f2 = x[:, 1::2].reshape(B * F2, H, W, C)
        feat_right = flow_warp(f1, flow_f.reshape(B * F2, H, W, 2),
                               "bilinear", "border").reshape(B, F2, H, W, C)
        feat_left = flow_warp(f2, flow_b.reshape(B * F2, H, W, 2),
                              "bilinear", "border").reshape(B, F2, H, W, C)
        out = jnp.stack([feat_left, feat_right], axis=2)  # (B, F2, 2, ...)
        return out.reshape(B, D, H, W, C)


class DecoderLayer(nn.Module):
    """Stack of cross-slice blocks, alternating zero/half-window shift,
    with mirror temporal extension for D not divisible by wt
    (reference swin_3d.py:1108-1202)."""

    dim: int
    depth: int
    num_heads: int
    window_size: Tuple[int, int, int] = (2, 4, 4)
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    if_unfold: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True, flow_f=None,
                 flow_b=None):
        """x: (B, D, H, W, C); optional flows (B, D//2, H, W, 2) enable the
        flow-aligned residual in every block."""
        B, D, H, W, C = x.shape
        wt = self.window_size[0]
        seq_back = None
        if D % wt != 0:
            delta = (-(-D // wt)) * wt - D
            k = (D // wt) * wt
            # the reference's index dance (swin_3d.py:1141-1157) repeats the
            # last `delta` pre-remainder frames in increasing order
            new_seq = list(range(k)) + list(range(k - delta, k)) + list(range(k, D))
            seq_back = list(range(k)) + list(range(D + delta - (D - k), D + delta))
            x = x[:, np.asarray(new_seq)]
            D = D + delta

        shift = tuple(w // 2 for w in self.window_size)
        for i in range(self.depth):
            x = EncoderBlockOnOnetoken(
                self.dim,
                self.num_heads,
                tuple(self.window_size),
                (0, 0, 0) if i % 2 == 0 else shift,
                self.mlp_ratio,
                self.qkv_bias,
                if_unfold=self.if_unfold,
                name=f"blocks{i}",
            )(x, deterministic, flow_f=flow_f, flow_b=flow_b)

        if seq_back is not None:
            x = x[:, np.asarray(seq_back)]
        return x
