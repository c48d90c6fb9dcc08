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
    """Cross-time-slice window MSA with 3D relative position bias."""

    dim: int
    window_size: Tuple[int, int, int]
    num_heads: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x, mask=None):
        """x: (B_, N, C) windowed tokens; mask: (nW, N, N) shift mask."""
        B_, N, C = x.shape
        h = self.num_heads
        d = C // h
        scale = d ** -0.5

        q = nn.Dense(C, use_bias=self.qkv_bias, kernel_init=trunc_normal_init(), name="q")(x)
        kv = nn.Dense(2 * C, use_bias=self.qkv_bias, kernel_init=trunc_normal_init(), name="kv")(x)
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
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B_, N, C)
        return nn.Dense(C, kernel_init=trunc_normal_init(), name="proj")(out)


class EncoderBlockOnOnetoken(nn.Module):
    """Shifted-window block: cross-slice attention + GEGLU MLP
    (reference swin_3d.py:687-855)."""

    dim: int
    num_heads: int
    window_size: Tuple[int, int, int] = (3, 8, 8)
    shift_size: Tuple[int, int, int] = (0, 0, 0)
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, D, H, W, C = x.shape
        window_size, shift_size = get_window_size(
            (D, H, W), self.window_size, self.shift_size
        )

        y = TorchLayerNorm(self.dim, name="norm1")(x)

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
                                self.qkv_bias, name="attn")(windows, mask)
        y = window_reverse_3d(attn, window_size, B, Dp, Hp, Wp)

        if any(s > 0 for s in shift_size):
            y = jnp.roll(y, (shift_size[0], shift_size[1], shift_size[2]),
                         axis=(1, 2, 3))
        y = y[:, :D, :H, :W, :]

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

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: (B, D, H, W, C)."""
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
                name=f"blocks{i}",
            )(x, deterministic)

        if seq_back is not None:
            x = x[:, np.asarray(seq_back)]
        return x
