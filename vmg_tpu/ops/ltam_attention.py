"""Fused Pallas kernel for LTAM's 2x2-window trajectory attention.

The serving profile's largest single cost (~28% of clip time,
NOTES_ROUND4) is the windowed softmax attention inside the trajectory
recurrence (reference ``models/trajectory.py:553-700`` LTAM_multi_head,
'wins' mode): per step, queries attend to K keyframe slots x the 4 pixels
of their 2x2 twins window.  With d = C/heads = 28 and <= 20 keys the
shapes are hostile to XLA on TPU -- the window relayouts are
small-granularity sublane transposes (~3.2 ms per (14400, 4, 20, 28)
copy in the xplane trace) that dwarf the arithmetic.

This kernel never leaves the image layout:

  * tap selection (the 4 window positions) is parity masks + row/column
    shifts -- each key/value tap image is ``select(parity, x, shift(x))``,
    pure VPU ops on (R, W, 128) tiles;
  * the per-head dot products contract the 128-lane channel dim with a
    constant 0/1 block mask on the MXU ((R*W, 128) @ (128, heads) and the
    (heads -> lanes) broadcast-back its transpose);
  * softmax is a single online pass: normalized q and k bound
    |q.k|*scale <= scale and the decay x rpe bias is folded in as
    exp(pe) factors, so ``exp`` needs no running-max subtraction
    (documented bound: safe for |pe| up to ~80 in f32);
  * keyframe buffers arrive in the 'warped-carry' layout (one
    (H, W, K*256) array, per slot 128 value lanes then 128 key lanes) so
    every slot slice is an aligned lane tile.

Equivalence to the XLA windows formulation is pinned by
tests/test_fused_layouts.py (interpret mode, fp32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def cpad(c: int) -> int:
    """Channel count padded up to whole 128-lane tiles."""
    return -(-c // LANE) * LANE


def _pick_rows(h: int, w: int, K: int, CP: int, kv_itemsize: int) -> int:
    """Largest even row-tile whose working set fits scoped VMEM.

    Live per row of tile: the kv block (K slots x 2*CP lanes) plus ~18
    f32 (CP-lane) temporaries (q, out, num, accum den, per-tap shifted
    key/value variants and their products).  Budget 8 MB of the 16 MB
    scoped VMEM -- the compiler stacks unrolled-loop temporaries."""
    per_row = w * (K * 2 * CP * kv_itemsize + 18 * CP * 4)
    for r in (8, 6, 4, 2):
        if h % r == 0 and r * per_row <= 8 * 1024 * 1024:
            return r
    for r in (2, 4, 6, 8):  # smallest dividing tile as a fallback
        if h % r == 0:
            return r
    raise ValueError(f"H={h} not divisible by an even row-tile")


def _shift_down(x):
    # out[r] = x[r-1] (row 0 keeps itself; masked out by parity select)
    return jnp.concatenate([x[:1], x[:-1]], axis=0)


def _shift_up(x):
    return jnp.concatenate([x[1:], x[-1:]], axis=0)


def _shift_right(x):
    return jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)


def _shift_left(x):
    return jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)


def _kernel(q_ref, kv_ref, pe_ref, mask_ref, out_ref, *, K: int, heads: int,
            CP: int):
    R, W, _ = q_ref.shape[1:]
    q = q_ref[0]                       # (R, W, CP) f32, normalized*scale
    m = mask_ref[...]                  # (CP, heads) f32 head-band mask

    row_par = jax.lax.broadcasted_iota(jnp.int32, (R, W, 1), 0) % 2
    col_par = jax.lax.broadcasted_iota(jnp.int32, (R, W, 1), 1) % 2
    row_even = row_par == 0
    col_even = col_par == 0
    # query in-window position as f32 masks for the exp(pe) factors
    mpos = [
        jnp.asarray((row_even & col_even), jnp.float32),
        jnp.asarray((row_even & ~col_even), jnp.float32),
        jnp.asarray((~row_even & col_even), jnp.float32),
        jnp.asarray((~row_even & ~col_even), jnp.float32),
    ]

    num = jnp.zeros((R, W, CP), jnp.float32)
    den = jnp.zeros((R, W, heads), jnp.float32)

    for k in range(K):
        val = kv_ref[0, :, :, k * 2 * CP:(k * 2 + 1) * CP]
        key = kv_ref[0, :, :, (k * 2 + 1) * CP:(k * 2 + 2) * CP]
        for ki in range(2):
            if ki == 0:
                # out row r reads source row r - r%2 (window top)
                krow = jnp.where(row_even, key, _shift_down(key))
                vrow = jnp.where(row_even, val, _shift_down(val))
            else:
                krow = jnp.where(row_even, _shift_up(key), key)
                vrow = jnp.where(row_even, _shift_up(val), val)
            for kj in range(2):
                if kj == 0:
                    ksel = jnp.where(col_even, krow, _shift_right(krow))
                    vsel = jnp.where(col_even, vrow, _shift_right(vrow))
                else:
                    ksel = jnp.where(col_even, _shift_left(krow), krow)
                    vsel = jnp.where(col_even, _shift_left(vrow), vrow)
                t = ki * 2 + kj
                prod = q * ksel.astype(jnp.float32)
                logits = jax.lax.dot_general(
                    prod.reshape(R * W, CP), m,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(R, W, heads)
                # exp(pe) per (slot, tap, query position, head)
                wf = (mpos[0] * pe_ref[k, t, 0] + mpos[1] * pe_ref[k, t, 1]
                      + mpos[2] * pe_ref[k, t, 2] + mpos[3] * pe_ref[k, t, 3])
                e = jnp.exp(logits) * wf
                den = den + e
                eb = jax.lax.dot_general(
                    e.reshape(R * W, heads), m.T,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(R, W, CP)
                num = num + eb * vsel.astype(jnp.float32)

    denb = jax.lax.dot_general(
        den.reshape(R * W, heads), m.T, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(R, W, CP)
    out_ref[0] = num / jnp.maximum(denb, 1e-30)


def _build_mask(C: int, heads: int) -> np.ndarray:
    """Head-band 0/1 mask: lane c -> head c // (C/heads); zero-padded
    lanes [C, CP) belong to no head (q/k hold zeros there, and the
    broadcast-back must not leak values into them)."""
    d = C // heads
    m = np.zeros((cpad(C), heads), np.float32)
    for h in range(heads):
        m[h * d:(h + 1) * d, h] = 1.0
    return m


@functools.partial(
    jax.jit, static_argnames=("K", "heads", "C", "interpret"))
def ltam_attention_2x2(q, kv, pe, *, K: int, heads: int, C: int,
                       interpret: bool = False):
    """See module docstring.  q (N,H,W,CP) f32 normalized*scale with
    zeros beyond C (CP = cpad(C)); kv (N,H,W,K*2*CP) value|key per slot
    zero-padded to CP lanes each; pe (K,4,4,heads) f32 exp-factors.
    Returns (N,H,W,CP) f32."""
    N, H, W, L = q.shape
    CP = cpad(C)
    if L != CP or kv.shape[-1] != K * 2 * CP:
        raise ValueError(f"bad lane layout {q.shape} {kv.shape} K={K}")
    if H % 2 or W % 2:
        raise ValueError("2x2 windows need even H and W")
    R = _pick_rows(H, W, K, CP, kv.dtype.itemsize)
    mask = jnp.asarray(_build_mask(C, heads))
    kernel = functools.partial(_kernel, K=K, heads=heads, CP=CP)
    return pl.pallas_call(
        kernel,
        grid=(N, H // R),
        in_specs=[
            pl.BlockSpec((1, R, W, CP), lambda n, i: (n, i, 0, 0)),
            pl.BlockSpec((1, R, W, K * 2 * CP), lambda n, i: (n, i, 0, 0)),
            pl.BlockSpec((K, 4, 4, heads), lambda n, i: (0, 0, 0, 0)),
            pl.BlockSpec((CP, heads), lambda n, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, R, W, CP), lambda n, i: (n, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, W, CP), jnp.float32),
        interpret=interpret,
    )(q, kv, pe, mask)
