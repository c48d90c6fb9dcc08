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

The op carries a custom VJP (``_ltam_bwd_kernel``) so training uses the
same fused kernel: the adjoint of the parity-mask tap selection is a 2x2
window-sum times the in-window position mask (each source pixel at window
position t is read by exactly the 4 queries of its own window, for tap t),
so the backward also never leaves the image layout -- softmax/attention
gradients are the standard p*(g.v - g.out) chain with the per-head
contractions on the MXU, exactly as in the forward.

Equivalence of the forward to the XLA windows formulation and of the
gradients to autodiff of that formulation is pinned by
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


def _pick_rows(h: int, w: int, K: int, CP: int, kv_itemsize: int,
               n_temps: int = 18, n_kv_blocks: int = 1) -> int:
    """Largest even row-tile whose working set fits scoped VMEM.

    Live per row of tile: ``n_kv_blocks`` kv-sized blocks (K slots x
    2*CP lanes; the backward adds the f32 dkv output block) plus
    ``n_temps`` f32 (CP-lane) temporaries (q, out, num, accum den,
    per-tap shifted key/value variants and their products).  Budget 8 MB
    of the 16 MB scoped VMEM -- the compiler stacks unrolled-loop
    temporaries."""
    per_row = w * (K * 2 * CP * kv_itemsize
                   + (n_kv_blocks - 1) * K * 2 * CP * 4
                   + n_temps * CP * 4)
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


def _parity_masks(R: int, W: int):
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
    return row_even, col_even, mpos


def _tap_select(key, val, row_even, col_even, ki: int, kj: int):
    """out pixel (r, c) reads source (2*(r//2) + ki, 2*(c//2) + kj)."""
    if ki == 0:
        # out row r reads source row r - r%2 (window top)
        krow = jnp.where(row_even, key, _shift_down(key))
        vrow = jnp.where(row_even, val, _shift_down(val))
    else:
        krow = jnp.where(row_even, _shift_up(key), key)
        vrow = jnp.where(row_even, _shift_up(val), val)
    if kj == 0:
        ksel = jnp.where(col_even, krow, _shift_right(krow))
        vsel = jnp.where(col_even, vrow, _shift_right(vrow))
    else:
        ksel = jnp.where(col_even, _shift_left(krow), krow)
        vsel = jnp.where(col_even, _shift_left(vrow), vrow)
    return ksel, vsel


def _window_sum(x, row_even, col_even):
    """Per-pixel sum of x over the pixel's own 2x2 window (constant across
    the window) -- the adjoint of the tap selection's read pattern."""
    rows = x + jnp.where(row_even, _shift_up(x), _shift_down(x))
    return rows + jnp.where(col_even, _shift_left(rows), _shift_right(rows))


def _contract(x, m, R, W, CP, heads):
    """(R, W, CP) x (CP, heads) -> (R, W, heads) on the MXU."""
    return jax.lax.dot_general(
        x.reshape(R * W, CP), m, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(R, W, heads)


def _broadcast_heads(x, m, R, W, CP, heads):
    """(R, W, heads) x (heads, CP) -> (R, W, CP) on the MXU."""
    return jax.lax.dot_general(
        x.reshape(R * W, heads), m.T, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(R, W, CP)


def _kernel(q_ref, kv_ref, pe_ref, mask_ref, out_ref, den_ref, *, K: int,
            heads: int, CP: int):
    R, W, _ = q_ref.shape[1:]
    q = q_ref[0]                       # (R, W, CP) f32, normalized*scale
    m = mask_ref[...]                  # (CP, heads) f32 head-band mask

    row_even, col_even, mpos = _parity_masks(R, W)

    num = jnp.zeros((R, W, CP), jnp.float32)
    den = jnp.zeros((R, W, heads), jnp.float32)

    for k in range(K):
        val = kv_ref[0, :, :, k * 2 * CP:(k * 2 + 1) * CP]
        key = kv_ref[0, :, :, (k * 2 + 1) * CP:(k * 2 + 2) * CP]
        for ki in range(2):
            for kj in range(2):
                ksel, vsel = _tap_select(key, val, row_even, col_even,
                                         ki, kj)
                t = ki * 2 + kj
                prod = q * ksel.astype(jnp.float32)
                logits = _contract(prod, m, R, W, CP, heads)
                # exp(pe) per (slot, tap, query position, head)
                wf = (mpos[0] * pe_ref[k, t, 0] + mpos[1] * pe_ref[k, t, 1]
                      + mpos[2] * pe_ref[k, t, 2] + mpos[3] * pe_ref[k, t, 3])
                e = jnp.exp(logits) * wf
                den = den + e
                eb = _broadcast_heads(e, m, R, W, CP, heads)
                num = num + eb * vsel.astype(jnp.float32)

    den_ref[0] = den
    denb = _broadcast_heads(den, m, R, W, CP, heads)
    out_ref[0] = num / jnp.maximum(denb, 1e-30)


def _bwd_kernel(q_ref, kv_ref, pe_ref, mask_ref, den_ref, out_ref, g_ref,
                dq_ref, dkv_ref, dpe_ref, *, K: int, heads: int, CP: int):
    """Gradients wrt q, kv, pe.  Standard softmax-attention chain in the
    image layout: with p_i = e_i / den (i = (slot, tap)),

      dlogit_i = p_i * ((g.v_i)_h - (g.out)_h)
      dq       = sum_i broadcast(dlogit_i) * k_i
      dk_i     = scatter(broadcast(dlogit_i) * q)
      dv_i     = scatter(broadcast(p_i) * g)
      dwf_i    = exp(logit_i) * ((g.v_i)_h - (g.out)_h) / den

    where ()_h are per-head contractions (MXU, via the band mask) and
    scatter = mpos[t] * window_sum (each source pixel at in-window
    position t is read, for tap t, by exactly its own window's 4
    queries).  dpe accumulates across grid tiles (TPU grids run
    sequentially)."""
    R, W, _ = q_ref.shape[1:]
    q = q_ref[0]
    m = mask_ref[...]
    g = g_ref[0]                        # (R, W, CP) f32 cotangent
    out = out_ref[0]
    den = jnp.maximum(den_ref[0], 1e-30)   # (R, W, heads)

    row_even, col_even, mpos = _parity_masks(R, W)

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _init():
        dpe_ref[...] = jnp.zeros_like(dpe_ref)

    s = _contract(g * out, m, R, W, CP, heads)      # (g.out)_h
    dq = jnp.zeros((R, W, CP), jnp.float32)
    dpe_rows = []                                   # K*4 entries (4, heads)

    for k in range(K):
        val = kv_ref[0, :, :, k * 2 * CP:(k * 2 + 1) * CP]
        key = kv_ref[0, :, :, (k * 2 + 1) * CP:(k * 2 + 2) * CP]
        dval = jnp.zeros((R, W, CP), jnp.float32)
        dkey = jnp.zeros((R, W, CP), jnp.float32)
        for ki in range(2):
            for kj in range(2):
                ksel, vsel = _tap_select(key, val, row_even, col_even,
                                         ki, kj)
                t = ki * 2 + kj
                ksel = ksel.astype(jnp.float32)
                vsel = vsel.astype(jnp.float32)
                logits = _contract(q * ksel, m, R, W, CP, heads)
                el = jnp.exp(logits)
                wf = (mpos[0] * pe_ref[k, t, 0] + mpos[1] * pe_ref[k, t, 1]
                      + mpos[2] * pe_ref[k, t, 2] + mpos[3] * pe_ref[k, t, 3])
                p = el * wf / den
                gv = _contract(g * vsel, m, R, W, CP, heads)
                dlogit = p * (gv - s)
                # dv_i: p broadcast per head times the cotangent
                pb = _broadcast_heads(p, m, R, W, CP, heads)
                dval = dval + mpos[t] * _window_sum(pb * g, row_even,
                                                    col_even)
                dlb = _broadcast_heads(dlogit, m, R, W, CP, heads)
                dq = dq + dlb * ksel
                dkey = dkey + mpos[t] * _window_sum(dlb * q, row_even,
                                                    col_even)
                # dpe: reduce mpos-masked dwf over the tile's pixels
                dwf = el * (gv - s) / den
                dpe_rows.append(jnp.stack(
                    [jnp.sum(mpos[pos] * dwf, axis=(0, 1))
                     for pos in range(4)], axis=0))
        dkv_ref[0, :, :, k * 2 * CP:(k * 2 + 1) * CP] = dval
        dkv_ref[0, :, :, (k * 2 + 1) * CP:(k * 2 + 2) * CP] = dkey

    dq_ref[0] = dq
    acc = jnp.stack(dpe_rows, axis=0).reshape(K, 4, 4, heads)
    dpe_ref[...] += acc


def _build_mask(C: int, heads: int) -> np.ndarray:
    """Head-band 0/1 mask: lane c -> head c // (C/heads); zero-padded
    lanes [C, CP) belong to no head (q/k hold zeros there, and the
    broadcast-back must not leak values into them)."""
    d = C // heads
    m = np.zeros((cpad(C), heads), np.float32)
    for h in range(heads):
        m[h * d:(h + 1) * d, h] = 1.0
    return m


def _check_layout(q, kv, K: int, C: int):
    N, H, W, L = q.shape
    CP = cpad(C)
    if L != CP or kv.shape[-1] != K * 2 * CP:
        raise ValueError(f"bad lane layout {q.shape} {kv.shape} K={K}")
    if H % 2 or W % 2:
        raise ValueError("2x2 windows need even H and W")
    return N, H, W, CP


def _fwd_call(q, kv, pe, K: int, heads: int, C: int, interpret: bool):
    N, H, W, CP = _check_layout(q, kv, K, C)
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
        out_specs=[
            pl.BlockSpec((1, R, W, CP), lambda n, i: (n, i, 0, 0)),
            pl.BlockSpec((1, R, W, heads), lambda n, i: (n, i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, H, W, CP), jnp.float32),
            jax.ShapeDtypeStruct((N, H, W, heads), jnp.float32),
        ],
        interpret=interpret,
    )(q, kv, pe, mask)


def _bwd_call(q, kv, pe, den, out, g, K: int, heads: int, C: int,
              interpret: bool):
    N, H, W, CP = _check_layout(q, kv, K, C)
    # backward holds the f32 dkv output block alongside the kv input and
    # roughly twice the forward's temporaries
    R = _pick_rows(H, W, K, CP, kv.dtype.itemsize, n_temps=30,
                   n_kv_blocks=2)
    mask = jnp.asarray(_build_mask(C, heads))
    kernel = functools.partial(_bwd_kernel, K=K, heads=heads, CP=CP)
    dq, dkv, dpe = pl.pallas_call(
        kernel,
        grid=(N, H // R),
        in_specs=[
            pl.BlockSpec((1, R, W, CP), lambda n, i: (n, i, 0, 0)),
            pl.BlockSpec((1, R, W, K * 2 * CP), lambda n, i: (n, i, 0, 0)),
            pl.BlockSpec((K, 4, 4, heads), lambda n, i: (0, 0, 0, 0)),
            pl.BlockSpec((CP, heads), lambda n, i: (0, 0)),
            pl.BlockSpec((1, R, W, heads), lambda n, i: (n, i, 0, 0)),
            pl.BlockSpec((1, R, W, CP), lambda n, i: (n, i, 0, 0)),
            pl.BlockSpec((1, R, W, CP), lambda n, i: (n, i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, R, W, CP), lambda n, i: (n, i, 0, 0)),
            pl.BlockSpec((1, R, W, K * 2 * CP), lambda n, i: (n, i, 0, 0)),
            pl.BlockSpec((K, 4, 4, heads), lambda n, i: (0, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, H, W, CP), jnp.float32),
            jax.ShapeDtypeStruct((N, H, W, K * 2 * CP), jnp.float32),
            jax.ShapeDtypeStruct((K, 4, 4, heads), jnp.float32),
        ],
        interpret=interpret,
    )(q, kv, pe, mask, den, out, g)
    return dq, dkv, dpe


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _ltam_attention(q, kv, pe, K, heads, C, interpret):
    out, _ = _fwd_call(q, kv, pe, K, heads, C, interpret)
    return out


def _ltam_fwd_rule(q, kv, pe, K, heads, C, interpret):
    out, den = _fwd_call(q, kv, pe, K, heads, C, interpret)
    return out, (q, kv, pe, den, out)


def _ltam_bwd_rule(K, heads, C, interpret, res, g):
    q, kv, pe, den, out = res
    dq, dkv, dpe = _bwd_call(q, kv, pe, den, out,
                             g.astype(jnp.float32), K, heads, C, interpret)
    return dq, dkv.astype(kv.dtype), dpe


_ltam_attention.defvjp(_ltam_fwd_rule, _ltam_bwd_rule)


@functools.partial(
    jax.jit, static_argnames=("K", "heads", "C", "interpret"))
def ltam_attention_2x2(q, kv, pe, *, K: int, heads: int, C: int,
                       interpret: bool = False):
    """See module docstring.  q (N,H,W,CP) f32 normalized*scale with
    zeros beyond C (CP = cpad(C)); kv (N,H,W,K*2*CP) value|key per slot
    zero-padded to CP lanes each; pe (K,4,4,heads) f32 exp-factors.
    Returns (N,H,W,CP) f32.  Differentiable wrt q, kv, pe (fused
    backward kernel, see module docstring)."""
    _check_layout(q, kv, K, C)
    return _ltam_attention(q, kv, pe, K, heads, C, interpret)
