"""Fused Pallas kernel for chained 3x3 convs (conv -> act -> conv [+res]).

Two serving-path consumers share this one kernel family:

* **RCAB c-branch** (reference ``models/function.py:627-644`` selecting
  RCAB:561): ``res = conv2(relu(conv1(x)))`` plus the SE pooling sums.
  In the round-4 trace the XLA convs ride transposed layouts between the
  two MorphFC Pallas calls at ~5 ms per stage-0/6 mixer (~2x the conv
  roofline); the kernel runs them at full 128-lane contraction depth and
  folds the CA layer's global-pool partial sums into the same pass
  (VERDICT r4 item 1).
* **Trajectory resblocks** (reference ``trajectory.py:360-361`` via
  ResidualBlockNoBN): ``out = x + scale * conv2(relu(conv1(x)))``.
  Inside the scan XLA pins the carry W-major ({3,1,2,0}) and drags ~1/3
  of the chain's convs to 2.3x their standalone cost (NOTES_ROUND5); a
  pallas_call boundary forces row-major operands, which is exactly the
  layout pin the scan body needs (VERDICT r4 item 3).

Design (measured-legal Mosaic idioms from ``ops/group_conv``/
``ops/morphfc_fused``):

  * host pads x by the two-level conv halo (2 rows/cols) + tile
    alignment; the kernel DMAs an (R+4)-row slab per grid step;
  * each conv is ONE deep matmul (contraction 9*Cp) over a (tap, cin)-
    ordered im2col patch assembled in VMEM.  A patch-free variant doing
    9 tap-accumulated K=128 matmuls per row was built first and measured
    66 TF/s on-chip -- per-row weight re-streaming and short-M dots eat
    the MXU; the patch form streams each conv's weights once per block;
  * conv1 computes the (R+2, W+2)-extent intermediate conv2 needs (plus
    alignment junk on the right edge, never read back); bias + act on
    the f32 accumulator, rounded once to the compute dtype (matching the
    XLA module path's conv output rounding); the intermediate lives in
    VMEM only;
  * optional residual: ``out = x + scale * y2`` read from the slab's
    center rows (the resblock form);
  * optional psum: f32 per-frame sums of the output over the real (H, W)
    extent, accumulated across the sequential row-grid (the morphfc
    pattern) -- the RCAB CA pooling without a re-read.

No VJP: training pins the XLA module path everywhere this kernel is
used (TAB mixers and the trajectory serve it only under
``deterministic``); grads flow through the XLA formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _ceil_to(v: int, m: int) -> int:
    return -(-v // m) * m


def pack_conv_taps(kernel, bias, cin_pad: int, cout_pad: int | None = None):
    """(3, 3, Cin, Cout) HWIO + (Cout,) -> ((9, cin_pad, cout_pad),
    (1, cout_pad) f32) per-tap weight matrices, lane-padded both sides.

    Output-channel pad columns are exact zeros (zero weight + zero bias),
    so with relu/lrelu the padded result lanes are exact zeros too -- the
    next conv's padded input rows then contract garbage-free."""
    kh, kw, cin, cout = kernel.shape
    cout_pad = cout_pad or cout
    wm = kernel.reshape(kh * kw, cin, cout)
    wm = jnp.pad(wm, ((0, 0), (0, cin_pad - cin), (0, cout_pad - cout)))
    bm = (jnp.zeros((cout,), jnp.float32) if bias is None
          else bias.astype(jnp.float32))
    bm = jnp.pad(bm, (0, cout_pad - cout)).reshape(1, cout_pad)
    return wm, bm


def _act(y, kind):
    if kind == "relu":
        return jnp.maximum(y, 0.0)
    if kind == "lrelu":
        return jnp.where(y >= 0, y, 0.1 * y)
    if kind is None:
        return y
    raise ValueError(f"unknown act {kind!r}")


def _conv_shifted(srcs, w_ref, b_ref, nrows, W1, act, dtype):
    """sum over (dy, dx) of srcs[dx][dy:dy+nrows, 0:W1] @ w[tap] -- dy
    offsets ride the untiled row axis for free, dx picks a pre-shifted
    buffer; 9 accumulated full-slab matmuls, one weight stream each."""
    acc = None
    for dy in range(3):
        for dx in range(3):
            lhs = srcs[dx][dy:dy + nrows, 0:W1, :].reshape(
                nrows * W1, srcs[dx].shape[-1])
            d = jax.lax.dot_general(
                lhs, w_ref[dy * 3 + dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
    return _act(acc + b_ref[0][None, :], act).astype(dtype)


def _chain_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, psum_ref,
                  xs, sh1, sh2, y1, ys1, ys2, sem, *, R, H, W, Wo, W1, Cp,
                  Cout, act1, res_scale, emit_psum):
    n = pl.program_id(0)
    i = pl.program_id(1)
    dma = pltpu.make_async_copy(x_ref.at[n, pl.ds(i * R, R + 4)], xs, sem)
    dma.start()
    dma.wait()
    R1 = R + 2

    # dx decomposition: a full im2col patch was measured 3 ms/call slower
    # at the RCAB shape -- assembling it copies 9x the slab bytes through
    # the VPU.  Only the dx != 0 taps need a shifted copy (2 copies), and
    # the dy offsets are free row offsets into them; each of the 9
    # accumulated matmuls spans all rows (M = rows * W1), so weights
    # stream once per tap (the per-row tap form measured 66 TF/s).
    sh1[...] = xs[:, 1:1 + W1, :]
    sh2[...] = xs[:, 2:2 + W1, :]

    # conv1: R+2 rows x W1 cols (y1[r, j] = conv output at global row
    # i*R+r-1, col j-1 -- the exact halo conv2 needs)
    h1 = _conv_shifted((xs, sh1, sh2), w1_ref, b1_ref,
                       R1, W1, act1, jnp.float32).reshape(R1, W1, Cp)
    # conv2's SAME padding needs exact ZEROS at conv1 positions outside
    # the image -- not the values conv1 computes over the zero-padded
    # input there -- so out-of-image rows and cols are masked.
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, W1, 1), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (R1, 1, 1), 0) + i * R - 1
    ok = ((cols >= 1) & (cols <= W)) & ((rows >= 0) & (rows < H))
    y1[0:R1, 0:W1] = jnp.where(ok, h1, 0.0).astype(y1.dtype)

    ys1[...] = y1[:, 1:1 + W1, :]
    ys2[...] = y1[:, 2:2 + W1, :]
    acc2 = _conv_shifted((y1, ys1, ys2), w2_ref, b2_ref, R, W1, None,
                         out_ref.dtype)
    y2 = acc2.reshape(R, W1, Cout)
    if res_scale is not None:
        y2 = xs[2:2 + R, 2:2 + W1, :Cout] + res_scale * y2
    out_ref[0] = y2[:, :Wo]

    if emit_psum:
        valid = H - i * R
        rmask = jax.lax.broadcasted_iota(jnp.int32, (R, 1, 1), 0) < valid
        cmask = jax.lax.broadcasted_iota(jnp.int32, (1, W1, 1), 1) < W
        v = jnp.where(rmask & cmask, y2.astype(jnp.float32), 0.0)
        psum = jnp.sum(v, axis=(0, 1))[None, :]

        @pl.when(i == 0)
        def _():
            psum_ref[0] = psum

        @pl.when(i > 0)
        def _():
            psum_ref[0] = psum_ref[0] + psum


def _identity_kernel(x_ref, out_ref):
    out_ref[...] = x_ref[...]


def layout_pin(x, rows: int = 8):
    """Identity through a Pallas call: forces ``x`` into the default
    row-major layout at this point in the graph (a pallas_call's operands
    and results are always default-layout), at the cost of ONE extra
    read+write of x.  Used as a layout barrier inside the trajectory
    scan body, where XLA pins the carry W-major and drags the resblock
    convs to 2.3x their standalone cost (NOTES_ROUND5)."""
    N, H, W, C = x.shape
    R = min(rows, H)
    Hp = _ceil_to(H, R)
    return pl.pallas_call(
        _identity_kernel,
        grid=(N, Hp // R),
        in_specs=[pl.BlockSpec((1, R, W, C), lambda n, i: (n, i, 0, 0))],
        out_specs=pl.BlockSpec((1, R, W, C), lambda n, i: (n, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x)


def fused_conv_chain(x, k1, b1, k2, b2, *, act1: str = "relu",
                     res_scale: float | None = None,
                     emit_psum: bool = False,
                     rows: int | None = None,
                     interpret: bool = False):
    """conv3x3 -> act1 -> conv3x3 with the intermediate resident in VMEM.

    x (N, H, W, Cin); k1 (3, 3, Cin, Cm); k2 (3, 3, Cm, Cout); SAME
    zero padding, stride 1.  ``res_scale``: if set, returns
    ``x + res_scale * chain(x)`` (requires Cout == Cin).  ``emit_psum``:
    also return (N, Cout) f32 sums of the result over (H, W) -- the RCAB
    CA pooling.  Returns out or (out, psum).

    Serving-only (no VJP); numerics match the XLA module path to
    compute-dtype rounding (f32 accumulation, f32 bias/act, one round).
    """
    N, H, W, Cin = x.shape
    Cm = k1.shape[-1]
    Cout = k2.shape[-1]
    assert k1.shape == (3, 3, Cin, Cm) and k2.shape == (3, 3, Cm, Cout), (
        k1.shape, k2.shape)
    if res_scale is not None:
        assert Cout == Cin, (Cout, Cin)
    Cp = _ceil_to(max(Cin, Cm, Cout), LANE)
    if Cp != LANE:
        raise NotImplementedError(
            f"conv_chain supports single-lane-tile channels (<=128), got "
            f"Cin={Cin} Cm={Cm} Cout={Cout}")
    R = rows or 8
    Hp = _ceil_to(H, R)
    Wo = _ceil_to(W, 8)
    # conv1 output extent: cols -1 .. Wo (+ alignment junk cols computed
    # from the host zero pad, never read back) -- 8-aligned so the y1 row
    # stores are tile-aligned
    W1 = _ceil_to(Wo + 2, 8)
    Ws = _ceil_to(W1 + 2, 8)  # slab width >= dx offset 2 + W1
    xpd = jnp.pad(x, ((0, 0), (2, Hp + 2 - H), (2, Ws - 2 - W),
                      (0, Cp - Cin)))
    # conv1's OUTPUT lanes pad to Cp so the VMEM intermediate rows are
    # full-lane (the pad lanes are exact zeros through bias + relu/lrelu)
    w1, b1m = pack_conv_taps(k1, b1, Cp, Cp)
    w2, b2m = pack_conv_taps(k2, b2, Cp)

    kernel = functools.partial(
        _chain_kernel, R=R, H=H, W=W, Wo=Wo, W1=W1, Cp=Cp, Cout=Cout,
        act1=act1,
        res_scale=None if res_scale is None else float(res_scale),
        emit_psum=emit_psum)
    out, psum = pl.pallas_call(
        kernel,
        grid=(N, Hp // R),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # kernel DMAs its own slab
            pl.BlockSpec(w1.shape, lambda n, i: (0, 0, 0)),
            pl.BlockSpec(b1m.shape, lambda n, i: (0, 0)),
            pl.BlockSpec(w2.shape, lambda n, i: (0, 0, 0)),
            pl.BlockSpec(b2m.shape, lambda n, i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, R, Wo, Cout), lambda n, i: (n, i, 0, 0)),
            pl.BlockSpec((1, 1, Cout), lambda n, i: (n, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, H, W, Cout), x.dtype),
            jax.ShapeDtypeStruct((N, 1, Cout), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R + 4, Ws, Cp), x.dtype),
            pltpu.VMEM((R + 4, W1, Cp), x.dtype),
            pltpu.VMEM((R + 4, W1, Cp), x.dtype),
            pltpu.VMEM((R + 2, W1 + 8, Cp), x.dtype),
            pltpu.VMEM((R + 2, W1, Cp), x.dtype),
            pltpu.VMEM((R + 2, W1, Cp), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=28 * 1024 * 1024),
        interpret=interpret,
    )(xpd, w1, b1m, w2, b2m)
    if emit_psum:
        return out, psum.reshape(N, Cout)
    return out
