"""Fused Pallas kernels for the MorphFC-decay spatial mixer.

The stage-0/6 ``Enhanced_MorphFCs_decay`` blocks (reference
``models/function.py:596-805``) are the largest serving pool after round
3: ~14.6 ms each on-chip (xprof, stage-0 shape 16x180x320x112) of which
only ~4 ms is matmul/conv math -- the rest is HBM relayout traffic that
XLA cannot avoid at the graph level:

  * the H-axis mix forces a (B,T,H,W,C) -> (B,T,W,H,C) physical
    transpose + pad + reshape pipeline (~4.8 ms measured);
  * the three branch tensors (h, w, c) are materialized, re-read for the
    fp32 squeeze-mean (~2.8 ms of convert_reduce), re-read again for the
    softmax-weighted sum, and the projection + gate read/write the full
    tensor twice more.

Design (TPU-first, no reference code): two kernels around the one true
global dependency (the reweight softmax needs the global mean of
h + w + c, so fusing everything into one pass is impossible).

``fused_morphfc_axes``
    grid (N, ceil(H/chunk_h)); each program owns a (chunk_h, W, C) slab
    -- exactly one H-mix group -- and computes BOTH axis branches with
    zero HBM relayout:

    * H branch: the slab's native layout (rows = the chunk_h positions
      of the group, lanes = C) IS the token matrix of the H mix, so the
      branch is ``sum_p slab[p] @ Kh[p]`` where ``Kh`` is the
      block-diagonal (decay-folded) axis weight split along its input
      position axis -- 8 accumulated MXU matmuls, no transpose anywhere.
    * W branch: the W mix is transpose-free in HBM row-major order
      (tokens = (pos, q, s) flattened, see ``_FusedDecayedAxisFC``), so
      the kernel reads the SAME bytes through a second, XLA-reshaped
      view (N, H, G_w, chunk_w*C) and runs one (chunk_h*G_w, chunk_w*C)
      x (chunk_w*C, chunk_w*C) matmul.
    * the fp32 partial sums of (scaled h + w + c) for the reweight mean
      accumulate in VMEM across the sequential grid -- the branch
      tensors are never re-read for the reduction.

    H padding (H % chunk_h != 0) is handled by in-kernel row masking
    (replacing XLA's pad + slice round trip); rows past H are zeroed
    before the matmuls, their outputs are dropped by Pallas' partial
    block stores and excluded from the partial sums.

``fused_morphfc_combine``
    One streaming pass for everything after the softmax: the weighted
    branch sum, the projection matmul, and the symmetric gate
    ``(x + proj) * act(proj)`` -- 4 input reads + 1 output write versus
    XLA's 9 tensor passes through three separate fusions.

Both kernels keep the module's parameter tree unchanged (packing happens
at trace time from the same (C, C) axis weights + decay matrix).
Training keeps the XLA module path (TAB constructs the mixer with
impl='xla' when not deterministic), so no VJP is needed.  Numerics: f32
accumulation everywhere XLA accumulates f32; branch scale + bias applied
on the f32 accumulator (XLA path rounds to bf16 after the dot first --
differences are below bf16 rounding, pinned by tests on the interpret
path and on-chip by tools/tpu_check_morphfc.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vmg_tpu.ops.decay import morphfc_decay_matrix

LANE = 128


def pack_axis_weights(kernel, bias, chunk: int, decay: bool):
    """(C, C) axis-FC weight + (C,) bias -> kernel operands.

    Returns ``kp (chunk, C, chunk*C)`` -- the block-diagonal big matrix
    (token features (p, q, s) -> (p', q, s'), q-diagonal; identical
    construction to ``_FusedDecayedAxisFC``) split along the input
    position p, so the H-mix can consume a (chunk, W, C) slab row by
    row -- and ``bp (1, chunk*C) f32`` with the (P, Z)-indexed bias
    broadcast over q.
    """
    f = kernel.shape[0]
    ch = chunk
    S = f // ch
    if decay:
        gamma = morphfc_decay_matrix(ch, S)
        kernel = kernel * gamma.astype(kernel.dtype)
    k4 = kernel.reshape(ch, S, ch, S)  # (p, s, P, Z)
    eye = jnp.eye(ch, dtype=kernel.dtype)
    big = jnp.einsum("psPZ,qr->pqsPrZ", k4, eye).reshape(ch * f, ch * f)
    kp = big.reshape(ch, f, ch * f)
    if bias is None:
        bp = jnp.zeros((1, ch * f), jnp.float32)
    else:
        bp = jnp.broadcast_to(
            bias.astype(jnp.float32).reshape(ch, 1, S), (ch, ch, S)
        ).reshape(1, ch * f)
    return kp, bp


def pack_axis_weights_token(kernel, bias, chunk: int, decay: bool):
    """Token-form operands: the decayed (C, C) axis weight itself (token
    features (p, s) -> (p', s'), shared across q) + (1, C) f32 bias."""
    f = kernel.shape[0]
    if decay:
        gamma = morphfc_decay_matrix(chunk, f // chunk)
        kernel = kernel * gamma.astype(kernel.dtype)
    if bias is None:
        bp = jnp.zeros((1, f), jnp.float32)
    else:
        bp = bias.astype(jnp.float32).reshape(1, f)
    return kernel, bp


def _axes_kernel(x_ref, xw_ref, c_ref, kh_ref, bh_ref, kw_ref, bw_ref,
                 h_ref, w_ref, psum_ref, *, H, W, C, ch, cw, Gw,
                 non_linear, inv_ch, inv_cw):
    g = pl.program_id(1)
    valid = H - g * ch  # rows of this slab inside the real H extent

    # ---- H branch: sum_p slab[p] @ Kh[p], all in native layout ----
    acc_h = jnp.zeros((W, ch * C), jnp.float32)
    for p in range(ch):
        row = jnp.where(p < valid, x_ref[0, p], jnp.zeros_like(x_ref[0, p]))
        acc_h = acc_h + jax.lax.dot_general(
            row, kh_ref[p], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    acc_h = acc_h + bh_ref[0][None, :]
    if non_linear:
        acc_h = jnp.maximum(acc_h, 0.0)
    acc_h = acc_h * inv_ch

    psum = jnp.zeros((1, C), jnp.float32)
    for p in range(ch):
        hp = acc_h[:, p * C:(p + 1) * C]
        h_ref[0, p] = hp.astype(h_ref.dtype)
        s = jnp.sum(hp, axis=0, keepdims=True)
        psum = psum + jnp.where(p < valid, s, jnp.zeros_like(s))

    # ---- W branch: one matmul on the HBM-order token view ----
    wt = xw_ref[0].reshape(ch * Gw, cw * C)
    rows = jax.lax.broadcasted_iota(jnp.int32, (ch * Gw, 1), 0)
    wt = jnp.where(rows < valid * Gw, wt, jnp.zeros_like(wt))
    acc_w = jax.lax.dot_general(
        wt, kw_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_w = acc_w + bw_ref[0][None, :]
    if non_linear:
        acc_w = jnp.maximum(acc_w, 0.0)
    acc_w = acc_w * inv_cw
    w_ref[0] = acc_w.reshape(ch, Gw, cw * C).astype(w_ref.dtype)
    wm = jnp.where(rows < valid * Gw, acc_w, jnp.zeros_like(acc_w))
    sw = jnp.sum(wm, axis=0, keepdims=True)  # (1, cw*C)
    # fold (p', c') lanes onto C: per-p lane slices (Mosaic has no
    # lane -> sublane shape cast for vector<cw*C> -> vector<cw x C>)
    for p in range(cw):
        psum = psum + sw[:, p * C:(p + 1) * C]

    # ---- c branch partial sums (c itself computed by XLA upstream) ----
    for p in range(ch):
        s = jnp.sum(c_ref[0, p].astype(jnp.float32), axis=0, keepdims=True)
        psum = psum + jnp.where(p < valid, s, jnp.zeros_like(s))

    @pl.when(g == 0)
    def _():
        psum_ref[0] = psum

    @pl.when(g > 0)
    def _():
        psum_ref[0] = psum_ref[0] + psum


def fused_morphfc_axes(x, c, kh_raw, bh_raw, kw_raw, bw_raw, *,
                       chunk_h: int, chunk_w: int, decay: bool = True,
                       non_linear: bool = True, interpret: bool = False,
                       form: str | None = None):
    """Both decayed axis branches + fp32 reweight partial sums.

    x, c: (N, H, W, C) (c already scaled); kh_raw/kw_raw the raw (C, C)
    axis-FC weights, bh_raw/bw_raw their (C,) biases or None.  Form
    selection: the block-diagonal big-matrix kernel while chunk*C fits
    the lane budget (<= 1024 lanes; zero relayout, chunk-fold FLOP
    overhead on the MXU), else the token-form kernel (true FLOPs,
    chunk^2 lane-slice copies).  Returns (h (N, Hp, W, C),
    w (N, Hp, W, C), psum (N, C) f32) where Hp = ceil(H/chunk_h)*chunk_h
    -- rows >= H are junk and must be dropped by the consumer
    (``fused_morphfc_combine`` does, for free) -- and psum[n] = sum over
    the REAL (H, W) extent of (h + w + c)[n], branch scales 1/C applied.
    """
    N, H, W, C = x.shape
    ch, cw = chunk_h, chunk_w
    assert W % cw == 0, (W, cw)
    Gw = W // cw
    Gh = -(-H // ch)
    xw = x.reshape(N, H, Gw, cw * C)
    token = (ch * C > 1024 or cw * C > 1024) if form is None \
        else form == "token"

    if token:
        kh, bh = pack_axis_weights_token(kh_raw, bh_raw, ch, decay)
        kw, bw = pack_axis_weights_token(kw_raw, bw_raw, cw, decay)
        kernel = functools.partial(
            _axes_kernel_token, H=H, W=W, C=C, ch=ch, cw=cw, Gw=Gw,
            Sh=C // ch, Sw=C // cw, non_linear=non_linear, inv_c=1.0 / C)
        scratch = [pltpu.VMEM((W, C), x.dtype),
                   pltpu.VMEM((ch, Gw, C), x.dtype)]
    else:
        kh, bh = pack_axis_weights(kh_raw, bh_raw, ch, decay)
        kwp, bw = pack_axis_weights(kw_raw, bw_raw, cw, decay)
        kw = kwp.reshape(cw * C, cw * C)
        kernel = functools.partial(
            _axes_kernel, H=H, W=W, C=C, ch=ch, cw=cw, Gw=Gw,
            non_linear=non_linear, inv_ch=1.0 / C, inv_cw=1.0 / C)
        scratch = []

    h, w, psum = pl.pallas_call(
        kernel,
        grid=(N, Gh),
        in_specs=[
            pl.BlockSpec((1, ch, W, C), lambda n, g: (n, g, 0, 0)),
            pl.BlockSpec((1, ch, Gw, cw * C), lambda n, g: (n, g, 0, 0)),
            pl.BlockSpec((1, ch, W, C), lambda n, g: (n, g, 0, 0)),
            pl.BlockSpec(kh.shape, lambda n, g: (0,) * kh.ndim),
            pl.BlockSpec(bh.shape, lambda n, g: (0, 0)),
            pl.BlockSpec(kw.shape, lambda n, g: (0, 0)),
            pl.BlockSpec(bw.shape, lambda n, g: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, ch, W, C), lambda n, g: (n, g, 0, 0)),
            pl.BlockSpec((1, ch, Gw, cw * C), lambda n, g: (n, g, 0, 0)),
            # (1, 1, C): Mosaic requires the last two block dims divisible
            # by (8, 128) or equal to the array dims -- (1, C) vs (N, C)
            # is rejected, (1, C) of (N, 1, C) is exact
            pl.BlockSpec((1, 1, C), lambda n, g: (n, 0, 0)),
        ],
        out_shape=[
            # exact-H arrays: boundary blocks store partially (Pallas
            # masks out-of-range rows), so no pad rows ever reach HBM
            # and no slice-copy is needed downstream
            jax.ShapeDtypeStruct((N, H, W, C), x.dtype),
            jax.ShapeDtypeStruct((N, H, Gw, cw * C), x.dtype),
            jax.ShapeDtypeStruct((N, 1, C), jnp.float32),
        ],
        scratch_shapes=scratch,
        # the token form's 4 double-buffered (chunk, W, C)-class blocks
        # overflow the default 16M scoped-vmem budget at stage-1 shapes
        # by ~1M; v5e has headroom, raise the cap for this kernel
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=28 * 1024 * 1024) if token else None,
        interpret=interpret,
    )(x, xw, c, kh, bh, kw, bw)
    return h, w.reshape(N, H, W, C), psum.reshape(N, C)


def _axes_kernel_token(x_ref, xw_ref, c_ref, kh_ref, bh_ref, kw_ref, bw_ref,
                       h_ref, w_ref, psum_ref, patch_h, patch_w, *,
                       H, W, C, ch, cw, Gw, Sh, Sw, non_linear, inv_c):
    """Token-form axes kernel for wide stages (chunk * C > lane budget).

    The big-matrix form needs a (chunk*C)^2 weight resident in VMEM --
    25.7 MB at stage 1 (C=224, chunk 16), impossible.  This variant keeps
    the TRUE (C, C) axis weight and assembles the (pos, s) token matrix
    per channel-segment q with lane-slice copies (the group_conv patch
    pattern, measured legal), paying chunk^2 small copies per branch for
    a chunk-fold FLOP cut: 16 matmuls of contraction depth C instead of
    one of depth chunk*C with chunk x zeros.
    """
    g = pl.program_id(1)
    valid = H - g * ch

    # ---- H branch ----
    psum = jnp.zeros((1, C), jnp.float32)
    hq_sums = []
    for q in range(C // Sh):
        for p in range(ch):
            row = jnp.where(p < valid, x_ref[0, p, :, q * Sh:(q + 1) * Sh],
                            jnp.zeros((W, Sh), x_ref.dtype))
            patch_h[:, p * Sh:(p + 1) * Sh] = row
        acc = jax.lax.dot_general(
            patch_h[...], kh_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + bh_ref[0][None, :]
        if non_linear:
            acc = jnp.maximum(acc, 0.0)
        acc = acc * inv_c
        s_acc = jnp.zeros((1, Sh), jnp.float32)
        for p2 in range(ch):
            piece = acc[:, p2 * Sh:(p2 + 1) * Sh]
            h_ref[0, p2, :, q * Sh:(q + 1) * Sh] = piece.astype(h_ref.dtype)
            s = jnp.sum(piece, axis=0, keepdims=True)
            s_acc = s_acc + jnp.where(p2 < valid, s, jnp.zeros_like(s))
        hq_sums.append(s_acc)
    psum = psum + jnp.concatenate(hq_sums, axis=1)

    # ---- W branch ----
    rows = jax.lax.broadcasted_iota(jnp.int32, (ch * Gw, 1), 0)
    rmask = rows < valid * Gw
    wq_sums = []
    for q in range(C // Sw):
        for p in range(cw):
            off = p * C + q * Sw
            patch_w[:, :, p * Sw:(p + 1) * Sw] = xw_ref[0, :, :,
                                                        off:off + Sw]
        acc = jax.lax.dot_general(
            patch_w[...].reshape(ch * Gw, C), kw_ref[...],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        acc = acc + bw_ref[0][None, :]
        if non_linear:
            acc = jnp.maximum(acc, 0.0)
        acc = acc * inv_c
        accm = jnp.where(rmask, acc, jnp.zeros_like(acc))
        acc3 = acc.reshape(ch, Gw, C)
        s_acc = jnp.zeros((1, Sw), jnp.float32)
        for p2 in range(cw):
            off = p2 * C + q * Sw
            w_ref[0, :, :, off:off + Sw] = (
                acc3[:, :, p2 * Sw:(p2 + 1) * Sw].astype(w_ref.dtype))
            s_acc = s_acc + jnp.sum(accm[:, p2 * Sw:(p2 + 1) * Sw], axis=0,
                                    keepdims=True)
        wq_sums.append(s_acc)
    psum = psum + jnp.concatenate(wq_sums, axis=1)

    # ---- c branch partial sums ----
    for p in range(ch):
        s = jnp.sum(c_ref[0, p].astype(jnp.float32), axis=0, keepdims=True)
        psum = psum + jnp.where(p < valid, s, jnp.zeros_like(s))

    @pl.when(g == 0)
    def _():
        psum_ref[0] = psum

    @pl.when(g > 0)
    def _():
        psum_ref[0] = psum_ref[0] + psum


def _reduce_kernel(h_ref, w_ref, c_ref, psum_ref, *, H, R):
    i = pl.program_id(1)
    valid = H - i * R
    psum = jnp.zeros((1, h_ref.shape[-1]), jnp.float32)
    for r in range(R):
        s = jnp.sum(h_ref[0, r].astype(jnp.float32)
                    + w_ref[0, r].astype(jnp.float32)
                    + c_ref[0, r].astype(jnp.float32),
                    axis=0, keepdims=True)
        psum = psum + jnp.where(r < valid, s, jnp.zeros_like(s))

    @pl.when(i == 0)
    def _():
        psum_ref[0] = psum

    @pl.when(i > 0)
    def _():
        psum_ref[0] = psum_ref[0] + psum


def fused_morphfc_reduce(h, w, c, *, interpret: bool = False):
    """fp32 per-frame sums of (h + w + c) in one streaming pass.

    For shapes where the axes kernel is unavailable (wide stages), the
    branches come from XLA but the reweight mean does not need XLA's two
    full-tensor convert_reduce re-reads: one pass over the three branch
    tensors produces psum (N, C) f32 (the combine kernel then does the
    rest).  h, w, c: (N, H, W, C).
    """
    N, H, W, C = h.shape
    R = min(16, H)
    GH = -(-H // R)
    blk = pl.BlockSpec((1, R, W, C), lambda n, i: (n, i, 0, 0))
    psum = pl.pallas_call(
        functools.partial(_reduce_kernel, H=H, R=R),
        grid=(N, GH),
        in_specs=[blk, blk, blk],
        out_specs=pl.BlockSpec((1, 1, C), lambda n, i: (n, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, 1, C), jnp.float32),
        interpret=interpret,
    )(h, w, c)
    return psum.reshape(N, C)


def _combine_body(x_ref, h_ref, w_ref, c_ref, a_ref, pk_ref, pb_ref,
                  *, R, W, C, act):
    a = a_ref[0]  # (3, C)
    y = (h_ref[0] * a[0][None, None, :]
         + w_ref[0] * a[1][None, None, :]
         + c_ref[0] * a[2][None, None, :])
    acc = jax.lax.dot_general(
        y.reshape(R * W, C), pk_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    yp = (acc + pb_ref[0][None, :]).astype(x_ref.dtype).reshape(R, W, C)
    if act == "tanh":
        gate = jnp.tanh(yp)
    elif act == "sigmoid":
        gate = jax.nn.sigmoid(yp) - 0.5
    elif act == "relu":
        gate = jnp.maximum(yp, 0)
    else:
        raise ValueError(f"unsupported gate act {act!r}")
    return (x_ref[0] + yp) * gate


def _combine_kernel(x_ref, h_ref, w_ref, c_ref, a_ref, pk_ref, pb_ref,
                    out_ref, *, R, W, C, act):
    out_ref[0] = _combine_body(x_ref, h_ref, w_ref, c_ref, a_ref, pk_ref,
                               pb_ref, R=R, W=W, C=C, act=act)


def _combine_res_kernel(res_ref, x_ref, h_ref, w_ref, c_ref, a_ref, pk_ref,
                        pb_ref, out_ref, *, R, W, C, act, res_scale):
    """Combine + the TAB-level residual: out = res + res_scale * mixed
    (reference function.py:1216 ``x + drop_path(mix) * spatial_scale``,
    eval path) -- the block residual that XLA would otherwise spend a
    separate full read+write pass on."""
    mixed = _combine_body(x_ref, h_ref, w_ref, c_ref, a_ref, pk_ref,
                          pb_ref, R=R, W=W, C=C, act=act)
    out_ref[0] = res_ref[0] + res_scale * mixed


def fused_morphfc_combine(x, h, w, c, a, pk, pb, *, act: str = "tanh",
                          residual=None, res_scale: float = 1.0,
                          interpret: bool = False):
    """softmax-weighted branch sum + projection + symmetric gate.

    x, h, w, c: (N, H, W, C); a: (N, 3, C)
    per-frame softmax weights; pk (C, C), pb (C,).  Returns
    (x + proj(y)) * act(proj(y)) with y = h*a0 + w*a1 + c*a2 --
    reference function.py:784-800 semantics.  With ``residual`` (the TAB
    trunk, (N, H, W, C)) the block-level residual is folded in too:
    ``residual + res_scale * mixed`` (function.py:1216, eval path).
    """
    N, H, W, C = x.shape
    R = min(16, H)
    GH = -(-H // R)
    pbf = pb.astype(jnp.float32).reshape(1, C)
    blk = pl.BlockSpec((1, R, W, C), lambda n, i: (n, i, 0, 0))
    small_specs = [
        pl.BlockSpec((1, 3, C), lambda n, i: (n, 0, 0)),
        pl.BlockSpec(pk.shape, lambda n, i: (0, 0)),
        pl.BlockSpec(pbf.shape, lambda n, i: (0, 0)),
    ]
    if residual is None:
        kernel = functools.partial(_combine_kernel, R=R, W=W, C=C, act=act)
        in_specs = [blk, blk, blk, blk] + small_specs
        args = (x, h, w, c, a, pk, pbf)
    else:
        kernel = functools.partial(_combine_res_kernel, R=R, W=W, C=C,
                                   act=act, res_scale=float(res_scale))
        in_specs = [blk, blk, blk, blk, blk] + small_specs
        args = (residual, x, h, w, c, a, pk, pbf)
    out = pl.pallas_call(
        kernel,
        grid=(N, GH),
        in_specs=in_specs,
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((N, H, W, C), x.dtype),
        interpret=interpret,
    )(*args)
    return out
