"""Fused Pallas kernel for the grouped-conv FFN (conv3x3 + GELU + project).

The stage-0/6 TAB FFN (reference ``models/function.py:50`` Mlp_cnn with
``groups=4``) expands C -> 6C with a grouped 3x3 conv, applies GELU, and
projects back with a dense layer.  XLA has no good lowering for the
grouped conv on TPU: ``feature_group_count`` is silently wrong at the
stage-1 shape (NOTES_ROUND3 "TPU bugs"), per-group convs contract only
cg=28 of the MXU's 128 sublanes (~26 TFLOP/s), and the shipped
block-diagonal dense form pays groups x the FLOPs in exact zeros.  The
profiled serving trace puts the stage-0 expand conv + GELU at 15.8 ms
(largest single op) plus 2.4 ms for the projection -- and the 6x-wide
hidden activation makes two full HBM round trips in between.

This kernel computes the WHOLE FFN with the hidden activation resident in
VMEM (one HBM read of the input, one HBM write of the C-wide output):

  * the host packs the three dx-shifted copies of the input along lanes
    in (group, dx, channel) order (lane dim padded to a 128 multiple), so
    the kernel's manual DMA of a dy-halo'd row slab is fully tile-aligned
    (Mosaic requires DMA slice extents aligned to the (8,128) tiling --
    measured, tools/exp_mosaic_probe.py);
  * dy taps come from the slab's leading (untiled) row axis: per group,
    the conv is 3 accumulated matmuls of contraction depth 3*cg (84 at
    stage 0 vs 28 for a per-group conv) at the conv's TRUE FLOPs --
    group slices are unaligned lane READS, which Mosaic lowers fine
    (same probe);
  * bias + GELU run on the f32 accumulator, then the projection matmul
    (fc2) contracts the hidden back to C in-kernel, accumulating across
    groups -- a (fg -> C) dot per group, summed, which equals the dense
    fc2 on the concatenated hidden.

The backward is the custom-VJP of an equivalent XLA formulation
(``_xla_forward_ffn``): gradients are exact for the same math, and
training still takes the fast forward.

Numerics: conv accumulation is f32 (``preferred_element_type``), GELU in
f32, hidden cast to the input dtype for the projection (matching the XLA
module path where the conv output is materialized in compute dtype).
Tap summation order differs from XLA's conv lowering, so on-TPU outputs
match the module form to bf16 rounding; CPU tests and goldens keep the
XLA module path (``models/blocks.py`` MlpCnn gating), and the on-chip
parity check is ``tools/tpu_check_groupconv.py``.

GELU flavors: 'erf' (training / parity), 'tanh' (serving fast-math,
matches ``blocks.set_fast_gelu``), 'poly' (serving-only degree-9 odd
minimax polynomial of erf(x/sqrt2), max |gelu error| 3.9e-3 f32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
np_sqrt2 = float(2.0 ** 0.5)

# degree-9 odd minimax polynomial for t(x) ~ erf(x / sqrt(2)) on
# [-GELU_POLY_CLAMP, +GELU_POLY_CLAMP] (iteratively reweighted LS fit);
# beyond the clamp t snaps to +-1, so the tail error is
# |x|/2 * erfc(|x|/sqrt2) <= 1.2e-3 and decays superexponentially.
# Measured max |gelu_poly - gelu_erf| = 3.9e-3 in f32 (near x ~ 3.4).
GELU_POLY_CLAMP = 3.4
GELU_POLY_C = (
    0.793602488793883,
    -0.12420100474324265,
    0.014702234375413426,
    -0.0009693750356708431,
    2.6292438362010623e-05,
)


def gelu_poly(x):
    """Cheap serving GELU: x * 0.5 * (1 + poly9(clamp(x))), sign-snapped
    to +-1 beyond the fit range."""
    xc = jnp.clip(x, -GELU_POLY_CLAMP, GELU_POLY_CLAMP)
    x2 = xc * xc
    c = GELU_POLY_C
    t = c[4]
    for k in (3, 2, 1, 0):
        t = t * x2 + c[k]
    t = t * xc
    t = jnp.where(jnp.abs(x) >= GELU_POLY_CLAMP, jnp.sign(x), t)
    return 0.5 * x * (1.0 + t)


def _erf_as(x):
    """erf via Abramowitz-Stegun 7.1.26 (|err| <= 1.5e-7): Mosaic has no
    erf/erfc lowering, but exp is supported."""
    s = jnp.sign(x)
    z = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * z)
    poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
             - 0.284496736) * t + 0.254829592) * t
    return s * (1.0 - poly * jnp.exp(-z * z))


def _apply_act(y, act, mosaic=False):
    if act is None:
        return y
    if act == "erf":
        if mosaic:
            return 0.5 * y * (1.0 + _erf_as(y * (1.0 / np_sqrt2)))
        return jax.nn.gelu(y, approximate=False)
    if act == "tanh":
        return jax.nn.gelu(y, approximate=True)
    if act == "poly":
        return gelu_poly(y)
    raise ValueError(f"unknown act {act!r}")


def _ceil_to(v: int, m: int) -> int:
    return -(-v // m) * m


def pack_ffn_weights(kernel, bias, w2, b2, groups: int):
    """Conv params (3,3,cg,F) HWIO-grouped + dense (F,Cout) -> kernel
    operand layout.

    Returns wmat (g, 9*cg, fg) with rows in (tap, channel-in-group) order
    (tap = dy*3+dx) to match the kernel's VMEM patch assembly; bmat
    (g, fg); w2m (g, fg, Cout); b2m (1, Cout)."""
    kh, kw, cg, F = kernel.shape
    fg = F // groups
    wm = kernel.reshape(kh * kw * cg, F)
    wmat = jnp.stack([wm[:, b * fg:(b + 1) * fg] for b in range(groups)])
    bmat = bias.reshape(groups, fg)
    w2m = jnp.stack([w2[b * fg:(b + 1) * fg] for b in range(groups)])
    b2m = b2.reshape(1, -1)
    return wmat, bmat, w2m, b2m


def _kernel(x_ref, w_ref, b_ref, w2_ref, b2_ref, out_ref, xs, patch, sem,
            *, R, Wo, cg, fg, Cout, g, act):
    n = pl.program_id(0)
    i = pl.program_id(1)
    dma = pltpu.make_async_copy(x_ref.at[n, pl.ds(i * R, R + 2)], xs, sem)
    dma.start()
    dma.wait()
    acc2 = jnp.zeros((R * Wo, Cout), jnp.float32)
    for b in range(g):
        # im2col patch assembled in VMEM: dy from slab rows (untiled
        # axis), dx from sublane-offset reads, group from lane-offset
        # reads, taps joined by lane-offset stores -- all measured legal
        # (tools/exp_mosaic_probe*.py)
        for dy in range(3):
            for dx in range(3):
                t = dy * 3 + dx
                patch[:, :, t * cg:(t + 1) * cg] = (
                    xs[dy:dy + R, dx:dx + Wo, b * cg:(b + 1) * cg])
        acc = jax.lax.dot_general(
            patch[...].reshape(R * Wo, 9 * cg), w_ref[b],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = _apply_act(acc + b_ref[b][None, :].astype(jnp.float32), act,
                       mosaic=True)
        acc2 = acc2 + jax.lax.dot_general(
            y.astype(xs.dtype), w2_ref[b], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out = acc2 + b2_ref[0][None, :].astype(jnp.float32)
    out_ref[0] = out.reshape(R, Wo, Cout).astype(out_ref.dtype)


def _pick_rows(Wo: int, Cp: int, cg: int, fg: int, Cout: int,
               itemsize: int) -> int:
    """Largest row tile whose working set fits comfortably in VMEM.
    Live: halo'd input slab, the per-group patch, f32 conv accumulator +
    hidden + f32 output accumulator, the (double-buffered) output
    block."""
    for r in (16, 8, 4, 2):
        live = ((r + 2) * (Wo + 8) * Cp * itemsize    # xs slab
                + r * Wo * _ceil_to(9 * cg, LANE) * itemsize  # patch
                + r * Wo * fg * (4 + 4 + itemsize)    # acc f32 + act + hidden
                + r * Wo * Cout * 4                   # acc2 f32
                + 2 * r * Wo * Cout * itemsize)       # out block x2
        if live <= 10 * 1024 * 1024:
            return r
    return 2


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _fused_group_ffn(x, wmat, bmat, w2m, b2m, g, act, interpret, rows):
    N, H, W, C = x.shape
    cg = C // g
    fg = wmat.shape[-1]
    Cout = w2m.shape[-1]
    Cp = _ceil_to(C, LANE)
    Wo = _ceil_to(W, 8)
    R = rows or _pick_rows(Wo, Cp, cg, fg, Cout, x.dtype.itemsize)
    Hp = _ceil_to(H, R)
    Wp2 = _ceil_to(Wo + 2, 8)
    # one aligned pad (usually fused into the producer by XLA); channel
    # lanes pad to 128 so the kernel's manual row-slab DMA is tile-aligned
    xpd = jnp.pad(x, ((0, 0), (1, 1 + Hp - H), (1, Wp2 - 1 - W),
                      (0, Cp - C)))
    kernel = functools.partial(_kernel, R=R, Wo=Wo, cg=cg, fg=fg,
                               Cout=Cout, g=g, act=act)
    out = pl.pallas_call(
        kernel,
        grid=(N, Hp // R),
        in_specs=[
            # ANY-space input: the kernel DMAs its halo'd row slab itself
            # (BlockSpec blocks cannot overlap); weights as whole blocks
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(wmat.shape, lambda n, i: (0, 0, 0)),
            pl.BlockSpec(bmat.shape, lambda n, i: (0, 0)),
            pl.BlockSpec(w2m.shape, lambda n, i: (0, 0, 0)),
            pl.BlockSpec(b2m.shape, lambda n, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, R, Wo, Cout), lambda n, i: (n, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, Hp, Wo, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((R + 2, Wp2, Cp), x.dtype),
            pltpu.VMEM((R, Wo, 9 * cg), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xpd, wmat, bmat, w2m, b2m)
    return out[:, :H, :W]


def _xla_forward_ffn(x, wmat, bmat, w2m, b2m, g, act):
    """Equivalent XLA formulation (backward source + CPU path).

    Same (tap, c)-ordered im2col patch, per-group deep matmul, f32 act,
    per-group projection summed; jax.vjp of this gives exact gradients
    for the kernel's math."""
    N, H, W, C = x.shape
    cg = C // g
    Cout = w2m.shape[-1]
    xw = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((N, H, W, Cout), jnp.float32)
    for b in range(g):
        xg = xw[..., b * cg:(b + 1) * cg]
        taps = jnp.concatenate(
            [xg[:, dy:dy + H, dx:dx + W, :]
             for dy in range(3) for dx in range(3)], axis=-1)
        acc = jax.lax.dot_general(
            taps, wmat[b], (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = _apply_act(acc + bmat[b].astype(jnp.float32), act)
        out = out + jax.lax.dot_general(
            y.astype(x.dtype), w2m[b], (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return (out + b2m[0].astype(jnp.float32)).astype(x.dtype)


def _fwd_rule(x, wmat, bmat, w2m, b2m, g, act, interpret, rows):
    return (_fused_group_ffn(x, wmat, bmat, w2m, b2m, g, act, interpret,
                             rows),
            (x, wmat, bmat, w2m, b2m))


def _bwd_rule(g, act, interpret, rows, res, ct):
    x, wmat, bmat, w2m, b2m = res
    _, vjp = jax.vjp(
        lambda a, w, b, w2, b2: _xla_forward_ffn(a, w, b, w2, b2, g, act),
        x, wmat, bmat, w2m, b2m)
    return vjp(ct.astype(x.dtype))


_fused_group_ffn.defvjp(_fwd_rule, _bwd_rule)


def fused_group_ffn(x, kernel, bias, w2, b2, *, groups: int,
                    act: str | None = "erf",
                    impl: str = "auto",
                    interpret: bool = False,
                    rows: int | None = None):
    """Grouped 3x3 conv (stride 1, SAME) + bias + GELU + dense projection.

    x (N, H, W, C); kernel (3, 3, C/groups, F); bias (F,); w2 (F, Cout);
    b2 (Cout,).  ``impl``: 'pallas' | 'xla' | 'auto' (pallas on TPU, xla
    elsewhere).  Differentiable; backward is the exact vjp of the XLA
    formulation."""
    N, H, W, C = x.shape
    F = kernel.shape[-1]
    if C % groups or F % groups:
        raise ValueError(f"C={C}, F={F} not divisible by groups={groups}")
    wmat, bmat, w2m, b2m = pack_ffn_weights(kernel, bias, w2, b2, groups)
    use_pallas = impl == "pallas" or (
        impl == "auto" and jax.default_backend() == "tpu")
    if use_pallas:
        return _fused_group_ffn(x, wmat, bmat, w2m, b2m, groups, act,
                                interpret, rows)
    return _xla_forward_ffn(x, wmat, bmat, w2m, b2m, groups, act)
