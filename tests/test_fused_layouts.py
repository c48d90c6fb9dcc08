"""Equivalence tests for the transpose-free (fused) hot-path layouts.

Round-3 perf work (VERDICT r2 item 1) replaces the profiled copy sinks --
the MorphFC axis-mix relayouts and the LTAM 2x2-window transforms -- with
formulations that keep data in native layout.  These tests pin the fused
forms to the straightforward ones at fp32.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vmg_tpu.models.blocks import MorphFC, MorphFCDecay


def _cmp_variants(mk_module, x, seed=0, tol=2e-5):
    slow = mk_module(False)
    fast = mk_module(True)
    params = jax.jit(slow.init)(jax.random.key(seed), x)
    # identical param trees: the fused module keeps names and shapes
    out_slow = jax.jit(slow.apply)(params, x)
    out_fast = jax.jit(fast.apply)(params, x)
    np.testing.assert_allclose(np.asarray(out_slow), np.asarray(out_fast),
                               atol=tol, rtol=tol)


@pytest.mark.parametrize("chunk,dim,hw", [
    ((8, 8), 112, (16, 24)),    # stage-0 shape family (C % chunk == 0)
    ((5, 10), 112, (15, 20)),   # non-dividing chunks -> channel padding
    ((3, 3), 32, (10, 9)),      # spatial padding (W % chunk != 0)
])
def test_morphfc_decay_fused_matches_reference_layout(chunk, dim, hw):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 3, *hw, dim)), jnp.float32)

    def mk(fused):
        return MorphFCDecay(dim, chunk_h=chunk[0], chunk_w=chunk[1],
                            channel_mixer="rcab", fused=fused)

    _cmp_variants(mk, x)


def test_morphfc_decay_fused_gradients_match():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 2, 8, 8, 16)), jnp.float32)
    slow = MorphFCDecay(16, chunk_h=4, chunk_w=4, fused=False)
    fast = MorphFCDecay(16, chunk_h=4, chunk_w=4, fused=True)
    params = jax.jit(slow.init)(jax.random.key(2), x)

    def loss(mod, p):
        return jnp.sum(mod.apply(p, x) ** 2)

    g_slow = jax.jit(jax.grad(lambda p: loss(slow, p)))(params)
    g_fast = jax.jit(jax.grad(lambda p: loss(fast, p)))(params)
    for ks, vs in jax.tree_util.tree_leaves_with_path(g_slow):
        vf = g_fast
        for k in ks:
            vf = vf[k.key]
        np.testing.assert_allclose(np.asarray(vs), np.asarray(vf),
                                   atol=1e-3, rtol=1e-3)


def test_morphfc_plain_fused_matches_reference_layout():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 2, 12, 16, 24)), jnp.float32)

    def mk(fused):
        return MorphFC(24, chunk_h=4, chunk_w=8, fused=fused)

    _cmp_variants(mk, x)


def test_morphfc_decay_norm_falls_back_to_unfused():
    """relu_scale_norm needs the (q)-token layout; fused must defer."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 2, 8, 8, 16)), jnp.float32)
    a = MorphFCDecay(16, chunk_h=4, chunk_w=4, relu_scale=False,
                     relu_scale_norm=True, fused=True)
    b = MorphFCDecay(16, chunk_h=4, chunk_w=4, relu_scale=False,
                     relu_scale_norm=True, fused=False)
    params = jax.jit(b.init)(jax.random.key(5), x)
    np.testing.assert_allclose(np.asarray(jax.jit(a.apply)(params, x)),
                               np.asarray(jax.jit(b.apply)(params, x)),
                               atol=1e-6, rtol=1e-6)


def test_ltam_wins_strided_matches_windows():
    from vmg_tpu.models.trajectory import LTAM

    rng = np.random.default_rng(6)
    n, K, h, w, c = 2, 3, 8, 12, 16
    curr = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    anchor = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    index_buf = jnp.asarray(rng.standard_normal((n, K, h, w, c)), jnp.float32)
    sparse_buf = jnp.asarray(rng.standard_normal((n, K, h, w, c)), jnp.float32)
    loc = jnp.asarray(
        rng.uniform(0, [w - 1, h - 1], (n, K, h, w, 2)), jnp.float32)

    a = LTAM(embed_dim=c, head=4, mode="wins", win_impl="strided")
    b = LTAM(embed_dim=c, head=4, mode="wins", win_impl="windows")
    params = jax.jit(b.init)(jax.random.key(7), curr, index_buf, anchor,
                             sparse_buf, loc)
    oa = jax.jit(a.apply)(params, curr, index_buf, anchor, sparse_buf, loc)
    ob = jax.jit(b.apply)(params, curr, index_buf, anchor, sparse_buf, loc)
    np.testing.assert_allclose(np.asarray(oa), np.asarray(ob),
                               atol=2e-5, rtol=2e-5)


def test_conv_pixel_shuffle_matches_conv_then_shuffle():
    from vmg_tpu.ops.pixel_shuffle import conv_pixel_shuffle, pixel_shuffle

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((2, 6, 8, 16)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((3, 3, 16, 48)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((48,)), jnp.float32)

    got = conv_pixel_shuffle(x, kernel, bias, 2)
    ref = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    want = pixel_shuffle(ref, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("mode,en_field", [("wins", False), ("max", False),
                                           ("max", True)])
def test_trajectory_warped_carry_matches_loc_carry(mode, en_field):
    """'warped' carry (nearest-warped buffer copies, one wide warp/step)
    must equal the reference-shaped 'loc' carry exactly: nearest
    resampling composes, and values are never interpolated."""
    from vmg_tpu.models.trajectory import TrajectoryMultiHead

    rng = np.random.default_rng(11)
    B, T, H, W, C = 1, 7, 16, 16, 16
    x = jnp.asarray(rng.standard_normal((B, T, H, W, C)), jnp.float32)
    ff = jnp.asarray(rng.standard_normal((B, T - 1, H, W, 2)) * 2,
                     jnp.float32)
    fb = jnp.asarray(rng.standard_normal((B, T - 1, H, W, 2)) * 2,
                     jnp.float32)

    def mk(impl):
        return TrajectoryMultiHead(
            embed_dim=C, num_blocks=2, keyframe_stride=3, head=4,
            mode=mode, r_scaling=0.1, ltam=True, en_field=en_field,
            field_stride=4, carry_impl=impl)

    a, b = mk("loc"), mk("warped")
    params = jax.jit(a.init)(jax.random.key(12), x, ff, fb)
    oa = jax.jit(a.apply)(params, x, ff, fb)
    ob = jax.jit(b.apply)(params, x, ff, fb)
    np.testing.assert_allclose(np.asarray(oa), np.asarray(ob),
                               atol=2e-5, rtol=2e-5)
