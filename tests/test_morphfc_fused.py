"""Fused MorphFC Pallas kernels (interpret mode) vs the XLA module path.

The kernels (ops/morphfc_fused) must reproduce MorphFCDecay's math from
the SAME parameter tree: init through the XLA path, apply through the
kernel path.  Covers the H-padding mask (H % chunk_h != 0), both channel
mixers, the no-relu / no-decay / no-bias variants, and the gate flavors.
Reference semantics: models/function.py:596-805 (Enhanced_MorphFCs_decay).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vmg_tpu.models.blocks import MorphFCDecay


def _pair(H, W, C=16, chunk=4, T=3, seed=0, **kw):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((1, T, H, W, C)).astype(np.float32))
    cfg = {"dim": C, "chunk_h": chunk, "chunk_w": chunk}
    cfg.update(kw)
    m_ref = MorphFCDecay(**cfg, impl="xla")
    p = jax.jit(m_ref.init)(jax.random.key(1), x)
    y_ref = m_ref.apply(p, x)
    y_k = MorphFCDecay(**cfg, impl="interpret").apply(p, x)
    return np.asarray(y_ref), np.asarray(y_k)


@pytest.mark.parametrize("H", [16, 18])  # 18: partial last H-group masked
@pytest.mark.parametrize("channel_mixer", ["vanilla", "rcab"])
def test_matches_xla(H, channel_mixer):
    y_ref, y_k = _pair(H, 16, channel_mixer=channel_mixer)
    np.testing.assert_allclose(y_k, y_ref, atol=3e-5, rtol=2e-4)


@pytest.mark.parametrize("kw", [
    dict(non_linear=False),
    dict(decay=False),
    dict(qkv_bias=False),
    dict(symm_act="sigmoid"),
    dict(chunk_h=2, chunk_w=8),  # unequal chunks
])
def test_variants(kw):
    y_ref, y_k = _pair(14, 16, seed=3, **kw)
    np.testing.assert_allclose(y_k, y_ref, atol=3e-5, rtol=2e-4)


def test_hybrid_mode_matches_xla():
    """C % chunk != 0 (the stage-2 geometry class) takes the hybrid path:
    XLA axis branches + reduce/combine kernels."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 2, 12, 12, 18)).astype(np.float32))
    m_ref = MorphFCDecay(dim=18, chunk_h=4, chunk_w=4, impl="xla")
    p = jax.jit(m_ref.init)(jax.random.key(0), x)
    y_ref = m_ref.apply(p, x)
    m_k = MorphFCDecay(dim=18, chunk_h=4, chunk_w=4, impl="interpret")
    assert m_k._pallas_mode(x, "interpret") == "hybrid"
    y_k = m_k.apply(p, x)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref),
                               atol=3e-5, rtol=2e-4)


def test_gate_falls_back_without_gating():
    """Settings the kernels do not support (no gating) use the XLA path."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 2, 8, 8, 16)).astype(np.float32))
    m = MorphFCDecay(dim=16, chunk_h=4, chunk_w=4, gating=False,
                     impl="interpret")
    assert m._pallas_mode(x, "interpret") is None
    p = jax.jit(m.init)(jax.random.key(0), x)
    y = m.apply(p, x)
    assert y.shape == x.shape


def test_token_form_matches_big_form():
    """The two axes-kernel forms (block-diagonal big-matrix vs token-form
    with per-q assembly) compute the same branches and partial sums."""
    from vmg_tpu.ops.morphfc_fused import fused_morphfc_axes

    rng = np.random.default_rng(4)
    N, H, W, C, ck = 2, 14, 16, 16, 4
    x = jnp.asarray(rng.standard_normal((N, H, W, C)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((N, H, W, C)).astype(np.float32))
    kh = jnp.asarray(rng.standard_normal((C, C)).astype(np.float32) * 0.05)
    kw = jnp.asarray(rng.standard_normal((C, C)).astype(np.float32) * 0.05)
    bh = jnp.asarray(rng.standard_normal((C,)).astype(np.float32) * 0.1)
    bw = jnp.asarray(rng.standard_normal((C,)).astype(np.float32) * 0.1)
    kw_args = dict(chunk_h=ck, chunk_w=ck, decay=True, non_linear=True,
                   interpret=True)
    h1, w1, p1 = fused_morphfc_axes(x, c, kh, bh, kw, bw, form="big",
                                    **kw_args)
    h2, w2, p2 = fused_morphfc_axes(x, c, kh, bh, kw, bw, form="token",
                                    **kw_args)
    # pad rows (>= H) hold form-specific junk by contract; compare the
    # real extent only
    np.testing.assert_allclose(np.asarray(h2[:, :H]), np.asarray(h1[:, :H]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(w2[:, :H]), np.asarray(w1[:, :H]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1),
                               atol=1e-3, rtol=1e-5)
