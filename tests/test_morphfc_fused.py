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


def test_gate_falls_back_to_xla():
    """Shapes/settings the kernel does not support must run (XLA path)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 2, 12, 12, 18)).astype(np.float32))
    m = MorphFCDecay(dim=18, chunk_h=4, chunk_w=4, impl="interpret")
    p = jax.jit(m.init)(jax.random.key(0), x)
    assert m._pallas_ok(x, "interpret") is False  # C % chunk != 0
    y = m.apply(p, x)
    assert y.shape == x.shape
