"""Equivalence tests for the fused conv3x3-chain Pallas kernel
(ops/conv_chain) against the plain XLA formulation, interpret mode.

On-chip compile + parity is tools/tpu_check_convchain.py (same pattern
as tools/tpu_check_groupconv.py).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vmg_tpu.ops.conv_chain import fused_conv_chain


def _xla_chain(x, k1, b1, k2, b2, act1="relu", res_scale=None):
    y = jax.lax.conv_general_dilated(
        x, k1, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + b1
    if act1 == "relu":
        y = jax.nn.relu(y)
    elif act1 == "lrelu":
        y = jnp.where(y >= 0, y, 0.1 * y)
    y = jax.lax.conv_general_dilated(
        y, k2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + b2
    if res_scale is not None:
        y = x + res_scale * y
    return y


def _mk(rng, shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.1)


@pytest.mark.parametrize("H,W,C", [(16, 24, 16), (13, 24, 16)])
def test_chain_matches_xla(rng, H, W, C):
    x = _mk(rng, (2, H, W, C))
    k1, b1 = _mk(rng, (3, 3, C, C)), _mk(rng, (C,))
    k2, b2 = _mk(rng, (3, 3, C, C)), _mk(rng, (C,))
    got = fused_conv_chain(x, k1, b1, k2, b2, rows=4, interpret=True)
    want = _xla_chain(x, k1, b1, k2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_chain_resblock_mode(rng):
    """out = x + scale * conv2(relu(conv1(x))) -- ResidualBlockNoBN."""
    H, W, C = 16, 24, 16
    x = _mk(rng, (1, H, W, C))
    k1, b1 = _mk(rng, (3, 3, C, C)), _mk(rng, (C,))
    k2, b2 = _mk(rng, (3, 3, C, C)), _mk(rng, (C,))
    got = fused_conv_chain(x, k1, b1, k2, b2, res_scale=0.1, rows=4,
                           interpret=True)
    want = _xla_chain(x, k1, b1, k2, b2, res_scale=0.1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_chain_psum_and_rect_channels(rng):
    """RCAB form: psum = sum over the real (H, W) extent (pad rows/cols
    excluded), Cin != Cm."""
    H, W, Cin, Cm = 11, 16, 24, 16
    x = _mk(rng, (2, H, W, Cin))
    k1, b1 = _mk(rng, (3, 3, Cin, Cm)), _mk(rng, (Cm,))
    k2, b2 = _mk(rng, (3, 3, Cm, Cin)), _mk(rng, (Cin,))
    got, psum = fused_conv_chain(x, k1, b1, k2, b2, emit_psum=True,
                                 rows=4, interpret=True)
    want = _xla_chain(x, k1, b1, k2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(psum), np.asarray(want.astype(jnp.float32).sum((1, 2))),
        atol=1e-4, rtol=1e-5)


def test_resblock_module_kernel_path(rng):
    """ResidualBlockNoBN impl='interpret' == impl='xla' on one param tree."""
    from vmg_tpu.models.trajectory import ResidualBlockNoBN
    x = _mk(rng, (2, 12, 16, 24))
    m_x = ResidualBlockNoBN(24, res_scale=0.1, impl="xla")
    m_k = ResidualBlockNoBN(24, res_scale=0.1, impl="interpret")
    p = m_x.init(jax.random.key(0), x)
    np.testing.assert_allclose(
        np.asarray(m_k.apply(p, x)), np.asarray(m_x.apply(p, x)),
        atol=1e-5, rtol=1e-5)


def test_rcab_module_kernel_path(rng):
    """RCAB impl='interpret' == impl='xla' (SE pooling from kernel psum)."""
    from vmg_tpu.models.blocks import RCAB
    x = _mk(rng, (1, 2, 12, 16, 24))
    m_x = RCAB(24, impl="xla")
    m_k = RCAB(24, impl="interpret")
    p = m_x.init(jax.random.key(0), x)
    np.testing.assert_allclose(
        np.asarray(m_k.apply(p, x)), np.asarray(m_x.apply(p, x)),
        atol=1e-5, rtol=1e-5)


def test_chain_lrelu_first_act(rng):
    H, W, C = 8, 16, 8
    x = _mk(rng, (1, H, W, C))
    k1, b1 = _mk(rng, (3, 3, C, C)), _mk(rng, (C,))
    k2, b2 = _mk(rng, (3, 3, C, C)), _mk(rng, (C,))
    got = fused_conv_chain(x, k1, b1, k2, b2, act1="lrelu", rows=4,
                           interpret=True)
    want = _xla_chain(x, k1, b1, k2, b2, act1="lrelu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
