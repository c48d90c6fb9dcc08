"""Fused grouped-FFN kernel (ops/group_conv.py): parity of the Pallas
kernel (interpret mode) and the XLA formulation against the module path
that the golden suite pins (reference semantics: Mlp_cnn with groups,
function.py:50), plus custom-VJP gradients and the poly-GELU bound."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vmg_tpu.ops.group_conv import fused_group_ffn, gelu_poly
from vmg_tpu.models.blocks import GroupedConv3x3, MlpCnn


def _ref_ffn(x, kernel, bias, w2, b2, g):
    """conv(block-diag dense) -> erf GELU -> dense: the module path."""
    C = x.shape[-1]
    F = kernel.shape[-1]
    cg, fg = C // g, F // g
    blocks = jnp.zeros((3, 3, C, F), kernel.dtype)
    for gi in range(g):
        blocks = blocks.at[:, :, gi * cg:(gi + 1) * cg,
                           gi * fg:(gi + 1) * fg].set(
            kernel[..., gi * fg:(gi + 1) * fg])
    h = jax.lax.conv_general_dilated(
        x, blocks, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    h = jax.nn.gelu(h, approximate=False)
    return h @ w2 + b2


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(0)
    N, H, W, C, F, g = 2, 10, 14, 16, 48, 4
    x = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, C // g, F)) * 0.2,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal((F,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((F, C)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
    return x, k, b, w2, b2, g


def test_xla_form_matches_module_path(case):
    x, k, b, w2, b2, g = case
    ref = _ref_ffn(x, k, b, w2, b2, g)
    y = fused_group_ffn(x, k, b, w2, b2, groups=g, act="erf", impl="xla")
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-5)


def test_pallas_interpret_matches_module_path(case):
    x, k, b, w2, b2, g = case
    ref = _ref_ffn(x, k, b, w2, b2, g)
    # H=10 exercises the row-tile padding path (rows=4 -> Hp=12);
    # W=14 exercises the sublane padding (Wp=16)
    y = fused_group_ffn(x, k, b, w2, b2, groups=g, act="erf",
                        impl="pallas", interpret=True, rows=4)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-5)


def test_custom_vjp_matches_autodiff(case):
    x, k, b, w2, b2, g = case

    def loss_pal(x, k, b, w2, b2):
        y = fused_group_ffn(x, k, b, w2, b2, groups=g, act="erf",
                            impl="pallas", interpret=True)
        return jnp.sum(jnp.sin(y))

    def loss_ref(x, k, b, w2, b2):
        return jnp.sum(jnp.sin(_ref_ffn(x, k, b, w2, b2, g)))

    g1 = jax.grad(loss_pal, argnums=(0, 1, 2, 3, 4))(x, k, b, w2, b2)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, k, b, w2, b2)
    for a, r in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=5e-4, rtol=1e-4)


def test_grouped_conv_module_unchanged(case):
    """GroupedConv3x3 keeps the XLA forms the goldens pin; act='gelu'
    equals conv-then-gelu."""
    x, k, b, w2, b2, g = case
    F = k.shape[-1]
    C = x.shape[-1]
    cg, fg = C // g, F // g
    params = {"params": {"kernel": k, "bias": b}}
    y0 = GroupedConv3x3(F, g).apply(params, x)
    blocks = jnp.zeros((3, 3, C, F), k.dtype)
    for gi in range(g):
        blocks = blocks.at[:, :, gi * cg:(gi + 1) * cg,
                           gi * fg:(gi + 1) * fg].set(
            k[..., gi * fg:(gi + 1) * fg])
    ref = jax.lax.conv_general_dilated(
        x, blocks, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    np.testing.assert_allclose(np.asarray(y0), np.asarray(ref), atol=2e-6)
    y1 = GroupedConv3x3(F, g, act="gelu").apply(params, x)
    np.testing.assert_allclose(
        np.asarray(y1),
        np.asarray(jax.nn.gelu(y0, approximate=False)), atol=2e-6)


def test_mlpcnn_fused_path_matches_module_path():
    """MlpCnn impl='interpret' (the kernel, interpret mode) equals the CPU
    module path on the SAME param tree -- proves the param-twin modules
    produce an identical checkpoint layout."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 2, 8, 12, 16)), jnp.float32)
    m_ref = MlpCnn(16, exp_r=3.0, n_groups=4)
    p = m_ref.init(jax.random.key(0), x)
    m_fused = MlpCnn(16, exp_r=3.0, n_groups=4, impl="interpret")
    p_fused = m_fused.init(jax.random.key(0), x)
    assert jax.tree.structure(p) == jax.tree.structure(p_fused)
    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(p_fused)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    y_ref = m_ref.apply(p, x)
    y_fused = m_fused.apply(p, x)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               atol=2e-5)


def test_set_ffn_impl_override():
    """set_ffn_impl overrides every MlpCnn's impl at trace time: forcing
    'interpret' on an impl='xla' module takes the kernel path (same
    numbers), and restoring the previous override restores behavior."""
    from vmg_tpu.models.blocks import set_ffn_impl

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 2, 8, 12, 16)), jnp.float32)
    m = MlpCnn(16, exp_r=3.0, n_groups=4, impl="xla")
    p = m.init(jax.random.key(0), x)
    y_xla = m.apply(p, x)
    prev = set_ffn_impl("interpret")
    try:
        assert prev is None
        y_forced = m.apply(p, x)
    finally:
        set_ffn_impl(prev)
    np.testing.assert_allclose(np.asarray(y_forced), np.asarray(y_xla),
                               atol=2e-5)
    # override cleared: back to the module's own (XLA) path bit-for-bit
    y_after = m.apply(p, x)
    np.testing.assert_array_equal(np.asarray(y_after), np.asarray(y_xla))


def test_gelu_poly_error_bound():
    xs = jnp.linspace(-12.0, 12.0, 100001)
    err = jnp.max(jnp.abs(gelu_poly(xs) - jax.nn.gelu(xs, approximate=False)))
    assert float(err) < 4.5e-3
