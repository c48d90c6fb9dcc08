"""Module-level oracles for the FFN zoo tail vs the reference torch
modules (``/root/reference/models/function.py``): Mlp_cnn_shift (:239),
Mlp_ir (:282), Mlp_ir_multi (:318).

The full-model golden tests cover ffn_cnn and vanilla; these close the
remaining variants with direct weight transfer.  Note: ``irffn_single``
through the reference TAB dispatch (function.py:1204) is a latent crash
as shipped — TAB passes no ``hidden_features`` and Mlp_ir's fc1 uses the
un-defaulted argument (function.py:289) — so the oracle instantiates the
reference module with the hidden size passed explicitly, which is the
semantics our MlpIr implements.
"""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/tests")

torch = pytest.importorskip("torch")

from ref_stubs import import_reference_models  # noqa: E402

from vmg_tpu.models.blocks import MlpCnnShift, MlpIr, MlpIrMulti  # noqa: E402


@pytest.fixture(scope="module")
def ref():
    return import_reference_models()


def _lin(mod):
    return (np.asarray(mod.weight.detach()).T,
            np.asarray(mod.bias.detach()))


def _dw(mod):
    # torch depthwise (ch, 1, kh, kw) -> flax (kh, kw, 1, ch)
    return (np.asarray(mod.weight.detach()).transpose(2, 3, 1, 0),
            np.asarray(mod.bias.detach()))


def _dense(w, b):
    return {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}


def _run_pair(ref_mod, mine, params, shape, atol=2e-5):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(shape).astype(np.float32)
    with torch.no_grad():
        want = np.asarray(ref_mod(torch.from_numpy(x)))
    got = np.asarray(jax.jit(mine.apply)({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-4)


def test_mlp_cnn_shift_matches_reference(ref):
    torch.manual_seed(0)
    C = 18
    r = ref.Mlp_cnn_shift(in_features=C, exp_r=2)
    r.eval()
    params = {
        "fc": _dense(*_lin(r.fc)),
        "fc1": _dense(*_lin(r.fc1)),
        "fc2": _dense(*_lin(r.fc2)),
        "proj": _dense(*_lin(r.proj)),
        "reweight": {"fc1": _dense(*_lin(r.reweight.fc1)),
                     "fc2": _dense(*_lin(r.reweight.fc2))},
    }
    _run_pair(r, MlpCnnShift(dim=C, exp_r=2.0), params, (2, 3, 8, 10, C))


def test_mlp_ir_matches_reference(ref):
    torch.manual_seed(1)
    C, exp_r = 12, 2
    r = ref.Mlp_ir(in_features=C, hidden_features=C * exp_r, exp_r=exp_r)
    r.eval()
    params = {
        "fc1": _dense(*_lin(r.fc1)),
        "fc2": _dense(*_dw(r.fc2)),
        "fc3": _dense(*_lin(r.fc3)),
    }
    _run_pair(r, MlpIr(dim=C, exp_r=float(exp_r)), params, (1, 2, 9, 7, C))


def test_mlp_ir_multi_matches_reference(ref):
    """Mlp_ir_multi is un-runnable as shipped: a stray second ``forward``
    (a copy-pasted trajectory recurrence, function.py:373-388) shadows
    the real one (:340-367), so calling the module with one argument
    crashes on ``flow_backward[:, i]``.  The oracle therefore composes
    the reference's OWN submodules per the shadowed forward's source
    text, which is the semantics MlpIrMulti implements."""
    torch.manual_seed(2)
    C, exp_r = 16, 2   # hidden 32, 4 kernel groups of 8
    r = ref.Mlp_ir_multi(in_features=C, exp_r=exp_r)
    r.eval()
    params = {
        "fc1": _dense(*_lin(r.fc1)),
        "fc3": _dense(*_lin(r.fc3)),
    }
    for i, blk in enumerate(r.fc2_multi):
        params[f"fc2_multi{i}"] = _dense(*_dw(blk))

    rng = np.random.default_rng(0)
    xs = rng.standard_normal((1, 2, 8, 6, C)).astype(np.float32)
    with torch.no_grad():
        x = torch.from_numpy(xs)
        B, T, H, W, _ = x.shape
        hidden = r.hidden_features
        y = r.act1(r.fc1(x))
        y = y.permute(0, 1, 4, 2, 3).contiguous().view(-1, hidden, H, W)
        feat = torch.chunk(y, r.scale_n, 1)
        y = torch.cat([blk(f) for blk, f in zip(r.fc2_multi, feat)], dim=1)
        y = y + r.act2(y)
        y = y.view(B, T, hidden, H, W).permute(0, 1, 3, 4, 2).contiguous()
        want = np.asarray(r.fc3(y))

    mine = MlpIrMulti(dim=C, exp_r=float(exp_r))
    got = np.asarray(jax.jit(mine.apply)({"params": params}, jnp.asarray(xs)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
