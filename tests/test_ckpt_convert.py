"""Checkpoint conversion: roundtrip flax -> torch-named -> flax, plus
semantic checks that converted conv/linear weights compute identically."""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF
import jax
import jax.numpy as jnp
import flax.linen as nn

from vmg_tpu.configs import TINY_TEST_PRESET
from vmg_tpu.models import create_model
from vmg_tpu.ckpt.torch_convert import (
    convert_torch_state_dict,
    convert_spynet_state_dict,
    export_torch_state_dict,
    strip_module_prefix,
    verify_against,
)
from vmg_tpu.models.spynet import SPyNet


def _tree_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            _tree_equal(a[k], b[k], path + "/" + str(k))
    else:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=path)


def test_roundtrip_tiny_model(tiny_setup):
    model, params, x = tiny_setup
    sd = export_torch_state_dict(
        params, non_linear=TINY_TEST_PRESET.non_linear,
        channel_mixer=TINY_TEST_PRESET.channel_mixer,
    )
    back = convert_torch_state_dict(sd, strict=True)
    missing, bad = verify_against(params, back)
    assert not missing, missing[:10]
    assert not bad, bad[:10]
    _tree_equal(params["params"], back["params"])


def test_module_prefix_stripped(tiny_setup):
    model, params, x = tiny_setup
    sd = export_torch_state_dict(params)
    sd_mod = {"module." + k: v for k, v in sd.items()}
    back = convert_torch_state_dict(sd_mod, strict=True)
    _tree_equal(params["params"], back["params"])


def test_spynet_conversion_semantics(rng):
    """Converted conv weights must reproduce torch conv outputs exactly."""
    # synth a torch-style spynet state dict
    widths = [(8, 32), (32, 64), (64, 32), (32, 16), (16, 2)]
    sd = {}
    for lvl in range(6):
        for j, (cin, cout) in enumerate(widths):
            sd[f"basic_module.{lvl}.basic_module.{j}.conv.weight"] = (
                rng.standard_normal((cout, cin, 7, 7)).astype(np.float32) * 0.05
            )
            sd[f"basic_module.{lvl}.basic_module.{j}.conv.bias"] = (
                rng.standard_normal((cout,)).astype(np.float32) * 0.05
            )
    params = convert_spynet_state_dict(sd)

    model = SPyNet()
    ref_in = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    init_params = model.init(jax.random.key(0), ref_in, ref_in)
    missing, bad = verify_against(init_params, params)
    assert not missing and not bad, (missing[:5], bad[:5])

    # one basic module vs torch stack
    inp = rng.standard_normal((1, 16, 16, 8)).astype(np.float32)
    from vmg_tpu.models.spynet import SPyNetBasicModule
    bm = SPyNetBasicModule()
    bm_params = {"params": params["params"]["basic_module0"]}
    got = np.asarray(bm.apply(bm_params, jnp.asarray(inp)))

    x = torch.from_numpy(inp).permute(0, 3, 1, 2)
    for j in range(5):
        w = torch.from_numpy(sd[f"basic_module.0.basic_module.{j}.conv.weight"])
        b = torch.from_numpy(sd[f"basic_module.0.basic_module.{j}.conv.bias"])
        x = TF.conv2d(x, w, b, padding=3)
        if j < 4:
            x = TF.relu(x)
    want = x.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_linear_conversion_semantics(rng):
    """torch Linear -> flax Dense under the converter transpose."""
    w = rng.standard_normal((6, 4)).astype(np.float32)
    b = rng.standard_normal((6,)).astype(np.float32)
    x = rng.standard_normal((5, 4)).astype(np.float32)
    want = x @ w.T + b
    dense = nn.Dense(6)
    got = dense.apply({"params": {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(b)}},
                      jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_ttvsr_pretrain_remap_surgery():
    """Key surgery semantics of reference Trainer.py:317-353: backbone ->
    align_t_down, stage-2 sub-index 0/1 -> source 4/5, align_t_up mirror."""
    import numpy as np
    from vmg_tpu.ckpt.torch_convert import remap_ttvsr_pretrain

    sd = {
        # plain stage-0 entry: accepted + mirrored to align_t_up
        "backbone.layers.0.blk.w": np.float32(1.0),
        # stage-2 entry whose value must come from source index 4
        "backbone.layers.2.blk.0.w": np.float32(2.0),
        "backbone.layers.2.blk.4.w": np.float32(4.0),
        # stage-3 entry: accepted without mirroring (no 0/1 in k_l[2])
        "backbone.layers.3.blk.w": np.float32(3.0),
        # not in the target set: dropped
        "backbone.other.9.blk.w": np.float32(9.0),
    }
    target = {
        "align_t_down.layers.0.blk.w",
        "align_t_down.layers.2.blk.0.w",
        "align_t_down.layers.3.blk.w",
    }
    out = remap_ttvsr_pretrain(sd, target)
    assert out["align_t_down.layers.0.blk.w"] == 1.0
    assert out["align_t_up.layers.0.blk.w"] == 1.0
    assert out["align_t_down.layers.2.blk.0.w"] == 4.0  # from source .4.
    assert out["align_t_up.layers.2.blk.0.w"] == 4.0
    assert out["align_t_down.layers.3.blk.w"] == 3.0
    assert "align_t_up.layers.3.blk.w" not in out
    assert not any("other" in k for k in out)
    # current models expose no align_t_* keys -> empty result (reference
    # runtime behavior with the snapshot's VMG)
    assert remap_ttvsr_pretrain(sd, set()) == {}
