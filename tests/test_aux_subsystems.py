"""Aux subsystems: NIQE, profiling stats, StableHLO export, multihost."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp


_PRIS = "/root/reference/mmedit/core/evaluation/niqe_pris_params.npz"


@pytest.mark.skipif(not os.path.exists(_PRIS), reason="pris params absent")
def test_niqe_orders_natural_vs_noise(rng):
    from vmg_tpu.eval.niqe import niqe

    # a smooth gradient image should score better (lower) than pure noise
    h = w = 192
    yy, xx = np.mgrid[0:h, 0:w]
    smooth = ((yy + xx) / (h + w) * 200 + 20).astype(np.float64)
    smooth += rng.standard_normal((h, w)) * 2.0
    noise = rng.random((h, w)) * 255
    n_smooth = niqe(smooth, _PRIS)
    n_noise = niqe(noise, _PRIS)
    assert np.isfinite(n_smooth) and np.isfinite(n_noise)
    assert n_smooth < n_noise


def test_compiled_stats_reports_flops():
    from vmg_tpu.utils.profiling import compiled_stats

    stats = compiled_stats(
        lambda a, b: a @ b, jnp.ones((128, 256)), jnp.ones((256, 64))
    )
    # 2*M*N*K
    assert abs(stats["flops"] - 2 * 128 * 256 * 64) / (2 * 128 * 256 * 64) < 0.1


def test_stablehlo_export_roundtrip(tmp_path):
    from vmg_tpu.ckpt.export import export_stablehlo, load_stablehlo
    import flax.linen as nn

    model = nn.Dense(8)
    x = jnp.ones((2, 4))
    params = model.init(jax.random.key(0), x)
    path = str(tmp_path / "m.stablehlo")
    export_stablehlo(model, params, (2, 4), path)
    loaded = load_stablehlo(path)
    got = loaded.call(x)
    want = model.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_multihost_helpers_single_process():
    from vmg_tpu.parallel.multihost import all_gather_host_values

    out = all_gather_host_values([1.0, 2.0, 3.0])
    np.testing.assert_allclose(np.asarray(out).ravel()[-3:], [1, 2, 3])


def test_scalar_logger_jsonl_and_tb(tmp_path):
    """Scalar sink (reference tools/train.py:88-97,230-234 TB scalars):
    JSONL always written; TB event files when use_tb=True."""
    import json
    from vmg_tpu.utils.scalars import ScalarLogger

    d = str(tmp_path / "tb")
    lg = ScalarLogger(d, use_tb=True)
    lg.log(10, loss=0.5, lr=2e-4)
    lg.log(20, loss=0.25, lr=1.9e-4, val_psnr=None)  # None skipped
    lg.close()

    lines = [json.loads(s) for s in
             open(os.path.join(d, "scalars.jsonl")).read().splitlines()]
    assert lines[0] == {"step": 10, "loss": 0.5, "lr": 2e-4}
    assert lines[1]["step"] == 20 and "val_psnr" not in lines[1]
    if lg.tb_active:
        assert any(f.startswith("events.out.tfevents")
                   for f in os.listdir(d))


def test_scalar_logger_disabled_on_nonzero_rank(tmp_path):
    from vmg_tpu.utils.scalars import make_scalar_logger

    assert make_scalar_logger(str(tmp_path), True, enabled=False) is None
    lg = make_scalar_logger(str(tmp_path), False, enabled=True)
    lg.log(1, loss=1.0)
    lg.close()
    assert os.path.exists(os.path.join(tmp_path, "tb_logger", "scalars.jsonl"))


def test_collect_env_reports_stack():
    from vmg_tpu.utils import collect_env

    info = collect_env()
    assert info["jax"] == jax.__version__
    assert info["vmg_tpu"].startswith("0.")
    assert info["num_devices"] == len(jax.devices())
    # host-facts-only mode must not touch the backend
    host = collect_env(devices=False)
    assert "num_devices" not in host and "Python" in host
