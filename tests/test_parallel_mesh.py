"""Mesh parallelism on the 8-virtual-CPU-device mesh (conftest):
data parallel vs data x tensor parallel produce the same training step.

The reference only has DP (NCCL DDP, SURVEY.md §2.5); the rebuild adds a
``tensor`` mesh axis sharding the wide (>=224-channel) weights --
layout-only, so a (4, 2) DP x TP step must match the (8, 1) DP step.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vmg_tpu.configs import TINY_TEST_PRESET
from vmg_tpu.configs.config import TrainConfig, VMGNetworkConfig
from vmg_tpu.models import create_model
from vmg_tpu.train import init_train_state, make_train_step
from vmg_tpu.parallel import (
    make_mesh, make_sharded_train_step, shard_batch, replicate,
    param_shardings, state_shardings, shard_state,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _setup():
    import dataclasses
    # widen one stage past the 224 TP threshold so TP has something to shard
    cfg = dataclasses.replace(
        TINY_TEST_PRESET,
        embed_dim=(32, 224, 32), num_heads=(2, 4, 2),
    )
    tcfg = TrainConfig(lr=1e-4, T_period=(100,), niter=100, if_aux=True)
    model = create_model(cfg, is_train=True)
    rng = np.random.default_rng(0)
    batch = {
        "LRs": jnp.asarray(rng.random((8, 2, 64, 64, 3), dtype=np.float32)),
        "HRs": jnp.asarray(rng.random((8, 2, 256, 256, 3), dtype=np.float32)),
    }
    params = model.init(jax.random.key(0), batch["LRs"][:1])
    state = init_train_state(model, params, tcfg, flow_fix=0)
    raw_step = make_train_step(model, tcfg, grad_acc=1, jit=False)
    return state, raw_step, batch


def test_dp_vs_dp_tp_steps_match():
    state, raw_step, batch = _setup()

    mesh_dp = make_mesh((8, 1))
    step_dp = make_sharded_train_step(raw_step, mesh_dp)
    s1, m1 = step_dp(replicate(mesh_dp, state), shard_batch(mesh_dp, batch),
                     jax.random.key(1))
    loss_dp = float(m1["loss"])

    # fresh state: the donated step may alias-and-delete the CPU buffers
    state, raw_step, _ = _setup()
    mesh_tp = make_mesh((4, 2))
    shardings = param_shardings(mesh_tp, state.params)
    n_sharded = sum(
        1 for s in jax.tree.leaves(shardings,
                                   is_leaf=lambda x: hasattr(x, "spec"))
        if "tensor" in str(s.spec)
    )
    assert n_sharded > 0, "TP sharded nothing -- threshold or shapes wrong"

    step_tp = make_sharded_train_step(raw_step, mesh_tp,
                                      state_shardings(mesh_tp, state))
    s2, m2 = step_tp(shard_state(mesh_tp, state),
                     shard_batch(mesh_tp, batch), jax.random.key(1))
    loss_tp = float(m2["loss"])

    np.testing.assert_allclose(loss_tp, loss_dp, rtol=2e-5, atol=1e-6)
    # updated params agree leaf-wise (layout-only change).  Tolerance: at
    # step 1 AdamW's update is ~lr * g / (|g| + eps), so a reassociated
    # fp32 reduction that perturbs a near-zero gradient by 1e-7 can move
    # the update by a large fraction of lr (1e-4); diffs well under lr
    # are layout noise, not a sharding bug.
    a = jax.device_get(s1.params)
    b = jax.device_get(s2.params)
    diffs = jax.tree.map(lambda x, y: float(np.max(np.abs(x - y))), a, b)
    assert max(jax.tree.leaves(diffs)) < 2.5e-4, sorted(
        jax.tree.leaves(diffs))[-3:]


def test_param_shardings_rules():
    mesh = make_mesh((4, 2))
    tree = {
        "wide_kernel": jnp.zeros((3, 3, 112, 448)),
        "narrow_kernel": jnp.zeros((3, 3, 32, 32)),
        "wide_bias": jnp.zeros((448,)),
        "odd_wide": jnp.zeros((225,)),  # not divisible by tp -> replicated
        "scalar": jnp.zeros(()),
    }
    sh = param_shardings(mesh, tree)
    assert "tensor" in str(sh["wide_kernel"].spec)
    assert "tensor" in str(sh["wide_bias"].spec)
    assert "tensor" not in str(sh["narrow_kernel"].spec)
    assert "tensor" not in str(sh["odd_wide"].spec)
    assert "tensor" not in str(sh["scalar"].spec)


def test_sequence_sharded_forward_matches_single_device():
    """T sharded over the data axis (sequence parallel): same output as
    the replicated forward; cross-T ops (trajectory scan, wt>1 window
    attention, SPyNet pairs, trilinear) are handled by GSPMD collectives."""
    from vmg_tpu.parallel.seq import make_seq_sharded_forward, shard_clip_over_time

    model = create_model(TINY_TEST_PRESET, is_train=False)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((1, 8, 64, 64, 3), dtype=np.float32))
    params = model.init(jax.random.key(0), x)
    want = np.asarray(model.apply(params, x))

    mesh = make_mesh((8, 1))
    fwd = make_seq_sharded_forward(model, mesh)
    got = np.asarray(fwd(replicate(mesh, params), shard_clip_over_time(mesh, x)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
