"""Train-step integration: loss decreases on an overfit batch; grad
accumulation equals large-batch gradients; param groups label correctly."""

import numpy as np
import jax
import jax.numpy as jnp

from vmg_tpu.configs import TINY_TEST_PRESET
from vmg_tpu.configs.config import TrainConfig
from vmg_tpu.models import create_model
from vmg_tpu.train import (
    init_train_state,
    make_train_step,
    param_labels,
)


def _tiny_setup(grad_acc=1, batch=2, drop_path=0.1):
    import dataclasses
    cfg = dataclasses.replace(TINY_TEST_PRESET, drop_path_rate=drop_path)
    tcfg = TrainConfig(lr=1e-3, T_period=(1000,), niter=1000, if_aux=True,
                       aux_ratio=0.005, pre_training=True)
    model = create_model(cfg, is_train=True)
    rng = np.random.default_rng(0)
    lrs = jnp.asarray(rng.random((batch, 2, 64, 64, 3), dtype=np.float32))
    hrs = jnp.asarray(rng.random((batch, 2, 256, 256, 3), dtype=np.float32))
    params = model.init(jax.random.key(0), lrs)
    state = init_train_state(model, params, tcfg, flow_fix=0)
    step = make_train_step(model, tcfg, grad_acc=grad_acc, donate=False)
    return state, step, {"LRs": lrs, "HRs": hrs}


def test_loss_decreases_overfit():
    state, step, batch = _tiny_setup()
    losses = []
    for i in range(8):
        state, m = step(state, batch, jax.random.key(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def test_grad_acc_matches_full_batch():
    """total_batch=2 x batch_size=1: one accumulated update (grad_acc=2,
    microbatch 1) must equal one full total_batch step (grad_acc=1, B=2).
    Reference semantics: tools/train.py:155-162.  Droppath is disabled so
    the only difference is microbatch scheduling."""
    state1, step1, batch = _tiny_setup(grad_acc=1, batch=2, drop_path=0.0)
    state2, step2, _ = _tiny_setup(grad_acc=2, batch=2, drop_path=0.0)
    new1, m1 = step1(state1, batch, jax.random.key(0))
    new2, m2 = step2(state2, batch, jax.random.key(0))
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5, atol=1e-6)
    # gradient-level equivalence (the real semantics check, linear in the
    # grads so no optimizer amplification): mean of per-microbatch grads
    # == full-batch grads
    from vmg_tpu.train.loss import total_loss

    def loss_fn(params, lrs, hrs):
        out = state1.apply_fn(params, lrs, deterministic=False,
                              rngs={"droppath": jax.random.key(0)})
        return total_loss(out, hrs, eps=1e-12, if_aux=True, aux_ratio=0.005)

    g_full = jax.grad(loss_fn)(state1.params, batch["LRs"], batch["HRs"])
    g_half = [jax.grad(loss_fn)(state1.params, batch["LRs"][i:i + 1],
                                batch["HRs"][i:i + 1]) for i in (0, 1)]
    g_acc = jax.tree.map(lambda a, b: (a + b) / 2, *g_half)
    gn = float(jax.tree.reduce(
        lambda acc, x: acc + float(jnp.sum(jnp.abs(x))), g_full, 0.0))
    diff = float(jax.tree.reduce(
        lambda acc, x: acc + float(jnp.sum(jnp.abs(x))),
        jax.tree.map(lambda a, b: a - b, g_full, g_acc), 0.0))
    assert diff / max(gn, 1e-12) < 1e-4, (diff, gn)
    # post-AdamW params agree up to the rsqrt amplification of fp
    # reassociation noise at step 1 (update magnitude ~lr = 1e-3)
    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), new1.params, new2.params
    )
    assert max(jax.tree.leaves(diffs)) < 5e-4, (
        sorted(jax.tree.leaves(diffs))[-3:]
    )


def test_accumulate_batches_groups_loader_draws():
    """grad_acc loader draws of batch_size concatenate to one total_batch
    update; trailing partial groups drop (reference drop_last loader)."""
    from vmg_tpu.data.loader import accumulate_batches

    draws = [
        {"LRs": np.full((2, 1, 4, 4, 3), i, np.float32),
         "HRs": np.full((2, 1, 16, 16, 3), i, np.float32),
         "keys": [f"k{i}"]}
        for i in range(5)
    ]
    out = list(accumulate_batches(iter(draws), 2))
    assert len(out) == 2  # 5 draws, grad_acc 2 -> 2 updates, 1 dropped
    assert out[0]["LRs"].shape == (4, 1, 4, 4, 3)
    assert out[0]["LRs"][0, 0, 0, 0, 0] == 0 and out[0]["LRs"][2, 0, 0, 0, 0] == 1
    assert out[1]["LRs"][0, 0, 0, 0, 0] == 2 and out[1]["LRs"][2, 0, 0, 0, 0] == 3
    # grad_acc=1 passes batches through untouched (keys preserved)
    out1 = list(accumulate_batches(iter(draws), 1))
    assert len(out1) == 5 and "keys" in out1[0]


def test_param_labels_cover_groups():
    state, _, _ = _tiny_setup()
    labels = param_labels(state.params)
    flat = jax.tree.leaves(labels)
    assert "spynet" in flat and "main" in flat and "wd" in flat
