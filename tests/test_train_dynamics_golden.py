"""TRAINING-DYNAMICS GOLDEN: N full optimizer steps, torch reference vs
vmg_tpu, from identical init and identical synthetic batches, fp32 CPU.

The torch side replicates the reference Trainer's exact semantics
(reference ``tools/Trainer.py:57-198`` + the ``tools/train.py:181-220``
step indexing): three AdamW param groups (frozen-then-ratio SPyNet group,
weight-decay group for ``.mlp_blocks.`` params, main group), Charbonnier
+ edge aux loss, global grad-norm clip, CosineAnnealingLR_Restart stepped
AFTER each optimizer step, and the post-step flow-fix LR update.  The JAX
side is the shipped ``vmg_tpu.train`` stack unmodified.  Per-step losses
and the final parameters must track each other -- the one end-to-end
check that catches wd-group / AdamW / clip / schedule WIRING drift that
the piecewise oracles (test_train_loss_sched, test_train_step) cannot.

Scope notes:
  * ``ret_decay=False``: the reference's decay mixer mutates its stored
    weights in place every forward (``models/function.py:766-781``), i.e.
    its training semantics compound gamma into the weights -- a stateful
    quirk the functional rewrite deliberately does not replicate (decay
    is applied at use time; SURVEY.md §7 decision 1).  Forward parity
    with decay is covered by test_golden_reference / test_golden_fullwidth.
  * ``warmup_iter`` off: the reference applies warmup AFTER the step, so
    its update 0 runs at FULL base LR (see the deliberate-divergence note
    in ``vmg_tpu/train/schedule.py::main_lr_schedule``).
  * The flow-fix boundary IS exercised (flow_fix=3 inside the horizon):
    the spynet group must stay bit-frozen through update flow_fix+1 and
    start moving at flow_fix+2 on both sides.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # reference-torch training runs

import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_golden_reference import _build_pair  # noqa: E402
from ref_stubs import import_reference_models  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vmg_tpu.ckpt.torch_convert import convert_torch_state_dict  # noqa: E402
from vmg_tpu.configs.config import TrainConfig  # noqa: E402
from vmg_tpu.train import init_train_state, make_train_step  # noqa: E402


N_STEPS = 14
FLOW_FIX = 3
LR = 1e-4
BETAS = (0.9, 0.99)
WD = 1e-2
CLIP = 0.5
T_PERIOD = 40  # short cosine so the LR moves visibly inside the horizon
ETA_MIN = 1e-7
PRE_LR_RATIO = 0.125
EPS = 1e-12
AUX_RATIO = 0.005


def _load_ref_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _make_batches(n, rng):
    """Deterministic synthetic batch sequence: (lr, hr) numpy pairs."""
    out = []
    for _ in range(n):
        lr = rng.random((1, 4, 64, 64, 3), dtype=np.float32)
        hr = rng.random((1, 4, 256, 256, 3), dtype=np.float32)
        out.append((lr, hr))
    return out


def _torch_train(ref, batches):
    """Reference-Trainer-faithful fp32 CPU training loop.

    Group construction mirrors Trainer.__init__ (pre_training, wd > 0):
    ``[{spynet, lr 0}, {main}, {wd_params, weight_decay wd}]`` with
    optimizer-level weight_decay 0 (``Trainer.py:102-105``); the LR
    update mirrors update_learning_rate called with cur_iter=k after
    update k (``Trainer.py:244-272``, call site ``train.py:220``).
    """
    loss_mod = _load_ref_module("/root/reference/utils/loss.py", "ref_loss")
    sched_mod = _load_ref_module(
        "/root/reference/utils/lr_scheduler.py", "ref_sched")

    crit = loss_mod.CharbonnierLoss(eps=EPS, if_aux_loss=True,
                                    aux_ratio=AUX_RATIO)
    spy_params = list(ref.spynet.parameters())
    spy_ids = set(map(id, spy_params))
    wd_params = [p for n, p in ref.named_parameters()
                 if ".mlp_blocks." in n]  # reference models/vmg.py:408-411
    wd_ids = set(map(id, wd_params))
    main_params = [p for p in ref.parameters()
                   if id(p) not in spy_ids and id(p) not in wd_ids]
    opt = torch.optim.AdamW(
        [{"params": spy_params, "lr": 0.0},
         {"params": main_params},
         {"params": wd_params, "weight_decay": WD}],
        lr=LR, weight_decay=0.0, betas=BETAS)
    sch = sched_mod.CosineAnnealingLR_Restart(
        opt, T_period=[T_PERIOD], eta_min=ETA_MIN, restarts=None, weights=[1])

    losses, lrs_seen = [], []
    for k, (lr_np, hr_np) in enumerate(batches):
        lrs_seen.append((opt.param_groups[0]["lr"], opt.param_groups[1]["lr"]))
        inputs = torch.from_numpy(lr_np).permute(0, 1, 4, 2, 3)
        targets = torch.from_numpy(hr_np).permute(0, 1, 4, 2, 3)
        opt.zero_grad()
        out = ref(inputs)
        loss = crit(out, targets)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(ref.parameters(), max_norm=CLIP,
                                       norm_type=2)
        opt.step()
        # update_learning_rate(cur_iter=k, warmup_iter=-1)
        sch.step()
        if k <= FLOW_FIX:
            opt.param_groups[0]["lr"] = 0.0
        else:
            opt.param_groups[0]["lr"] = (
                opt.param_groups[1]["lr"] * PRE_LR_RATIO)
        losses.append(float(loss.detach()))
    return losses, lrs_seen


def test_training_dynamics_match_reference():
    ref_vmg = import_reference_models()
    ref, mine = _build_pair(
        ref_vmg, ret_decay=False, channel_mixer="vanilla", gating=False,
        is_train=True, drop_path_rate=0.0)

    sd0 = {k: v.clone() for k, v in ref.state_dict().items()}
    params0 = jax.tree.map(jnp.asarray, convert_torch_state_dict(
        sd0, strict=True))

    data_rng = np.random.default_rng(7)
    batches = _make_batches(N_STEPS, data_rng)

    ref_losses, ref_lrs = _torch_train(ref, batches)

    tcfg = TrainConfig(
        lr=LR, beta1=BETAS[0], beta2=BETAS[1], niter=T_PERIOD,
        T_period=(T_PERIOD,), eta_min=ETA_MIN, warmup_iter=-1,
        amp=False, if_grad_clip=True, grad_clip_up=CLIP,
        pre_training=True, pre_lr_ratio=PRE_LR_RATIO, weight_decay=WD,
        if_aux=True, aux_ratio=AUX_RATIO, eps=EPS)
    state = init_train_state(mine, params0, tcfg, flow_fix=FLOW_FIX)
    step = make_train_step(mine, tcfg, grad_acc=1, donate=False)

    my_losses = []
    for k, (lr_np, hr_np) in enumerate(batches):
        state, m = step(
            state, {"LRs": jnp.asarray(lr_np), "HRs": jnp.asarray(hr_np)},
            jax.random.key(k))
        my_losses.append(float(m["loss"]))

    # Per-step losses: fp32 on both sides; op-order drift compounds
    # through N optimizer steps, so the tolerance is wider than the
    # single-forward golden (2e-4) but must stay far below any
    # wiring-level error (a wrong LR/wd/clip shifts losses at ~1e-2).
    np.testing.assert_allclose(my_losses, ref_losses, rtol=2e-4, atol=2e-5)

    # Final params.  AdamW's m/(sqrt(v)+eps) normalizes tiny gradient
    # differences to O(lr)-scale update differences in the worst case, so
    # the bound is expressed in units of the total LR-path length
    # (N * lr): drift must be a small fraction of one step's movement.
    final_ref = {k: v.clone() for k, v in ref.state_dict().items()}
    want = jax.tree.map(jnp.asarray,
                        convert_torch_state_dict(final_ref, strict=True))
    flat_mine = jax.tree_util.tree_flatten_with_path(state.params)[0]
    flat_want = jax.tree_util.tree_flatten_with_path(want)[0]
    assert len(flat_mine) == len(flat_want)
    worst = ("", 0.0)
    for (pm, vm), (pw, vw) in zip(flat_mine, flat_want):
        assert pm == pw
        d = float(jnp.max(jnp.abs(vm - vw)))
        if d > worst[1]:
            worst = (jax.tree_util.keystr(pm), d)
    budget = N_STEPS * LR
    assert worst[1] < 0.05 * budget, (
        f"param drift {worst[1]:.3e} at {worst[0]} exceeds 5% of the "
        f"total step budget {budget:.1e}")

    # The spynet group must have stayed BIT-frozen through update
    # FLOW_FIX+1 and moved after -- assert it actually moved by the end
    # (wiring check: frozen forever would also pass the drift bound).
    spy0 = jax.tree_util.tree_flatten(
        {k: v for k, v in params0["params"].items() if k == "spynet"})[0]
    spyN = jax.tree_util.tree_flatten(
        {k: v for k, v in state.params["params"].items() if k == "spynet"})[0]
    moved = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(spy0, spyN))
    assert moved > 0.0, "spynet group never unfroze"
    # and the torch side agrees about WHEN it unfroze
    assert all(g0 == 0.0 for (g0, _) in ref_lrs[:FLOW_FIX + 2])
    assert ref_lrs[FLOW_FIX + 2][0] > 0.0
