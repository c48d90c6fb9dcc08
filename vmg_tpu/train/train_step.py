"""The jitted training step: bf16-friendly forward, Charbonnier(+edge)
loss, microbatched gradient accumulation as a lax.scan, AdamW groups.

Data parallelism comes from sharding the batch axis over the mesh's
``data`` axis (see ``vmg_tpu.parallel``); XLA inserts the gradient
all-reduce (psum over ICI) from the shardings -- no hand-written
collectives (replaces the reference's DDP/NCCL, ``tools/Trainer.py:29-32``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from vmg_tpu.configs.config import TrainConfig
from vmg_tpu.train.loss import total_loss
from vmg_tpu.train.optimizer import build_optimizer


class TrainState(train_state.TrainState):
    pass


def init_train_state(model, params, train_cfg: TrainConfig,
                     flow_fix: Optional[int] = None) -> TrainState:
    tx = build_optimizer(params, train_cfg, flow_fix)
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def make_train_step(
    model,
    train_cfg: TrainConfig,
    grad_acc: int = 1,
    donate: bool = True,
    jit: bool = True,
    frames_mirror: bool = False,
):
    """Returns jitted (state, batch, rng) -> (state, metrics).

    batch: {'LRs': (B, T, h, w, 3), 'HRs': (B, T, 4h, 4w, 3)} where B is
    the EFFECTIVE update batch (the reference's ``total_batch``).  With
    grad_acc > 1, B must be divisible by grad_acc; microbatches of
    B/grad_acc (= the reference's ``batch_size``) run sequentially and
    gradients average -- one optimizer update per total_batch, matching
    the reference's accumulation loop (``tools/train.py:155-162``) while
    peak memory stays at the microbatch level.  The caller groups loader
    draws to B via ``vmg_tpu.data.loader.accumulate_batches``.

    Microbatch i takes the strided rows ``[i::grad_acc]``: the update is
    the mean of per-sample grads, so grouping is irrelevant to the
    result, and the strided split keeps every device's rows its own
    under a data-sharded jit (a contiguous ``[i*mb:(i+1)*mb]`` split
    re-distributes rows across devices).  Small grad_acc (<= 4) unrolls
    the accumulation in Python -- measured 6-8x faster at runtime than
    the lax.scan form on XLA:CPU (while-body execution overhead), same
    numerics and add order; larger grad_acc uses lax.scan to keep
    compile time bounded.

    ``frames_mirror``: set True when the dataset mirror-extends every clip
    (``use_mirrors``): the backward flow reuses the flipped forward flow,
    matching the reference's dynamic per-batch detection
    (``models/vmg.py:426-432``) -- with use_mirrors the mirror property
    holds for every sample by construction, so a static flag is exact and
    saves the backward SPyNet pass.
    """

    def loss_fn(params, lrs, hrs, rng):
        if train_cfg.amp:
            # bf16 compute / fp32 master params; the cast's VJP upcasts
            # gradients (replaces CUDA AMP + GradScaler, Trainer.py:115)
            from vmg_tpu.train.precision import cast_params_for_compute

            params = cast_params_for_compute(params, jnp.bfloat16)
        out = model.apply(
            params, lrs, deterministic=False, frames_mirror=frames_mirror,
            rngs={"droppath": rng},
        )
        return total_loss(
            out, hrs,
            eps=train_cfg.eps,
            if_aux=train_cfg.if_aux,
            aux_ratio=train_cfg.aux_ratio,
        )

    grad_fn = jax.value_and_grad(loss_fn)

    def step_fn(state: TrainState, batch, rng):
        lrs, hrs = batch["LRs"], batch["HRs"]
        if grad_acc <= 1:
            loss, grads = grad_fn(state.params, lrs, hrs, rng)
        else:
            B = lrs.shape[0]
            mb = B // grad_acc
            rngs = jax.random.split(rng, grad_acc)
            # Strided split via reshape(mb, grad_acc)+swapaxes: microbatch
            # i = rows [i::grad_acc].  GSPMD keeps this split shard-local
            # (each device's rows stay its own); a direct strided slice
            # lrs[i::grad_acc] of the data-sharded axis makes the
            # partitioner replicate the whole microbatch computation onto
            # every device (measured: per-device conv batch = mb instead
            # of mb/n_data, 8x redundant work on an 8-mesh).
            lrs_mb = jnp.swapaxes(
                lrs.reshape(mb, grad_acc, *lrs.shape[1:]), 0, 1)
            hrs_mb = jnp.swapaxes(
                hrs.reshape(mb, grad_acc, *hrs.shape[1:]), 0, 1)
            if grad_acc <= 4:
                # Unrolled accumulation (see docstring): same numerics
                # and add order as the scan, no while-loop runtime cost.
                grads = jax.tree.map(jnp.zeros_like, state.params)
                loss = jnp.asarray(0.0, jnp.float32)
                for i in range(grad_acc):
                    loss_i, grads_i = grad_fn(
                        state.params, lrs_mb[i], hrs_mb[i], rngs[i])
                    grads = jax.tree.map(jnp.add, grads, grads_i)
                    loss = loss + loss_i
            else:
                def micro(carry, xs):
                    acc_grads, acc_loss = carry
                    l, h, r = xs
                    loss_i, grads_i = grad_fn(state.params, l, h, r)
                    acc_grads = jax.tree.map(jnp.add, acc_grads, grads_i)
                    return (acc_grads, acc_loss + loss_i), None

                zero = jax.tree.map(jnp.zeros_like, state.params)
                (grads, loss), _ = jax.lax.scan(
                    micro, (zero, jnp.asarray(0.0, jnp.float32)),
                    (lrs_mb, hrs_mb, rngs)
                )
            grads = jax.tree.map(lambda g: g / grad_acc, grads)
            loss = loss / grad_acc

        state = state.apply_gradients(grads=grads)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return state, metrics

    if not jit:
        return step_fn
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
