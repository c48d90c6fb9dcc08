#!/usr/bin/env python
"""Training CLI (replaces reference ``tools/train.py`` + ``dist_train.sh``).

Single entry point for 1..N chips and multi-host: parallelism comes from
the device mesh, not process launchers.  Usage:

    python tools/train.py --config vmg_tpu/configs/presets/vmg_reds_few_levels.yml
    python tools/train.py --config ... --resume   # resume latest orbax step
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--batchsize", type=int, default=None)
    p.add_argument("--max-steps", type=int, default=None,
                   help="override niter (smoke tests)")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() first")
    p.add_argument("--max-retries", type=int, default=3,
                   help="recover from transient device errors by restoring "
                        "the latest checkpoint (failure recovery the "
                        "reference lacks; SURVEY.md §5)")
    p.add_argument("--val-lr-root", default=None,
                   help="LR clip tree for periodic validation every "
                        "train.val_freq steps (EvalIterHook equivalent)")
    p.add_argument("--val-gt-root", default=None)
    p.add_argument("--val-clips", type=int, default=1)
    args = p.parse_args()

    if args.multihost:
        jax.distributed.initialize()

    from vmg_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    from vmg_tpu.configs import load_config
    from vmg_tpu.data import create_dataset, create_dataloader
    from vmg_tpu.models import create_model
    from vmg_tpu.train import init_train_state, make_train_step
    from vmg_tpu.parallel import make_mesh, make_sharded_train_step, shard_batch, replicate
    from vmg_tpu.ckpt import save_checkpoint, restore_checkpoint, latest_step
    from vmg_tpu.utils import (
        setup_logger, AverageMeter, set_random_seed, count_params,
        make_scalar_logger, collect_env,
    )
    from vmg_tpu.train.schedule import main_lr_schedule

    cfg = load_config(args.config, is_train=True)
    if args.batchsize:
        cfg.dataset.batch_size = args.batchsize
    exp_root = os.path.join(cfg.path.experiments_root, cfg.name)
    ckpt_dir = os.path.join(exp_root, "ckpt")
    logger = setup_logger("base", exp_root, "train",
                          tofile=jax.process_index() == 0)
    set_random_seed(cfg.train.manual_seed)
    # scalar sink: TB events (use_tb_logger) + scalars.jsonl, rank 0 only
    # (reference tools/train.py:88-97,230-234)
    scalars = make_scalar_logger(exp_root, cfg.logger.use_tb_logger,
                                 enabled=jax.process_index() == 0)
    lr_of = main_lr_schedule(cfg.train)

    mesh = make_mesh(cfg.mesh_shape)
    n_data = mesh.shape["data"]
    # environment header (reference mmedit/apis/train logs collect_env)
    env_lines = "\n".join(f"  {k}: {v}" for k, v in collect_env().items())
    logger.info(f"environment:\n{env_lines}")
    logger.info(f"mesh: {dict(mesh.shape)}  devices: {len(jax.devices())}")

    amp_dtype = jnp.bfloat16 if cfg.train.amp else jnp.float32
    model = create_model(cfg.network, is_train=True, dtype=amp_dtype)
    t0 = time.time()
    lr_h = cfg.dataset.crop_size // cfg.scale
    sample = {
        "LRs": jnp.zeros((cfg.dataset.batch_size, cfg.network.num_frames,
                          lr_h, lr_h, 3), jnp.float32),
        "HRs": jnp.zeros((cfg.dataset.batch_size, cfg.network.num_frames,
                          cfg.dataset.crop_size, cfg.dataset.crop_size, 3),
                         jnp.float32),
    }
    params = jax.jit(model.init)(jax.random.key(cfg.train.manual_seed),
                                 sample["LRs"])
    logger.info(f"model init: {count_params(params)/1e6:.3f}M params "
                f"({time.time()-t0:.1f}s)")

    state = init_train_state(model, params, cfg.train, cfg.network.flow_fix)
    start_step = 0
    if args.resume:
        step = latest_step(ckpt_dir)
        if step is not None:
            state = restore_checkpoint(ckpt_dir, state, step)
            start_step = int(state.step)
            logger.info(f"resumed from step {start_step}")

    # Reference grad-accumulation semantics (tools/train.py:155-162): the
    # effective update batch is total_batch; each optimizer step consumes
    # grad_acc loader draws of batch_size and averages their gradients.
    # Here: buffer grad_acc host batches, concatenate to total_batch, and
    # the jitted step scans microbatches of batch_size (peak device memory
    # stays at the microbatch level).
    grad_acc = max(1, cfg.dataset.total_batch // cfg.dataset.batch_size) \
        if cfg.train.grad_acc else 1
    raw_step = make_train_step(model, cfg.train, grad_acc=grad_acc, jit=False,
                               frames_mirror=cfg.dataset.use_mirrors)
    if mesh.shape.get("tensor", 1) > 1:
        # DP x TP: shard the wide weights (and their AdamW slots) over the
        # tensor axis; GSPMD inserts the ICI collectives (parallel/tp.py)
        from vmg_tpu.parallel import state_shardings, shard_state

        step_fn = make_sharded_train_step(raw_step, mesh,
                                          state_shardings(mesh, state))
        place_state = lambda s: shard_state(mesh, s)  # noqa: E731
    else:
        step_fn = make_sharded_train_step(raw_step, mesh)
        place_state = lambda s: replicate(mesh, s)  # noqa: E731
    state = place_state(state)

    dataset = create_dataset(cfg.dataset, cfg.scale)
    loader = create_dataloader(dataset, cfg.dataset,
                               num_replicas=jax.process_count(),
                               rank=jax.process_index())

    # periodic validation (the reference's EvalIterHook,
    # mmedit/core/evaluation/eval_hooks.py)
    val_hook = None
    if args.val_lr_root:
        from vmg_tpu.edit.hooks import EvalIterHook
        from vmg_tpu.eval import SlidingEvaluator, calculate_psnr
        from vmg_tpu.eval.eval_utils import read_seq_images
        from vmg_tpu.train.precision import cast_params_for_compute

        eval_model = create_model(cfg.network, is_train=False,
                                  dtype=amp_dtype)
        val_fwd = jax.jit(lambda p, v: eval_model.apply(p, v))

        def eval_fn(st):
            p = cast_params_for_compute(
                jax.device_get({"params": st.params["params"]}), amp_dtype
            ) if cfg.train.amp else {"params": st.params["params"]}
            ev = SlidingEvaluator(
                lambda clip: np.asarray(val_fwd(p, jnp.asarray(clip))),
                scale=cfg.scale, test_num_frames=cfg.network.num_frames,
                overlapped_mode=0, spatial_wins=None,
                overlapped_spatial_length=None, dataset_name="val",
            )
            clips = sorted(os.listdir(args.val_lr_root))[: args.val_clips]
            psnrs = []
            for clip in clips:
                lr = read_seq_images(os.path.join(args.val_lr_root, clip))
                gt = read_seq_images(os.path.join(args.val_gt_root, clip))
                out = ev.evaluate(lr[: cfg.network.num_frames])
                psnrs.append(np.mean([
                    calculate_psnr(out[i], gt[i])
                    for i in range(out.shape[0])
                ]))
            return {"val_psnr": float(np.mean(psnrs))}

        val_hook = EvalIterHook(eval_fn, interval=cfg.train.val_freq,
                                logger=logger)

    niter = args.max_steps or cfg.train.niter
    meter = AverageMeter()
    step = start_step
    epoch = 0
    t_log = time.time()
    key = jax.random.key(cfg.train.manual_seed + 777)
    # failure recovery: keep a host-side snapshot to restore from when no
    # checkpoint has been written yet (the donated device state is gone
    # after a failed step)
    host_snapshot = jax.device_get(state)
    snapshot_step = step
    retries = 0
    from vmg_tpu.data.loader import accumulate_batches

    while step < niter:
        dataset.set_epoch(epoch)
        if hasattr(loader.sampler, "set_epoch"):
            loader.sampler.set_epoch(epoch)
        for batch in accumulate_batches(iter(loader), grad_acc):
            if step >= niter:
                break
            key, sub = jax.random.split(key)
            dev_batch = shard_batch(mesh, {
                "LRs": batch["LRs"], "HRs": batch["HRs"]
            })
            try:
                state, metrics = step_fn(state, dev_batch, sub)
                loss = float(metrics["loss"])
            except jax.errors.JaxRuntimeError as e:
                retries += 1
                logger.warning(f"device error at step {step} "
                               f"(retry {retries}/{args.max_retries}): {e}")
                if retries > args.max_retries:
                    raise
                ck = latest_step(ckpt_dir)
                if ck is not None and ck >= snapshot_step:
                    state = restore_checkpoint(ckpt_dir, host_snapshot, ck)
                    step = int(ck)
                    logger.warning(f"restored checkpoint step {ck}")
                else:
                    state = host_snapshot
                    step = snapshot_step
                    logger.warning(f"restored host snapshot step {step}")
                state = place_state(state)
                continue
            step += 1
            meter.update(loss)
            if step % 1000 == 0:
                host_snapshot = jax.device_get(state)
                snapshot_step = step
            if val_hook is not None:
                val_hook.after_iter(step, state, {})
                if scalars and val_hook.latest and \
                        step % val_hook.interval == 0:
                    scalars.log(step, **val_hook.latest)
            if step % cfg.logger.print_freq == 0:
                dt = time.time() - t_log
                logger.info(
                    f"step {step}/{niter} epoch {epoch} "
                    f"loss {meter.average():.5f} "
                    f"({cfg.logger.print_freq / dt:.2f} it/s)"
                )
                if scalars:
                    scalars.log(
                        step,
                        loss=meter.average(),
                        lr=lr_of(step),
                        grad_norm=float(metrics["grad_norm"]),
                        it_per_s=cfg.logger.print_freq / dt,
                    )
                meter.reset()
                t_log = time.time()
            if step % cfg.logger.save_checkpoint_freq == 0 and \
                    jax.process_index() == 0:
                save_checkpoint(ckpt_dir, step, jax.device_get(state))
                logger.info(f"checkpoint saved at step {step}")
        epoch += 1

    if jax.process_index() == 0:
        save_checkpoint(ckpt_dir, step, jax.device_get(state))
        logger.info(f"final checkpoint at step {step}")
    if scalars:
        scalars.close()


if __name__ == "__main__":
    main()
