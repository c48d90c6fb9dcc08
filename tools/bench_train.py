#!/usr/bin/env python
"""Training-step throughput at the reference recipe shapes (one chip).

Protocol: the reference trains with 64x64 LR crops, clips of num_frames
(``configs/VMG-REDS.yml:83-108``; batch per GPU ``batch_size``).  This
times the full jitted train step (fwd + bwd + AdamW update) of the
flagship model on synthetic data and prints one JSON line of
clips/sec and frames/sec.

The step runs the same code path as tools/train.py (make_train_step with
bf16 compute policy); on TPU the trajectory attention resolves to the
fused Pallas kernel forward AND backward (ops/ltam_attention custom VJP).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="full", choices=("full", "few", "tiny"))
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--crop", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--grad-acc", type=int, default=1,
                    help="microbatch accumulation (reference total_batch "
                         "semantics); batch must be divisible")
    ap.add_argument("--no-remat", action="store_true",
                    help="disable TAB/trajectory rematerialization (fits "
                         "at crop-training sizes; trades memory for the "
                         "recompute FLOPs)")
    ap.add_argument("--remat-policy", default=None,
                    help="jax.checkpoint_policies name for the remat'ed "
                         "blocks (e.g. dots_saveable); default saves "
                         "nothing inside them")
    ap.add_argument("--stage-barrier", action="store_true",
                    help="optimization_barrier between TABs (see "
                         "VMGNetworkConfig.stage_barrier)")
    ap.add_argument("--mem-only", action="store_true",
                    help="compile only and print the XLA memory analysis "
                         "(temp/argument/output bytes) -- the 11.9 GB "
                         "temp cliff forensics, no device execution")
    args = ap.parse_args()

    from vmg_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vmg_tpu.configs import (
        FULL_PRESET, FEW_LEVELS_PRESET, TINY_TEST_PRESET, TrainConfig)
    from vmg_tpu.models import create_model
    from vmg_tpu.train import init_train_state, make_train_step

    cfg = {"full": FULL_PRESET, "few": FEW_LEVELS_PRESET,
           "tiny": TINY_TEST_PRESET}[args.preset]
    import dataclasses
    if args.no_remat:
        cfg = dataclasses.replace(cfg, remat=False)
    if args.remat_policy:
        cfg = dataclasses.replace(cfg, remat_policy=args.remat_policy)
    if args.stage_barrier:
        cfg = dataclasses.replace(cfg, stage_barrier=True)
    B, T, S = args.batch, args.frames, args.crop
    # amp=True matches the shipped training recipe
    # (configs/presets/vmg_reds_full.yml: bf16 compute on TPU)
    tcfg = TrainConfig(lr=2e-4, T_period=(400000,), niter=400000,
                       if_aux=True, amp=True)

    # same precision construction as tools/train.py: module dtype bf16
    # under amp (activations bf16; without it the f32 input promotes every
    # activation back to f32 regardless of the bf16 param cast)
    amp_dtype = jnp.bfloat16 if tcfg.amp else jnp.float32
    model = create_model(cfg, is_train=True, dtype=amp_dtype)
    rng = np.random.default_rng(0)
    batch = {
        "LRs": jnp.asarray(rng.random((B, T, S, S, 3), dtype=np.float32)),
        "HRs": jnp.asarray(
            rng.random((B, T, 4 * S, 4 * S, 3), dtype=np.float32)),
    }
    params = jax.jit(model.init)(jax.random.key(0), batch["LRs"][:1])
    state = init_train_state(model, params, tcfg, flow_fix=0)
    step = make_train_step(model, tcfg, grad_acc=args.grad_acc)

    if args.mem_only:
        key = jax.random.key(1)
        compiled = (jax.jit(make_train_step(model, tcfg,
                                            grad_acc=args.grad_acc,
                                            jit=False), donate_argnums=(0,))
                    .lower(state, batch, key).compile())
        ma = compiled.memory_analysis()
        rec = {"preset": args.preset, "batch": B,
               "remat": not args.no_remat,
               "remat_policy": args.remat_policy,
               "temp_gb": round(ma.temp_size_in_bytes / 2**30, 3),
               "argument_gb": round(ma.argument_size_in_bytes / 2**30, 3),
               "output_gb": round(ma.output_size_in_bytes / 2**30, 3),
               "alias_gb": round(ma.alias_size_in_bytes / 2**30, 3),
               "generated_code_mb": round(
                   ma.generated_code_size_in_bytes / 2**20, 1)}
        print(json.dumps(rec))
        return

    key = jax.random.key(1)
    state, metrics = step(state, batch, key)  # compile + first step
    loss0 = float(metrics["loss"])  # fences

    t0 = time.perf_counter()
    for i in range(args.iters):
        state, metrics = step(state, batch, jax.random.fold_in(key, i))
    loss = float(metrics["loss"])  # host fetch fences the stream
    dt = (time.perf_counter() - t0) / args.iters

    # MFU: model FLOPs from the compiled train step's own cost analysis
    # (fwd + bwd + optimizer as XLA counts them; remat recompute included,
    # so this is "hardware FLOP utilization" of the executed program) vs
    # v5e bf16 peak 197 TFLOP/s
    try:
        from vmg_tpu.eval.flops import cost_analysis
        costs = cost_analysis(
            lambda s_, b_, k_: step(s_, b_, k_), state, batch,
            jax.random.key(9))
        step_flops = float(costs.get("flops", 0.0))
    except Exception:
        step_flops = 0.0
    peak = 197e12
    mfu = step_flops / dt / peak if step_flops else None
    niter = 400000 if args.preset == "full" else 600000
    rec = {
        "metric": (f"train step ({args.preset} preset, B={B}, T={T}, "
                   f"{S}x{S} crops, grad_acc={args.grad_acc}, "
                   "bf16+fp32-flow, one chip)"),
        "value": round(B / dt, 4),
        "unit": "clips/sec",
        "frames_per_sec": round(B * T / dt, 3),
        "step_ms": round(dt * 1e3, 2),
        "step_tflops": round(step_flops / 1e12, 2) if step_flops else None,
        "hw_flop_util_vs_v5e_peak": round(mfu, 4) if mfu else None,
        "projected_days_for_recipe": round(niter * dt / 86400, 2),
        "recipe_iters": niter,
        "loss_first": round(loss0, 5),
        "loss_last": round(loss, 5),
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
