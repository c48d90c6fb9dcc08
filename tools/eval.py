#!/usr/bin/env python
"""Evaluation CLI (replaces reference ``tools/test_reds4.py`` + Tester).

Walks the LR dataset tree clip by clip, runs the sliding/tiled/oracle
inference protocol, reports PSNR / PSNR-Y / SSIM / SSIM-Y / FPS per frame,
clip, and dataset, and writes PNGs.

    python tools/eval.py --config configs/vmg_eval_reds4.yml \\
        --checkpoint experiments/VMG-REDS/ckpt
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np
import cv2


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", default=None,
                   help="orbax dir, .pth (torch), or 'random' for smoke runs")
    p.add_argument("--lr-root", default=None, help="override LR root")
    p.add_argument("--gt-root", default=None, help="override GT root")
    p.add_argument("--max-clips", type=int, default=None)
    p.add_argument("--topk", type=int, default=None,
                   help="report the k best clips by PSNR "
                        "(reference test_reds4.py select_topk)")
    p.add_argument("--device-tiles", action="store_true",
                   help="run the spatial tile loop on-device in one jitted "
                        "call (no host round-trip per tile)")
    p.add_argument("--fast-gelu", action="store_true",
                   help="serving fast-math: tanh-approximate GELU (error "
                        "far below bf16 rounding; off by default to keep "
                        "bit-parity with the torch reference)")
    args = p.parse_args()

    from vmg_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from vmg_tpu.configs import load_config
    from vmg_tpu.models import create_model
    from vmg_tpu.eval import (
        SlidingEvaluator, calculate_psnr, structural_similarity, rgb2ycbcr_matlab,
    )
    from vmg_tpu.eval.eval_utils import read_seq_images, index_generation
    from vmg_tpu.utils import setup_logger, AverageMeter
    from vmg_tpu.ckpt import restore_checkpoint
    from vmg_tpu.ckpt.torch_convert import convert_torch_state_dict

    if args.fast_gelu:
        from vmg_tpu.models.blocks import set_fast_gelu
        set_fast_gelu(True)

    cfg = load_config(args.config, is_train=False)
    logger = setup_logger("base", cfg.path.output_dir, "eval")
    model = create_model(cfg.network, is_train=False)

    if cfg.dataset.FLOPs:
        from vmg_tpu.eval.flops import model_flops

        h = cfg.dataset.image_shape[1] // cfg.scale
        w = cfg.dataset.image_shape[2] // cfg.scale
        fx = jnp.zeros((1, cfg.dataset.flops_num_frames, h, w, 3), jnp.float32)
        fparams = jax.eval_shape(model.init, jax.random.key(0), fx)
        # count on concrete params (cheap tiny init then re-lower is heavy;
        # use abstract lowering via jit cost analysis on zeros)
        import numpy as _np
        concrete = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), fparams)
        logger.info(f"FLOPs = {model_flops(model, concrete, fx) / 1e9:.2f} G "
                    f"on (1, {cfg.dataset.flops_num_frames}, {h}, {w}, 3)")

    lr_root = args.lr_root or cfg.dataset.dataset_root
    if not lr_root:
        p.error("no LR root: set dataset.dataset_root in the config "
                "or pass --lr-root")
    # default GT location by dataset-name dispatch
    # (reference tools/test_reds4.py:148-163)
    if args.gt_root or cfg.dataset.gt_root:
        gt_root = args.gt_root or cfg.dataset.gt_root
    elif "Vimeo" in cfg.name:
        gt_root = lr_root.replace("_LR", "")
    elif "RED" in cfg.name:
        gt_root = lr_root.replace("train_sharp_bicubic", "train_sharp")
    else:  # Vid4 / UDM10 trees: <root>/LR/X4/<clip> vs <root>/GT/<clip>
        gt_root = lr_root.replace("LR/X4", "GT")

    # --- params -------------------------------------------------------
    if args.checkpoint and args.checkpoint.endswith((".pth", ".pt")):
        import torch

        sd = torch.load(args.checkpoint, map_location="cpu")
        sd = sd.get("state_dict", sd)
        params = convert_torch_state_dict(sd, strict=cfg.path.strict_load)
        params = jax.tree.map(jnp.asarray, params)
    elif args.checkpoint and args.checkpoint != "random":
        abstract = jax.eval_shape(
            model.init, jax.random.key(0),
            jnp.zeros((1, 2, 64, 64, 3), jnp.float32),
        )
        state = restore_checkpoint(args.checkpoint, None)
        params = state["params"] if "params" in state else state
    else:
        logger.warning("using RANDOM weights (smoke run)")
        params = jax.jit(model.init)(
            jax.random.key(0), jnp.zeros((1, 2, 64, 64, 3), jnp.float32)
        )

    use_mirrors = cfg.dataset.use_mirrors
    fwd = jax.jit(lambda x: model.apply(params, x, frames_mirror=use_mirrors))

    def forward_fn(clip_np):
        x = jnp.asarray(clip_np)
        if use_mirrors:
            # mirror-extend the clip (reference data/REDS.py:203-205 /
            # Tester mirrors protocol); the model reuses flipped forward
            # flow for the backward direction (vmg.py:426-432)
            x = jnp.concatenate([x, x[:, ::-1]], axis=1)
        out = np.asarray(fwd(x))
        if use_mirrors:
            out = out[:, : out.shape[1] // 2]
        return out

    device_tiled_fn = None
    if args.device_tiles and cfg.dataset.wins:
        from vmg_tpu.eval.device_tiled import make_device_tiled_forward

        lr_hw = (cfg.dataset.image_shape[1] // cfg.scale,
                 cfg.dataset.image_shape[2] // cfg.scale)
        dev_tiled = make_device_tiled_forward(
            lambda p, patch: model.apply(p, patch,
                                         frames_mirror=use_mirrors),
            cfg.scale, tuple(cfg.dataset.wins),
            cfg.dataset.overlapped_spatial_length, lr_hw,
        )

        def device_tiled_fn(clip_np):
            x = jnp.asarray(clip_np)
            if use_mirrors:
                x = jnp.concatenate([x, x[:, ::-1]], axis=1)
            out = np.asarray(dev_tiled(params, x))
            if use_mirrors:
                out = out[:, : out.shape[1] // 2]
            return out

    evaluator = SlidingEvaluator(
        forward_fn,
        scale=cfg.scale,
        test_num_frames=cfg.dataset.num_frames,
        overlapped_mode=cfg.dataset.overlapped_mode,
        spatial_wins=cfg.dataset.wins,
        overlapped_spatial_length=cfg.dataset.overlapped_spatial_length,
        dataset_name="REDS" if cfg.dataset.name in ("REDS", "REDS4")
        else cfg.dataset.name,
        device_tiled_fn=device_tiled_fn,
    )

    def _find_clips(root):
        """One- or two-level clip trees (REDS4: 000/; Vimeo: 00001/0001/)."""
        out = []
        for d in sorted(os.listdir(root)):
            p = os.path.join(root, d)
            if not os.path.isdir(p):
                continue
            subs = [s for s in sorted(os.listdir(p))
                    if os.path.isdir(os.path.join(p, s))]
            if subs:
                out.extend(os.path.join(d, s) for s in subs)
            else:
                out.append(d)
        return out

    clips = _find_clips(lr_root)
    if args.max_clips:
        clips = clips[: args.max_clips]

    ds_psnr, ds_psnr_y = AverageMeter(), AverageMeter()
    ds_ssim, ds_ssim_y = AverageMeter(), AverageMeter()
    ds_fps = AverageMeter()
    clip_scores = []

    for clip in clips:
        lr_imgs = read_seq_images(os.path.join(lr_root, clip))
        gt_imgs = read_seq_images(os.path.join(gt_root, clip))
        n_gt = gt_imgs.shape[0]
        n_out = cfg.dataset.num_out_frames
        windows = index_generation(min(n_out, n_gt), n_gt)

        c_psnr, c_psnr_y = AverageMeter(), AverageMeter()
        c_ssim, c_ssim_y = AverageMeter(), AverageMeter()
        tested = set()
        save_dir = os.path.join(cfg.path.output_dir, clip)
        os.makedirs(save_dir, exist_ok=True)

        for indices in windows:
            sel = np.asarray(indices)
            out, fps = evaluator.evaluate_fps(lr_imgs[sel], gt_imgs[sel])
            ds_fps.update(fps)
            for i, frame_idx in enumerate(indices):
                if frame_idx in tested:
                    continue
                tested.add(frame_idx)
                if cfg.dataset.eval_mid_clip:
                    # Vimeo protocol: score only the center frame (or the
                    # two mirror centers), reference test_reds4.py:226-241
                    if use_mirrors:
                        if i not in (3, 10):
                            continue
                    elif i != len(indices) // 2:
                        continue
                output, target = out[i], gt_imgs[frame_idx]
                oy = rgb2ycbcr_matlab(output)[..., 0]
                ty = rgb2ycbcr_matlab(target)[..., 0]
                psnr = calculate_psnr(output, target)
                psnr_y = calculate_psnr(oy, ty)
                ssim = structural_similarity(output, target)
                ssim_y = structural_similarity(oy, ty)
                c_psnr.update(psnr)
                c_psnr_y.update(psnr_y)
                c_ssim.update(ssim)
                c_ssim_y.update(ssim_y)
                cv2.imwrite(
                    os.path.join(save_dir, f"{cfg.name}-{frame_idx + 1:08d}.png"),
                    output[..., ::-1],
                )
                logger.info(
                    f"{clip} {frame_idx + 1:3d} - PSNR {psnr:.4f} "
                    f"PSNR-Y {psnr_y:.4f} SSIM {ssim:.5f} SSIM-Y {ssim_y:.5f}"
                )
        logger.info(
            f"[clip {clip}] PSNR {c_psnr.average():.4f} "
            f"PSNR-Y {c_psnr_y.average():.4f} SSIM {c_ssim.average():.5f} "
            f"SSIM-Y {c_ssim_y.average():.5f}"
        )
        ds_psnr.update(c_psnr.average())
        ds_psnr_y.update(c_psnr_y.average())
        ds_ssim.update(c_ssim.average())
        ds_ssim_y.update(c_ssim_y.average())
        clip_scores.append((clip, c_psnr.average()))

    if args.topk:
        best = sorted(clip_scores, key=lambda kv: -kv[1])[: args.topk]
        for rank, (clip, p_) in enumerate(best, 1):
            logger.info(f"[top-{rank}] {clip}: PSNR {p_:.4f}")

    logger.info(
        f"[dataset] PSNR {ds_psnr.average():.4f} PSNR-Y {ds_psnr_y.average():.4f} "
        f"SSIM {ds_ssim.average():.5f} SSIM-Y {ds_ssim_y.average():.5f} "
        f"FPS {ds_fps.average():.3f}"
    )


if __name__ == "__main__":
    main()
