#!/usr/bin/env python
"""Synthesize a tiny REDS-layout demo dataset for overfit smoke training
(the learning-evidence recipe: no real REDS data or egress exists in this
environment, so a structured synthetic clip stands in).

Frames are a textured scene (mixed sinusoids + moving squares) translating
smoothly over time -- enough temporal/spatial structure for VSR training
signal.  HR frames are written as packed shards; LR is the oracle-tested
MATLAB bicubic /4 (vmg_tpu.ops.resize.imresize_matlab), the same
degradation the reference's prep uses (datasets/generate_LR.py:11).

Usage:
    python tools/make_demo_data.py --out /tmp/vmg_demo --frames 30
    python tools/train.py --config vmg_tpu/configs/presets/vmg_demo_overfit.yml --max-steps 300
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def make_frame(t: float, h: int, w: int, rng: np.random.Generator
               ) -> np.ndarray:
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    img = np.zeros((h, w, 3), np.float32)
    # drifting plaid of incommensurate frequencies per channel
    for c, (fy, fx, sp) in enumerate([(0.031, 0.055, 17.0),
                                      (0.047, 0.023, -11.0),
                                      (0.019, 0.041, 7.0)]):
        img[..., c] = 0.5 + 0.25 * np.sin(
            2 * np.pi * (fy * (yy + sp * t) + fx * (xx - sp * t))
        ) + 0.15 * np.sin(2 * np.pi * (0.09 * xx + 0.5 * sp * t * 0.04))
    # moving high-contrast squares (sharp edges -> SR signal)
    for i in range(6):
        size = 12 + 6 * i
        cy = int((0.13 * (i + 1) * h + 9.0 * t * (1 + 0.3 * i)) % (h - size))
        cx = int((0.17 * (i + 1) * w - 6.0 * t * (1 + 0.2 * i)) % (w - size))
        color = np.asarray([(i * 53) % 255, (i * 97) % 255,
                            (i * 151) % 255], np.float32) / 255.0
        img[cy:cy + size, cx:cx + size] = color
    return np.clip(img, 0.0, 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/vmg_demo")
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # prep runs on host
    import jax.numpy as jnp
    from vmg_tpu.data.storage import PackedWriter
    from vmg_tpu.ops.resize import imresize_matlab

    h = w = args.size
    rng = np.random.default_rng(0)
    os.makedirs(args.out, exist_ok=True)
    hr_w = PackedWriter(os.path.join(args.out, "hr.pack"), (h, w, 3))
    lr_w = PackedWriter(os.path.join(args.out, "lr.pack"),
                        (h // 4, w // 4, 3))

    import cv2

    val_lr = os.path.join(args.out, "val", "LR", "000")
    val_gt = os.path.join(args.out, "val", "GT", "000")
    os.makedirs(val_lr, exist_ok=True)
    os.makedirs(val_gt, exist_ok=True)

    resize = jax.jit(lambda v: imresize_matlab(v, 0.25))
    bicubic_psnr = []
    up = jax.jit(lambda v: imresize_matlab(v, 4.0))
    for i in range(args.frames):
        hr = make_frame(float(i), h, w, rng)
        lr = np.asarray(resize(jnp.asarray(hr)))
        hr_u8 = np.round(hr * 255).astype(np.uint8)
        lr_u8 = np.round(np.clip(lr, 0, 1) * 255).astype(np.uint8)
        hr_w.add(f"000_{i}", hr_u8, clip_key="000")
        lr_w.add(f"000_{i}", lr_u8, clip_key="000")
        cv2.imwrite(os.path.join(val_lr, f"{i:08d}.png"), lr_u8[..., ::-1])
        cv2.imwrite(os.path.join(val_gt, f"{i:08d}.png"), hr_u8[..., ::-1])
        # bicubic-upsample baseline PSNR for the learning-evidence bar
        bi = np.asarray(up(jnp.asarray(lr_u8.astype(np.float32) / 255)))
        bi_u8 = np.round(np.clip(bi, 0, 1) * 255).astype(np.uint8)
        mse = np.mean((bi_u8.astype(np.float64)
                       - hr_u8.astype(np.float64)) ** 2)
        bicubic_psnr.append(10 * np.log10(255.0 ** 2 / mse))
    hr_w.close()
    lr_w.close()
    print(f"demo dataset: {args.frames} frames at {h}x{w} -> {args.out}")
    print(f"bicubic-upsample baseline PSNR: "
          f"{float(np.mean(bicubic_psnr)):.3f} dB")


if __name__ == "__main__":
    main()
