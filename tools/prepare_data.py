#!/usr/bin/env python
"""Dataset preparation CLI (replaces reference ``datasets/`` scripts:
prepare_reds.py, generate_LR.py, create_lmdb.py, create_ann.py).

Builds vmg_tpu packed shards from a PNG tree, optionally synthesizing the
x4 LR side with MATLAB-compatible antialiased bicubic (the same
degradation as reference ``datasets/generate_LR.py``).

    python tools/prepare_data.py pack   --src /REDS/train_sharp --dst hr.pack
    python tools/prepare_data.py gen-lr --src /REDS/train_sharp --dst lr.pack --scale 4
    python tools/prepare_data.py keys   --src hr.pack --dst REDS_keys.pkl
"""

from __future__ import annotations

import argparse
import glob
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np
import cv2


def _iter_frames(src):
    clips = sorted(d for d in os.listdir(src) if os.path.isdir(os.path.join(src, d)))
    for clip in clips:
        frames = sorted(glob.glob(os.path.join(src, clip, "*.png")))
        for fi, path in enumerate(frames):
            yield clip, fi, path


def cmd_pack(args):
    from vmg_tpu.data import PackedWriter

    first = None
    for clip, fi, path in _iter_frames(args.src):
        img = cv2.imread(path, cv2.IMREAD_COLOR)[:, :, ::-1]  # RGB
        if first is None:
            first = img.shape
            writer = PackedWriter(args.dst, first)
        writer.add(f"{clip}_{fi}", np.ascontiguousarray(img), clip_key=clip)
    writer.close()
    print(f"packed -> {args.dst} ({first})")


def cmd_gen_lr(args):
    import jax.numpy as jnp
    from vmg_tpu.data import PackedWriter
    from vmg_tpu.ops.resize import imresize_matlab

    writer = None
    for clip, fi, path in _iter_frames(args.src):
        img = cv2.imread(path, cv2.IMREAD_COLOR)[:, :, ::-1].astype(np.float32) / 255.0
        lr = np.asarray(imresize_matlab(jnp.asarray(img), 1.0 / args.scale))
        lr = np.clip(np.round(lr * 255.0), 0, 255).astype(np.uint8)
        if writer is None:
            writer = PackedWriter(args.dst, lr.shape)
        writer.add(f"{clip}_{fi}", np.ascontiguousarray(lr), clip_key=clip)
    writer.close()
    print(f"LR packed -> {args.dst}")


def cmd_keys(args):
    from vmg_tpu.data.storage import PackedBackend

    be = PackedBackend(args.src)
    with open(args.dst, "wb") as f:
        pickle.dump({"keys": be.keys}, f)
    print(f"{len(be.keys)} clip keys -> {args.dst}")


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, fn in [("pack", cmd_pack), ("gen-lr", cmd_gen_lr), ("keys", cmd_keys)]:
        sp = sub.add_parser(name)
        sp.add_argument("--src", required=True)
        sp.add_argument("--dst", required=True)
        if name == "gen-lr":
            sp.add_argument("--scale", type=int, default=4)
        sp.set_defaults(fn=fn)
    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
