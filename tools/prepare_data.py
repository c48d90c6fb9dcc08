#!/usr/bin/env python
"""Dataset preparation CLI (replaces reference ``datasets/`` scripts:
prepare_reds.py, prepare_vimeo.py, sep_vimeo.py, generate_LR.py,
create_lmdb.py, create_ann.py).

Builds vmg_tpu packed shards from a PNG tree, optionally synthesizing the
x4 LR side with MATLAB-compatible antialiased bicubic (the same
degradation as reference ``datasets/generate_LR.py``).

    # REDS (flat clip/frame tree)
    python tools/prepare_data.py pack   --src /REDS/train_sharp --dst hr.pack
    python tools/prepare_data.py gen-lr --src /REDS/train_sharp --dst lr.pack --scale 4
    python tools/prepare_data.py keys   --src hr.pack --dst REDS_keys.pkl

    # Vimeo-90K septuplets (sequences/a/b/im1..im7.png)
    python tools/prepare_data.py sep-vimeo --src .../sequences \\
        --list .../sep_trainlist.txt --dst .../sequences/train
    python tools/prepare_data.py pack   --src .../sequences/train --dst vimeo_hr.pack --layout vimeo
    python tools/prepare_data.py gen-lr --src .../sequences/train --dst vimeo_lr.pack --layout vimeo
    python tools/prepare_data.py ann --dataset vimeo --list sep_trainlist.txt --dst meta_info_Vimeo90K_GT.txt
    python tools/prepare_data.py ann --dataset reds --dst meta_info_REDS_GT.txt
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


def _iter_frames(src, layout: str = "clips"):
    """Yield (clip_key, frame_id, path).

    layout='clips': one-level tree clip/NNNNN.png, frame_id = 0-based order
    (REDS; reference datasets/create_lmdb.py:44-47 key scheme).
    layout='vimeo': two-level septuplet tree a/b/im{1..7}.png with 1-based
    frame ids and clip key 'a/b' (reference data/Vimeo.py frame naming).
    """
    if layout == "vimeo":
        for a in sorted(os.listdir(src)):
            pa = os.path.join(src, a)
            if not os.path.isdir(pa):
                continue
            for b in sorted(os.listdir(pa)):
                pb = os.path.join(pa, b)
                if not os.path.isdir(pb):
                    continue
                for path in sorted(glob.glob(os.path.join(pb, "im*.png"))):
                    fid = int(os.path.basename(path)[2:-4])  # imN.png -> N
                    yield f"{a}/{b}", fid, path
        return
    clips = sorted(d for d in os.listdir(src) if os.path.isdir(os.path.join(src, d)))
    for clip in clips:
        frames = sorted(glob.glob(os.path.join(src, clip, "*.png")))
        for fi, path in enumerate(frames):
            yield clip, fi, path


def cmd_pack(args):
    from vmg_tpu.data import PackedWriter

    first = None
    for clip, fi, path in _iter_frames(args.src, args.layout):
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
    for clip, fi, path in _iter_frames(args.src, args.layout):
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


def cmd_sep_vimeo(args):
    """Materialize a Vimeo train/test subset per the official sep list
    (reference datasets/sep_vimeo.py:9-29): copy each listed a/b clip dir
    from --src into --dst, preserving the two-level layout."""
    import shutil

    with open(args.list) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    os.makedirs(args.dst, exist_ok=True)
    for line in lines:
        src_dir = os.path.join(args.src, line)
        dst_dir = os.path.join(args.dst, line)
        if os.path.isdir(dst_dir):
            continue
        shutil.copytree(src_dir, dst_dir)
    print(f"{len(lines)} clips -> {args.dst}")


_REDS4_CLIPS = (0, 11, 15, 20)  # the REDS4 eval partition
# (reference mmedit/datasets/sr_reds_multiple_gt_dataset.py:46-49)


def cmd_ann(args):
    """Annotation / meta-info files (reference datasets/create_ann.py):
    vimeo -> '<a/b> (256, 448, 3)' per sep-list line; reds -> the 266
    training clip ids (000..269 minus REDS4)."""
    if args.dataset == "vimeo":
        if not args.list:
            raise SystemExit("--list required for --dataset vimeo")
        with open(args.list) as f:
            lines = [ln.strip() for ln in f if ln.strip()]
        with open(args.dst, "w") as f:
            for line in lines:
                f.write(f"{line} (256, 448, 3)\n")
        print(f"{len(lines)} entries -> {args.dst}")
    elif args.dataset == "reds":
        clips = [f"{i:03d}" for i in range(270) if i not in _REDS4_CLIPS]
        with open(args.dst, "w") as f:
            f.write("\n".join(clips) + "\n")
        print(f"{len(clips)} clips -> {args.dst}")
    else:
        raise SystemExit(f"unknown dataset {args.dataset!r}")


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, fn in [("pack", cmd_pack), ("gen-lr", cmd_gen_lr), ("keys", cmd_keys)]:
        sp = sub.add_parser(name)
        sp.add_argument("--src", required=True)
        sp.add_argument("--dst", required=True)
        if name in ("pack", "gen-lr"):
            sp.add_argument("--layout", choices=("clips", "vimeo"),
                            default="clips")
        if name == "gen-lr":
            sp.add_argument("--scale", type=int, default=4)
        sp.set_defaults(fn=fn)
    sp = sub.add_parser("sep-vimeo")
    sp.add_argument("--src", required=True)
    sp.add_argument("--list", required=True)
    sp.add_argument("--dst", required=True)
    sp.set_defaults(fn=cmd_sep_vimeo)
    sp = sub.add_parser("ann")
    sp.add_argument("--dataset", choices=("vimeo", "reds"), required=True)
    sp.add_argument("--list", default=None)
    sp.add_argument("--dst", required=True)
    sp.set_defaults(fn=cmd_ann)
    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
