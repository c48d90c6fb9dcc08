"""Video export + terminal progress (reference ``utils/make_video.py``,
``utils/progress_bar.py``)."""

from __future__ import annotations

import glob
import os
import sys
import time

import cv2


def make_video(png_dir: str, out_path: str, fps: int = 25):
    """PNG sequence directory -> MP4."""
    paths = sorted(glob.glob(os.path.join(png_dir, "*.png")))
    if not paths:
        raise FileNotFoundError(f"no PNGs under {png_dir}")
    first = cv2.imread(paths[0])
    h, w = first.shape[:2]
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    writer = cv2.VideoWriter(out_path, fourcc, fps, (w, h))
    for p in paths:
        writer.write(cv2.imread(p))
    writer.release()
    return out_path


class ProgressBar:
    """Minimal terminal progress bar with ETA."""

    def __init__(self, total: int, width: int = 40):
        self.total = total
        self.width = width
        self.count = 0
        self.start = time.time()

    def update(self, msg: str = ""):
        self.count += 1
        frac = self.count / self.total
        filled = int(self.width * frac)
        elapsed = time.time() - self.start
        eta = elapsed / max(frac, 1e-9) * (1 - frac)
        bar = "#" * filled + "-" * (self.width - filled)
        sys.stdout.write(
            f"\r[{bar}] {self.count}/{self.total} "
            f"eta {eta:5.0f}s {msg}"
        )
        if self.count >= self.total:
            sys.stdout.write("\n")
        sys.stdout.flush()
