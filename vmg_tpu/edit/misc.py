"""tensor2img (reference ``mmedit/core/misc.py:9``): float array in any of
(T,H,W,C)/(H,W,C)/(H,W) in [min_max] -> uint8 BGR image (first frame)."""

from __future__ import annotations

import numpy as np


def tensor2img(tensor, out_type=np.uint8, min_max=(0.0, 1.0)) -> np.ndarray:
    arr = np.asarray(tensor, dtype=np.float64)
    while arr.ndim > 3:
        arr = arr[0]
    lo, hi = min_max
    arr = np.clip((arr - lo) / (hi - lo), 0.0, 1.0)
    if arr.ndim == 3 and arr.shape[-1] == 3:
        arr = arr[..., ::-1]  # RGB -> BGR for cv2
    if out_type == np.uint8:
        return (arr * 255.0).round().astype(np.uint8)
    return arr.astype(out_type)
