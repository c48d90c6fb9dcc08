"""Sequence IO + index windows (reference ``utils/eval_utils.py``)."""

from __future__ import annotations

import glob
import os
from typing import List

import numpy as np
import cv2


def read_image(path: str) -> np.ndarray:
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.ndim == 2:
        img = img[:, :, None].repeat(3, 2)
    return img[:, :, :3][:, :, ::-1]  # BGR -> RGB uint8


def read_seq_images(path: str) -> np.ndarray:
    """Read a sorted PNG sequence -> (N, H, W, C) RGB uint8."""
    paths = sorted(glob.glob(os.path.join(path, "*")))
    return np.stack([read_image(p) for p in paths], axis=0)


def index_generation(num_output_frames: int, num_GT: int) -> List[List[int]]:
    """Overlapping index windows covering num_GT frames
    (reference utils/eval_utils.py:38-60)."""
    indices_list = []
    right = num_output_frames
    while right <= num_GT:
        indices_list.append(list(range(right - num_output_frames, right)))
        right += num_output_frames - 1
    if right - num_output_frames < num_GT - 1:
        indices_list.append(list(range(num_GT - num_output_frames, num_GT)))
    return indices_list
