"""Inpainting mask generators (reference ``mmedit/core/mask.py``:
bbox / irregular / free-form ("brush stroke") masks).  numpy host-side."""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
import cv2


def random_bbox(img_shape: Tuple[int, int],
                max_bbox_shape: Tuple[int, int] = (128, 128),
                max_bbox_delta: Tuple[int, int] = (40, 40),
                min_margin: Tuple[int, int] = (20, 20),
                rng: Optional[np.random.Generator] = None):
    """Random hole bbox (top, left, h, w) (reference mask.py:9)."""
    rng = rng or np.random.default_rng()
    H, W = img_shape[:2]
    mh, mw = max_bbox_shape
    dh, dw = max_bbox_delta
    marh, marw = min_margin
    h = mh - int(rng.integers(0, dh // 2 + 1)) * 2
    w = mw - int(rng.integers(0, dw // 2 + 1)) * 2
    top = int(rng.integers(marh, H - mh - marh + 1))
    left = int(rng.integers(marw, W - mw - marw + 1))
    return (top, left, h, w)


def bbox2mask(img_shape: Tuple[int, int], bbox,
              dtype=np.float32) -> np.ndarray:
    """bbox (top, left, h, w) -> (H, W, 1) mask (reference mask.py:77)."""
    H, W = img_shape[:2]
    mask = np.zeros((H, W, 1), dtype)
    top, left, h, w = bbox
    mask[top: top + h, left: left + w] = 1
    return mask


def bbox_mask(img_shape: Tuple[int, int], max_bbox_shape: Tuple[int, int] = (128, 128),
              max_bbox_delta: Tuple[int, int] = (40, 40),
              min_margin: Tuple[int, int] = (20, 20),
              rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Random rectangle mask -> (H, W, 1) float32 {0,1}."""
    return bbox2mask(img_shape, random_bbox(img_shape, max_bbox_shape,
                                            max_bbox_delta, min_margin, rng))


def irregular_mask(img_shape: Tuple[int, int], area_ratio_range=(0.15, 0.5),
                   num_vertices=(4, 12), max_angle=4.0,
                   length_range=(10, 100), brush_width=(10, 40),
                   rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Random-walk polyline mask with target area ratio."""
    rng = rng or np.random.default_rng()
    H, W = img_shape
    mask = np.zeros((H, W), np.uint8)
    target = rng.uniform(*area_ratio_range) * H * W
    while mask.sum() < target:
        n = int(rng.integers(num_vertices[0], num_vertices[1] + 1))
        x = int(rng.integers(0, W))
        y = int(rng.integers(0, H))
        bw = int(rng.integers(brush_width[0], brush_width[1] + 1))
        for _ in range(n):
            angle = rng.uniform(0, max_angle)
            length = int(rng.integers(length_range[0], length_range[1] + 1))
            nx = int(np.clip(x + length * math.cos(angle), 0, W - 1))
            ny = int(np.clip(y + length * math.sin(angle), 0, H - 1))
            cv2.line(mask, (x, y), (nx, ny), 1, thickness=bw)
            x, y = nx, ny
    return mask.astype(np.float32)[..., None]


def brush_stroke_mask(img_shape: Tuple[int, int], num_strokes=(1, 4),
                      num_vertices=(4, 12), mean_angle=2 * math.pi / 5,
                      angle_range=2 * math.pi / 15, brush_width=(12, 40),
                      rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """DeepFill-v2 style free-form strokes."""
    rng = rng or np.random.default_rng()
    H, W = img_shape
    mask = np.zeros((H, W), np.uint8)
    avg_radius = math.sqrt(H * H + W * W) / 8
    for _ in range(int(rng.integers(num_strokes[0], num_strokes[1] + 1))):
        n = int(rng.integers(num_vertices[0], num_vertices[1] + 1))
        lo = mean_angle - angle_range
        hi = mean_angle + angle_range
        x = int(rng.integers(0, W))
        y = int(rng.integers(0, H))
        bw = int(rng.integers(brush_width[0], brush_width[1] + 1))
        for i in range(n):
            angle = rng.uniform(lo, hi)
            if i % 2 == 0:
                angle = 2 * math.pi - angle
            r = np.clip(rng.normal(avg_radius, avg_radius // 2), 0, 2 * avg_radius)
            nx = int(np.clip(x + r * math.cos(angle), 0, W - 1))
            ny = int(np.clip(y + r * math.sin(angle), 0, H - 1))
            cv2.line(mask, (x, y), (nx, ny), 1, thickness=bw)
            cv2.circle(mask, (x, y), bw // 2, 1, -1)
            x, y = nx, ny
    return mask.astype(np.float32)[..., None]
