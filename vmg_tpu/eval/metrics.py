"""Evaluation metrics with reference-exact numerics
(reference ``utils/metrics.py`` + skimage conventions used by
``tools/test_reds4.py:205-218``).

These run on host numpy: they are post-processing of already-synced
uint8 frames, exactly like the reference, so cv2/numpy is the right tool
(and keeps bit-parity trivially).
"""

from __future__ import annotations

import math

import numpy as np
import cv2


def calculate_psnr(img1: np.ndarray, img2: np.ndarray, border: int = 0) -> float:
    """PSNR on [0, 255] arrays with optional border crop."""
    if img1.shape != img2.shape:
        raise ValueError("Input images must have the same dimensions.")
    h, w = img1.shape[:2]
    img1 = img1[border : h - border or None, border : w - border or None]
    img2 = img2[border : h - border or None, border : w - border or None]
    mse = np.mean((img1.astype(np.float64) - img2.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 20 * math.log10(255.0 / math.sqrt(mse))


def psnr_float01(img_test: np.ndarray, img_true: np.ndarray) -> float:
    """skimage peak_signal_noise_ratio on float [0,1] (data_range=1), as the
    oracle clip selector uses (reference Tester.py:199-205)."""
    err = np.mean((img_test.astype(np.float64) - img_true.astype(np.float64)) ** 2)
    if err == 0:
        return float("inf")
    return 10 * math.log10(1.0 / err)


def psnr_exceed_check(psnr: float) -> float:
    """Cap infinite PSNR the way the reference does (Tester.py:24-33)."""
    if psnr >= float("inf"):
        return float(10 * np.log10(255.0 ** 2 / 0.65025))
    return float(psnr)


def _ssim_single(img1: np.ndarray, img2: np.ndarray) -> float:
    C1 = (0.01 * 255) ** 2
    C2 = (0.03 * 255) ** 2
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.transpose())
    mu1 = cv2.filter2D(img1, -1, window)[5:-5, 5:-5]
    mu2 = cv2.filter2D(img2, -1, window)[5:-5, 5:-5]
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = cv2.filter2D(img1 ** 2, -1, window)[5:-5, 5:-5] - mu1_sq
    sigma2_sq = cv2.filter2D(img2 ** 2, -1, window)[5:-5, 5:-5] - mu2_sq
    sigma12 = cv2.filter2D(img1 * img2, -1, window)[5:-5, 5:-5] - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    return float(ssim_map.mean())


def structural_similarity(img1: np.ndarray, img2: np.ndarray) -> float:
    """SSIM on [0, 255]; per-channel mean for color images."""
    if img1.shape != img2.shape:
        raise ValueError("Input images must have the same dimensions.")
    if img1.ndim == 3:
        return float(np.mean([_ssim_single(img1[..., i], img2[..., i])
                              for i in range(img1.shape[2])]))
    return _ssim_single(img1, img2)


def rgb2ycbcr_matlab(img: np.ndarray) -> np.ndarray:
    """MATLAB/skimage rgb2ycbcr.  uint8 input -> float YCbCr in [16, 235]
    (Y); matches ``skimage.color.rgb2ycbcr`` used by test_reds4.py:208."""
    x = img.astype(np.float64)
    if img.dtype == np.uint8:
        x = x / 255.0
    y = x @ np.asarray(
        [[65.481, -37.797, 112.0],
         [128.553, -74.203, -93.786],
         [24.966, 112.0, -18.214]]
    )
    y += np.asarray([16.0, 128.0, 128.0])
    return y
