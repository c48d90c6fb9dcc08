"""Matting evaluation metrics: SAD, MSE, gradient error, connectivity
error (reference ``mmedit/core/evaluation/metrics.py:12-137`` and
``metric_utils.py``).

These are host-side numpy metrics (the reference computes them on CPU with
cv2 as well); they operate on uint8-range [0, 255] alpha mattes and
{0, 128, 255} trimaps.  The predicted alpha must already be masked by the
trimap (pred == 0 where trimap == 0, pred == 255 where trimap == 255) --
the reference asserts the same.
"""

from __future__ import annotations

import numpy as np


def _check(alpha, trimap, pred_alpha):
    if alpha.ndim != 2 or trimap.ndim != 2 or pred_alpha.ndim != 2:
        raise ValueError("alpha, trimap and pred_alpha must be 2-D")
    if not ((pred_alpha[trimap == 0] == 0).all()
            and (pred_alpha[trimap == 255] == 255).all()):
        raise ValueError("pred_alpha should be masked by trimap before "
                         "evaluation")


def sad(alpha, trimap, pred_alpha):
    """Sum of absolute differences, in thousands (reference metrics.py:12)."""
    _check(alpha, trimap, pred_alpha)
    diff = np.abs(pred_alpha.astype(np.float64) / 255
                  - alpha.astype(np.float64) / 255)
    return diff.sum() / 1000


def mse(alpha, trimap, pred_alpha):
    """Mean squared error over the unknown region (reference metrics.py:26)."""
    _check(alpha, trimap, pred_alpha)
    weight_sum = (trimap == 128).sum()
    if weight_sum == 0:
        return 0.0
    diff = (pred_alpha.astype(np.float64) / 255
            - alpha.astype(np.float64) / 255)
    return float((diff ** 2).sum() / weight_sum)


def gaussian(x, sigma):
    return np.exp(-x ** 2 / (2 * sigma ** 2)) / (sigma * np.sqrt(2 * np.pi))


def dgaussian(x, sigma):
    return -x * gaussian(x, sigma) / sigma ** 2


def gauss_filter(sigma, epsilon=1e-2):
    """Derivative-of-gaussian filter pair (reference metric_utils.py:30)."""
    half_size = np.ceil(
        sigma * np.sqrt(-2 * np.log(np.sqrt(2 * np.pi) * sigma * epsilon)))
    size = int(2 * half_size + 1)
    i = np.arange(size)[:, None] - half_size
    j = np.arange(size)[None, :] - half_size
    filter_x = gaussian(i, sigma) * dgaussian(j, sigma)
    filter_x = filter_x / np.sqrt((filter_x ** 2).sum())
    return filter_x, filter_x.T


def gauss_gradient(img, sigma):
    """Gaussian gradient magnitude with replicate borders
    (reference metric_utils.py:60)."""
    import cv2

    filter_x, filter_y = gauss_filter(sigma)
    gx = cv2.filter2D(img, -1, filter_x, borderType=cv2.BORDER_REPLICATE)
    gy = cv2.filter2D(img, -1, filter_y, borderType=cv2.BORDER_REPLICATE)
    return np.sqrt(gx ** 2 + gy ** 2)


def gradient_error(alpha, trimap, pred_alpha, sigma=1.4):
    """Gradient error over the unknown region, in thousands
    (reference metrics.py:44)."""
    import cv2

    _check(alpha, trimap, pred_alpha)
    alpha = alpha.astype(np.float64)
    pred_alpha = pred_alpha.astype(np.float64)
    alpha_normed = np.zeros_like(alpha)
    pred_normed = np.zeros_like(pred_alpha)
    cv2.normalize(alpha, alpha_normed, 1.0, 0.0, cv2.NORM_MINMAX)
    cv2.normalize(pred_alpha, pred_normed, 1.0, 0.0, cv2.NORM_MINMAX)
    a_grad = gauss_gradient(alpha_normed, sigma).astype(np.float32)
    p_grad = gauss_gradient(pred_normed, sigma).astype(np.float32)
    return float(((a_grad - p_grad) ** 2 * (trimap == 128)).sum() / 1000)


def connectivity(alpha, trimap, pred_alpha, step=0.1):
    """Connectivity error over the unknown region, in thousands
    (reference metrics.py:78): per threshold level, distance of each pixel
    to the largest connected component of the thresholded intersection."""
    import cv2

    _check(alpha, trimap, pred_alpha)
    alpha = alpha.astype(np.float32) / 255
    pred_alpha = pred_alpha.astype(np.float32) / 255

    thresh_steps = np.arange(0, 1 + step, step)
    round_down_map = -np.ones_like(alpha)
    for i in range(1, len(thresh_steps)):
        alpha_thresh = alpha >= thresh_steps[i]
        pred_thresh = pred_alpha >= thresh_steps[i]
        intersection = (alpha_thresh & pred_thresh).astype(np.uint8)

        _, output, stats, _ = cv2.connectedComponentsWithStats(
            intersection, connectivity=4)
        size = stats[1:, -1]
        omega = np.zeros_like(alpha)
        if len(size) != 0:
            max_id = np.argmax(size)
            omega[output == max_id + 1] = 1

        mask = (round_down_map == -1) & (omega == 0)
        round_down_map[mask] = thresh_steps[i - 1]
    round_down_map[round_down_map == -1] = 1

    alpha_diff = alpha - round_down_map
    pred_diff = pred_alpha - round_down_map
    alpha_phi = 1 - alpha_diff * (alpha_diff >= 0.15)
    pred_phi = 1 - pred_diff * (pred_diff >= 0.15)
    return float(np.sum(np.abs(alpha_phi - pred_phi)
                        * (trimap == 128)) / 1000)
