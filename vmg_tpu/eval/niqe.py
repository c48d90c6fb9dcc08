"""NIQE no-reference quality metric (reference
``mmedit/core/evaluation/metrics.py:470`` + niqe_pris_params.npz).

Standard NIQE: MSCN coefficients -> per-patch GGD/AGGD features ->
Mahalanobis-style distance to a pretrained multivariate Gaussian of
natural-scene statistics.  The pretrained parameters (mu_pris, cov_pris,
gaussian window) ship as an .npz; this environment has no egress, so the
loader takes a path and falls back to the reference's mounted copy.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Tuple

import numpy as np
import cv2

_DEFAULT_PRIS = "/root/reference/mmedit/core/evaluation/niqe_pris_params.npz"


def _load_pris(path: Optional[str] = None):
    path = path or _DEFAULT_PRIS
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"NIQE pretrained natural-scene statistics not found at {path}; "
            "pass pris_params_path explicitly"
        )
    data = np.load(path)
    return (data["mu_pris_param"].ravel(), data["cov_pris_param"],
            data["gaussian_window"])


_GAM_RANGE = np.arange(0.2, 10.001, 0.001)
_GAM_RECIP = 1.0 / _GAM_RANGE
try:
    from scipy.special import gamma as _gamma_fn  # pragma: no cover
except Exception:  # scipy not available: use math.gamma elementwise
    _gamma_fn = np.vectorize(math.gamma)

_R_GAM = (_gamma_fn(_GAM_RECIP) * _gamma_fn(3 * _GAM_RECIP)
          / (_gamma_fn(2 * _GAM_RECIP) ** 2))


def _estimate_aggd(block: np.ndarray) -> Tuple[float, float, float]:
    """Asymmetric GGD parameter estimation (alpha, beta_l, beta_r)."""
    block = block.flatten()
    left = block[block < 0]
    right = block[block > 0]
    left_std = np.sqrt(np.mean(left ** 2)) if left.size else 0.0
    right_std = np.sqrt(np.mean(right ** 2)) if right.size else 0.0
    gammahat = left_std / right_std if right_std > 0 else np.inf
    rhat = (np.mean(np.abs(block)) ** 2) / np.mean(block ** 2) \
        if np.mean(block ** 2) > 0 else 0.0
    rhatnorm = (rhat * (gammahat ** 3 + 1) * (gammahat + 1)
                / ((gammahat ** 2 + 1) ** 2)) if np.isfinite(gammahat) else 0.0
    pos = np.argmin((_R_GAM - rhatnorm) ** 2)
    alpha = _GAM_RANGE[pos]
    g1 = float(_gamma_fn(1 / alpha))
    g3 = float(_gamma_fn(3 / alpha))
    beta_l = left_std * np.sqrt(g1 / g3)
    beta_r = right_std * np.sqrt(g1 / g3)
    return float(alpha), float(beta_l), float(beta_r)


def _block_features(mscn: np.ndarray) -> list:
    feats = []
    alpha, bl, br = _estimate_aggd(mscn)
    feats.extend([alpha, (bl + br) / 2])
    for shift in [(0, 1), (1, 0), (1, 1), (1, -1)]:
        shifted = np.roll(mscn, shift, axis=(0, 1))
        alpha, bl, br = _estimate_aggd(mscn * shifted)
        mean = (br - bl) * (_gamma_fn(2 / alpha) / _gamma_fn(1 / alpha))
        feats.extend([alpha, mean, bl, br])
    return feats


def niqe(img: np.ndarray, pris_params_path: Optional[str] = None,
         crop_border: int = 0, block_size: int = 96) -> float:
    """NIQE of a grayscale or RGB uint8/float [0,255] image (lower=better)."""
    mu_pris, cov_pris, window = _load_pris(pris_params_path)
    if img.ndim == 3:
        img = (0.299 * img[..., 0] + 0.587 * img[..., 1]
               + 0.114 * img[..., 2])
    img = img.astype(np.float64)
    if crop_border:
        img = img[crop_border:-crop_border, crop_border:-crop_border]

    h, w = img.shape
    nbh, nbw = h // block_size, w // block_size
    img = img[: nbh * block_size, : nbw * block_size]

    feats_all = []
    for scale in (1, 2):
        mu = cv2.filter2D(img, -1, window, borderType=cv2.BORDER_REPLICATE)
        sigma = np.sqrt(np.abs(
            cv2.filter2D(img ** 2, -1, window,
                         borderType=cv2.BORDER_REPLICATE) - mu ** 2
        ))
        mscn = (img - mu) / (sigma + 1.0)
        bs = block_size // scale
        feats = []
        for bi in range(nbh):
            for bj in range(nbw):
                block = mscn[bi * bs : (bi + 1) * bs, bj * bs : (bj + 1) * bs]
                feats.append(_block_features(block))
        feats_all.append(np.asarray(feats))
        if scale == 1:
            img = cv2.resize(img / 255.0, (img.shape[1] // 2, img.shape[0] // 2),
                             interpolation=cv2.INTER_LINEAR) * 255.0
    feats = np.concatenate(feats_all, axis=1)

    mu_dist = np.nanmean(feats, axis=0)
    good = feats[~np.isnan(feats).any(axis=1)]
    cov_dist = np.cov(good, rowvar=False)
    pinv = np.linalg.pinv((cov_pris + cov_dist) / 2)
    d = mu_pris - mu_dist
    return float(np.sqrt(d @ pinv @ d))
