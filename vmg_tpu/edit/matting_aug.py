"""Matting data-augmentation transforms (reference
``mmedit/datasets/pipelines/matting_aug.py``, 631 LoC).

Host-side numpy/cv2 transforms over the pipeline results dict, registered
in PIPELINES like the rest of ``vmg_tpu.edit.pipelines``.  Randomness
comes from ``results['rng']`` (a ``np.random.Generator``) so samples are
reproducible from (seed, index), unlike the reference's global
``np.random`` state.

Conventions follow the reference: ``alpha`` is uint8 [0, 255] HxW,
``trimap`` has values {0, 128, 255}, images are float32 [0, 255] HWC.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import List, Sequence, Tuple, Union

import numpy as np
import cv2

from vmg_tpu.edit.registry import PIPELINES


def _rng(results) -> np.random.Generator:
    return results.get("rng", np.random.default_rng())


def add_gaussian_noise(img, mu, sigma, rng=None):
    rng = rng or np.random.default_rng()
    img = img.astype(np.float32)
    noisy = img + rng.normal(mu, sigma, img.shape)
    return np.clip(noisy, 0, 255)


def adjust_gamma(image, gamma=1.0, gain=1.0):
    """Power-law transform, skimage semantics (reference
    pipelines/utils.py:56): scale by the dtype range, not the data range."""
    if np.any(image < 0):
        raise ValueError("gamma correction needs non-negative values")
    if gamma < 0:
        raise ValueError("gamma must be non-negative")
    dtype = image.dtype.type
    if np.issubdtype(dtype, np.integer):
        scale = float(np.iinfo(dtype).max)
    else:
        scale = 1.0
    out = ((image / scale) ** gamma) * scale * gain
    return out.astype(dtype)


def random_choose_unknown(unknown, crop_size, rng=None):
    """Random top-left point whose crop centers on an unknown pixel
    (reference pipelines/utils.py:92)."""
    rng = rng or np.random.default_rng()
    h, w = unknown.shape
    crop_h, crop_w = crop_size
    delta_h = center_h = crop_h // 2
    delta_w = center_w = crop_w // 2

    mask = np.zeros_like(unknown)
    mask[delta_h:h - delta_h, delta_w:w - delta_w] = 1
    if np.any(unknown & mask):
        center_h_list, center_w_list = np.where(unknown & mask)
    elif np.any(unknown):
        center_h_list, center_w_list = np.where(unknown)
    else:
        center_h_list, center_w_list = [center_h], [center_w]
    idx = int(rng.integers(len(center_h_list)))
    center_h, center_w = center_h_list[idx], center_w_list[idx]
    top = int(np.clip(center_h - delta_h, 0, h - crop_h))
    left = int(np.clip(center_w - delta_w, 0, w - crop_w))
    return top, left


@PIPELINES.register_module()
class MergeFgAndBg:
    """merged = fg * alpha + (1 - alpha) * bg (reference matting_aug.py:22)."""

    def __call__(self, results):
        alpha = results["alpha"][..., None].astype(np.float32) / 255.0
        results["merged"] = (results["fg"] * alpha
                             + (1.0 - alpha) * results["bg"])
        return results


@PIPELINES.register_module()
class GenerateTrimap:
    """Random erode/dilate trimap from alpha (reference matting_aug.py:51)."""

    def __init__(self, kernel_size, iterations=1, random=True):
        if isinstance(kernel_size, int):
            kernel_size = (kernel_size, kernel_size + 1)
        if isinstance(iterations, int):
            iterations = (iterations, iterations + 1)
        self.random = random
        self.iterations = tuple(iterations)
        if random:
            lo, hi = kernel_size
            self.kernels = [
                cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (s, s))
                for s in range(lo, hi)
            ]
        else:
            ek, dk = kernel_size
            self.kernels = [
                cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (ek, ek)),
                cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (dk, dk)),
            ]

    def __call__(self, results):
        rng = _rng(results)
        alpha = results["alpha"]
        if self.random:
            n = len(self.kernels)
            ei, di = int(rng.integers(n)), int(rng.integers(n))
            erode_iter = int(rng.integers(*self.iterations))
            dilate_iter = int(rng.integers(*self.iterations))
        else:
            ei, di = 0, 1
            erode_iter, dilate_iter = self.iterations
        eroded = cv2.erode(alpha, self.kernels[ei], iterations=erode_iter)
        dilated = cv2.dilate(alpha, self.kernels[di], iterations=dilate_iter)
        trimap = np.full_like(alpha, 128)
        trimap[eroded >= 255] = 255
        trimap[dilated <= 0] = 0
        results["trimap"] = trimap.astype(np.float32)
        return results


@PIPELINES.register_module()
class GenerateTrimapWithDistTransform:
    """Trimap via Euclidean distance to the unknown region
    (reference matting_aug.py:146)."""

    def __init__(self, dist_thr=20, random=True):
        if not (isinstance(dist_thr, int) and dist_thr >= 1):
            raise ValueError(f"dist_thr must be an int >= 1, got {dist_thr}")
        self.dist_thr = dist_thr
        self.random = random

    def __call__(self, results):
        rng = _rng(results)
        alpha = results["alpha"]
        known = (alpha == 0) | (alpha == 255)
        dist = cv2.distanceTransform(known.astype(np.uint8), cv2.DIST_L2,
                                     cv2.DIST_MASK_PRECISE)
        thr = int(rng.integers(1, self.dist_thr)) if self.random \
            else self.dist_thr
        unknown = dist <= thr
        trimap = (alpha == 255) * 255
        trimap[unknown] = 128
        results["trimap"] = trimap.astype(np.uint8)
        return results


@PIPELINES.register_module()
class CompositeFg:
    """With p=0.5 composite the fg with a random second (fg, alpha):
    fg' = a1*fg1 + (1-a1)*fg2; a' = 1 - (1-a1)(1-a2)
    (reference matting_aug.py:198)."""

    def __init__(self, fg_dirs, alpha_dirs, interpolation="nearest"):
        self.fg_dirs = fg_dirs if isinstance(fg_dirs, list) else [fg_dirs]
        self.alpha_dirs = (alpha_dirs if isinstance(alpha_dirs, list)
                           else [alpha_dirs])
        self.interpolation = interpolation
        self.fg_list, self.alpha_list = self._file_list(self.fg_dirs,
                                                        self.alpha_dirs)

    @staticmethod
    def _file_list(fg_dirs, alpha_dirs):
        fgs, alphas = [], []
        for fd, ad in zip(fg_dirs, alpha_dirs):
            f = sorted(os.listdir(fd))
            a = sorted(os.listdir(ad))
            if len(f) != len(a):
                raise ValueError(
                    f"{fd} and {ad} should have the same number of images")
            fgs += [osp.join(fd, x) for x in f]
            alphas += [osp.join(ad, x) for x in a]
        return fgs, alphas

    def _resize(self, img, w, h):
        interp = {"nearest": cv2.INTER_NEAREST, "bilinear": cv2.INTER_LINEAR,
                  "bicubic": cv2.INTER_CUBIC}[self.interpolation]
        return cv2.resize(img, (w, h), interpolation=interp)

    def __call__(self, results):
        rng = _rng(results)
        fg = results["fg"]
        alpha = results["alpha"].astype(np.float32) / 255.0
        h, w = fg.shape[:2]
        if rng.random() < 0.5:
            idx = int(rng.integers(len(self.fg_list)))
            fg2 = cv2.imread(self.fg_list[idx], cv2.IMREAD_COLOR)
            alpha2 = cv2.imread(self.alpha_list[idx], cv2.IMREAD_GRAYSCALE)
            alpha2 = alpha2.astype(np.float32) / 255.0
            fg2 = self._resize(fg2, w, h)
            alpha2 = self._resize(alpha2, w, h)
            alpha_tmp = 1.0 - (1.0 - alpha) * (1.0 - alpha2)
            if np.any(alpha_tmp < 1):
                fg = (fg.astype(np.float32) * alpha[..., None]
                      + fg2.astype(np.float32) * (1 - alpha[..., None]))
                alpha = alpha_tmp
        results["fg"] = fg
        results["alpha"] = (alpha * 255).astype(np.uint8)
        return results


@PIPELINES.register_module()
class GenerateSeg:
    """Binary seg mask from alpha: threshold, erode/dilate, random holes,
    blur (reference matting_aug.py:312)."""

    def __init__(self, kernel_size=5, erode_iter_range=(10, 20),
                 dilate_iter_range=(15, 30), num_holes_range=(0, 3),
                 hole_sizes=((15, 15), (25, 25), (35, 35), (45, 45)),
                 blur_ksizes=((21, 21), (31, 31), (41, 41))):
        self.kernel_size = kernel_size
        self.erode_iter_range = erode_iter_range
        self.dilate_iter_range = dilate_iter_range
        self.num_holes_range = num_holes_range
        self.hole_sizes = [tuple(h) for h in hole_sizes]
        self.blur_ksizes = [tuple(b) for b in blur_ksizes]

    @staticmethod
    def _crop_hole(img, start_point, hole_size):
        top, left = start_point
        bottom, right = top + hole_size[0], left + hole_size[1]
        h, w = img.shape[:2]
        if top < 0 or bottom > h or left < 0 or right > w:
            raise ValueError(
                f"crop area {(left, top, right, bottom)} exceeds {(h, w)}")
        img[top:bottom, left:right] = 0
        return img

    def __call__(self, results):
        rng = _rng(results)
        alpha = results["alpha"]
        trimap = results["trimap"]
        kernel = cv2.getStructuringElement(
            cv2.MORPH_ELLIPSE, (self.kernel_size, self.kernel_size))
        seg = (alpha > 0.5).astype(np.float32)
        seg = cv2.erode(seg, kernel,
                        iterations=int(rng.integers(*self.erode_iter_range)))
        seg = cv2.dilate(seg, kernel,
                         iterations=int(rng.integers(*self.dilate_iter_range)))
        num_holes = int(rng.integers(*self.num_holes_range))
        for _ in range(num_holes):
            hole_size = self.hole_sizes[int(rng.integers(len(self.hole_sizes)))]
            unknown = trimap == 128
            start = random_choose_unknown(unknown, hole_size, rng)
            seg = self._crop_hole(seg, start, hole_size)
            trimap = self._crop_hole(trimap, start, hole_size)
        seg = cv2.GaussianBlur(
            seg, self.blur_ksizes[int(rng.integers(len(self.blur_ksizes)))], 0)
        results["seg"] = seg.astype(np.uint8)
        results["num_holes"] = num_holes
        return results


@PIPELINES.register_module()
class PerturbBg:
    """Gaussian noise or gamma change on the background
    (reference matting_aug.py:420)."""

    def __init__(self, gamma_ratio=0.6):
        if not 0 <= gamma_ratio <= 1:
            raise ValueError(f"gamma_ratio must be in [0, 1], "
                             f"got {gamma_ratio}")
        self.gamma_ratio = gamma_ratio

    def __call__(self, results):
        rng = _rng(results)
        if rng.random() >= self.gamma_ratio:
            mu = int(rng.integers(-7, 7))
            sigma = int(rng.integers(2, 6))
            results["noisy_bg"] = add_gaussian_noise(results["bg"], mu,
                                                     sigma, rng)
        else:
            gamma = float(rng.normal(1, 0.12))
            results["noisy_bg"] = adjust_gamma(results["bg"], gamma)
        return results


@PIPELINES.register_module()
class GenerateSoftSeg:
    """Soften a binary seg mask: threshold, border pad, erode/dilate, blur
    (reference matting_aug.py:462)."""

    def __init__(self, fg_thr=0.2, border_width=25, erode_ksize=3,
                 dilate_ksize=5, erode_iter_range=(10, 20),
                 dilate_iter_range=(3, 7),
                 blur_ksizes=((21, 21), (31, 31), (41, 41))):
        self.fg_thr = fg_thr
        self.border_width = border_width
        self.erode_ksize = erode_ksize
        self.dilate_ksize = dilate_ksize
        self.erode_iter_range = erode_iter_range
        self.dilate_iter_range = dilate_iter_range
        self.blur_ksizes = [tuple(b) for b in blur_ksizes]

    def __call__(self, results):
        rng = _rng(results)
        seg = results["seg"].astype(np.float32) / 255
        height = seg.shape[0]
        seg[seg > self.fg_thr] = 1
        seg = cv2.copyMakeBorder(seg, 0, self.border_width, 0, 0,
                                 cv2.BORDER_REPLICATE)
        ek = cv2.getStructuringElement(
            cv2.MORPH_ELLIPSE, (self.erode_ksize, self.erode_ksize))
        dk = cv2.getStructuringElement(
            cv2.MORPH_ELLIPSE, (self.dilate_ksize, self.dilate_ksize))
        seg = cv2.erode(seg, ek,
                        iterations=int(rng.integers(*self.erode_iter_range)))
        seg = cv2.dilate(seg, dk,
                         iterations=int(rng.integers(*self.dilate_iter_range)))
        seg = cv2.GaussianBlur(
            seg, self.blur_ksizes[int(rng.integers(len(self.blur_ksizes)))], 0)
        seg = (seg * 255).astype(np.uint8)
        seg = seg[:height]
        results["soft_seg"] = seg
        return results


@PIPELINES.register_module()
class TransformTrimap:
    """Two-channel trimap + 6-channel Gaussian distance encoding (FBA
    matting; reference matting_aug.py:581)."""

    def __call__(self, results):
        trimap = results["trimap"]
        assert trimap.ndim == 2
        h, w = trimap.shape[:2]
        trimap2 = np.zeros((h, w, 2), dtype=np.uint8)
        trimap2[trimap == 0, 0] = 255
        trimap2[trimap == 255, 1] = 255
        trans = np.zeros((h, w, 6), dtype=np.float32)
        factor = np.array([[[0.02, 0.08, 0.16]]], dtype=np.float32)
        L = 320
        for k in range(2):
            if np.any(trimap2[:, :, k]):
                dt = -cv2.distanceTransform(255 - trimap2[:, :, k],
                                            cv2.DIST_L2, 0) ** 2
                trans[..., 3 * k:3 * k + 3] = np.exp(
                    dt[..., None] / (2 * ((factor * L) ** 2)))
        results["transformed_trimap"] = trans
        results["two_channel_trimap"] = trimap2
        return results
