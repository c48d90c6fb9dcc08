"""Pipeline-zoo tail: crop / loading / formatting / affine transforms
(reference ``mmedit/datasets/pipelines/``: crop.py, loading.py,
formating.py, the remaining augmentation.py classes).

Completes the declarative transform registry to the reference's surface.
Conventions follow ``vmg_tpu.edit.pipelines``: plain numpy HWC arrays in a
results dict, randomness from ``results['rng']``.  The tensor-formatting
shims (ToTensor / ImageToTensor / FramesToTensor) keep the reference's CHW
output contract for drop-in pipeline configs, producing numpy arrays (the
framework's models are channels-last; its native collate is
``FramesToArray``).
"""

from __future__ import annotations

import math
import os
import os.path as osp
from typing import Optional, Sequence

import numpy as np
import cv2

from vmg_tpu.edit.registry import PIPELINES
from vmg_tpu.edit.masks import (random_bbox, bbox2mask, irregular_mask,
                                brush_stroke_mask)
from vmg_tpu.edit.matting_aug import random_choose_unknown


def _rng(results) -> np.random.Generator:
    return results.get("rng", np.random.default_rng())


_INTERP = {"nearest": cv2.INTER_NEAREST, "bilinear": cv2.INTER_LINEAR,
           "bicubic": cv2.INTER_CUBIC, "area": cv2.INTER_AREA,
           "lanczos": cv2.INTER_LANCZOS4}


def imresize(img, size_wh, interpolation="bilinear"):
    """mmcv.imresize: size is (w, h)."""
    return cv2.resize(img, tuple(size_wh),
                      interpolation=_INTERP[interpolation])


# ---------------------------------------------------------------------------
# crop.py
# ---------------------------------------------------------------------------


@PIPELINES.register_module()
class Crop:
    """Random or center crop (reference crop.py:10)."""

    def __init__(self, keys, crop_size, random_crop=True):
        self.keys = keys
        self.crop_size = tuple(crop_size)
        self.random_crop = random_crop

    def _crop_one(self, item, rng):
        h, w = item.shape[:2]
        ch = min(h, self.crop_size[0])
        cw = min(w, self.crop_size[1])
        if self.random_crop:
            x = int(rng.integers(0, w - cw + 1))
            y = int(rng.integers(0, h - ch + 1))
        else:
            x = max(0, (w - cw)) // 2
            y = max(0, (h - ch)) // 2
        return item[y: y + ch, x: x + cw, ...], [x, y, cw, ch]

    def __call__(self, results):
        rng = _rng(results)
        for k in self.keys:
            data = results[k]
            if isinstance(data, list):
                out = [self._crop_one(d, rng) for d in data]
                results[k] = [o[0] for o in out]
                results[k + "_crop_bbox"] = [o[1] for o in out]
            else:
                results[k], results[k + "_crop_bbox"] = self._crop_one(
                    data, rng)
        results["crop_size"] = self.crop_size
        return results


@PIPELINES.register_module()
class FixedCrop:
    """Paired crop at a fixed (or once-random) position
    (reference crop.py:88)."""

    def __init__(self, keys, crop_size, crop_pos=None):
        self.keys = keys
        self.crop_size = tuple(crop_size)
        self.crop_pos = tuple(crop_pos) if crop_pos is not None else None

    def __call__(self, results):
        rng = _rng(results)
        h, w = results[self.keys[0]].shape[:2]
        ch, cw = self.crop_size
        if self.crop_pos is None:
            cw = min(w, cw)
            ch = min(h, ch)
            x = int(rng.integers(0, w - cw + 1))
            y = int(rng.integers(0, h - ch + 1))
        else:
            x, y = self.crop_pos
            cw = min(w - x, cw)
            ch = min(h - y, ch)
        for k in self.keys:
            if results[k].shape[0] != h or results[k].shape[1] != w:
                raise ValueError(
                    f"sizes must agree across keys, got {results[k].shape} "
                    f"vs ({h}, {w})")
            results[k] = results[k][y: y + ch, x: x + cw, ...]
            results[k + "_crop_bbox"] = [x, y, cw, ch]
        results["crop_size"] = self.crop_size
        results["crop_pos"] = self.crop_pos
        return results


@PIPELINES.register_module()
class CropAroundCenter:
    """GCA-matting crop: center an unknown pixel of the center 1/4 region
    (reference crop.py:242)."""

    def __init__(self, crop_size):
        if isinstance(crop_size, int):
            crop_size = (crop_size, crop_size)
        self.crop_size = tuple(crop_size)

    def __call__(self, results):
        rng = _rng(results)
        fg, alpha = results["fg"], results["alpha"]
        trimap, bg = results["trimap"], results["bg"]
        h, w = fg.shape[:2]
        crop_h, crop_w = self.crop_size
        ratio = max(crop_h / h, crop_w / w)
        if ratio > 1:
            nh = max(int(h * ratio), crop_h)
            nw = max(int(w * ratio), crop_w)
            fg = imresize(fg, (nw, nh), "nearest")
            alpha = imresize(alpha, (nw, nh), "nearest")
            trimap = imresize(trimap, (nw, nh), "nearest")
            bg = imresize(bg, (nw, nh), "bicubic")
            h, w = nh, nw

        small_trimap = imresize(trimap, (w // 4, h // 4), "nearest")
        mh, mw = crop_h // 2, crop_w // 2
        sample = small_trimap[mh // 4: (h - mh) // 4,
                              mw // 4: (w - mw) // 4]
        ys, xs = np.where(sample == 128)
        if len(ys) < 10:
            top = int(rng.integers(0, h - crop_h + 1))
            left = int(rng.integers(0, w - crop_w + 1))
        else:
            i = int(rng.integers(len(ys)))
            top, left = int(ys[i]) * 4, int(xs[i]) * 4
        bottom, right = top + crop_h, left + crop_w
        results["fg"] = fg[top:bottom, left:right]
        results["alpha"] = alpha[top:bottom, left:right]
        results["trimap"] = trimap[top:bottom, left:right]
        results["bg"] = bg[top:bottom, left:right]
        results["crop_bbox"] = (left, top, right, bottom)
        return results


@PIPELINES.register_module()
class CropAroundUnknown:
    """Crop with a random size so the top-left centers an unknown pixel
    (reference crop.py:330)."""

    def __init__(self, keys, crop_sizes, unknown_source="alpha",
                 interpolations="bilinear"):
        if "alpha" not in keys:
            raise ValueError(f'"alpha" must be in keys, got {keys}')
        if unknown_source not in ("alpha", "trimap"):
            raise ValueError(f"bad unknown_source {unknown_source}")
        if unknown_source not in keys:
            raise ValueError("unknown_source key must also be in keys")
        self.keys = keys
        self.crop_sizes = [(s, s) if isinstance(s, int) else tuple(s)
                           for s in crop_sizes]
        self.unknown_source = unknown_source
        self.interpolations = ([interpolations] * len(keys)
                               if isinstance(interpolations, str)
                               else list(interpolations))

    def __call__(self, results):
        rng = _rng(results)
        h, w = results[self.keys[0]].shape[:2]
        crop_h, crop_w = self.crop_sizes[int(rng.integers(
            len(self.crop_sizes)))]
        ratio = max(crop_h / h, crop_w / w)
        if ratio > 1:
            h = max(int(h * ratio), crop_h)
            w = max(int(w * ratio), crop_w)
            for k, interp in zip(self.keys, self.interpolations):
                results[k] = imresize(results[k], (w, h), interp)
        if self.unknown_source == "alpha":
            unknown = (results["alpha"] > 0) & (results["alpha"] < 255)
        else:
            unknown = results["trimap"] == 128
        top, left = random_choose_unknown(np.squeeze(unknown),
                                          (crop_h, crop_w), rng)
        bottom, right = top + crop_h, left + crop_w
        for k in self.keys:
            results[k] = results[k][top:bottom, left:right]
        results["crop_bbox"] = (left, top, right, bottom)
        return results


@PIPELINES.register_module()
class CropAroundFg:
    """Crop around the whole foreground of the seg mask with a random
    boundary ratio (reference crop.py:437)."""

    def __init__(self, keys, bd_ratio_range=(0.1, 0.4), test_mode=False):
        if "seg" not in keys:
            raise ValueError(f'"seg" must be in keys, got {keys}')
        self.keys = keys
        self.bd_ratio_range = bd_ratio_range
        self.test_mode = test_mode

    def __call__(self, results):
        rng = _rng(results)
        seg = results["seg"]
        height, width = seg.shape[:2]
        coor = np.array(np.where(seg))
        top, left = np.amin(coor, axis=1)
        bottom, right = np.amax(coor, axis=1)
        long_side = np.maximum(bottom - top, right - left)
        if self.test_mode:
            bottom = top + long_side
            right = left + long_side
        boundary = int(np.round(rng.uniform(*self.bd_ratio_range)
                                * long_side))
        top = max(top - boundary, 0)
        left = max(left - boundary, 0)
        bottom = min(bottom + boundary, height)
        right = min(right + boundary, width)
        for k in self.keys:
            results[k] = results[k][top:bottom, left:right]
        results["crop_bbox"] = (left, top, right, bottom)
        return results


@PIPELINES.register_module()
class ModCrop:
    """Crop gt to a multiple of scale (reference crop.py:503)."""

    def __call__(self, results):
        img = results["gt"].copy()
        scale = results["scale"]
        if img.ndim not in (2, 3):
            raise ValueError(f"wrong img ndim {img.ndim}")
        h, w = img.shape[:2]
        results["gt"] = img[: h - h % scale, : w - w % scale, ...]
        return results


@PIPELINES.register_module()
class CropLike:
    """Crop/zero-pad target to the reference key's spatial size
    (reference crop.py:536)."""

    def __init__(self, target_key, reference_key=None):
        assert reference_key and target_key
        self.target_key = target_key
        self.reference_key = reference_key

    def __call__(self, results):
        size = results[self.reference_key].shape
        old = results[self.target_key]
        new_size = size[:2] + old.shape[2:]
        h_cover = min(old.shape[0], size[0])
        w_cover = min(old.shape[1], size[1])
        out = np.zeros(new_size, old.dtype)
        out[:h_cover, :w_cover] = old[:h_cover, :w_cover]
        results[self.target_key] = out
        return results


# ---------------------------------------------------------------------------
# augmentation.py tail
# ---------------------------------------------------------------------------


@PIPELINES.register_module()
class Resize:
    """mmcv-style resize with scale / keep_ratio / size_factor / max_size
    (reference augmentation.py:13)."""

    def __init__(self, keys, scale=None, keep_ratio=False, size_factor=None,
                 max_size=None, interpolation="bilinear", output_keys=None):
        assert keys, "keys must not be empty"
        if output_keys:
            assert len(output_keys) == len(keys)
        else:
            output_keys = keys
        if size_factor:
            assert scale is None and not keep_ratio
        if max_size:
            assert size_factor is not None
        if isinstance(scale, (list, tuple)):
            scale = tuple(scale)
            if min(scale) == -1:
                scale = (np.inf, max(scale))
        self.keys = keys
        self.output_keys = output_keys
        self.scale = scale
        self.keep_ratio = keep_ratio
        self.size_factor = size_factor
        self.max_size = max_size
        self.interpolation = interpolation

    def _resize(self, img, scale):
        if self.keep_ratio:
            h, w = img.shape[:2]
            if isinstance(scale, (int, float)):
                factor = scale
            else:
                max_long, max_short = max(scale), min(scale)
                factor = min(max_long / max(h, w), max_short / min(h, w))
            nw, nh = int(w * factor + 0.5), int(h * factor + 0.5)
            out = imresize(img, (nw, nh), self.interpolation)
            self.scale_factor = factor
        else:
            if isinstance(scale, (int, float)):
                h, w = img.shape[:2]
                nw, nh = int(w * scale), int(h * scale)
            else:
                nh, nw = scale
            out = imresize(img, (nw, nh), self.interpolation)
            h, w = img.shape[:2]
            self.scale_factor = np.array((nw / w, nh / h), np.float32)
        return out

    def __call__(self, results):
        scale = self.scale
        if self.size_factor:
            h, w = results[self.keys[0]].shape[:2]
            nh = h - h % self.size_factor
            nw = w - w % self.size_factor
            if self.max_size:
                nh = min(nh, self.max_size - self.max_size % self.size_factor)
                nw = min(nw, self.max_size - self.max_size % self.size_factor)
            scale = (nh, nw)
        for k, ok in zip(self.keys, self.output_keys):
            img = self._resize(results[k], scale)
            if img.ndim == 2:
                img = img[..., None]
            results[ok] = img
        results["scale_factor"] = self.scale_factor
        results["keep_ratio"] = self.keep_ratio
        results["interpolation"] = self.interpolation
        return results


@PIPELINES.register_module()
class RandomAffine:
    """Affine warp with rotation/translate/scale/shear/flip (reference
    augmentation.py:283; GCA's data generator adds the flips)."""

    def __init__(self, keys, degrees, translate=None, scale=None, shear=None,
                 flip_ratio=None):
        self.keys = keys
        self.degrees = ((-degrees, degrees)
                        if isinstance(degrees, (int, float)) else degrees)
        self.translate = translate
        self.scale = scale
        self.shear = ((-shear, shear)
                      if isinstance(shear, (int, float)) else shear)
        self.flip_ratio = flip_ratio if flip_ratio is not None else 0.0

    @staticmethod
    def _get_params(degrees, translate, scale_ranges, shears, flip_ratio,
                    img_size, rng):
        angle = rng.uniform(degrees[0], degrees[1])
        if translate is not None:
            max_dx = translate[0] * img_size[0]
            max_dy = translate[1] * img_size[1]
            translations = (np.round(rng.uniform(-max_dx, max_dx)),
                            np.round(rng.uniform(-max_dy, max_dy)))
        else:
            translations = (0, 0)
        if scale_ranges is not None:
            scale = (rng.uniform(*scale_ranges), rng.uniform(*scale_ranges))
        else:
            scale = (1.0, 1.0)
        shear = rng.uniform(*shears) if shears is not None else 0.0
        flip = (rng.random(2) < flip_ratio).astype(np.int32) * 2 - 1
        return angle, translations, scale, shear, flip

    @staticmethod
    def _get_inverse_affine_matrix(center, angle, translate, scale, shear,
                                   flip):
        # M^-1 = C * RSS^-1 * C^-1 * T^-1 with per-axis scales and flips
        # (reference augmentation.py:405-456)
        angle = math.radians(angle)
        shear = math.radians(shear)
        scale_x = 1.0 / scale[0] * flip[0]
        scale_y = 1.0 / scale[1] * flip[1]
        d = (math.cos(angle + shear) * math.cos(angle)
             + math.sin(angle + shear) * math.sin(angle))
        matrix = [
            math.cos(angle) * scale_x,
            math.sin(angle + shear) * scale_x, 0,
            -math.sin(angle) * scale_y,
            math.cos(angle + shear) * scale_y, 0,
        ]
        matrix = [m / d for m in matrix]
        matrix[2] += matrix[0] * (-center[0] - translate[0]) + matrix[1] * (
            -center[1] - translate[1])
        matrix[5] += matrix[3] * (-center[0] - translate[0]) + matrix[4] * (
            -center[1] - translate[1])
        matrix[2] += center[0]
        matrix[5] += center[1]
        return matrix

    def __call__(self, results):
        rng = _rng(results)
        h, w = results[self.keys[0]].shape[:2]
        # small images: no rotation, to limit introduced dark area
        degrees = (0, 0) if np.maximum(h, w) < 1024 else self.degrees
        params = self._get_params(degrees, self.translate, self.scale,
                                  self.shear, self.flip_ratio, (h, w), rng)
        center = (w * 0.5 + 0.5, h * 0.5 + 0.5)
        M = np.array(self._get_inverse_affine_matrix(center, *params)
                     ).reshape(2, 3)
        for k in self.keys:
            results[k] = cv2.warpAffine(
                results[k], M, (w, h),
                flags=cv2.INTER_NEAREST + cv2.WARP_INVERSE_MAP)
        return results


@PIPELINES.register_module()
class RandomJitter:
    """HSV jitter of the foreground, adaptive to the image statistics
    (reference augmentation.py:497)."""

    def __init__(self, hue_range=40):
        self.hue_range = ((-hue_range, hue_range)
                          if isinstance(hue_range, (int, float))
                          else hue_range)

    def __call__(self, results):
        rng = _rng(results)
        fg, alpha = results["fg"], results["alpha"]
        fg = cv2.cvtColor(fg.astype(np.float32) / 255, cv2.COLOR_BGR2HSV)
        hue_jitter = int(rng.integers(self.hue_range[0], self.hue_range[1]))
        fg[:, :, 0] = np.remainder(fg[:, :, 0] + hue_jitter, 360)
        sat_mean = fg[:, :, 1][alpha > 0].mean()
        sat_jitter = (1.1 - sat_mean) * (rng.random() * 0.2 - 0.1)
        sat = np.abs(fg[:, :, 1] + sat_jitter)
        sat[sat > 1] = 2 - sat[sat > 1]
        fg[:, :, 1] = sat
        val_mean = fg[:, :, 2][alpha > 0].mean()
        val_jitter = (1.1 - val_mean) * (rng.random() * 0.2 - 0.1)
        val = np.abs(fg[:, :, 2] + val_jitter)
        val[val > 1] = 2 - val[val > 1]
        fg[:, :, 2] = val
        results["fg"] = cv2.cvtColor(fg, cv2.COLOR_HSV2BGR) * 255
        return results


@PIPELINES.register_module()
class BinarizeImage:
    """Threshold images (reference augmentation.py:567)."""

    def __init__(self, keys, binary_thr, to_int=False):
        self.keys = keys
        self.binary_thr = binary_thr
        self.to_int = to_int

    def __call__(self, results):
        t = np.int32 if self.to_int else np.float32
        for k in self.keys:
            results[k] = (results[k][..., :] > self.binary_thr).astype(t)
        return results


@PIPELINES.register_module()
class RandomMaskDilation:
    """Dilate masks with a random square kernel, then re-binarize
    (reference augmentation.py:612)."""

    def __init__(self, keys, binary_thr=0.0, kernel_min=9, kernel_max=49):
        self.keys = keys
        self.binary_thr = binary_thr
        self.kernel_min = kernel_min
        self.kernel_max = kernel_max

    def __call__(self, results):
        rng = _rng(results)
        for k in self.keys:
            ksize = int(rng.integers(self.kernel_min, self.kernel_max + 1))
            kernel = np.ones((ksize, ksize), np.uint8)
            img = cv2.dilate(results[k], kernel, iterations=1)
            img = (img > self.binary_thr).astype(np.float32)
            if img.ndim == 2:
                img = img[..., None]
            results[k] = img
            results[k + "_dilate_kernel_size"] = ksize
        return results


@PIPELINES.register_module()
class GenerateFrameIndiceswithPadding:
    """Frame index window around the current frame with boundary padding
    (reference augmentation.py:718)."""

    def __init__(self, padding, filename_tmpl="{:08d}"):
        if padding not in ("replicate", "reflection", "reflection_circle",
                           "circle"):
            raise ValueError(f"wrong padding mode {padding}")
        self.padding = padding
        self.filename_tmpl = filename_tmpl

    def __call__(self, results):
        clip_name, frame_name = results["key"].split(os.sep) \
            if os.sep in results["key"] else results["key"].split("/")
        current_idx = int(frame_name)
        max_frame_num = results["max_frame_num"] - 1
        num_input_frames = results["num_input_frames"]
        num_pad = num_input_frames // 2

        frame_list = []
        for i in range(current_idx - num_pad, current_idx + num_pad + 1):
            if i < 0:
                pad_idx = {"replicate": 0, "reflection": -i,
                           "reflection_circle": current_idx + num_pad - i,
                           "circle": num_input_frames + i}[self.padding]
            elif i > max_frame_num:
                pad_idx = {
                    "replicate": max_frame_num,
                    "reflection": max_frame_num * 2 - i,
                    "reflection_circle":
                        (current_idx - num_pad) - (i - max_frame_num),
                    "circle": i - num_input_frames}[self.padding]
            else:
                pad_idx = i
            frame_list.append(pad_idx)

        lq_root, gt_root = results["lq_path"], results["gt_path"]
        results["lq_path"] = [
            osp.join(lq_root, clip_name,
                     f"{self.filename_tmpl.format(i)}.png")
            for i in frame_list
        ]
        results["gt_path"] = [osp.join(gt_root, clip_name,
                                       f"{frame_name}.png")]
        return results


# ---------------------------------------------------------------------------
# loading.py
# ---------------------------------------------------------------------------


def _imread(path, flag="color", channel_order="bgr"):
    if flag == "grayscale":
        img = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
    elif flag == "unchanged":
        img = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
    else:
        img = cv2.imread(str(path), cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    if channel_order == "rgb" and img.ndim == 3 and img.shape[2] == 3:
        img = img[:, :, ::-1].copy()
    return img


@PIPELINES.register_module()
class LoadImageFromFile:
    """Load results[f'{key}_path'] -> results[key]
    (reference loading.py:13)."""

    def __init__(self, key="gt", flag="color", channel_order="bgr",
                 save_original_img=False, use_cache=False, **kwargs):
        self.key = key
        self.flag = flag
        self.channel_order = channel_order
        self.save_original_img = save_original_img
        self.use_cache = use_cache
        self.cache = {}

    def _load(self, path):
        if self.use_cache:
            if path not in self.cache:
                self.cache[path] = _imread(path, self.flag,
                                           self.channel_order)
            return self.cache[path]
        return _imread(path, self.flag, self.channel_order)

    def __call__(self, results):
        path = str(results[f"{self.key}_path"])
        img = self._load(path)
        results[self.key] = img
        results[f"{self.key}_path"] = path
        results[f"{self.key}_ori_shape"] = img.shape
        if self.save_original_img:
            results[f"ori_{self.key}"] = img.copy()
        return results


@PIPELINES.register_module()
class RandomLoadResizeBg:
    """Load a random background image resized to the fg size
    (reference loading.py:164)."""

    def __init__(self, bg_dir, flag="color", channel_order="bgr", **kwargs):
        self.bg_dir = bg_dir
        self.bg_list = sorted(os.listdir(bg_dir))
        self.flag = flag
        self.channel_order = channel_order

    def __call__(self, results):
        rng = _rng(results)
        h, w = results["fg"].shape[:2]
        idx = int(rng.integers(len(self.bg_list)))
        img = _imread(osp.join(self.bg_dir, self.bg_list[idx]), self.flag,
                      self.channel_order)
        results["bg"] = imresize(img, (w, h), "bicubic")
        return results


@PIPELINES.register_module()
class LoadMask:
    """Generate or load an inpainting hole mask (reference loading.py:219):
    modes bbox / irregular / ff / set / file."""

    def __init__(self, mask_mode="bbox", mask_config=None):
        self.mask_mode = mask_mode
        self.mask_config = dict(mask_config or {})
        if mask_mode == "set":
            self.mask_list = []
            with open(self.mask_config["mask_list_file"]) as f:
                for line in f:
                    name = line.strip().split(" ")[0]
                    self.mask_list.append(
                        osp.join(self.mask_config["prefix"], name))

    @staticmethod
    def _read_mask(path):
        mask = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
        if mask is None:
            raise FileNotFoundError(path)
        if mask.ndim == 2:
            mask = mask[..., None]
        else:
            mask = mask[:, :, 0:1]
        return (mask > 0).astype(np.float32)

    def __call__(self, results):
        rng = _rng(results)
        cfg = dict(self.mask_config)
        if self.mask_mode == "bbox":
            shape = cfg.pop("img_shape")
            bbox = random_bbox(shape, rng=rng, **{
                k: v for k, v in cfg.items()
                if k in ("max_bbox_shape", "max_bbox_delta", "min_margin")})
            results["mask_bbox"] = bbox
            mask = bbox2mask(shape, bbox)
        elif self.mask_mode == "irregular":
            shape = cfg.pop("img_shape")
            mask = irregular_mask(shape, rng=rng, **{
                k: v for k, v in cfg.items()
                if k in ("area_ratio_range", "num_vertices", "max_angle",
                         "length_range", "brush_width")})
        elif self.mask_mode == "ff":
            shape = cfg.pop("img_shape")
            mask = brush_stroke_mask(shape, rng=rng, **{
                k: v for k, v in cfg.items()
                if k in ("num_strokes", "num_vertices", "mean_angle",
                         "angle_range", "brush_width")})
        elif self.mask_mode == "set":
            mask = self._read_mask(
                self.mask_list[int(rng.integers(len(self.mask_list)))])
        elif self.mask_mode == "file":
            mask = self._read_mask(results["mask_path"])
        else:
            raise NotImplementedError(
                f"mask mode {self.mask_mode} not implemented")
        results["mask"] = mask
        return results


@PIPELINES.register_module()
class GetSpatialDiscountMask:
    """DeepFill spatial-discounting weights inside the hole bbox
    (reference loading.py:381)."""

    def __init__(self, gamma=0.99, beta=1.5):
        self.gamma = gamma
        self.beta = beta

    def spatial_discount_mask(self, mask_width, mask_height):
        w, h = np.meshgrid(np.arange(mask_width), np.arange(mask_height))
        grid = np.stack([h, w], axis=2)
        return (self.gamma ** (np.minimum(
            grid, [mask_height - 1, mask_width - 1] - grid)
            * self.beta)).max(axis=2, keepdims=True)

    def __call__(self, results):
        top, left, mask_height, mask_width = results["mask_bbox"]
        mask = results["mask"]
        hole = self.spatial_discount_mask(mask_width, mask_height)
        discount = np.zeros_like(mask)
        discount[top: top + mask_height, left: left + mask_width, ...] = hole
        results["discount_mask"] = discount
        return results


@PIPELINES.register_module()
class LoadPairedImageFromFile(LoadImageFromFile):
    """Load a horizontally concatenated pair and split into img_a / img_b
    (reference loading.py:447)."""

    def __call__(self, results):
        results = super().__call__(results)
        img = results[self.key]
        w = img.shape[1]
        if w % 2 != 0:
            raise ValueError(f"paired image width must be even, got {w}")
        new_w = w // 2
        img_a = img[:, :new_w]
        img_b = img[:, new_w:]
        for name, im in (("img_a", img_a), ("img_b", img_b)):
            results[name] = im
            results[f"{name}_path"] = results[f"{self.key}_path"]
            results[f"{name}_ori_shape"] = im.shape
            if self.save_original_img:
                results[f"ori_{name}"] = im.copy()
        return results


# ---------------------------------------------------------------------------
# formating.py
# ---------------------------------------------------------------------------


@PIPELINES.register_module()
class ToTensor:
    """Convert values to float32 numpy arrays (the framework's device
    feed; reference formating.py:33 makes torch tensors)."""

    def __init__(self, keys):
        self.keys = keys

    def __call__(self, results):
        for k in self.keys:
            results[k] = np.asarray(results[k], np.float32)
        return results


@PIPELINES.register_module()
class ImageToTensor:
    """HWC -> CHW float32 (reference formating.py:63 contract)."""

    def __init__(self, keys, to_float32=True):
        self.keys = keys
        self.to_float32 = to_float32

    def __call__(self, results):
        for k in self.keys:
            v = results[k]
            if v.ndim == 2:
                v = v[..., None]
            if self.to_float32:
                v = v.astype(np.float32)
            results[k] = v.transpose(2, 0, 1)
        return results


@PIPELINES.register_module()
class FramesToTensor(ImageToTensor):
    """list of HWC frames -> (T, C, H, W); singleton T squeezed
    (reference formating.py:101)."""

    def __call__(self, results):
        for k in self.keys:
            if not isinstance(results[k], list):
                raise TypeError(f'results["{k}"] should be a list')
            frames = []
            for v in results[k]:
                if v.ndim == 2:
                    v = v[..., None]
                if self.to_float32:
                    v = v.astype(np.float32)
                frames.append(v.transpose(2, 0, 1))
            out = np.stack(frames, axis=0)
            if out.shape[0] == 1:
                out = np.squeeze(out)
            results[k] = out
        return results


@PIPELINES.register_module()
class GetMaskedImage:
    """masked_img = img * (1 - mask) (reference formating.py:141)."""

    def __init__(self, img_name="gt_img", mask_name="mask"):
        self.img_name = img_name
        self.mask_name = mask_name

    def __call__(self, results):
        results["masked_img"] = (results[self.img_name]
                                 * (1.0 - results[self.mask_name]))
        return results


@PIPELINES.register_module()
class FormatTrimap:
    """{0,128,255} -> {0,1,2} labels, optionally one-hot (3,H,W)
    (reference formating.py:179)."""

    def __init__(self, to_onehot=False):
        self.to_onehot = to_onehot

    def __call__(self, results):
        trimap = np.squeeze(results["trimap"]).copy()
        trimap[trimap == 128] = 1
        trimap[trimap == 255] = 2
        if self.to_onehot:
            trimap = np.eye(3, dtype=np.float32)[trimap.astype(np.int64)]
            trimap = trimap.transpose(2, 0, 1)
        else:
            trimap = trimap[None, ...].astype(np.float32)
        results["trimap"] = trimap
        results["to_onehot"] = self.to_onehot
        return results
