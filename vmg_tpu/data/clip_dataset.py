"""Training clip datasets (reference ``data/REDS.py``, ``data/Vimeo.py``).

Same sampling semantics -- random T-frame window from each clip, optional
temporal reverse, paired LR/HR random crop, hflip/vflip/rot90, optional
mirror extension -- but with *stateless* randomness: every sample's
augmentation is drawn from a generator seeded by (seed, epoch, index).
That replaces the reference's process-global numpy/random seeding
(``data/REDS.py:67-74``) and makes multi-host loading reproducible and
resumable by construction.

Output is channels-last float32 RGB: {'LRs': (T, h, w, 3),
'HRs': (T, 4h, 4w, 3), 'key': str}.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from vmg_tpu.configs.config import DatasetConfig
from vmg_tpu.data.storage import open_backend, detect_backend


class ClipDatasetBase:
    def __init__(self, cfg: DatasetConfig, scale: int = 4):
        self.cfg = cfg
        self.scale = scale
        self.num_frames = cfg.num_frames
        self.hr_crop = cfg.crop_size
        self.lr_crop = cfg.crop_size // scale
        hr_shape = (cfg.image_shape[1], cfg.image_shape[2], cfg.image_shape[0])
        lr_shape = (cfg.image_shape[1] // scale, cfg.image_shape[2] // scale,
                    cfg.image_shape[0])
        kind = detect_backend(cfg.dataroot_HR)
        self.hr = open_backend(kind, cfg.dataroot_HR, hr_shape, cfg.cache_keys)
        self.lr = open_backend(kind, cfg.dataroot_LR, lr_shape, cfg.cache_keys)
        self.keys = self._load_keys()
        assert self.keys, "empty clip key list"
        self.epoch = 0

    def _load_keys(self) -> List[str]:
        if self.cfg.cache_keys:
            import pickle

            with open(self.cfg.cache_keys, "rb") as f:
                return list(pickle.load(f)["keys"])
        return list(self.hr.keys)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        return len(self.keys)

    def _rng(self, index: int) -> np.random.Generator:
        seed = (self.cfg.pre_seed or 0, self.epoch, index)
        return np.random.default_rng(np.random.SeedSequence(seed))

    def _augment(self, rng, lr_list, hr_list):
        hflip = self.cfg.use_hflip and rng.random() < 0.5
        vflip = self.cfg.use_vflip and rng.random() < 0.5
        rot90 = self.cfg.use_rot and rng.random() < 0.5

        def aug(img):
            if hflip:
                img = img[:, ::-1]
            if vflip:
                img = img[::-1]
            if rot90:
                img = img.transpose(1, 0, 2)
            return img

        return [aug(v) for v in lr_list], [aug(v) for v in hr_list]

    def _crop_pair(self, rng, lr_list, hr_list):
        H, W = lr_list[0].shape[:2]
        rnd_h = int(rng.integers(0, max(0, H - self.lr_crop) + 1))
        rnd_w = int(rng.integers(0, max(0, W - self.lr_crop) + 1))
        lr_list = [v[rnd_h : rnd_h + self.lr_crop, rnd_w : rnd_w + self.lr_crop]
                   for v in lr_list]
        hh, hw = rnd_h * self.scale, rnd_w * self.scale
        hr_list = [v[hh : hh + self.hr_crop, hw : hw + self.hr_crop]
                   for v in hr_list]
        return lr_list, hr_list

    def _finalize(self, rng, lr_list, hr_list, key) -> Dict:
        lr_list, hr_list = self._crop_pair(rng, lr_list, hr_list)
        lr_list, hr_list = self._augment(rng, lr_list, hr_list)
        if self.cfg.use_mirrors:
            lr_list = lr_list + lr_list[::-1]
            hr_list = hr_list + hr_list[::-1]
        return {
            "LRs": np.ascontiguousarray(np.stack(lr_list, 0)),
            "HRs": np.ascontiguousarray(np.stack(hr_list, 0)),
            "key": key,
        }


class REDSDataset(ClipDatasetBase):
    """Random T-frame window out of 100-frame REDS clips
    (reference data/REDS.py:143-215).

    When both backends are packed shards and the native library is built,
    the gather+crop+augment+float-convert runs as one fused C++ pass
    (vmg_tpu/data/native.py); the numpy path is the bit-identical fallback.
    """

    use_native: bool = True

    def __getitem__(self, index: int) -> Dict:
        rng = self._rng(index)
        key = self.keys[index]
        frames = self._sample_frames(rng)

        native = self._try_native(rng, key, frames)
        if native is not None:
            return native

        hr_list = [self.hr.read(f"{key}_{v}") for v in frames]
        lr_list = [self.lr.read(f"{key}_{v}") for v in frames]
        return self._finalize(rng, lr_list, hr_list, key)

    def _native_available(self) -> bool:
        from vmg_tpu.data.storage import PackedBackend

        if not (self.use_native and isinstance(self.hr, PackedBackend)
                and isinstance(self.lr, PackedBackend)):
            return False
        from vmg_tpu.data import native as natmod

        return natmod.get_lib() is not None

    def _sample_frames(self, rng) -> List[int]:
        total = self.cfg.total_num_frames
        start = int(rng.integers(0, total - self.num_frames + 1))
        frames = list(range(start, start + self.num_frames))
        if self.cfg.random_reverse and rng.random() < 0.5:
            frames.reverse()
        return frames

    def _native_plan(self, rng, key, frames):
        """(lr_idx, hr_idx, cy, cx, flags) with the SAME rng draw order as
        the numpy path: crop (2 ints), then hflip/vflip/rot (3 floats)."""
        H, W = self.lr.frame_shape[:2]
        rnd_h = int(rng.integers(0, max(0, H - self.lr_crop) + 1))
        rnd_w = int(rng.integers(0, max(0, W - self.lr_crop) + 1))
        hflip = self.cfg.use_hflip and rng.random() < 0.5
        vflip = self.cfg.use_vflip and rng.random() < 0.5
        rot90 = self.cfg.use_rot and rng.random() < 0.5
        flags = int(hflip) | (int(vflip) << 1) | (int(rot90) << 2)
        lr_idx = [self.lr.index[f"{key}_{v}"] for v in frames]
        hr_idx = [self.hr.index[f"{key}_{v}"] for v in frames]
        return lr_idx, hr_idx, rnd_h, rnd_w, flags

    def _try_native(self, rng, key, frames) -> Optional[Dict]:
        if not self._native_available():
            return None
        from vmg_tpu.data import native as natmod

        lr_idx, hr_idx, rnd_h, rnd_w, flags = self._native_plan(rng, key, frames)
        hflip, vflip, rot90 = flags & 1, (flags >> 1) & 1, (flags >> 2) & 1
        lrs = natmod.assemble_clip(
            self.lr._mm, self.lr.frame_shape, lr_idx, rnd_h, rnd_w,
            self.lr_crop, self.lr_crop, hflip, vflip, rot90,
        )
        hrs = natmod.assemble_clip(
            self.hr._mm, self.hr.frame_shape, hr_idx,
            rnd_h * self.scale, rnd_w * self.scale,
            self.hr_crop, self.hr_crop, hflip, vflip, rot90,
        )
        if self.cfg.use_mirrors:
            lrs = np.concatenate([lrs, lrs[::-1]], axis=0)
            hrs = np.concatenate([hrs, hrs[::-1]], axis=0)
        return {"LRs": lrs, "HRs": hrs, "key": key}

    def get_batch(self, indices) -> Optional[Dict]:
        """Assemble a whole batch in ONE native call per shard
        (``assemble_batch``, OpenMP over clips) -- bit-identical to
        stacking per-clip samples.  None -> caller falls back."""
        if not self._native_available():
            return None
        from vmg_tpu.data import native as natmod

        B = len(indices)
        T = self.num_frames
        lr_idx = np.empty((B, T), np.int64)
        hr_idx = np.empty((B, T), np.int64)
        lr_crops = np.zeros((B, 4), np.int64)
        hr_crops = np.zeros((B, 4), np.int64)
        keys = []
        for b, index in enumerate(indices):
            rng = self._rng(index)
            key = self.keys[index]
            frames = self._sample_frames(rng)
            li, hi, cy, cx, flags = self._native_plan(rng, key, frames)
            lr_idx[b], hr_idx[b] = li, hi
            lr_crops[b] = (cy, cx, flags, 0)
            hr_crops[b] = (cy * self.scale, cx * self.scale, flags, 0)
            keys.append(key)
        lrs = natmod.assemble_batch(self.lr._mm, self.lr.frame_shape,
                                    lr_idx, lr_crops, self.lr_crop,
                                    self.lr_crop)
        hrs = natmod.assemble_batch(self.hr._mm, self.hr.frame_shape,
                                    hr_idx, hr_crops, self.hr_crop,
                                    self.hr_crop)
        if self.cfg.use_mirrors:
            lrs = np.concatenate([lrs, lrs[:, ::-1]], axis=1)
            hrs = np.concatenate([hrs, hrs[:, ::-1]], axis=1)
        return {"LRs": lrs, "HRs": hrs, "keys": keys}


class VimeoDataset(ClipDatasetBase):
    """Vimeo-90K septuplets (reference data/Vimeo.py:140-209); frames are
    1-indexed im1..im7."""

    def __getitem__(self, index: int) -> Dict:
        rng = self._rng(index)
        key = self.keys[index]
        frames = list(range(1, self.num_frames + 1))
        if self.cfg.random_reverse and rng.random() < 0.5:
            frames.reverse()
        hr_list = [self.hr.read(f"{key}_{v}") for v in frames]
        lr_list = [self.lr.read(f"{key}_{v}") for v in frames]
        return self._finalize(rng, lr_list, hr_list, key)


def create_dataset(cfg: DatasetConfig, scale: int = 4) -> ClipDatasetBase:
    if cfg.name == "Vimeo90k_septuplet":
        return VimeoDataset(cfg, scale)
    if cfg.name == "REDS":
        return REDSDataset(cfg, scale)
    raise NotImplementedError(f"Dataset {cfg.name!r} is not recognized")


class RepeatDataset:
    """Virtually repeat a dataset N times (reference
    mmedit/datasets/dataset_wrappers.py RepeatDataset)."""

    def __init__(self, dataset, times: int):
        self.dataset = dataset
        self.times = times

    def set_epoch(self, epoch: int):
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __getitem__(self, idx):
        return self.dataset[idx % len(self.dataset)]

    def __len__(self):
        return self.times * len(self.dataset)
