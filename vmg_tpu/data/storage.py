"""Frame storage backends.

The reference reads raw BGR frames out of LMDB shards
(``data/REDS.py:76-122``).  This rebuild supports three backends:

  * ``packed`` -- vmg_tpu's native format: one flat ``data.bin`` of raw
    uint8 HWC frames plus a JSON index, read through ``np.memmap``.  Zero
    per-sample decode work and pure sequential I/O: the right shape for
    feeding a TPU from host RAM / NVMe.  Written by :class:`PackedWriter`
    (see ``tools/prepare_data.py``).
  * ``lmdb``   -- reads the reference's own LMDB shards (gated on the
    ``lmdb`` package being present) including their ``*_keys.pkl``.
  * ``img``    -- PNG/JPEG folder trees via cv2 (prep-free but slow).

All backends return float32 RGB HWC in [0, 1].
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Dict, List, Optional, Tuple

import numpy as np

try:
    import lmdb  # type: ignore

    _HAS_LMDB = True
except Exception:  # pragma: no cover
    _HAS_LMDB = False

import cv2


class PackedBackend:
    """vmg_tpu native packed frames: meta.json + data.bin (raw uint8 HWC)."""

    def __init__(self, root: str):
        with open(os.path.join(root, "meta.json")) as f:
            self.meta = json.load(f)
        self.frame_shape = tuple(self.meta["frame_shape"])  # (H, W, C)
        self.index: Dict[str, int] = self.meta["index"]  # key -> frame idx
        nbytes = int(np.prod(self.frame_shape))
        self._mm = np.memmap(os.path.join(root, "data.bin"), dtype=np.uint8,
                             mode="r")
        self._frame_bytes = nbytes

    @property
    def keys(self) -> List[str]:
        return self.meta["clip_keys"]

    def read(self, key: str) -> np.ndarray:
        idx = self.index[key]
        off = idx * self._frame_bytes
        raw = self._mm[off : off + self._frame_bytes]
        img = raw.reshape(self.frame_shape)
        return img.astype(np.float32) / 255.0


class PackedWriter:
    """Builds a packed shard: frames are stored in insertion order."""

    def __init__(self, root: str, frame_shape: Tuple[int, int, int]):
        os.makedirs(root, exist_ok=True)
        self.root = root
        self.frame_shape = tuple(frame_shape)
        self._f = open(os.path.join(root, "data.bin"), "wb")
        self.index: Dict[str, int] = {}
        self.clip_keys: List[str] = []
        self._n = 0

    def add(self, key: str, img_uint8: np.ndarray, clip_key: Optional[str] = None):
        assert img_uint8.dtype == np.uint8 and img_uint8.shape == self.frame_shape
        self._f.write(img_uint8.tobytes())
        self.index[key] = self._n
        self._n += 1
        if clip_key and (not self.clip_keys or self.clip_keys[-1] != clip_key):
            self.clip_keys.append(clip_key)

    def close(self):
        self._f.close()
        with open(os.path.join(self.root, "meta.json"), "w") as f:
            json.dump(
                {
                    "frame_shape": self.frame_shape,
                    "index": self.index,
                    "clip_keys": self.clip_keys,
                    "num_frames": self._n,
                },
                f,
            )


class LmdbBackend:
    """Reads the reference's LMDB shards (BGR uint8 raw frames)."""

    def __init__(self, root: str, frame_shape: Tuple[int, int, int],
                 keys_pkl: Optional[str] = None):
        if not _HAS_LMDB:
            raise RuntimeError("lmdb python package not available")
        self.root = root
        self.frame_shape = frame_shape  # (H, W, C)
        self._env = None
        self._keys: Optional[List[str]] = None
        if keys_pkl:
            with open(keys_pkl, "rb") as f:
                self._keys = list(pickle.load(f)["keys"])

    def _ensure(self):
        if self._env is None:  # lazy per-worker open, as the reference does
            self._env = lmdb.open(self.root, readonly=True, lock=False,
                                  readahead=False, meminit=False)

    @property
    def keys(self) -> List[str]:
        return self._keys or []

    def read(self, key: str) -> np.ndarray:
        self._ensure()
        with self._env.begin(write=False) as txn:
            buf = txn.get(key.encode("ascii"))
        H, W, C = self.frame_shape
        img = np.frombuffer(buf, dtype=np.uint8).reshape(H, W, C)
        # stored BGR -> return RGB
        return img[:, :, ::-1].astype(np.float32) / 255.0


class ImageFolderBackend:
    """PNG tree: read(key) where key is a relative path sans extension."""

    def __init__(self, root: str, ext: str = ".png"):
        self.root = root
        self.ext = ext

    @property
    def keys(self) -> List[str]:
        return sorted(
            d for d in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, d))
        )

    def read(self, key: str) -> np.ndarray:
        path = os.path.join(self.root, key + self.ext)
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if img is None:
            raise FileNotFoundError(path)
        if img.ndim == 2:
            img = img[:, :, None].repeat(3, 2)
        img = img[:, :, :3][:, :, ::-1]  # BGR -> RGB
        return img.astype(np.float32) / 255.0


def open_backend(kind: str, root: str, frame_shape=None, keys_pkl=None):
    if kind == "packed":
        return PackedBackend(root)
    if kind == "lmdb":
        return LmdbBackend(root, frame_shape, keys_pkl)
    if kind == "img":
        return ImageFolderBackend(root)
    raise ValueError(f"unknown backend {kind!r}")


def detect_backend(root: str) -> str:
    if root.endswith(".lmdb"):
        return "lmdb"
    if os.path.exists(os.path.join(root, "meta.json")):
        return "packed"
    return "img"
