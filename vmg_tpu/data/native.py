"""ctypes bindings for the native clip-assembly library.

Builds ``native/libpackbatch.so`` on first use if the toolchain is present;
callers fall back to the pure-numpy path when unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_SO = os.path.join(_ROOT, "native", "libpackbatch.so")
_SRC = os.path.join(_ROOT, "native", "packbatch.cpp")

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
             _SRC, "-o", _SO],
            check=True, capture_output=True,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) and os.path.exists(_SRC):
        if not _build():
            return None
    if not os.path.exists(_SO):
        return None
    lib = ctypes.CDLL(_SO)
    i64 = ctypes.c_int64
    lib.assemble_clip.restype = ctypes.c_int
    lib.assemble_clip.argtypes = [
        ctypes.c_void_p, i64, i64, i64,
        ctypes.POINTER(i64), i64,
        i64, i64, i64, i64,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p,
    ]
    lib.assemble_batch.restype = ctypes.c_int
    lib.assemble_batch.argtypes = [
        ctypes.c_void_p, i64, i64, i64,
        ctypes.POINTER(i64), i64, i64,
        ctypes.POINTER(i64), i64, i64,
        ctypes.c_void_p,
    ]
    _lib = lib
    return _lib


def assemble_clip(mm: np.memmap, frame_shape, frame_indices, cy, cx, ch, cw,
                  hflip: bool, vflip: bool, rot90: bool) -> Optional[np.ndarray]:
    """Native fused gather+crop+aug+convert; None if the lib is missing."""
    lib = get_lib()
    if lib is None:
        return None
    H, W, C = frame_shape
    T = len(frame_indices)
    idx = np.ascontiguousarray(np.asarray(frame_indices, np.int64))
    out_h, out_w = (cw, ch) if rot90 else (ch, cw)
    out = np.empty((T, out_h, out_w, C), np.float32)
    rc = lib.assemble_clip(
        mm.ctypes.data if hasattr(mm, "ctypes") else
        ctypes.cast(mm, ctypes.c_void_p),
        H, W, C,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), T,
        cy, cx, ch, cw,
        int(hflip), int(vflip), int(rot90),
        out.ctypes.data,
    )
    if rc != 0:
        raise ValueError("assemble_clip: crop out of bounds")
    return out


def assemble_batch(mm: np.memmap, frame_shape, frame_indices: np.ndarray,
                   crops: np.ndarray, ch: int, cw: int) -> Optional[np.ndarray]:
    """Batched fused gather+crop+aug: B clips in one call (OpenMP over B).

    frame_indices: (B, T) int64; crops: (B, 4) int64 rows of
    (cy, cx, hflip | vflip<<1 | rot90<<2, 0).  Square crops required
    (ch == cw) so rot90 keeps the batch shape uniform.  Returns
    (B, T, ch, cw, C) float32, or None when the lib is missing.
    """
    lib = get_lib()
    if lib is None:
        return None
    assert ch == cw, "assemble_batch requires square crops"
    H, W, C = frame_shape
    idx = np.ascontiguousarray(np.asarray(frame_indices, np.int64))
    cr = np.ascontiguousarray(np.asarray(crops, np.int64))
    B, T = idx.shape
    assert cr.shape == (B, 4)
    out = np.empty((B, T, ch, cw, C), np.float32)
    rc = lib.assemble_batch(
        mm.ctypes.data if hasattr(mm, "ctypes") else
        ctypes.cast(mm, ctypes.c_void_p),
        H, W, C,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), B, T,
        cr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), ch, cw,
        out.ctypes.data,
    )
    if rc != 0:
        raise ValueError("assemble_batch: crop out of bounds")
    return out
