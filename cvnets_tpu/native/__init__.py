"""Native (C++) host-side data-path ops, bound via ctypes.

The TPU compute path is jax/XLA/Pallas; the host runtime around it is native
where it's hot: JPEG decode + crop + resize runs on a C++ thread pool over
libjpeg (decode.cpp), bypassing the per-sample PIL/GIL path. Built on demand
with g++ (no pybind11 in this image); import degrades gracefully to None when
the toolchain or libjpeg is unavailable, and callers fall back to PIL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "decode.cpp")
_SO = os.path.join(_DIR, "_decode.so")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _SO, "-ljpeg", "-lpthread",
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
        return proc.returncode == 0 and os.path.exists(_SO)
    except Exception:
        return False


def load_library():
    """Load (building if needed) the native decode library; None on failure."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.decode_crop_resize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        lib.decode_crop_resize_batch.restype = None
        lib.jpeg_dimensions.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.jpeg_dimensions.restype = ctypes.c_int
        lib.decode_rrc_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        lib.decode_rrc_batch.restype = None
        lib.jpeg_dimensions_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.jpeg_dimensions_batch.restype = None
        _LIB = lib
        return _LIB


def jpeg_dimensions(data: bytes) -> Optional[Tuple[int, int]]:
    """(width, height) from the JPEG header, or None."""
    lib = load_library()
    if lib is None:
        return None
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    ok = lib.jpeg_dimensions(data, len(data), ctypes.byref(w), ctypes.byref(h))
    return (w.value, h.value) if ok else None


def decode_crop_resize_batch(
    blobs: Sequence[bytes],
    crops: Optional[Sequence[Tuple[int, int, int, int]]],
    out_hw: Tuple[int, int],
    n_threads: int = 0,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Decode a batch of JPEGs with per-image crop (x, y, w, h; w<=0 = full
    image) resized to out_hw. Returns (images uint8 (N, H, W, 3), ok (N,) bool)
    or None when the native library is unavailable."""
    lib = load_library()
    if lib is None:
        return None
    n = len(blobs)
    h, w = int(out_hw[0]), int(out_hw[1])
    bufs = (ctypes.c_char_p * n)(*blobs)
    lens = (ctypes.c_size_t * n)(*[len(b) for b in blobs])
    if crops is None:
        crops = [(0, 0, -1, -1)] * n
    crop_arr = np.ascontiguousarray(np.asarray(crops, np.int32).reshape(-1))
    out = np.empty((n, h, w, 3), np.uint8)
    status = np.zeros((n,), np.int32)
    lib.decode_crop_resize_batch(
        ctypes.cast(bufs, ctypes.POINTER(ctypes.c_char_p)),
        lens, n,
        crop_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        int(n_threads),
    )
    return out, status.astype(bool)


def decode_rrc_batch(
    blobs: Sequence[bytes],
    crops: Sequence[Tuple[int, int, int, int]],
    flips: Optional[np.ndarray],
    out_hw: Tuple[int, int],
    out: Optional[np.ndarray] = None,
    n_threads: int = 0,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Batched decode + crop (x, y, w, h; w<=0 = full) + resize + optional
    horizontal flip, written directly into the collated uint8 batch ``out``
    (allocated when None). Only the crop region is IDCT'd (libjpeg-turbo
    jpeg_crop_scanline / jpeg_skip_scanlines). Returns (batch (N, H, W, 3)
    uint8, ok (N,) bool) or None when the native library is unavailable."""
    lib = load_library()
    if lib is None:
        return None
    n = len(blobs)
    h, w = int(out_hw[0]), int(out_hw[1])
    bufs = (ctypes.c_char_p * n)(*blobs)
    lens = (ctypes.c_size_t * n)(*[len(b) for b in blobs])
    crop_arr = np.ascontiguousarray(np.asarray(crops, np.int32).reshape(-1))
    if flips is None:
        flip_ptr = ctypes.cast(None, ctypes.POINTER(ctypes.c_uint8))
    else:
        flips = np.ascontiguousarray(np.asarray(flips, np.uint8))
        flip_ptr = flips.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    if out is None:
        out = np.empty((n, h, w, 3), np.uint8)
    status = np.zeros((n,), np.int32)
    lib.decode_rrc_batch(
        ctypes.cast(bufs, ctypes.POINTER(ctypes.c_char_p)),
        lens, n,
        crop_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        flip_ptr,
        h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        int(n_threads),
    )
    return out, status.astype(bool)


def jpeg_dimensions_batch(blobs: Sequence[bytes]) -> Optional[np.ndarray]:
    """(N, 2) int32 of (width, height) per blob (0, 0 on failure), or None."""
    lib = load_library()
    if lib is None:
        return None
    n = len(blobs)
    bufs = (ctypes.c_char_p * n)(*blobs)
    lens = (ctypes.c_size_t * n)(*[len(b) for b in blobs])
    ws = np.zeros((n,), np.int32)
    hs = np.zeros((n,), np.int32)
    lib.jpeg_dimensions_batch(
        ctypes.cast(bufs, ctypes.POINTER(ctypes.c_char_p)), lens, n,
        ws.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        hs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return np.stack([ws, hs], axis=1)
