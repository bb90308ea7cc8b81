"""ctypes wrapper around the native multithreaded PNG batch decoder.

Builds ``native/fastpng.cpp`` on first use (g++ -O2 -shared, cached next to
the source); falls back cleanly when no toolchain is present — callers use
:func:`available` to pick between the native loader and PIL.

The native path decodes a whole file batch in parallel into one contiguous
(N, H, W, 3) uint8 buffer — the host-side feeding stage for device
transfers, replacing the reference's serial PIL loop (reference:
src/training/train_and_save_model.py:51-56,135).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "fastpng.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libfastpng.so")


def _build() -> Optional[str]:
    if os.path.exists(_SO) and (os.path.getmtime(_SO)
                                >= os.path.getmtime(_SRC)):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", _SO, "-lz", "-pthread"],
            check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        lib.fastpng_info.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_int),
                                     ctypes.POINTER(ctypes.c_int)]
        lib.fastpng_info.restype = ctypes.c_int
        lib.fastpng_decode_rgb.argtypes = [ctypes.c_char_p,
                                           ctypes.c_void_p,
                                           ctypes.c_int, ctypes.c_int]
        lib.fastpng_decode_rgb.restype = ctypes.c_int
        lib.fastpng_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.fastpng_load_batch.restype = ctypes.c_int
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def png_info(path) -> Tuple[int, int]:
    lib = _load()
    if lib is None:
        raise RuntimeError("fastpng native library unavailable")
    h, w = ctypes.c_int(), ctypes.c_int()
    rc = lib.fastpng_info(str(path).encode(), ctypes.byref(h),
                          ctypes.byref(w))
    if rc != 0:
        raise ValueError(f"fastpng_info({path}) failed with code {rc}")
    return h.value, w.value


def decode_rgb(path, h: int, w: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("fastpng native library unavailable")
    out = np.empty((h, w, 3), np.uint8)
    rc = lib.fastpng_decode_rgb(str(path).encode(),
                                out.ctypes.data_as(ctypes.c_void_p), h, w)
    if rc != 0:
        raise ValueError(f"fastpng_decode_rgb({path}) failed with code {rc}")
    return out


def load_batch_rgb(paths: List, h: int, w: int,
                   n_threads: Optional[int] = None) -> Tuple[np.ndarray, int]:
    """Decode a batch of equally-sized PNGs in parallel.

    Returns ((N, H, W, 3) uint8, n_failures); failed slots are zeroed.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("fastpng native library unavailable")
    n = len(paths)
    out = np.zeros((n, h, w, 3), np.uint8)
    if n == 0:
        return out, 0
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    nt = n_threads or min(os.cpu_count() or 1, 16)
    failures = lib.fastpng_load_batch(
        arr, n, out.ctypes.data_as(ctypes.c_void_p), h, w, nt)
    return out, int(failures)
