"""Native (C++) components, built on demand and loaded via ctypes.

The reference's runtime leans on native code (pycocotools' C RLE, CUDA
extensions). Compute kernels map to Pallas/XLA; host-side byte-crunching
(the RLE codec) lives here. `load_rle()` compiles `rle.cpp` with g++ on
first use (cached `librle.so`) and returns ctypes bindings, or None when no
toolchain is available — callers fall back to the numpy implementation.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build() -> str | None:
    src = os.path.join(_DIR, "rle.cpp")
    so = os.path.join(_DIR, "librle.so")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", src, "-o", so],
            check=True, capture_output=True, timeout=120,
        )
        return so
    except Exception:
        return None


def load_rle():
    """ctypes handle to the RLE codec, or None (numpy fallback)."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        i64 = ctypes.c_int64
        p_i64 = ctypes.POINTER(ctypes.c_int64)
        p_u8 = ctypes.POINTER(ctypes.c_uint8)
        lib.rle_from_string.restype = i64
        lib.rle_from_string.argtypes = [ctypes.c_char_p, i64, p_i64, i64]
        lib.rle_to_string.restype = i64
        lib.rle_to_string.argtypes = [p_i64, i64, ctypes.c_char_p, i64]
        lib.rle_to_mask.restype = None
        lib.rle_to_mask.argtypes = [p_i64, i64, i64, i64, p_u8]
        lib.mask_to_rle.restype = i64
        lib.mask_to_rle.argtypes = [p_u8, i64, i64, p_i64, i64]
        _LIB = lib
        return _LIB
