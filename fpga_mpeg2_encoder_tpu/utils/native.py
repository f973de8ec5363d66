"""ctypes bindings for the native host components (native/bitstitch.cpp).

The library is built on demand with g++ (no pip/pybind11 dependency); every entry
point has a NumPy fallback so the framework works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "native", "bitstitch.cpp")
_LIB = os.path.join(_ROOT, "native", "libbitstitch.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_LIB)
            lib.bitstitch_pack.restype = ctypes.c_int64
            lib.bitstitch_pack.argtypes = [
                ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8)]
            lib.bitstitch_finish.restype = ctypes.c_int64
            lib.bitstitch_finish.argtypes = [ctypes.POINTER(ctypes.c_uint8),
                                             ctypes.c_int64]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def pack_symbols_host(codes: np.ndarray, lens: np.ndarray,
                      align_mask: Optional[np.ndarray] = None
                      ) -> Tuple[bytes, int]:
    """Pack (code, len) symbol arrays into bytes on the host.

    Uses the C++ stitcher when available, NumPy-assisted Python otherwise.
    Returns (byte-aligned bytes, exact bit length)."""
    codes = np.ascontiguousarray(codes, np.uint32)
    lens = np.ascontiguousarray(lens, np.int32)
    n = codes.shape[0]
    lib = _load()
    if lib is not None:
        out = np.zeros(int(lens.clip(min=0).sum()) // 8 + 16 + n, np.uint8)
        am = None if align_mask is None else np.ascontiguousarray(align_mask, np.uint8)
        bits = lib.bitstitch_pack(
            codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            None if am is None else am.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out[:(bits + 7) // 8].tobytes(), int(bits)
    # fallback: pure Python
    from ..core.bitstream import BitWriter
    bw = BitWriter()
    for i in range(n):
        if align_mask is not None and align_mask[i]:
            bw.align()
        bw.put(int(codes[i]), int(lens[i]))
    bits = bw.bit_length
    return bw.to_bytes_aligned(), bits
