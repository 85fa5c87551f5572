"""Native (C++) host runtime pieces, built on demand with the system
toolchain and bound via ctypes (no pybind11 in the image). Every native
entry point has a pure-numpy fallback — absence of a compiler degrades
performance, never correctness."""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    src = os.path.join(os.path.dirname(__file__), "fwht.cpp")
    cache_dir = os.path.join(tempfile.gettempdir(), "wanq_native")
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, "libwanq_fwht.so")
    if not (os.path.exists(so_path)
            and os.path.getmtime(so_path) >= os.path.getmtime(src)):
        cmd = ["c++", "-O3", "-march=native", "-shared", "-fPIC",
               "-o", so_path, src]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (subprocess.SubprocessError, FileNotFoundError) as e:
            logging.info("native fwht build unavailable (%s); numpy fallback", e)
            return None
    lib = ctypes.CDLL(so_path)
    lib.fwht_rows_f64.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
    ]
    lib.fwht_rows_f64.restype = None
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        try:
            _LIB = _build_and_load()
        except Exception as e:  # noqa: BLE001 — never break PTQ on build issues
            logging.info("native fwht disabled: %s", e)
            _LIB = None
    return _LIB


def fwht_rows_f64(x: np.ndarray, k: int) -> Optional[np.ndarray]:
    """In-place-style FWHT butterflies over the last axis of [rows, n] down
    to base order k (unnormalized). Returns the transformed array, or None
    when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.ascontiguousarray(x, dtype=np.float64).copy()
    rows, n = out.shape
    lib.fwht_rows_f64(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rows, n, k,
    )
    return out
