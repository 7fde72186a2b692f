"""ctypes bindings to the native C++ ETL library (native/gcnrec.cpp).

Builds lazily with ``make -C native`` on first use if the shared library
is missing and a compiler is available; all callers degrade gracefully to
the numpy implementations when the build fails (pure-Python environments,
missing toolchain).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgcnrec.so")
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.gcnrec_kcore_filter.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.gcnrec_kcore_filter.restype = None
        lib.gcnrec_build_norm_edges.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.gcnrec_build_norm_edges.restype = ctypes.c_int64
        _lib = lib
    except Exception:
        _load_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def kcore_filter_native(
    users: np.ndarray, items: np.ndarray, k: int
) -> np.ndarray:
    """Native K-core keep-mask; raises if the library is unavailable."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    u = np.ascontiguousarray(users, dtype=np.int64)
    it = np.ascontiguousarray(items, dtype=np.int64)
    keep = np.empty(len(u), dtype=np.uint8)
    lib.gcnrec_kcore_filter(
        _ptr(u, ctypes.c_int64),
        _ptr(it, ctypes.c_int64),
        len(u),
        int(k),
        _ptr(keep, ctypes.c_uint8),
    )
    return keep.astype(bool)


def build_norm_edges_native(rows: np.ndarray, cols: np.ndarray, num_nodes: int):
    """Native dedup-sum + D^-1/2 A D^-1/2 + dst-major sort.

    Returns (dst, src, weight) with dtype (int32, int32, float32).
    Raises if the library is unavailable.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    r = np.ascontiguousarray(rows, dtype=np.int64)
    c = np.ascontiguousarray(cols, dtype=np.int64)
    n = len(r)
    out_dst = np.empty(n, dtype=np.int32)
    out_src = np.empty(n, dtype=np.int32)
    out_w = np.empty(n, dtype=np.float32)
    nnz = lib.gcnrec_build_norm_edges(
        _ptr(r, ctypes.c_int64),
        _ptr(c, ctypes.c_int64),
        n,
        int(num_nodes),
        _ptr(out_dst, ctypes.c_int32),
        _ptr(out_src, ctypes.c_int32),
        _ptr(out_w, ctypes.c_float),
    )
    return out_dst[:nnz], out_src[:nnz], out_w[:nnz]
