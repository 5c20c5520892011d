"""ctypes bindings for the native C++ data loader (with NumPy fallback).

The reference's runtime tier is C++ (file readers in the nodes, SURVEY.md
2.1); this package keeps that tier native: ``loader.cpp`` is compiled on
first use with the system toolchain into ``libsgtd_native.so``. When no
compiler is available the pure-NumPy readers in ``sgtd_tpu.io.readers`` are
used transparently — same results, no prefetching.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "loader.cpp")
_LIB = os.path.join(_DIR, "libsgtd_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on first use; None if
    unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        i64, f32p = ctypes.c_longlong, ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.sgtd_read_bin.restype = i64
        lib.sgtd_read_bin.argtypes = [ctypes.c_char_p, f32p, i64]
        lib.sgtd_read_label.restype = i64
        lib.sgtd_read_label.argtypes = [ctypes.c_char_p, i32p, i32p, i64]
        lib.sgtd_load_scan.restype = i64
        lib.sgtd_load_scan.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_float, f32p, i32p, i32p, i64,
        ]
        lib.sgtd_prefetch_open.restype = ctypes.c_void_p
        lib.sgtd_prefetch_open.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
            i64, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ]
        lib.sgtd_prefetch_get.restype = i64
        lib.sgtd_prefetch_get.argtypes = [
            ctypes.c_void_p, i64, f32p, i32p, i32p, i64,
        ]
        lib.sgtd_prefetch_close.restype = None
        lib.sgtd_prefetch_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def load_scan(
    bin_path: str,
    label_path: str | None = None,
    min_norm: float = 0.0,
    cap: int = 1 << 21,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fused scan+label load -> (xyz (N,3) f32, sem (N,) i32, inst (N,) i32).

    Uses the native loader when available, else the NumPy readers.
    """
    lib = get_lib()
    if lib is not None:
        xyz = np.empty((cap, 3), np.float32)
        sem = np.empty(cap, np.int32)
        inst = np.empty(cap, np.int32)
        n = lib.sgtd_load_scan(
            bin_path.encode(),
            (label_path or "").encode(),
            ctypes.c_float(min_norm * min_norm),
            xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            sem.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            inst.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cap,
        )
        if n >= 0:
            return xyz[:n].copy(), sem[:n].copy(), inst[:n].copy()
    # Fallback.
    from sgtd_tpu.io import readers

    pts = readers.read_bin(bin_path)
    xyz = pts[:, :3]
    if label_path:
        sem, inst = readers.read_label(label_path)
        n = min(len(xyz), len(sem))
        xyz, sem, inst = xyz[:n], sem[:n], inst[:n]
    else:
        sem = np.zeros(len(xyz), np.int32)
        inst = np.zeros(len(xyz), np.int32)
    if min_norm > 0:
        keep = np.sum(xyz * xyz, axis=1) >= min_norm * min_norm
        xyz, sem, inst = xyz[keep], sem[keep], inst[keep]
    return (
        np.ascontiguousarray(xyz, np.float32),
        sem.astype(np.int32),
        inst.astype(np.int32),
    )


class PrefetchingLoader:
    """Background-thread readahead over a scan list (native only; degrades
    to synchronous loads without the native library)."""

    def __init__(
        self,
        bin_paths: List[str],
        label_paths: List[str] | None = None,
        n_threads: int = 2,
        depth: int = 4,
        min_norm: float = 0.0,
        cap: int = 1 << 21,
    ):
        self._bins = list(bin_paths)
        self._labels = list(label_paths) if label_paths else None
        self._cap = cap
        self._min_norm = min_norm
        self._handle = None
        lib = get_lib()
        if lib is not None:
            n = len(self._bins)
            arr_b = (ctypes.c_char_p * n)(*[p.encode() for p in self._bins])
            arr_l = None
            if self._labels:
                arr_l = (ctypes.c_char_p * n)(*[p.encode() for p in self._labels])
            self._handle = lib.sgtd_prefetch_open(
                arr_b, arr_l, n, n_threads, depth, ctypes.c_float(min_norm * min_norm)
            )
            self._lib = lib
            # Keep the path buffers alive while the C++ side copies them at
            # open time only, so no further references needed.

    def __len__(self):
        return len(self._bins)

    def get(self, idx: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        if self._handle is not None:
            xyz = np.empty((self._cap, 3), np.float32)
            sem = np.empty(self._cap, np.int32)
            inst = np.empty(self._cap, np.int32)
            n = self._lib.sgtd_prefetch_get(
                self._handle,
                idx,
                xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                sem.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                inst.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                self._cap,
            )
            if n >= 0:
                return xyz[:n].copy(), sem[:n].copy(), inst[:n].copy()
        return load_scan(
            self._bins[idx],
            self._labels[idx] if self._labels else None,
            self._min_norm,
            self._cap,
        )

    def close(self):
        if self._handle is not None:
            self._lib.sgtd_prefetch_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
