"""ctypes bindings for the native host runtime (`spgan_native.cpp`).

Builds the shared library with g++ on first import if it is missing (the
image bakes the toolchain; no pip). Every entry point has a numpy fallback so
the framework works even without a compiler — `HAS_NATIVE` reports which path
is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "spgan_native.cpp")
_LIB = os.path.join(_DIR, "libspgan_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
HAS_NATIVE = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", _LIB, _SRC, "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, HAS_NATIVE
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.spgan_parse_xyz.restype = ctypes.c_int64
        lib.spgan_parse_xyz.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int32]
        lib.spgan_assemble_batch.restype = None
        lib.spgan_assemble_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_uint64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float)]
        lib.spgan_save_xyz.restype = ctypes.c_int64
        lib.spgan_save_xyz.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int32]
        _lib = lib
        HAS_NATIVE = True
        return lib


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def parse_xyz(path: str, max_rows: int = 1 << 22, cols: int = 3) -> np.ndarray:
    """Fast whitespace-float parser for .xyz files -> [rows, cols] float32."""
    lib = _load()
    if lib is None:
        return np.loadtxt(path).astype(np.float32)[:, :cols]
    out = np.empty((max_rows, cols), np.float32)
    n = lib.spgan_parse_xyz(path.encode(), _fp(out), max_rows, cols)
    if n < 0:
        raise FileNotFoundError(path)
    return out[:n].copy()


def assemble_batch(data: np.ndarray, idx: np.ndarray, seed: int,
                   n_threads: int = 4) -> np.ndarray:
    """Gather data[idx] with independent per-item point-order shuffles.

    data: [M, N, 3] float32 (C-contiguous), idx: [bs] int64 -> [bs, N, 3].
    The native path runs the Fisher-Yates shuffles on C++ threads; the numpy
    fallback matches semantics (different permutations, same distribution).
    """
    data = np.ascontiguousarray(data, np.float32)
    idx = np.ascontiguousarray(idx, np.int64)
    bs, n_points = len(idx), data.shape[1]
    lib = _load()
    out = np.empty((bs, n_points, 3), np.float32)
    if lib is None:
        rng = np.random.default_rng(seed)
        for i, j in enumerate(idx):
            perm = rng.permutation(n_points)
            out[i] = data[j][perm]
        return out
    lib.spgan_assemble_batch(
        _fp(data), data.shape[0], n_points,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), bs,
        ctypes.c_uint64(seed if seed else 1), n_threads, _fp(out))
    return out


def save_xyz_fast(path: str, pc: np.ndarray) -> int:
    lib = _load()
    pc = np.ascontiguousarray(pc, np.float32)
    if lib is None:
        np.savetxt(path, pc, fmt="%.6f")
        return len(pc)
    return lib.spgan_save_xyz(path.encode(), _fp(pc), pc.shape[0], pc.shape[1])
