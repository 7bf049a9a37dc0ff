"""ctypes loader for the first-party C++ host kernels.

Builds `src/edsnet_native.cpp` with g++ on first use (cached in `build/`),
and exposes a small typed wrapper.  Every caller must tolerate ``load()``
returning None (pure-numpy fallbacks exist for all native paths).
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from pathlib import Path
from typing import List, Optional

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "src" / "edsnet_native.cpp"
_BUILD = _HERE / "build"

_lock = threading.Lock()
_cached: Optional["NativeLib"] = None
_failed = False


class NativeLib:
    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        lib.eds_knapsack.restype = ctypes.c_int64
        lib.eds_knapsack.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32, ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.eds_kts_dp.restype = None
        lib.eds_kts_dp.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32),
        ]

    def knapsack(self, values: np.ndarray, weights: np.ndarray,
                 capacity: int) -> List[int]:
        values = np.ascontiguousarray(values, dtype=np.int64)
        weights = np.ascontiguousarray(weights, dtype=np.int64)
        n = len(values)
        out = np.zeros(n, dtype=np.uint8)
        self._lib.eds_knapsack(
            values.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            weights.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int32(n), ctypes.c_int64(int(capacity)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return [int(i) for i in np.where(out == 1)[0]]

    def kts_dp(self, J: np.ndarray, m: int, lmin: int, lmax: int,
               backtrack: bool):
        J = np.ascontiguousarray(J, dtype=np.float64)
        n = J.shape[0]
        scores = np.zeros(m + 1, dtype=np.float64)
        path = np.zeros((m + 1, n + 1), dtype=np.int32)
        self._lib.eds_kts_dp(
            J.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_int32(n), ctypes.c_int32(m), ctypes.c_int32(lmin),
            ctypes.c_int32(min(lmax, 10 ** 9)), ctypes.c_int32(int(backtrack)),
            scores.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            path.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return scores, path


def _build() -> Optional[Path]:
    src_hash = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
    so_path = _BUILD / f"edsnet_native_{src_hash}.so"
    if so_path.exists():
        return so_path
    _BUILD.mkdir(exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           str(_SRC), "-o", str(so_path)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        return None
    return so_path


def load() -> Optional[NativeLib]:
    """Build (once) and load the native library; None if unavailable."""
    global _cached, _failed
    if _cached is not None:
        return _cached
    if _failed or os.environ.get("EDSNET_NO_NATIVE"):
        return None
    with _lock:
        if _cached is not None or _failed:
            return _cached
        so = _build()
        if so is None:
            _failed = True
            return None
        try:
            _cached = NativeLib(ctypes.CDLL(str(so)))
        except OSError:
            _failed = True
            return None
    return _cached
