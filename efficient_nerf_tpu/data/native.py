"""ctypes bindings for the native (C++) shard reader.

Builds runtime/libens_runtime.so on first use (g++, ~1s) and falls back
cleanly to the pure-numpy path when a toolchain is unavailable — gate with
`native_available()`. See runtime/shard_reader.cpp for the library.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

__all__ = ["native_available", "NativeShardReader"]

_RUNTIME_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "runtime")
_LIB_PATH = os.path.join(_RUNTIME_DIR, "libens_runtime.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB_PATH):
            src = os.path.join(_RUNTIME_DIR, "shard_reader.cpp")
            if not os.path.exists(src):
                _build_failed = True
                return None
            try:
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-fPIC", "-Wall", "-pthread",
                     "-shared", "-o", _LIB_PATH, src],
                    check=True, capture_output=True, timeout=120)
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.ens_reader_create.restype = ctypes.c_void_p
        lib.ens_reader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int]
        lib.ens_reader_destroy.argtypes = [ctypes.c_void_p]
        lib.ens_reader_num_shards.argtypes = [ctypes.c_void_p]
        lib.ens_reader_num_shards.restype = ctypes.c_int
        lib.ens_reader_load_batch.restype = ctypes.c_int
        lib.ens_reader_load_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        _lib = lib
        return _lib


def native_available() -> bool:
    if os.environ.get("EFFICIENT_NERF_TPU_NO_NATIVE"):
        return False
    return _load_lib() is not None


class NativeShardReader:
    """Parallel batch assembly of fixed-shape .npy shards.

    load_batch(indices) returns one contiguous [k*rows, cols] float32 array
    filled by the C++ thread pool.
    """

    def __init__(self, paths: Sequence[str], rows: int = 4096, cols: int = 9,
                 n_threads: int = 0):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self.rows, self.cols = rows, cols
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths])
        self._handle = lib.ens_reader_create(arr, len(paths), rows, cols,
                                             n_threads)
        self._paths: List[str] = list(paths)

    def __len__(self):
        return len(self._paths)

    def load_batch(self, indices: Sequence[int],
                   out: Optional[np.ndarray] = None) -> np.ndarray:
        k = len(indices)
        if out is None:
            out = np.empty((k * self.rows, self.cols), np.float32)
        assert out.shape == (k * self.rows, self.cols) and out.dtype == np.float32
        idx = (ctypes.c_int * k)(*indices)
        rc = self._lib.ens_reader_load_batch(
            self._handle, idx, k,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc != 0:
            raise IOError(f"native shard read failed (code {rc})")
        return out

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.ens_reader_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
