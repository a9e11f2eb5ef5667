"""ctypes bindings for the native (C++) data-plane components.

Builds lazily with g++ on first use (no pybind11 in the image; plain C ABI).
Falls back cleanly when a compiler is unavailable — callers must check
``is_available()``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libprefetch.so")
_lock = threading.Lock()
_lib = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    src = os.path.join(_HERE, "prefetch.cc")
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-pthread", src, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return None
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        return getattr(e, "stderr", str(e)) or str(e)


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return
        if not os.path.isfile(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(
                    os.path.join(_HERE, "prefetch.cc"))):
            err = _build()
            if err is not None:
                _build_error = err
                return
        lib = ctypes.CDLL(_SO)
        lib.prefetch_engine_create.restype = ctypes.c_void_p
        lib.prefetch_engine_create.argtypes = [ctypes.c_int]
        lib.prefetch_engine_destroy.argtypes = [ctypes.c_void_p]
        lib.prefetch_gather_submit.restype = ctypes.c_void_p
        lib.prefetch_gather_submit.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        lib.prefetch_gather_wait.argtypes = [ctypes.c_void_p]
        lib.prefetch_gather.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        _lib = lib


def is_available() -> bool:
    _load()
    return _lib is not None


class PrefetchEngine:
    """Threaded gather engine over a uint8 row-major array.

    ``gather(src, indices, out)`` copies ``src[indices]`` into ``out`` using
    the worker pool; ``submit``/``wait`` give the async form used by the
    double-buffered loader.
    """

    def __init__(self, num_threads: int = 0):
        _load()
        if _lib is None:
            raise RuntimeError(f"native prefetch unavailable: {_build_error}")
        if num_threads <= 0:
            num_threads = min(8, os.cpu_count() or 4)
        self._engine = _lib.prefetch_engine_create(num_threads)

    def __del__(self):
        if getattr(self, "_engine", None) and _lib is not None:
            _lib.prefetch_engine_destroy(self._engine)
            self._engine = None

    @staticmethod
    def _check(src: np.ndarray, indices: np.ndarray, out: np.ndarray):
        assert src.dtype == np.uint8 and out.dtype == np.uint8
        assert src.flags["C_CONTIGUOUS"] and out.flags["C_CONTIGUOUS"]
        assert indices.dtype == np.int64 and indices.flags["C_CONTIGUOUS"]
        row_bytes = int(np.prod(src.shape[1:]))
        assert out.shape[0] == indices.shape[0]
        assert int(np.prod(out.shape[1:])) == row_bytes
        return row_bytes

    def submit(self, src: np.ndarray, indices: np.ndarray, out: np.ndarray):
        row_bytes = self._check(src, indices, out)
        job = _lib.prefetch_gather_submit(
            self._engine,
            src.ctypes.data_as(ctypes.c_void_p), row_bytes,
            indices.ctypes.data_as(ctypes.c_void_p), len(indices),
            out.ctypes.data_as(ctypes.c_void_p))
        # Keep references alive until wait().
        return (job, src, indices, out)

    @staticmethod
    def wait(handle):
        job, _src, _idx, out = handle
        _lib.prefetch_gather_wait(job)
        return out

    def gather(self, src: np.ndarray, indices: np.ndarray,
               out: Optional[np.ndarray] = None) -> np.ndarray:
        if out is None:
            out = np.empty((len(indices),) + src.shape[1:], np.uint8)
        return self.wait(self.submit(src, indices, out))
