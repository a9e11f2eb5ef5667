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
    # Compile to a per-pid temp name and rename into place: concurrent
    # first-use builds (multi-process training) must never CDLL a
    # half-written .so, and os.rename is atomic on one filesystem.
    src = os.path.join(_HERE, "prefetch.cc")
    tmp = f"{_SO}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-pthread", src, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        os.replace(tmp, _SO)
        return None
    except (subprocess.CalledProcessError, FileNotFoundError, OSError) as e:
        try:
            os.unlink(tmp)
        except OSError:
            pass
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
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            # Corrupt/truncated .so (a build interrupted before the atomic
            # rename existed, or copied in broken): rebuild once, then give
            # up cleanly — is_available() must return False, not raise.
            err = _build()
            if err is not None:
                _build_error = err
                return
            try:
                lib = ctypes.CDLL(_SO)
            except OSError as e:
                _build_error = str(e)
                return
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
        # Real exceptions, not asserts: these guard raw C memcpy offsets —
        # under ``python -O`` an assert-stripped mismatch would read/write
        # out of bounds instead of raising.
        if src.dtype != np.uint8 or out.dtype != np.uint8:
            raise TypeError(f"src/out must be uint8, got {src.dtype}/{out.dtype}")
        if not (src.flags["C_CONTIGUOUS"] and out.flags["C_CONTIGUOUS"]):
            raise ValueError("src and out must be C-contiguous")
        if indices.dtype != np.int64 or not indices.flags["C_CONTIGUOUS"]:
            raise TypeError("indices must be C-contiguous int64")
        row_bytes = int(np.prod(src.shape[1:]))
        if out.shape[0] != indices.shape[0]:
            raise ValueError(f"out rows {out.shape[0]} != indices {indices.shape[0]}")
        if int(np.prod(out.shape[1:])) != row_bytes:
            raise ValueError(f"out row shape {out.shape[1:]} != src {src.shape[1:]}")
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


_engine_lock = threading.Lock()
_shared_engine: Optional[PrefetchEngine] = None


def shared_engine() -> PrefetchEngine:
    """The process-wide engine: loaders share ONE thread pool.

    A train+test loader pair (cli/common.py) would otherwise each spawn a
    mostly-idle 8-thread pool; only one loader gathers at a time, and the
    C++ job queue is mutex-protected, so sharing is safe.  Raises when the
    native library is unavailable — callers gate on ``is_available()``.
    """
    global _shared_engine
    with _engine_lock:
        if _shared_engine is None:
            _shared_engine = PrefetchEngine()
        return _shared_engine
