"""ctypes bindings for the native SPSC frame ring (framering.cpp).

Builds the shared library on first import if g++ is available (no pybind11
in this image; plain C ABI + ctypes per the environment's constraints).
Falls back cleanly: callers check ``native_available()`` and use a Python
queue otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
import time

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "framering.cpp")
_LIB = os.path.join(_DIR, "libframering.so")

_lib = None
_lock = threading.Lock()


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.ring_create.restype = ctypes.c_void_p
        lib.ring_create.argtypes = [ctypes.c_int64, ctypes.c_int64]
        lib.ring_destroy.argtypes = [ctypes.c_void_p]
        lib.ring_acquire_write.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.ring_acquire_write.argtypes = [ctypes.c_void_p]
        lib.ring_commit_write.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.ring_acquire_read.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.ring_acquire_read.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)]
        lib.ring_release_read.argtypes = [ctypes.c_void_p]
        lib.ring_close.argtypes = [ctypes.c_void_p]
        lib.ring_is_closed.restype = ctypes.c_int32
        lib.ring_is_closed.argtypes = [ctypes.c_void_p]
        lib.ring_size.restype = ctypes.c_int64
        lib.ring_size.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


def native_available() -> bool:
    return _load() is not None


class FrameRing:
    """Single-producer single-consumer ring of fixed-size frame slots.

    ``put(arr)`` copies the frame into a preallocated slot (blocking while
    full); ``get()`` returns a copied-out ndarray or None once closed and
    drained. Frame shape/dtype must be uniform (set by the first put)."""

    def __init__(self, slot_bytes: int, n_slots: int = 8, spin_sleep: float = 1e-4):
        lib = _load()
        if lib is None:
            raise RuntimeError("native ring unavailable (g++ build failed)")
        self._lib = lib
        self._h = lib.ring_create(slot_bytes, n_slots)
        if not self._h:
            raise MemoryError("ring_create failed")
        self.slot_bytes = slot_bytes
        self.spin_sleep = spin_sleep
        # per-slot metadata travels in a deque (append/popleft are atomic and
        # SPSC ordering matches slot ordering)
        import collections

        self._meta = collections.deque()

    def put(self, arr: np.ndarray) -> None:
        arr = np.ascontiguousarray(arr)
        assert arr.nbytes <= self.slot_bytes, (arr.nbytes, self.slot_bytes)
        while True:
            ptr = self._lib.ring_acquire_write(self._h)
            if ptr:
                break
            time.sleep(self.spin_sleep)
        ctypes.memmove(ptr, arr.ctypes.data, arr.nbytes)
        self._meta.append((arr.shape, arr.dtype))
        self._lib.ring_commit_write(self._h, arr.nbytes)

    def get(self) -> np.ndarray | None:
        nbytes = ctypes.c_int64(0)
        while True:
            ptr = self._lib.ring_acquire_read(self._h, ctypes.byref(nbytes))
            if ptr:
                break
            if self._lib.ring_is_closed(self._h) and self._lib.ring_size(self._h) == 0:
                return None
            time.sleep(self.spin_sleep)
        shape, dtype = self._meta.popleft()
        out = np.frombuffer(
            ctypes.string_at(ptr, nbytes.value), dtype=dtype
        ).reshape(shape).copy()
        self._lib.ring_release_read(self._h)
        return out

    def close(self) -> None:
        self._lib.ring_close(self._h)

    def __len__(self) -> int:
        return int(self._lib.ring_size(self._h))

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.ring_destroy(self._h)
                self._h = None
        except Exception:
            pass
