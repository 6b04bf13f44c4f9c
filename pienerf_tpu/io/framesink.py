"""Async frame sink: non-blocking PNG output for the interactive loop.

ctypes wrapper over native/framesink.cpp (threaded zlib PNG encoder). The
native library is built by native/build.sh; when absent, a pure-Python
fallback (imageio on a worker thread) keeps behavior identical, just
slower.
"""

from __future__ import annotations

import ctypes
import os
import queue
import threading
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "_framesink.so")


def _load_native():
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.framesink_create.restype = ctypes.c_void_p
    lib.framesink_create.argtypes = [ctypes.c_int]
    lib.framesink_push.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.framesink_flush.argtypes = [ctypes.c_void_p]
    lib.framesink_destroy.argtypes = [ctypes.c_void_p]
    lib.framesink_write_png.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    lib.framesink_write_png.restype = ctypes.c_int
    return lib


_NATIVE = _load_native()


def native_available() -> bool:
    return _NATIVE is not None


class FrameSink:
    """Push RGB frames; they encode and hit disk off the caller's thread."""

    def __init__(self, n_threads: int = 2):
        self._native: Optional[ctypes.c_void_p] = None
        self._thread = None
        if _NATIVE is not None:
            self._native = _NATIVE.framesink_create(n_threads)
        else:
            self._q: "queue.Queue" = queue.Queue()
            self._thread = threading.Thread(target=self._py_worker,
                                            daemon=True)
            self._thread.start()

    def _py_worker(self):
        import imageio.v2 as imageio

        while True:
            item = self._q.get()
            if item is None:
                self._q.task_done()
                return
            path, frame = item
            imageio.imwrite(path, frame)
            self._q.task_done()

    def push(self, path: str, frame: np.ndarray) -> None:
        """frame: [H, W, 3] float in [0,1] or uint8."""
        if frame.dtype != np.uint8:
            frame = (np.clip(frame, 0.0, 1.0) * 255).astype(np.uint8)
        frame = np.ascontiguousarray(frame)
        h, w = frame.shape[:2]
        if self._native is not None:
            _NATIVE.framesink_push(
                self._native, path.encode(),
                frame.ctypes.data_as(ctypes.c_void_p), w, h)
        else:
            self._q.put((path, frame))

    def flush(self) -> None:
        if self._native is not None:
            _NATIVE.framesink_flush(self._native)
        else:
            self._q.join()

    def close(self) -> None:
        if self._native is not None:
            _NATIVE.framesink_destroy(self._native)
            self._native = None
        elif self._thread is not None:
            self._q.put(None)
            self._q.join()
            self._thread = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.flush()
        self.close()
