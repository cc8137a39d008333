"""Prefetching frame loader for streaming sequences.

Wraps the native C++ loader (tpuflow/_native/loader.cpp): worker threads
read and widen RAW frames OFF the GIL into a bounded ring, so host disk
I/O overlaps device compute in `process_sequence`. Falls back to
synchronous numpy reads (tpuflow.io.raw.read_frame) when the shared
library is not built — identical values either way (tested).

Usage:
    with FrameLoader(paths, width, height) as loader:
        for _ in paths:
            frame = loader.next()   # float32 (height, width), file order
"""

from __future__ import annotations

import ctypes
import os
from typing import Sequence

import numpy as np

_SO = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "_native", "libtpuflow_loader.so")

_lib = None
if os.path.exists(_SO):
    try:
        _lib = ctypes.CDLL(_SO)
        _lib.tf_loader_open.restype = ctypes.c_int64
        _lib.tf_loader_open.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64,
        ]
        _lib.tf_loader_next.restype = ctypes.c_int
        _lib.tf_loader_next.argtypes = [ctypes.c_int64, ctypes.POINTER(ctypes.c_float)]
        _lib.tf_loader_close.restype = None
        _lib.tf_loader_close.argtypes = [ctypes.c_int64]
    except OSError:  # pragma: no cover
        _lib = None


def native_available() -> bool:
    return _lib is not None


class FrameLoader:
    """Ordered prefetching reader over a list of RAW frame files.

    u8 files are widened to float32 (no rescale), f32 read verbatim —
    auto-detected per file by size, like tpuflow.io.raw.read_frame
    (reference semantics: src/data_types/data2d.cpp:98-178).
    """

    def __init__(self, paths: Sequence[str], width: int, height: int,
                 *, ring: int = 8, threads: int = 2, force_numpy: bool = False):
        self._paths = list(paths)
        self._w, self._h = int(width), int(height)
        self._idx = 0
        self._handle = 0
        self._native = _lib is not None and not force_numpy
        if self._native:
            joined = "\n".join(self._paths).encode()
            self._handle = _lib.tf_loader_open(
                joined, len(self._paths), self._w, self._h, ring, threads
            )
            if self._handle == 0:  # pragma: no cover - defensive
                self._native = False

    def next(self) -> np.ndarray:
        """The next frame in file order (blocks until prefetched).

        Raises IndexError when the file list is exhausted (NOT
        StopIteration: from a plain method that would silently terminate
        an enclosing generator instead of surfacing the bug).

        Thread contract: ``next`` and ``close`` must be called from one
        thread (the native layer frees the loader on close; a close
        racing a blocked next would use freed state). process_sequence
        honours this — only its writer thread is separate, and it never
        touches the loader.
        """
        if self._idx >= len(self._paths):
            raise IndexError("FrameLoader exhausted: no more frames")
        path = self._paths[self._idx]
        self._idx += 1
        if self._native:
            out = np.empty((self._h, self._w), dtype=np.float32)
            rc = _lib.tf_loader_next(
                self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            )
            if rc == 0:
                return out
            if rc == -2:
                raise OSError(f"native loader failed to read {path!r}")
            raise RuntimeError(f"native loader error {rc} on {path!r}")
        from tpuflow.io.raw import read_frame

        return read_frame(path, self._w, self._h)

    def close(self) -> None:
        if self._native and self._handle:
            _lib.tf_loader_close(self._handle)
            self._handle = 0

    def __enter__(self) -> "FrameLoader":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def __del__(self):  # pragma: no cover - GC safety net
        try:
            self.close()
        except Exception:
            pass
