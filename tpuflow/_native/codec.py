"""ctypes bindings for the native I/O codec (see codec.cpp).

Raises ImportError at import time if the shared library is not built, so
``tpuflow.io`` can fall back to numpy.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_SO = os.path.join(os.path.dirname(__file__), "libtpuflow_codec.so")
if not os.path.exists(_SO):
    raise ImportError(f"native codec not built (missing {_SO}); run make -C tpuflow/_native")

_lib = ctypes.CDLL(_SO)

_lib.tf_read_raw_u8.restype = ctypes.c_int
_lib.tf_read_raw_u8.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_float)]
_lib.tf_read_raw_f32.restype = ctypes.c_int
_lib.tf_read_raw_f32.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_float)]
_lib.tf_write_raw_u8.restype = ctypes.c_int
_lib.tf_write_raw_u8.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
_lib.tf_write_raw_f32.restype = ctypes.c_int
_lib.tf_write_raw_f32.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
_lib.tf_flow_to_rgb.restype = None
_lib.tf_flow_to_rgb.argtypes = [
    ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ctypes.c_int64, ctypes.c_float, ctypes.POINTER(ctypes.c_ubyte),
]
_lib.tf_flow_magnitude.restype = None
_lib.tf_flow_magnitude.argtypes = [
    ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
]


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _check(rc: int, path: str):
    if rc == -1:
        raise OSError(f"cannot open {path!r}")
    if rc == -2:
        raise ValueError(f"short read/write on {path!r}")
    if rc != 0:
        raise OSError(f"native codec error {rc} on {path!r}")


def read_raw_u8(path: str, width: int, height: int) -> np.ndarray:
    out = np.empty((height, width), dtype=np.float32)
    _check(_lib.tf_read_raw_u8(path.encode(), out.size, _fptr(out)), path)
    return out


def read_raw_f32(path: str, width: int, height: int) -> np.ndarray:
    out = np.empty((height, width), dtype=np.float32)
    _check(_lib.tf_read_raw_f32(path.encode(), out.size, _fptr(out)), path)
    return out


def write_raw_u8(path: str, image: np.ndarray) -> None:
    img = np.ascontiguousarray(image, dtype=np.float32)
    _check(_lib.tf_write_raw_u8(path.encode(), _fptr(img), img.size), path)


def write_raw_f32(path: str, image: np.ndarray) -> None:
    img = np.ascontiguousarray(image, dtype=np.float32)
    _check(_lib.tf_write_raw_f32(path.encode(), _fptr(img), img.size), path)


def flow_to_rgb(u: np.ndarray, v: np.ndarray, flow_max_scale: float) -> np.ndarray:
    uu = np.ascontiguousarray(u, dtype=np.float32)
    vv = np.ascontiguousarray(v, dtype=np.float32)
    rgb = np.empty(uu.shape + (3,), dtype=np.uint8)
    _lib.tf_flow_to_rgb(
        _fptr(uu), _fptr(vv), uu.size, ctypes.c_float(flow_max_scale),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return rgb


def flow_magnitude(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    uu = np.ascontiguousarray(u, dtype=np.float32)
    vv = np.ascontiguousarray(v, dtype=np.float32)
    out = np.empty_like(uu)
    _lib.tf_flow_magnitude(_fptr(uu), _fptr(vv), uu.size, _fptr(out))
    return out
