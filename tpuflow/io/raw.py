"""RAW image file I/O (headerless binary frames).

Same file semantics as the reference host containers
(reference: src/data_types/data2d.cpp:98-231): row-major ``y*w + x`` layout,
little-endian, u8 frames widened to float32 on read (no rescale), float32
frames read/written verbatim, u8 writes clamped to [0, 255] and truncated.

Arrays are numpy (host side); device transfer happens exactly once per run in
the solver driver — the "upload once, iterate on device, download once"
contract of the reference pipeline
(reference: src/optical_flow/optical_flow_2d.cpp:214-215,543-545).

A C++ fast path (tpuflow._native) is used when built; numpy is the fallback.
"""

from __future__ import annotations

import os

import numpy as np

try:  # optional native codec (see tpuflow/_native)
    from tpuflow._native import codec as _codec
except Exception:  # pragma: no cover - absence is a supported configuration
    _codec = None


def _check_size(path: str, expected_bytes: int) -> None:
    actual = os.path.getsize(path)
    if actual < expected_bytes:
        raise ValueError(
            f"RAW file {path!r} too small: has {actual} bytes, "
            f"expected {expected_bytes}"
        )


def read_raw_u8(path: str, width: int, height: int) -> np.ndarray:
    """Read a headerless u8 frame and widen to float32 (values 0..255).

    Reference semantics: src/data_types/data2d.cpp:98-141.
    """
    _check_size(path, width * height)
    if _codec is not None:
        return _codec.read_raw_u8(path, width, height)
    data = np.fromfile(path, dtype=np.uint8, count=width * height)
    return data.reshape(height, width).astype(np.float32)


def read_raw_f32(path: str, width: int, height: int) -> np.ndarray:
    """Read a headerless little-endian float32 frame.

    Reference semantics: src/data_types/data2d.cpp:143-178.
    """
    _check_size(path, width * height * 4)
    if _codec is not None:
        return _codec.read_raw_f32(path, width, height)
    data = np.fromfile(path, dtype="<f4", count=width * height)
    return data.reshape(height, width).astype(np.float32)


def read_frame(path: str, width: int, height: int) -> np.ndarray:
    """Read a frame, auto-detecting u8 vs f32 from the file size.

    The reference ships u8 data (rub pair) but reads it with the F32 reader
    as-built (a known reference bug, src/main.cpp:175-183); we instead pick
    the reader whose expected size matches the file.
    """
    size = os.path.getsize(path)
    if size == width * height * 4:
        return read_raw_f32(path, width, height)
    if size == width * height:
        return read_raw_u8(path, width, height)
    raise ValueError(
        f"RAW file {path!r} has {size} bytes; matches neither u8 "
        f"({width * height}) nor f32 ({width * height * 4}) for {width}x{height}"
    )


def write_raw_u8(path: str, image: np.ndarray) -> None:
    """Write a float32 frame as u8, clamped to [0, 255] and truncated.

    Reference semantics: src/data_types/data2d.cpp:180-208.
    """
    clamped = np.clip(np.asarray(image, dtype=np.float32), 0.0, 255.0)
    clamped.astype(np.uint8).tofile(path)


def write_raw_f32(path: str, image: np.ndarray) -> None:
    """Write a float32 frame verbatim (little-endian).

    Reference semantics: src/data_types/data2d.cpp:210-231.
    """
    np.asarray(image, dtype="<f4").tofile(path)
