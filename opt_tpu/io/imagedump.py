"""SimpleBuffer .imagedump format (reference:
examples/shape_from_shading/src/SimpleBuffer.cpp:14-58): int32 header
(width, height, channels, datatype 0=float32/1=uint8) + raw row-major data.
Infinities are clamped on load as the reference does (+inf -> float32 max,
-inf -> -10000)."""

from __future__ import annotations

import struct

import numpy as np


def read_imagedump(path, clamp_infinity=True):
    with open(path, "rb") as f:
        data = f.read()
    w, h, c, t = struct.unpack("<iiii", data[:16])
    dtype = np.float32 if t == 0 else np.uint8
    arr = np.frombuffer(data, dtype, w * h * c, 16).reshape(h, w, c).copy()
    if t == 0 and clamp_infinity:
        arr[np.isposinf(arr)] = np.finfo(np.float32).max
        arr[np.isneginf(arr)] = -10000.0
    return arr


def write_imagedump(path, arr):
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[..., None]
    h, w, c = arr.shape
    t = 0 if arr.dtype == np.float32 else 1
    with open(path, "wb") as f:
        f.write(struct.pack("<iiii", w, h, c, t))
        f.write(arr.tobytes())
