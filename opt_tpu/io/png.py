"""Minimal PNG codec (pure Python + zlib).

Replaces the reference's LodePNG usage (reference: examples/shared mLib
LodePNG wrappers).  Supports the subset the example datasets use: 8-bit
greyscale / RGB / RGBA / palette, non-interlaced.  Returns uint8 numpy
arrays of shape (H, W, C).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _unfilter(raw, height, stride, bpp):
    """Reverse PNG per-scanline filtering (types 0-4).

    Uses the native C implementation when available
    (opt_tpu/native/native.c png_unfilter); this Python path is the
    fallback."""
    try:
        from ..native.build import png_unfilter as native_unfilter

        out = native_unfilter(raw, height, stride, bpp)
        if out is not None:
            return out
    except Exception:
        pass
    out = np.zeros(height * stride, dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos)
        pos += stride
        if ftype == 0:
            cur = line.copy()
        elif ftype == 1:  # Sub
            cur = line.astype(np.int32)
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
            cur = cur.astype(np.uint8)
        elif ftype == 2:  # Up
            cur = ((line.astype(np.int32) + prev) & 0xFF).astype(np.uint8)
        elif ftype == 3:  # Average
            cur = line.astype(np.int32)
            pv = prev.astype(np.int32)
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + pv[i]) >> 1)) & 0xFF
            cur = cur.astype(np.uint8)
        elif ftype == 4:  # Paeth
            cur = line.astype(np.int32)
            pv = prev.astype(np.int32)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = pv[i]
                c = pv[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pr = a
                elif pb <= pc:
                    pr = b
                else:
                    pr = c
                cur[i] = (cur[i] + pr) & 0xFF
            cur = cur.astype(np.uint8)
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y * stride : (y + 1) * stride] = cur
        prev = cur
    return out


def read_png(path):
    """Decode a PNG file -> uint8 array (H, W, C)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:8] != _MAGIC:
        raise ValueError(f"{path}: not a PNG file")
    pos = 8
    width = height = None
    bitdepth = ctype = None
    idat = []
    palette = None
    trns = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, bitdepth, ctype, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", chunk)
            )
            if bitdepth != 8:
                raise ValueError(f"{path}: only 8-bit PNG supported")
            if interlace:
                raise ValueError(f"{path}: interlaced PNG not supported")
        elif tag == b"PLTE":
            palette = np.frombuffer(chunk, np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(chunk, np.uint8)
        elif tag == b"IDAT":
            idat.append(chunk)
        elif tag == b"IEND":
            break
    if width is None or ctype not in _CHANNELS:
        raise ValueError(f"{path}: missing/invalid IHDR")
    nch = _CHANNELS[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = width * nch
    if width <= 0 or height <= 0 or len(raw) != height * (1 + stride):
        # Validate before handing raw to the native C unfilter, which
        # otherwise reads past a truncated buffer.
        raise ValueError(
            f"{path}: corrupt IDAT ({len(raw)} bytes, expected "
            f"{height * (1 + stride)} for {width}x{height}x{nch})"
        )
    flat = _unfilter(raw, height, stride, nch)
    img = flat.reshape(height, width, nch)
    if ctype == 3:  # palette
        rgb = palette[img[..., 0]]
        if trns is not None:
            alpha = np.full((height, width, 1), 255, np.uint8)
            limit = min(len(trns), 256)
            alpha[..., 0] = np.where(
                img[..., 0] < limit,
                np.pad(trns, (0, 256 - limit), constant_values=255)[
                    img[..., 0]
                ],
                255,
            )
            return np.concatenate([rgb, alpha], axis=-1)
        return rgb
    return img


def write_png(path, img):
    """Encode a uint8 array (H, W) or (H, W, C in 1/3/4) as PNG."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = np.clip(np.round(img), 0, 255).astype(np.uint8)
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    ctype = {1: 0, 3: 2, 4: 6}[c]
    raw = bytearray()
    for y in range(h):
        raw.append(0)  # filter: none
        raw.extend(img[y].tobytes())
    compressed = zlib.compress(bytes(raw), 6)

    def chunk(tag, payload):
        out = struct.pack(">I", len(payload)) + tag + payload
        crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
        return out + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", compressed))
        f.write(chunk(b"IEND", b""))
