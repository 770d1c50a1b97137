"""Build and bind the native host-runtime library (opt_tpu/native/native.c).

Compiled on demand with the system compiler and bound via ctypes; every
entry point has a pure-Python fallback, so the framework works without a
toolchain.  Set OPT_TPU_NO_NATIVE=1 to force the fallbacks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native.c")
_SO = os.path.join(_HERE, "_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _compile():
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                check=True,
                capture_output=True,
            )
            return True
        except (OSError, subprocess.CalledProcessError):
            continue
    return False


def get_lib():
    """The ctypes library, or None if unavailable."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("OPT_TPU_NO_NATIVE"):
            return None
        if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        ):
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        i64 = ctypes.c_int64
        p_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        p_f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.png_unfilter.restype = ctypes.c_int
        lib.png_unfilter.argtypes = [p_u8, p_u8, i64, i64, i64]
        lib.neighbor_lists.restype = i64
        lib.neighbor_lists.argtypes = [p_i32, i64, i64, p_i32, p_i32, i64]
        lib.csr_transpose.restype = None
        lib.csr_transpose.argtypes = [
            p_i32, p_i32, p_f32, i64, i64, p_i32, p_i32, p_f32,
        ]
        lib.csr_spmv.restype = None
        lib.csr_spmv.argtypes = [p_i32, p_i32, p_f32, p_f32, p_f32, i64]
        lib.csr_ata.restype = i64
        lib.csr_ata.argtypes = [
            p_i32, p_i32, ctypes.c_void_p, i64, i64,
            p_i32, p_i32, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        _lib = lib
        return _lib


# -- high-level wrappers -------------------------------------------------------


def png_unfilter(raw, height, stride, bpp):
    """Native PNG unfilter; returns None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    raw = np.frombuffer(raw, np.uint8) if isinstance(raw, bytes) else raw
    raw = np.ascontiguousarray(raw, np.uint8)
    out = np.empty(height * stride, np.uint8)
    rc = lib.png_unfilter(raw, out, height, stride, bpp)
    if rc != 0:
        raise ValueError(f"bad PNG filter type (rc={rc})")
    return out


def neighbor_lists(faces, n_verts):
    """Native CSR 1-ring neighbor lists; returns None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    faces = np.ascontiguousarray(faces, np.int32)
    if faces.size and (faces.min() < 0 or faces.max() >= n_verts):
        # Out-of-range vertex ids would index past deg[]/starts[] in C
        # (heap corruption); match the pure-Python fallback's IndexError.
        raise IndexError(
            f"face vertex id out of range [0, {n_verts}): "
            f"min={faces.min()}, max={faces.max()}"
        )
    nf = len(faces)
    cap = 6 * nf + 1
    offsets = np.zeros(n_verts + 1, np.int32)
    idx = np.empty(cap, np.int32)
    total = lib.neighbor_lists(faces, nf, n_verts, offsets, idx, cap)
    if total < 0:
        return None
    return idx[:total].copy(), offsets


def csr_transpose(rowptr, colind, vals, n_rows, n_cols):
    lib = get_lib()
    if lib is None:
        return None
    rowptr = np.ascontiguousarray(rowptr, np.int32)
    colind = np.ascontiguousarray(colind, np.int32)
    vals = np.ascontiguousarray(vals, np.float32)
    t_rowptr = np.zeros(n_cols + 1, np.int32)
    t_colind = np.empty_like(colind)
    t_vals = np.empty_like(vals)
    lib.csr_transpose(
        rowptr, colind, vals, n_rows, n_cols, t_rowptr, t_colind, t_vals
    )
    return t_rowptr, t_colind, t_vals


def csr_spmv(rowptr, colind, vals, x):
    lib = get_lib()
    if lib is None:
        return None
    rowptr = np.ascontiguousarray(rowptr, np.int32)
    colind = np.ascontiguousarray(colind, np.int32)
    vals = np.ascontiguousarray(vals, np.float32)
    x = np.ascontiguousarray(x, np.float32)
    y = np.empty(len(rowptr) - 1, np.float32)
    lib.csr_spmv(rowptr, colind, vals, x, y, len(rowptr) - 1)
    return y


def csr_ata(rowptr, colind, vals, n_rows, n_cols):
    """Two-phase A^T A (symbolic count then numeric fill), like the
    reference's computeNnzPatternATA/computeATA."""
    lib = get_lib()
    if lib is None:
        return None
    t = csr_transpose(rowptr, colind, vals, n_rows, n_cols)
    t_rowptr, t_colind, t_vals = t
    rowptr = np.ascontiguousarray(rowptr, np.int32)
    colind = np.ascontiguousarray(colind, np.int32)
    vals32 = np.ascontiguousarray(vals, np.float32)
    nnz = lib.csr_ata(
        rowptr, colind, vals32.ctypes.data, n_rows, n_cols,
        t_rowptr, t_colind, t_vals.ctypes.data,
        None, None, None,
    )
    out_rowptr = np.zeros(n_cols + 1, np.int32)
    out_colind = np.empty(nnz, np.int32)
    out_vals = np.empty(nnz, np.float32)
    lib.csr_ata(
        rowptr, colind, vals32.ctypes.data, n_rows, n_cols,
        t_rowptr, t_colind, t_vals.ctypes.data,
        out_rowptr.ctypes.data, out_colind.ctypes.data,
        out_vals.ctypes.data,
    )
    return out_rowptr, out_colind, out_vals
