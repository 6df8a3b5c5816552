"""Native (C++) IO hot paths, loaded through ctypes.

Build model: ``make`` in this directory (or the automatic on-demand g++
compile below) produces ``libgunrock_io.so`` next to the sources. Every
entry point has a pure-numpy fallback — the native module is an
accelerator, not a dependency (reference parity: mmio + from_coo are the
reference's C/C++ host hot paths, SURVEY.md section 7 "keep native where
the reference is native").
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_SO = _DIR / "libgunrock_io.so"
_lib = None
_tried = False


def _build() -> bool:
    src = _DIR / "fast_io.cpp"
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             str(src), "-o", str(_SO)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """The loaded native library, building it on first use; None if
    unavailable (no g++, sandboxed, etc.)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _SO.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    lib.gr_mtx_parse.restype = ctypes.c_void_p
    lib.gr_mtx_parse.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_char_p,
        ctypes.c_int,
    ]
    lib.gr_mtx_copy.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 3
    lib.gr_mtx_free.argtypes = [ctypes.c_void_p]
    lib.gr_coo_to_compressed.argtypes = [
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def parse_mtx(path: str):
    """Native .mtx parse. Returns (n_rows, n_cols, rows, cols, vals,
    symmetric, pattern) with symmetric entries already expanded, or None
    when the native library is unavailable. Raises ValueError on malformed
    files (matching the python loader's error contract)."""
    lib = get_lib()
    if lib is None:
        return None
    nr = ctypes.c_int64()
    nc = ctypes.c_int64()
    nnz = ctypes.c_int64()
    sym = ctypes.c_int()
    pat = ctypes.c_int()
    err = ctypes.create_string_buffer(256)
    h = lib.gr_mtx_parse(
        str(path).encode(), ctypes.byref(nr), ctypes.byref(nc),
        ctypes.byref(nnz), ctypes.byref(sym), ctypes.byref(pat), err, 256
    )
    if not h:
        raise ValueError(f"{path}: {err.value.decode()}")
    try:
        n = nnz.value
        rows = np.empty(n, dtype=np.int32)
        cols = np.empty(n, dtype=np.int32)
        vals = np.empty(n, dtype=np.float32)
        lib.gr_mtx_copy(
            h,
            rows.ctypes.data_as(ctypes.c_void_p),
            cols.ctypes.data_as(ctypes.c_void_p),
            vals.ctypes.data_as(ctypes.c_void_p),
        )
    finally:
        lib.gr_mtx_free(h)
    return nr.value, nc.value, rows, cols, vals, bool(sym.value), bool(pat.value)


def coo_to_compressed(major, minor, values, n_major: int, n_minor: int):
    """Native stable counting sort by (major, minor). Returns
    (offsets int64[n_major+1], minor_sorted, vals_sorted, perm) or None."""
    lib = get_lib()
    if lib is None:
        return None
    major = np.ascontiguousarray(major, dtype=np.int32)
    minor = np.ascontiguousarray(minor, dtype=np.int32)
    values = np.ascontiguousarray(values, dtype=np.float32)
    nnz = major.shape[0]
    offsets = np.empty(n_major + 1, dtype=np.int64)
    minor_out = np.empty(nnz, dtype=np.int32)
    vals_out = np.empty(nnz, dtype=np.float32)
    perm = np.empty(nnz, dtype=np.int64)
    lib.gr_coo_to_compressed(
        nnz, n_major, n_minor,
        major.ctypes.data_as(ctypes.c_void_p),
        minor.ctypes.data_as(ctypes.c_void_p),
        values.ctypes.data_as(ctypes.c_void_p),
        offsets.ctypes.data_as(ctypes.c_void_p),
        minor_out.ctypes.data_as(ctypes.c_void_p),
        vals_out.ctypes.data_as(ctypes.c_void_p),
        perm.ctypes.data_as(ctypes.c_void_p),
    )
    return offsets, minor_out, vals_out, perm
