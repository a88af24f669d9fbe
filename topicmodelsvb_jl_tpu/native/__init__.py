"""ctypes loader for the native C++ data layer.

Compiles ``tmvb_native.cpp`` with the system C++ toolchain on first use
(cached next to the source); every caller falls back to pure Python when
the toolchain or the compiled library is unavailable, so the native
layer is an accelerator, never a requirement.

This is the build's counterpart to the reference's host-side data path
(readcorp parsing, Corpus.jl:277-325; device flattening,
modelutils.jl:370-494) — see tmvb_native.cpp.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "tmvb_native.cpp")
_LIB = os.path.join(_DIR, "libtmvb_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_i64p = ctypes.POINTER(ctypes.c_int64)
_i32p = ctypes.POINTER(ctypes.c_int32)
_f32p = ctypes.POINTER(ctypes.c_float)
_f64p = ctypes.POINTER(ctypes.c_double)


def _build() -> bool:
    # compile to a private temp name and os.replace into place: concurrent
    # processes (test workers, parallel jobs) may build simultaneously, and
    # dlopen of a half-written .so fails or loads garbage
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", tmp],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, _LIB)
        return True
    except Exception:
        try:
            os.remove(tmp)
        except OSError:
            pass
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
            lib.tmvb_count.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_char, _i64p, _i64p]
            lib.tmvb_parse.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_char, _i64p, _i64p]
            lib.tmvb_parse.restype = ctypes.c_int64
            lib.tmvb_fill_dense.argtypes = [
                _i64p, _f64p, _i64p, ctypes.c_int64, ctypes.c_int64,
                _i32p, _f32p, ctypes.c_int32]
            _lib = lib
        except OSError:
            _lib = None
    return _lib


def parse_delimited_ints(data: bytes, delim: str = ","):
    """Parse a text buffer of delimited integers into CSR form.

    Returns (values int64 [n_vals], line_offsets int64 [n_lines+1]) or
    None when the native library is unavailable.  Raises ValueError on a
    malformed byte, mirroring the reference's per-document load error
    (Corpus.jl:298).
    """
    lib = get_lib()
    if lib is None:
        return None
    n = len(data)
    n_lines = ctypes.c_int64(0)
    n_vals = ctypes.c_int64(0)
    d = ctypes.c_char(delim.encode())
    lib.tmvb_count(data, n, d, ctypes.byref(n_lines), ctypes.byref(n_vals))
    vals = np.empty(max(n_vals.value, 1), dtype=np.int64)
    offs = np.zeros(n_lines.value + 1, dtype=np.int64)
    rc = lib.tmvb_parse(
        data, n, d,
        vals.ctypes.data_as(_i64p), offs.ctypes.data_as(_i64p))
    if rc != 0:
        raise ValueError(f"malformed integer near byte {rc - 1}")
    return vals[: offs[-1]] if n_vals.value else vals[:0], offs


def fill_dense(term_vals: np.ndarray, count_vals: Optional[np.ndarray],
               offsets: np.ndarray, rows: int, L: int,
               rows_alloc: Optional[int] = None):
    """CSR → dense [rows_alloc or rows, L] (terms 0-based int32, counts
    f32, 1 if None); rows beyond ``rows`` stay zero-padding.

    Returns (terms, counts) or None when native is unavailable.
    This is ops.packing.pack_corpus's fast path (f32 corpora).
    """
    lib = get_lib()
    if lib is None:
        return None
    terms = np.zeros((rows_alloc or rows, L), dtype=np.int32)
    counts = np.zeros((rows_alloc or rows, L), dtype=np.float32)
    tv = np.ascontiguousarray(term_vals, dtype=np.int64)
    cv = np.ascontiguousarray(
        count_vals if count_vals is not None else np.zeros(1),
        dtype=np.float64)
    off = np.ascontiguousarray(offsets, dtype=np.int64)
    lib.tmvb_fill_dense(
        tv.ctypes.data_as(_i64p), cv.ctypes.data_as(_f64p),
        off.ctypes.data_as(_i64p), rows, L,
        terms.ctypes.data_as(_i32p), counts.ctypes.data_as(_f32p),
        1 if count_vals is not None else 0)
    return terms, counts
