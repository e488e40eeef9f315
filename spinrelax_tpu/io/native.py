"""ctypes bindings to the native fast-IO library (libfastio.so).

Compiled on demand from spinrelax_tpu/native/fastio.cpp (plain C ABI, no
pybind11).  Falls back silently to None when no compiler is available;
callers degrade to the numpy text parsers.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfastio.so")

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    src = os.path.join(_NATIVE_DIR, "fastio.cpp")
    try:
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", src, "-o", _LIB_PATH],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.fastio_table_dims.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
        ]
        lib.fastio_table_dims.restype = ctypes.c_int
        lib.fastio_parse_table.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_long,
        ]
        lib.fastio_parse_table.restype = ctypes.c_long
        lib.fastio_count_fields_headers.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_long)
        ]
        lib.fastio_count_fields_headers.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def load_table(fn: str, skip_chars: str = "#@&") -> Optional[np.ndarray]:
    """Parse a numeric text table -> (nRows, nCols) float64, or None when
    the native library is unavailable (caller falls back to numpy)."""
    lib = _load()
    if lib is None:
        return None
    rows = ctypes.c_long()
    cols = ctypes.c_long()
    rc = lib.fastio_table_dims(
        fn.encode(), skip_chars.encode(), ctypes.byref(rows), ctypes.byref(cols)
    )
    if rc != 0:
        raise OSError(f"fastio_table_dims failed on {fn!r} (code {rc})")
    out = np.empty((rows.value, cols.value), dtype=np.float64)
    n = lib.fastio_parse_table(
        fn.encode(), skip_chars.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rows.value, cols.value,
    )
    if n < 0:
        raise OSError(f"fastio_parse_table failed on {fn!r} (code {n})")
    if n != rows.value * cols.value:
        raise OSError(f"fastio_parse_table short read on {fn!r}")
    return out


def count_fields_headers(fn: str) -> Optional[int]:
    lib = _load()
    if lib is None:
        return None
    n = ctypes.c_long()
    rc = lib.fastio_count_fields_headers(fn.encode(), ctypes.byref(n))
    if rc != 0:
        raise OSError(f"fastio_count_fields_headers failed on {fn!r}")
    return n.value
