"""Compile-on-demand loader for the native fastio library.

Builds ``libfastio.so`` next to the source with the system compiler on
first use (cached); returns None when no toolchain is available so the
pure-numpy fallbacks take over.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fastio.cc")
_LIB = os.path.join(_DIR, "libfastio.so")

_cached = "unset"


def _compile() -> bool:
    for cc in ("g++", "c++", "clang++"):
        try:
            r = subprocess.run(
                [cc, "-O2", "-shared", "-fPIC", _SRC, "-o", _LIB],
                capture_output=True, timeout=120,
            )
            if r.returncode == 0:
                return True
        except (OSError, subprocess.TimeoutExpired):
            continue
    return False


def load_fastio():
    """ctypes handle to libfastio, or None."""
    global _cached
    if _cached != "unset":
        return _cached
    try:
        if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            if not _compile():
                _cached = None
                return None
        lib = ctypes.CDLL(_LIB)
        lib.lle_parse_section.restype = ctypes.c_long
        lib.lle_parse_section.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_long, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.lle_format_xyz.restype = ctypes.c_long
        lib.lle_format_xyz.argtypes = [
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_double),
            ctypes.c_long, ctypes.c_char_p, ctypes.c_long,
        ]
        _cached = lib
    except OSError:
        _cached = None
    return _cached


def parse_rows(lib, text: str, rows: int, cols: int):
    """Parse `rows` data lines of up to `cols` columns into (rows, cols)."""
    import numpy as np

    out = np.zeros((rows, cols), np.float64)
    buf = text.encode()
    n = lib.lle_parse_section(
        buf, len(buf), rows, cols,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if n != rows:
        raise ValueError(f"native parser consumed {n} of {rows} rows")
    return out
