"""Build + load the native C++ runtime pieces.

The reference's host-side runtime (Zoltan distributed directory, state
migration pack/unpack, assembly index math) is native C++; this package's
equivalents live in ``fastset.cpp`` and are compiled on first import with
the system toolchain, cached next to the source, and loaded via ctypes
(no pybind11 in this environment).  Every consumer has a pure-numpy
fallback, so a missing compiler degrades performance, never correctness.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import tempfile
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fastset.cpp")
_LIB_BASENAME = "_fastset"

_lock = threading.Lock()
_lib = None
_lib_error: str | None = None


def _lib_path() -> str:
    tag = f"cpython{sys.version_info.major}{sys.version_info.minor}"
    return os.path.join(_HERE, f"{_LIB_BASENAME}-{tag}.so")


def _needs_build(path: str) -> bool:
    if not os.path.exists(path):
        return True
    return os.path.getmtime(path) < os.path.getmtime(_SRC)


def _compile(path: str) -> None:
    # build into a temp file then atomically rename: concurrent importers
    # (pytest-xdist, multi-process drivers) must never see a torn .so
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_HERE)
    os.close(fd)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-std=c++17", "-o", tmp, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    c_i64 = ctypes.c_int64
    p_i64 = ctypes.POINTER(ctypes.c_int64)
    p_u8 = ctypes.POINTER(ctypes.c_uint8)
    lib.fastset_create.argtypes = [c_i64]
    lib.fastset_create.restype = ctypes.c_void_p
    lib.fastset_destroy.argtypes = [ctypes.c_void_p]
    lib.fastset_destroy.restype = None
    lib.fastset_size.argtypes = [ctypes.c_void_p]
    lib.fastset_size.restype = c_i64
    lib.fastset_insert.argtypes = [ctypes.c_void_p, p_i64, c_i64, p_u8]
    lib.fastset_insert.restype = c_i64
    lib.fastset_lookup.argtypes = [ctypes.c_void_p, p_i64, c_i64, p_i64]
    lib.fastset_lookup.restype = None
    lib.fastset_sub2ind.argtypes = [p_i64, c_i64, p_i64, c_i64, p_i64]
    lib.fastset_sub2ind.restype = None
    return lib


def load():
    """The loaded CDLL, or None if the toolchain is unavailable."""
    global _lib, _lib_error
    if _lib is not None or _lib_error is not None:
        return _lib
    with _lock:
        if _lib is not None or _lib_error is not None:
            return _lib
        try:
            path = _lib_path()
            if _needs_build(path):
                _compile(path)
            _lib = _bind(ctypes.CDLL(path))
        except Exception as e:  # no compiler / unwritable dir -> fallback
            _lib_error = f"{type(e).__name__}: {e}"
    return _lib


def load_error() -> str | None:
    return _lib_error
