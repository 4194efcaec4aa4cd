"""ctypes bridge to the native C++ helpers (SA-IS suffix sort).

The shared library is compiled on demand from gramtools_tpu/native/ and
cached alongside the sources. Falls back to None (-> numpy paths) if no
compiler is available.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libgramtpu.so"
_SOURCES = ["sais.cpp", "fastx.cpp"]

_lib = None
_lib_tried = False


def _build_library() -> Optional[Path]:
    sources = [str(_NATIVE_DIR / s) for s in _SOURCES if (_NATIVE_DIR / s).exists()]
    if not sources:
        return None
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-o", str(_LIB_PATH)] + sources
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    return _LIB_PATH


def _stale() -> bool:
    if not _LIB_PATH.exists():
        return True
    lib_mtime = _LIB_PATH.stat().st_mtime
    return any(
        (_NATIVE_DIR / s).exists() and (_NATIVE_DIR / s).stat().st_mtime > lib_mtime
        for s in _SOURCES
    )


def get_native_lib():
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if _stale() and _build_library() is None:
        return None
    try:
        _lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    _lib.gram_tpu_suffix_array.restype = ctypes.c_int
    _lib.gram_tpu_suffix_array.argtypes = [
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    return _lib


def native_suffix_array(text: np.ndarray) -> Optional[np.ndarray]:
    lib = get_native_lib()
    if lib is None:
        return None
    text = np.ascontiguousarray(text, dtype=np.uint32)
    out = np.empty(text.size + 1, dtype=np.int32)
    rc = lib.gram_tpu_suffix_array(
        text.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.c_int64(text.size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        return None
    return out
