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
           "-o", str(_LIB_PATH)] + sources + ["-lz"]
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
    _lib.gram_tpu_open_fastx.restype = ctypes.c_void_p
    _lib.gram_tpu_open_fastx.argtypes = [ctypes.c_char_p]
    _lib.gram_tpu_close_fastx.argtypes = [ctypes.c_void_p]
    _lib.gram_tpu_read_batch.restype = ctypes.c_int64
    _lib.gram_tpu_read_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
    ]
    return _lib


def native_read_batches(path, batch_size: int = 5000,
                        seq_capacity: int = 64 * 1024 * 1024):
    """Yields lists of int-encoded reads (uint8 arrays, 0 = non-ACGT)
    from a FASTA/FASTQ(.gz) file via the native parser, or None if the
    native library is unavailable."""
    lib = get_native_lib()
    if lib is None or not hasattr(lib, "gram_tpu_open_fastx"):
        return None
    handle = lib.gram_tpu_open_fastx(str(path).encode())
    if not handle:
        return None

    def gen():
        seq_buf = np.empty(seq_capacity, dtype=np.uint8)
        len_buf = np.empty(batch_size, dtype=np.int32)
        qual_sum = np.empty(batch_size, dtype=np.int64)
        qual_len = np.empty(batch_size, dtype=np.int32)
        try:
            while True:
                n = lib.gram_tpu_read_batch(
                    handle, batch_size, seq_capacity,
                    seq_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    len_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                    qual_sum.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                    qual_len.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
                if n < 0:
                    raise IOError(f"native fastx parse error in {path}")
                if n == 0:
                    break
                reads = []
                cursor = 0
                for i in range(n):
                    ln = int(len_buf[i])
                    reads.append(seq_buf[cursor : cursor + ln].copy())
                    cursor += ln
                yield reads
        finally:
            lib.gram_tpu_close_fastx(handle)

    return gen()


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
