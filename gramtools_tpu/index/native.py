"""ctypes bridge to the native C++ helpers (SA-IS suffix sort).

The shared library is compiled on demand from gramtools_tpu/native/ and
cached alongside the sources. Falls back to None (-> numpy paths) if no
compiler is available.
"""
from __future__ import annotations

import os
import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libgramtpu.so"
_SOURCES = ["sais.cpp", "fastx.cpp", "quasimap.cpp", "screen.cpp"]

_lib = None
_lib_tried = False


def _build_library() -> Optional[Path]:
    sources = [str(_NATIVE_DIR / s) for s in _SOURCES if (_NATIVE_DIR / s).exists()]
    if not sources:
        return None
    # GRAMTOOLS_TPU_MARCH=portable builds without -march=native so a
    # container image built on one host cannot SIGILL on an older CPU
    march = ([] if os.environ.get("GRAMTOOLS_TPU_MARCH") == "portable"
             else ["-march=native"])
    cmd = (["g++", "-O3"] + march + ["-shared", "-fPIC", "-std=c++17",
           "-fopenmp", "-o", str(_LIB_PATH)] + sources + ["-lz"])
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
    if hasattr(_lib, "gram_tpu_cpu_quasimap"):
        i32p = ctypes.POINTER(ctypes.c_int32)
        _lib.gram_tpu_cpu_quasimap.restype = ctypes.c_int64
        _lib.gram_tpu_cpu_quasimap.argtypes = [
            i32p, i32p, i32p, i32p, i32p, i32p,
            ctypes.POINTER(ctypes.c_int8), i32p, i32p,
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            i32p, i32p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), i32p, i32p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, i32p,
            i32p, ctypes.c_int32,
        ]
    if hasattr(_lib, "gram_tpu_kmer_screen"):
        u8p = ctypes.POINTER(ctypes.c_uint8)
        _lib.gram_tpu_kmer_screen.restype = ctypes.c_int64
        _lib.gram_tpu_kmer_screen.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            u8p, u8p, u8p, ctypes.c_int32,
        ]
    if hasattr(_lib, "gram_tpu_cpu_quasimap_e2e"):
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        _lib.gram_tpu_cpu_quasimap_e2e.restype = ctypes.c_int64
        _lib.gram_tpu_cpu_quasimap_e2e.argtypes = [
            i32p, i32p, i32p, i32p, i32p, i32p,
            ctypes.POINTER(ctypes.c_int8), i32p, i32p,
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            u8p, ctypes.c_int64, ctypes.c_int32,
            u8p, i64p, i32p, i32p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
            i64p, i32p,
        ]
    return _lib


def cpu_quasimap_baseline(idx, jt, reads, n_steps, seed_ptr, seed_lo,
                          seed_hi, state_cap: int = 10000,
                          num_threads: int = 0, iv_cap: int = 0):
    """OpenMP scalar-search baseline (native/quasimap.cpp): maps a read
    buffer with the reference backend's per-read worklist algorithm over
    this package's index tables. Returns (per_read_state_counts, total)
    or None if the native library is unavailable.

    reads: (R, max_steps) int32 right-to-left base codes, 0 = pad.
    seed_ptr/seed_lo/seed_hi: CSR seed SA intervals per read.
    num_threads: 0 = OpenMP default (all cores), mirroring the reference
    binary's --max_threads.
    """
    lib = get_native_lib()
    if lib is None or not hasattr(lib, "gram_tpu_cpu_quasimap"):
        return None
    fm = idx.fm
    occ_t = np.ascontiguousarray(fm.occ.T, dtype=np.int32)  # (n+1, 4)
    sym_start = np.ascontiguousarray(fm.sym_start, dtype=np.int32)
    marker_prefix = np.ascontiguousarray(fm.marker_prefix, dtype=np.int32)
    # marker rank -> jump locus (same precomputation as DeviceIndex.build)
    msp = fm.marker_sa_pos
    if msp.size == 0:
        marker_rank_locus = np.full(1, -1, dtype=np.int32)
    else:
        prg_pos = fm.sa[np.clip(msp, 0, fm.size - 1)]
        marker_rank_locus = np.ascontiguousarray(
            jt.pos_to_locus[np.clip(prg_pos, 0, jt.pos_to_locus.shape[0] - 1)],
            dtype=np.int32)
    out_lo = np.ascontiguousarray(jt.out_lo, dtype=np.int32)
    out_hi = np.ascontiguousarray(jt.out_hi, dtype=np.int32)
    ops_kind = np.ascontiguousarray(jt.ops_kind, dtype=np.int8)
    ops_site = np.ascontiguousarray(jt.ops_site, dtype=np.int32)
    ops_allele = np.ascontiguousarray(jt.ops_allele, dtype=np.int32)
    reads = np.ascontiguousarray(reads, dtype=np.int32)
    n_steps = np.ascontiguousarray(n_steps, dtype=np.int32)
    seed_ptr = np.ascontiguousarray(seed_ptr, dtype=np.int64)
    seed_lo = np.ascontiguousarray(seed_lo, dtype=np.int32)
    seed_hi = np.ascontiguousarray(seed_hi, dtype=np.int32)
    n_reads, max_steps = reads.shape
    out_states = np.empty(n_reads, dtype=np.int32)
    out_iv = (np.full((n_reads, iv_cap, 2), -1, dtype=np.int32)
              if iv_cap > 0 else None)

    i32p = ctypes.POINTER(ctypes.c_int32)
    as_i32 = lambda a: a.ctypes.data_as(i32p)
    total = lib.gram_tpu_cpu_quasimap(
        as_i32(occ_t), as_i32(sym_start), as_i32(marker_prefix),
        as_i32(marker_rank_locus), as_i32(out_lo), as_i32(out_hi),
        ops_kind.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        as_i32(ops_site), as_i32(ops_allele),
        ctypes.c_int64(fm.size), ctypes.c_int32(jt.max_outcomes),
        ctypes.c_int32(jt.max_ops),
        as_i32(reads), as_i32(n_steps), ctypes.c_int64(n_reads),
        ctypes.c_int64(max_steps),
        seed_ptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        as_i32(seed_lo), as_i32(seed_hi),
        ctypes.c_int32(state_cap), ctypes.c_int32(num_threads),
        ctypes.c_int32(1), as_i32(out_states),
        as_i32(out_iv) if out_iv is not None else i32p(),
        ctypes.c_int32(iv_cap))
    if total < 0:
        return None
    return out_states, int(total), out_iv


def _baseline_tables(idx, jt):
    """Contiguous index-table views shared by the scan-only and e2e
    baselines."""
    fm = idx.fm
    occ_t = np.ascontiguousarray(fm.occ.T, dtype=np.int32)  # (n+1, 4)
    sym_start = np.ascontiguousarray(fm.sym_start, dtype=np.int32)
    marker_prefix = np.ascontiguousarray(fm.marker_prefix, dtype=np.int32)
    msp = fm.marker_sa_pos
    if msp.size == 0:
        marker_rank_locus = np.full(1, -1, dtype=np.int32)
    else:
        prg_pos = fm.sa[np.clip(msp, 0, fm.size - 1)]
        marker_rank_locus = np.ascontiguousarray(
            jt.pos_to_locus[np.clip(prg_pos, 0, jt.pos_to_locus.shape[0] - 1)],
            dtype=np.int32)
    return (occ_t, sym_start, marker_prefix, marker_rank_locus,
            np.ascontiguousarray(jt.out_lo, dtype=np.int32),
            np.ascontiguousarray(jt.out_hi, dtype=np.int32),
            np.ascontiguousarray(jt.ops_kind, dtype=np.int8),
            np.ascontiguousarray(jt.ops_site, dtype=np.int32),
            np.ascontiguousarray(jt.ops_allele, dtype=np.int32))


def cpu_quasimap_e2e_baseline(idx, jt, kmer_index, reads, sel_seeds,
                              n_sites: int, max_alleles: int = 8,
                              state_cap: int = 10000, num_threads: int = 0):
    """Full-pipeline OpenMP baseline (native/quasimap.cpp
    gram_tpu_cpu_quasimap_e2e): raw forward reads in, both orientations
    screened/seeded/scanned, selection + allele-sum tally -- the per-read
    work of the reference binary's mapping path, for bench.py's
    like-for-like vs_baseline_e2e. Returns (mapped_flags, n_mapped,
    allele_sum) or None if the native library is unavailable.

    reads: (R, L) uint8 forward base codes 1..4.
    sel_seeds: (R,) uint32 per-read selection seeds.
    """
    lib = get_native_lib()
    if lib is None or not hasattr(lib, "gram_tpu_cpu_quasimap_e2e"):
        return None
    k = kmer_index.kmer_size
    present = kmer_index._presence_bitmap()
    if present is None:
        return None
    present_u8 = np.ascontiguousarray(present, dtype=np.uint8)
    # dense per-code CSR offsets over the seed-state arrays
    space = present_u8.size
    counts = np.zeros(space + 1, dtype=np.int64)
    counts[kmer_index.codes.astype(np.int64) + 1] = np.diff(
        kmer_index.offsets)
    kmer_offsets = np.ascontiguousarray(np.cumsum(counts), dtype=np.int64)
    tables = _baseline_tables(idx, jt)
    reads = np.ascontiguousarray(reads, dtype=np.uint8)
    sel_seeds = np.ascontiguousarray(sel_seeds, dtype=np.uint32)
    n_reads, read_len = reads.shape
    allele_sum = np.zeros(n_sites * max_alleles, dtype=np.int64)
    out_mapped = np.empty(n_reads, dtype=np.int32)

    i32p = ctypes.POINTER(ctypes.c_int32)
    as_i32 = lambda a: a.ctypes.data_as(i32p)
    fm = idx.fm
    total = lib.gram_tpu_cpu_quasimap_e2e(
        as_i32(tables[0]), as_i32(tables[1]), as_i32(tables[2]),
        as_i32(tables[3]), as_i32(tables[4]), as_i32(tables[5]),
        tables[6].ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        as_i32(tables[7]), as_i32(tables[8]),
        ctypes.c_int64(fm.size), ctypes.c_int32(jt.max_outcomes),
        ctypes.c_int32(jt.max_ops),
        reads.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(n_reads), ctypes.c_int32(read_len),
        present_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        kmer_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        as_i32(np.ascontiguousarray(kmer_index.lo, dtype=np.int32)),
        as_i32(np.ascontiguousarray(kmer_index.hi, dtype=np.int32)),
        ctypes.c_int32(k),
        sel_seeds.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.c_int64(n_sites), ctypes.c_int32(max_alleles),
        ctypes.c_int32(state_cap), ctypes.c_int32(num_threads),
        allele_sum.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        as_i32(out_mapped))
    if total < 0:
        return None
    return out_mapped.astype(bool), int(total), allele_sum


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


def native_read_batches_flat(path, batch_size: int = 5000,
                             seq_capacity: int = 64 * 1024 * 1024):
    """Yields (flat_seq uint8, lens int32) per batch from a
    FASTA/FASTQ(.gz) file via the native parser -- no per-read Python
    objects (the list-of-arrays path costs ~10us/read in slicing alone
    at throughput buffer sizes). Returns None if the native library is
    unavailable."""
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
                lens = len_buf[:n].copy()
                yield seq_buf[: int(lens.sum())].copy(), lens
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


def native_kmer_screen(fwd: np.ndarray, k: int, present: np.ndarray,
                       num_threads: int = 0):
    """Fused revcomp + kmer-presence screen (native/screen.cpp).

    fwd: (n, L) uint8 base codes 1..4 (no zeros). present: (4^k,) bool.
    Returns (oriented (2n, L) uint8 with rows [fwd_i, revcomp_i, ...],
    passed (2n,) bool) or None when the native library is unavailable."""
    lib = get_native_lib()
    if lib is None or not hasattr(lib, "gram_tpu_kmer_screen"):
        return None
    if present.size != 4 ** k:
        # bitmap does not match k: indexing present[] with 2k-bit codes
        # would read past the bitmap -- fall back to the NumPy screen
        return None
    fwd = np.ascontiguousarray(fwd, dtype=np.uint8)
    n, L = fwd.shape
    oriented = np.empty((2 * n, L), dtype=np.uint8)
    passed = np.empty(2 * n, dtype=np.uint8)
    pres = np.ascontiguousarray(present, dtype=np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.gram_tpu_kmer_screen(
        fwd.ctypes.data_as(u8p), ctypes.c_int64(n), ctypes.c_int32(L),
        ctypes.c_int32(k), pres.ctypes.data_as(u8p),
        oriented.ctypes.data_as(u8p), passed.ctypes.data_as(u8p),
        ctypes.c_int32(num_threads))
    return oriented, passed.astype(bool)
