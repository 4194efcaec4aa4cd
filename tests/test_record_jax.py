"""Device-side recorder (record_jax) vs the scalar oracle under stress:
tiny budgets force overflow -> full-budget device retry -> host fallback,
and outputs must stay bit-identical through every path."""
import os
import tempfile
from pathlib import Path

import numpy as np
import pytest

from gramtools_tpu.index.build import build_prg_index
from gramtools_tpu.index.kmer_index import build_kmer_index
from gramtools_tpu.index.kmer_index_vec import build_kmer_index_vectorised
from gramtools_tpu.mapping.quasimap import quasimap_reads
from gramtools_tpu.mapping.search_jax_log import LogBatchedEngine, LogConfig
from gramtools_tpu.prg.linearise import PrgString, prg_string_to_ints


def _write_reads(td, reads):
    fq = os.path.join(td, "reads.fastq")
    with open(fq, "w") as fh:
        for i, r in enumerate(reads):
            s = "".join("ACGT"[b - 1] for b in r)
            fh.write(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n")
    return fq


def _run_scalar(prg_str, reads, k, seed):
    prg = PrgString(prg_string_to_ints(prg_str))
    idx = build_prg_index(prg)
    with tempfile.TemporaryDirectory() as td:
        fq = _write_reads(td, reads)
        kidx = build_kmer_index(idx, k)
        stats, cov = quasimap_reads([fq], kidx, idx, k, seed=seed)
    return stats, cov, idx.graph.coverage.copy()


def _run_device(prg_str, reads, k, seed, cfg, env=None):
    prg = PrgString(prg_string_to_ints(prg_str))
    idx = build_prg_index(prg)
    old = {}
    env = env or {}
    for key, val in env.items():
        old[key] = os.environ.get(key)
        os.environ[key] = val
    try:
        with tempfile.TemporaryDirectory() as td:
            fq = _write_reads(td, reads)
            kidx = build_kmer_index_vectorised(idx, k)
            engine = LogBatchedEngine(idx, k, cfg)
            assert engine.device_record
            stats, cov = quasimap_reads([fq], kidx, idx, k, seed=seed,
                                        engine=engine)
    finally:
        for key, val in old.items():
            if val is None:
                os.environ.pop(key, None)
            else:
                os.environ[key] = val
    return stats, cov, idx.graph.coverage.copy(), engine


PRG = "TTGCAACCGT[TGCAA,G]CGTTGCAA[A,C]GGA[C[A,T]G,T]TT"


def _sampled_reads(rng, n):
    reads = [np.array([4, 3, 2, 1, 1], dtype=np.uint8)] * 2  # TGCAA multimap
    for _ in range(n):
        reads.append(rng.randint(1, 5, size=rng.randint(5, 10)).astype(
            np.uint8))
    return reads


def test_device_record_with_retry_matches_scalar():
    """Tiny pool/hits so the scan overflows -> the fused retry pass must
    re-record overflowed rows identically."""
    rng = np.random.RandomState(3)
    reads = _sampled_reads(rng, 40)
    st_h, cov_h, pb_h = _run_scalar(PRG, reads, 3, 17)
    st_d, cov_d, pb_d, engine = _run_device(
        PRG, reads, 3, 17, LogConfig(pool=64, hits=4),
        env={"GRAMTOOLS_TPU_RETRY_MIN": "1"})
    assert st_d.as_dict() == st_h.as_dict()
    assert cov_d.allele_sum == cov_h.allele_sum
    assert cov_d.grouped_counts == cov_h.grouped_counts
    np.testing.assert_array_equal(pb_d, pb_h)


def test_device_record_heavy_fallback_matches_scalar():
    """retry disabled (high retry_min): overflowed rows go straight to
    the exact host path; device + host contributions must stay disjoint
    and sum to the scalar result."""
    rng = np.random.RandomState(11)
    reads = _sampled_reads(rng, 40)
    st_h, cov_h, pb_h = _run_scalar(PRG, reads, 3, 23)
    st_d, cov_d, pb_d, engine = _run_device(
        PRG, reads, 3, 23, LogConfig(pool=48, hits=4),
        env={"GRAMTOOLS_TPU_RETRY_MIN": "100000"})
    assert st_d.as_dict() == st_h.as_dict()
    assert cov_d.allele_sum == cov_h.allele_sum
    assert cov_d.grouped_counts == cov_h.grouped_counts
    np.testing.assert_array_equal(pb_d, pb_h)


def test_device_record_many_seeds_parity():
    """Seed sweep: RNG pick parity (incl. rejection-branch fallback)."""
    rng = np.random.RandomState(7)
    reads = _sampled_reads(rng, 25)
    for seed in range(6):
        st_h, cov_h, pb_h = _run_scalar(PRG, reads, 3, seed)
        st_d, cov_d, pb_d, _ = _run_device(
            PRG, reads, 3, seed, LogConfig(pool=256, hits=64))
        assert cov_d.allele_sum == cov_h.allele_sum, seed
        assert cov_d.grouped_counts == cov_h.grouped_counts, seed
        np.testing.assert_array_equal(pb_d, pb_h)
