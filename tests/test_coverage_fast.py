"""Vectorised selection+recording (coverage_fast) vs the scalar path.

The scalar path (coverage.py record_search_states) is the oracle; the
log engine's record_buffer must produce identical allele-sum lists,
grouped-count dicts and per-base coverage for whole buffers, including
RNG-exact multi-mapping selection and nonvariant picks."""
from pathlib import Path

import numpy as np
import pytest

from gramtools_tpu.index.build import build_prg_index
from gramtools_tpu.index.kmer_index import build_kmer_index
from gramtools_tpu.index.kmer_index_vec import build_kmer_index_vectorised
from gramtools_tpu.mapping.quasimap import quasimap_reads
from gramtools_tpu.mapping.search_jax_log import LogBatchedEngine, LogConfig
from gramtools_tpu.prg.linearise import PrgString, prg_string_to_ints

DATA_DIR = Path("/root/reference/gramtools/tests/integration_test_data")


def repeat_prg(rng, num_sites=4, nested=False):
    """PRG with repeated flanks so reads multimap (forces nonvariant
    occurrences + multiple equivalence classes into selection)."""
    motif = "".join(rng.choice(list("ACGT"), size=6))
    parts = []
    for _ in range(num_sites):
        parts.append(motif)  # repeated -> multimapping reads
        n_alleles = rng.randint(2, 4)
        alleles = []
        for _ in range(n_alleles):
            length = rng.randint(0 if nested else 1, 5)
            alleles.append("".join(rng.choice(list("ACGT"), size=length)))
        if nested and rng.rand() < 0.5 and len(alleles[0]) >= 2:
            mid = len(alleles[0]) // 2
            alleles[0] = alleles[0][:mid] + "[A,C]" + alleles[0][mid:]
        parts.append("[" + ",".join(alleles) + "]")
    parts.append(motif)
    return "".join(parts)


def run_both(prg_str, reads, k, seed):
    try:
        prg = PrgString(prg_string_to_ints(prg_str))
        idx_h = build_prg_index(prg)
        idx_d = build_prg_index(PrgString(prg_string_to_ints(prg_str)))
    except ValueError:
        pytest.skip("inconsistent random PRG")
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        fq = os.path.join(td, "reads.fastq")
        with open(fq, "w") as fh:
            for i, r in enumerate(reads):
                s = "".join("ACGT"[b - 1] for b in r)
                fh.write(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n")
        kidx_h = build_kmer_index(idx_h, k)
        stats_h, cov_h = quasimap_reads([fq], kidx_h, idx_h, k, seed=seed)
        pb_h = idx_h.graph.coverage.copy()

        kidx_d = build_kmer_index_vectorised(idx_d, k)
        engine = LogBatchedEngine(idx_d, k, LogConfig(pool=512, hits=128))
        stats_d, cov_d = quasimap_reads([fq], kidx_d, idx_d, k, seed=seed,
                                        engine=engine)
        pb_d = idx_d.graph.coverage.copy()
    return (stats_h, cov_h, pb_h), (stats_d, cov_d, pb_d), engine


@pytest.mark.parametrize("seed,nested", [(0, False), (1, False), (2, True),
                                         (3, True), (7, True), (11, False)])
def test_record_buffer_matches_scalar_random(seed, nested):
    rng = np.random.RandomState(seed)
    prg_str = repeat_prg(rng, num_sites=5, nested=nested)
    reads = []
    for _ in range(60):
        length = rng.randint(4, 14)
        reads.append(rng.randint(1, 5, size=length).astype(np.uint8))
    (st_h, cov_h, pb_h), (st_d, cov_d, pb_d), engine = run_both(
        prg_str, reads, 3, seed * 31 + 1)
    assert st_d.as_dict() == st_h.as_dict()
    assert cov_d.allele_sum == cov_h.allele_sum
    assert cov_d.grouped_counts == cov_h.grouped_counts
    np.testing.assert_array_equal(pb_d, pb_h)


def test_record_buffer_matches_scalar_hard_nested():
    prgs = ["A[[A[CCC,C],T],G]TA",
            "A[T[TT,T]T,A[AT,]A]G[C,G]",
            "T[A[C,G][C,G],]T"]
    rng = np.random.RandomState(123)
    for prg_str in prgs:
        reads = [rng.randint(1, 5, size=rng.randint(4, 10)).astype(np.uint8)
                 for _ in range(40)]
        (st_h, cov_h, pb_h), (st_d, cov_d, pb_d), _ = run_both(
            prg_str, reads, 3, 99)
        assert cov_d.allele_sum == cov_h.allele_sum
        assert cov_d.grouped_counts == cov_h.grouped_counts
        np.testing.assert_array_equal(pb_d, pb_h)


@pytest.mark.skipif(not DATA_DIR.exists(), reason="fixtures unavailable")
@pytest.mark.parametrize("fixture,expected_grouped", [
    ("IT1", [{(0,): 1, (1,): 1}, {(0,): 1, (1,): 1}]),
    ("IT2", [{(0, 1): 1}, {(0, 1): 1}]),
    ("IT3", [{(0,): 1, (0, 1): 1}, {(0,): 1}]),
])
def test_record_buffer_fixture_parity(fixture, expected_grouped):
    prg = PrgString.from_file(DATA_DIR / fixture / "prg.bin")
    idx = build_prg_index(prg)
    kmer_index = build_kmer_index_vectorised(idx, 5)
    engine = LogBatchedEngine(idx, 5)
    stats, coverage = quasimap_reads(
        [str(DATA_DIR / fixture / "reads.fastq")], kmer_index, idx, 5,
        seed=42, engine=engine)
    assert coverage.grouped_counts == expected_grouped


def test_record_buffer_nonvariant_vs_class_pick():
    """A read occurring both in nonvariant sequence and inside an allele:
    the RNG pick between nonvariant occurrence and site class must match
    the scalar path for many seeds (coverage_common.cpp:85-146)."""
    prg_str = "TTGCAACCGT[TGCAA,G]CGTTGCAA[A,C]GG"
    rng = np.random.RandomState(5)
    reads = [np.array([4, 3, 2, 1, 1], dtype=np.uint8)] * 3  # TGCAA x3
    reads += [rng.randint(1, 5, size=6).astype(np.uint8) for _ in range(10)]
    for seed in range(12):
        (st_h, cov_h, pb_h), (st_d, cov_d, pb_d), _ = run_both(
            prg_str, reads, 3, seed)
        assert cov_d.allele_sum == cov_h.allele_sum, seed
        assert cov_d.grouped_counts == cov_h.grouped_counts, seed
        np.testing.assert_array_equal(pb_d, pb_h)


def test_record_buffer_encapsulated_runs():
    """Reads fully inside an allele, repeated within it: run-merged
    per-occurrence states (encapsulated_search.cpp:30-107)."""
    prg_str = "CCGTA[TGCATGCATGCA,AAT]GGTTC"
    reads = [np.array([4, 3, 2, 1], dtype=np.uint8)] * 2      # TGCA
    reads += [np.array([2, 1, 4, 3], dtype=np.uint8)]         # CATG
    for seed in (1, 5, 9):
        (st_h, cov_h, pb_h), (st_d, cov_d, pb_d), _ = run_both(
            prg_str, reads, 3, seed)
        assert cov_d.allele_sum == cov_h.allele_sum
        assert cov_d.grouped_counts == cov_h.grouped_counts
        np.testing.assert_array_equal(pb_d, pb_h)
