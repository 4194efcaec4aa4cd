"""High-level genotyping tests: map reads then genotype.

Ported from libgramtools tests/genotype/infer/level_genotyping/
test_runner.cpp (prg_setup-based cases).
"""
import numpy as np
import pytest

from gramtools_tpu.index.build import build_prg_index
from gramtools_tpu.index.kmer_index import build_kmer_index
from gramtools_tpu.infer.runner import LevelGenotyper
from gramtools_tpu.mapping.quasimap import quasimap_reads
from gramtools_tpu.mapping.read_stats import ReadStats
from gramtools_tpu.prg.linearise import (PrgString, encode_prg,
                                         normalise_legacy_end_markers,
                                         prg_string_to_ints)


def setup_and_genotype(prg_ints, reads, tmp_path, ploidy=1, kmer_size=2):
    """prg_setup + quasimap_reads + LevelGenotyper (test_resources.hpp)."""
    idx = build_prg_index(PrgString(prg_ints))
    kmer_index = build_kmer_index(idx, kmer_size)
    fastq = tmp_path / "reads.fastq"
    with open(fastq, "w") as fh:
        for i, read in enumerate(reads):
            fh.write(f"@r{i}\n{read}\n+\n{'?' * len(read)}\n")
    read_stats = ReadStats()
    read_stats.compute_base_error_rate(fastq)
    stats, coverage = quasimap_reads([str(fastq)], kmer_index, idx,
                                     kmer_size, seed=42)
    read_stats.compute_coverage_depth(coverage, idx)
    genotyper = LevelGenotyper(idx, coverage, read_stats, ploidy,
                               get_gcp=False)
    return idx, genotyper.genotyped_records


def called_alleles(site):
    return [(a.sequence, a.pb_cov, a.haplogroup)
            for a in site.get_unique_genotyped_alleles()]


def test_two_site_non_nested_prg(tmp_path):
    prg_ints = normalise_legacy_end_markers(encode_prg("AATAA5C6G6AA7C8G8AA"))
    reads = ["AATAACAACAA"] * 5 + ["AATAAGAACAA"]
    _, recs = setup_and_genotype(prg_ints, reads, tmp_path)
    # site 5: five reads on C (the error read covers G)
    assert called_alleles(recs[0]) == [("C", (5,), 0)]
    # site 7: all six reads cross allele C
    assert called_alleles(recs[1]) == [("C", (6,), 0)]


def test_two_site_nested_prg(tmp_path):
    prg_ints = prg_string_to_ints("AATAA[CCC[A,G],T]AA")
    reads = ["AATAACCCGAA"] * 5 + ["AATAATAA"]
    _, recs = setup_and_genotype(prg_ints, reads, tmp_path)
    assert called_alleles(recs[1]) == [("G", (5,), 1)]
    assert called_alleles(recs[0]) == [("CCCG", (5, 5, 5, 5), 0)]


def test_direct_deletion_called_empty_allele(tmp_path):
    prg_ints = prg_string_to_ints("GGGGG[CCC,]GG")
    reads = ["GGGGGG"] * 5
    _, recs = setup_and_genotype(prg_ints, reads, tmp_path)
    # empty (direct-deletion) allele keeps no per-base coverage
    # (runner stores input_alleles, not the coverage-assigned copies)
    assert called_alleles(recs[0]) == [("", (), 1)]


class TestSnpsNestedInTwoHaplotypes:
    PRG = "ATCGGC[TC[A,G]TC,GG[T,G]GG]AT"

    def run(self, tmp_path, reads):
        prg_ints = prg_string_to_ints(self.PRG)
        return setup_and_genotype(prg_ints, reads, tmp_path)

    def test_no_reads_all_null(self, tmp_path):
        _, recs = self.run(tmp_path, [])
        assert all(r.is_null() for r in recs)

    def test_calls_snp_in_chosen_haplotype_invalidates_other(self, tmp_path):
        # 7 reads through 5:0/7:1, 1 read through 5:1/9:0
        reads = ["ATCGGCTCGTCAT"] * 7 + ["ATCGGCGGTGGAT"]
        _, recs = self.run(tmp_path, reads)
        # outer site called on haplogroup 0
        assert recs[0].get_unique_genotyped_alleles()[0].sequence == "TCGTC"
        # nested site in haplogroup 0 called G
        assert called_alleles(recs[1])[0][0] == "G"
        # nested site on the non-chosen haplogroup is invalidated (null)
        assert recs[2].is_null()
