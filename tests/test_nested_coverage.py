"""Nested-PRG coverage parity, ported from
libgramtools tests/genotype/quasimap/test_quasimap.cpp:695-843
(grouped counts + per-base coverage with double nesting, multi-mapping
and direct deletions).
"""
import pytest

from gramtools_tpu.common.seq import encode_dna
from gramtools_tpu.index.build import build_prg_index
from gramtools_tpu.index.kmer_index import build_kmer_index
from gramtools_tpu.mapping.coverage import Coverage
from gramtools_tpu.mapping.quasimap import QuasimapStats, quasimap_read
from gramtools_tpu.prg.linearise import PrgString, prg_string_to_ints


class Setup:
    def __init__(self, raw, kmer_size=2):
        self.idx = build_prg_index(PrgString(prg_string_to_ints(raw)))
        self.kmer_index = build_kmer_index(self.idx, kmer_size)
        self.kmer_size = kmer_size
        self.coverage = Coverage.empty(self.idx)
        self.stats = QuasimapStats()

    def map(self, read_str, seed=42):
        quasimap_read(encode_dna(read_str), self.coverage, self.kmer_index,
                      self.idx, self.kmer_size, self.stats, seed)

    def collect_coverage(self, positions):
        g = self.idx.graph
        return [[int(c) for c in g.node_coverage(int(g.ra_node[p]))]
                for p in positions]


class TestDoubleNesting:
    PRG = "A[[A[CCC,c],t],g]TA"
    POSITIONS = [0, 3, 5, 9, 12, 15, 17]

    def test_read_ends_inside_nested_site(self):
        s = Setup(self.PRG)
        s.map("AACCCTA")
        assert s.coverage.grouped_counts == [
            {(0,): 1}, {(0,): 1}, {(0,): 1}]
        assert s.collect_coverage(self.POSITIONS) == [
            [], [1], [1, 1, 1], [0], [0], [0], []]

    def test_read_multimaps(self):
        s = Setup(self.PRG)
        s.map("CTA")
        assert s.coverage.grouped_counts == [
            {(0,): 1}, {(0,): 1}, {(0, 1): 1}]
        assert s.collect_coverage(self.POSITIONS) == [
            [], [0], [0, 0, 1], [1], [0], [0], []]


class TestSingleNestingPlusSNP:
    PRG = "a[t[tt,t]t,a[at,]a]g[c,g]"
    POSITIONS = [0, 2, 4, 7, 9, 11, 13, 17, 19, 21, 23]

    def test_fully_crossing_read(self):
        s = Setup(self.PRG)
        s.map("ATTTTGC")
        assert s.coverage.grouped_counts == [
            {(0,): 1}, {(0,): 1}, {}, {(0,): 1}]
        assert s.collect_coverage(self.POSITIONS) == [
            [], [1], [1, 1], [0], [1], [0], [0, 0], [0], [], [1], [0]]

    def test_very_multimapping_read(self):
        s = Setup(self.PRG)
        s.map("TT")
        assert s.coverage.grouped_counts == [
            {(0,): 1}, {(0, 1): 1}, {}, {}]
        assert s.collect_coverage(self.POSITIONS) == [
            [], [1], [1, 1], [1], [1], [0], [0, 0], [0], [], [0], [0]]

    def test_map_through_direct_deletion(self):
        s = Setup(self.PRG)
        s.map("AAAGG")
        assert s.coverage.grouped_counts == [
            {(1,): 1}, {}, {(1,): 1}, {(1,): 1}]
        assert s.collect_coverage(self.POSITIONS) == [
            [], [0], [0, 0], [0], [0], [1], [0, 0], [1], [], [0], [1]]
