"""Per-base coverage recorder tests, ported from
libgramtools tests/genotype/quasimap/coverage/test_allele_base.cpp.

collect_coverage parity (test_resources.cpp:9-21): coverage of the node
at each given PRG position.
"""
import numpy as np
import pytest

from gramtools_tpu.index.build import build_prg_index
from gramtools_tpu.mapping.coverage import record_per_base
from gramtools_tpu.mapping.coverage_fast import record_per_base_batch
from gramtools_tpu.mapping.search import SearchState
from gramtools_tpu.prg.linearise import (PrgString, encode_prg,
                                         normalise_legacy_end_markers,
                                         prg_string_to_ints)
from gramtools_tpu.prg.markers import FIRST_ALLELE


def make_idx(raw, bracketed=False):
    ints = (prg_string_to_ints(raw) if bracketed
            else normalise_legacy_end_markers(encode_prg(raw)))
    return build_prg_index(PrgString(ints))


def collect_coverage(idx, positions):
    out = []
    g = idx.graph
    for pos in positions:
        node = int(g.ra_node[pos])
        out.append([int(c) for c in g.node_coverage(node)])
    return out


RECORDERS = [
    ("scalar", lambda idx, per_read: [record_per_base(idx, s, n)
                                      for s, n in per_read]),
    ("batch", record_per_base_batch),
]


@pytest.mark.parametrize("name,recorder", RECORDERS)
class TestTwoSitesNoNesting:
    POSITIONS = [0, 4, 6, 8, 10, 13, 15, 18]

    def test_read_covers_two_sites(self, name, recorder):
        idx = make_idx("GCT5C6G6T6AG7T8CC8CT")
        read_1 = SearchState(4, 4, ((7, FIRST_ALLELE + 1),
                                    (5, FIRST_ALLELE + 1)))
        recorder(idx, [([read_1], 6)])
        assert collect_coverage(idx, self.POSITIONS) == [
            [], [0], [1], [0], [], [0], [1, 0], []]

    def test_read_covers_two_sites_2(self, name, recorder):
        idx = make_idx("GCT5C6G6T6AG7T8CC8CT")
        read_2 = SearchState(12, 12, ((7, FIRST_ALLELE + 1),))
        recorder(idx, [([read_2], 7)])
        assert collect_coverage(idx, self.POSITIONS) == [
            [], [0], [0], [1], [], [0], [1, 1], []]


@pytest.mark.parametrize("name,recorder", RECORDERS)
class TestRepeatsAndEmptyAllele:
    PRG = "AAT[ATAT,AA,]AGG"
    POSITIONS = [0, 4, 9, 12]

    def test_repeated_multimapped_read_coverage_added_once(self, name, recorder):
        idx = make_idx(self.PRG, bracketed=True)
        states = [SearchState(4, 4), SearchState(5, 5, ((5, FIRST_ALLELE),))]
        recorder(idx, [(states, 4)])
        assert collect_coverage(idx, self.POSITIONS) == [
            [], [1, 1, 1, 1], [0, 0], []]

    def test_map_read_multiple_times_coverage_multiply_added(self, name,
                                                             recorder):
        idx = make_idx(self.PRG, bracketed=True)
        read_2 = SearchState(5, 5, ((5, FIRST_ALLELE + 1),))
        for _ in range(3):
            recorder(idx, [([read_2], 5)])
        expected = [[], [0, 0, 0, 0], [3, 3], []]
        assert collect_coverage(idx, self.POSITIONS) == expected
        # deletion read: no per-base coverage to record
        read_3 = SearchState(1, 1, ((5, FIRST_ALLELE + 2),))
        for _ in range(5):
            recorder(idx, [([read_3], 5)])
        assert collect_coverage(idx, self.POSITIONS) == expected


@pytest.mark.parametrize("name,recorder", RECORDERS)
def test_batch_multiple_reads_at_once(name, recorder):
    idx = make_idx("GCT5C6G6T6AG7T8CC8CT")
    read_1 = SearchState(4, 4, ((7, FIRST_ALLELE + 1), (5, FIRST_ALLELE + 1)))
    read_2 = SearchState(12, 12, ((7, FIRST_ALLELE + 1),))
    recorder(idx, [([read_1], 6), ([read_2], 7)])
    assert collect_coverage(idx, [4, 6, 8, 15]) == [[0], [1], [1], [2, 1]]
