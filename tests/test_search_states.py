"""SearchState path tests, ported from
libgramtools tests/genotype/quasimap/test_quasimap.cpp:420-843
(exact SA intervals + variant paths incl. nested jump chains).
"""
import pytest

from gramtools_tpu.common.seq import encode_dna
from gramtools_tpu.index.build import build_prg_index
from gramtools_tpu.index.kmer_index import build_kmer_index
from gramtools_tpu.mapping.coverage import Coverage, allele_base_non_nested
from gramtools_tpu.mapping.quasimap import QuasimapStats, quasimap_read
from gramtools_tpu.mapping.search import (SearchState,
                                          process_markers_search_states,
                                          search_base_backwards,
                                          search_read_backwards)
from gramtools_tpu.prg.linearise import (PrgString, encode_prg,
                                         normalise_legacy_end_markers,
                                         prg_string_to_ints)
from gramtools_tpu.prg.markers import ALLELE_UNKNOWN, FIRST_ALLELE


class Setup:
    def __init__(self, raw, kmer_size=2, bracketed=False):
        ints = (prg_string_to_ints(raw) if bracketed
                else normalise_legacy_end_markers(encode_prg(raw)))
        self.idx = build_prg_index(PrgString(ints))
        self.kmer_index = build_kmer_index(self.idx, kmer_size)
        self.kmer_size = kmer_size

    def search(self, read_str):
        read = encode_dna(read_str)
        seeds = self.kmer_index.get(
            read[read.size - self.kmer_size:].tobytes(), [])
        return search_read_backwards(read, seeds, self.kmer_size, self.idx)


def test_initially_in_site_have_exited():
    s = Setup("gcgct5c6G6t6agtcct")
    states = process_markers_search_states([SearchState(10, 10)], s.idx)
    states = search_base_backwards(4, states, s.idx)
    assert len(states) == 1
    assert states[0].traversed == ((5, FIRST_ALLELE + 1),)


def test_end_in_site_search_state_and_coverage():
    s = Setup("gcgct5c6g6T6AGTCCt")
    states = s.search("tagtcc")
    assert len(states) == 1
    assert (states[0].lo, states[0].hi) == (14, 14)
    assert states[0].traversing == ((5, ALLELE_UNKNOWN),)

    coverage = Coverage.empty(s.idx)
    quasimap_read(encode_dna("tagtcc"), coverage, s.kmer_index, s.idx,
                  s.kmer_size, QuasimapStats(), 42)
    assert coverage.allele_sum == [[0, 0, 1]]
    assert allele_base_non_nested(s.idx) == [[[0], [0], [1]]]


def test_start_in_site_map_out():
    s = Setup("gcGCT5C6g6t6agtcct")
    states = s.search("gcgctc")
    assert len(states) == 1
    assert states[0].traversed == ((5, FIRST_ALLELE),)


def test_start_out_of_site_map_through():
    s = Setup("gcgcT5c6G6t6AGtcct")
    states = s.search("gctgag")
    assert len(states) == 1
    assert states[0].traversed == ((5, FIRST_ALLELE + 1),)


def test_read_crossing_two_alleles_paths():
    s = Setup("gct5c6g6t6ag7T8c8CT")
    states = s.search("cagtct")
    assert len(states) == 1
    assert states[0].traversed == ((7, FIRST_ALLELE),)
    assert states[0].traversing == ((5, ALLELE_UNKNOWN),)


def test_start_within_allele_end_within_another():
    s = Setup("gct5c6g6t6ag7GAG8c8ct")
    states = s.search("caggag")
    assert len(states) == 1
    assert states[0].traversed == ((7, FIRST_ALLELE),)
    assert states[0].traversing == ((5, ALLELE_UNKNOWN),)


def test_multistep_concurrent_allele_querying():
    s = Setup("gct5gC6aC6C6t6Cg", kmer_size=1)
    states = s.kmer_index.get(bytes([2]), [])
    assert len(states) == 1
    assert states[0].hi - states[0].lo + 1 == 5
    states = process_markers_search_states(list(states), s.idx)
    states = search_base_backwards(2, states, s.idx)
    assert len(states) == 1
    assert states[0].traversing[-1][1] == ALLELE_UNKNOWN
    assert states[0].hi - states[0].lo + 1 == 3


def test_one_mapping_encapsulated_by_allele():
    s = Setup("t5c6gCTTAGT6aa")
    states = s.search("cttagt")
    assert len(states) == 1
    assert states[0].traversed[0] == (5, FIRST_ALLELE + 1)


def test_start_and_end_in_site():
    s = Setup("t5c6gcttagtacgcttagt6aa")
    states = s.search("cttagt")
    assert states == [SearchState(7, 8, ((5, FIRST_ALLELE + 1),), ())]


def test_nested_map_into_and_out_of_nested_site():
    s = Setup("a[c,g[ct,t]a]c", bracketed=True)
    states = s.search("agtac")
    assert states == [SearchState(
        1, 1, ((7, FIRST_ALLELE + 1), (5, FIRST_ALLELE + 1)), ())]


def test_nested_deletion_and_exit_entry_chains():
    s = Setup("t[a[c,g][c,g],]t", kmer_size=1, bracketed=True)
    # direct deletion path
    states = s.search("tt")
    assert states == [SearchState(7, 7, ((5, FIRST_ALLELE + 1),), ())]
    # exit-then-entry chain through two nested sites
    states = s.search("tacct")
    assert states == [SearchState(
        7, 7,
        ((9, FIRST_ALLELE), (7, FIRST_ALLELE), (5, FIRST_ALLELE)), ())]
