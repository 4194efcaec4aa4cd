"""BWT backward-search tests, ported from
libgramtools tests/genotype/quasimap/search/test_BWT_search.cpp.
"""
import pytest

from gramtools_tpu.common.seq import encode_dna
from gramtools_tpu.index.build import build_prg_index
from gramtools_tpu.mapping.search import (SearchState, initial_state,
                                          search_base_backwards,
                                          search_read_backwards)
from gramtools_tpu.prg.linearise import (PrgString, encode_prg,
                                         normalise_legacy_end_markers)

G, C, A, T = 3, 2, 1, 4


def make_idx(raw):
    return build_prg_index(
        PrgString(normalise_legacy_end_markers(encode_prg(raw))))


def test_dna_rank_queries():
    idx = make_idx("aca5g6t6gctc")
    # how many 'C' in bwt[0:8) and bwt[0:10)
    assert idx.fm.rank_base(C, 8) == 2
    assert idx.fm.rank_base(C, 10) == 3


def test_single_char_interval():
    idx = make_idx("gcgctggagtgctgt")
    result = search_base_backwards(G, [initial_state(idx)], idx)
    assert result == [SearchState(5, 11)]


def test_two_consecutive_chars():
    idx = make_idx("gcgctggagtgctgt")
    states = search_base_backwards(G, [initial_state(idx)], idx)
    states = search_base_backwards(T, states, idx)
    assert states == [SearchState(13, 15)]


def test_single_char_freq_one():
    idx = make_idx("gcgctggagtgctgt")
    result = search_base_backwards(A, [initial_state(idx)], idx)
    assert result == [SearchState(1, 1)]


def test_no_valid_interval_returns_empty():
    idx = make_idx("gcgctggagtgctgt")
    states = search_base_backwards(A, [initial_state(idx)], idx)
    states = search_base_backwards(A, states, idx)
    assert states == []


def test_one_base_extension_gc():
    idx = make_idx("gcgct5c6g6a6agtcct")
    lo, hi = idx.fm.base_next_sa_interval(G, 3, 7)
    assert (lo, hi) == (8, 9)


def test_one_base_extension_ag():
    idx = make_idx("gcgct5c6g6a6agtcct")
    lo, hi = idx.fm.base_next_sa_interval(A, 8, 11)
    assert (lo, hi) == (1, 1)


def test_read_leads_to_prg_edge_no_states():
    from gramtools_tpu.index.kmer_index import build_kmer_index
    idx = make_idx("gcgct5c6g6t6agtcct")
    kmer_index = build_kmer_index(idx, 4)
    read = encode_dna("agcgc")
    seeds = kmer_index.get(encode_dna("gcgc").tobytes(), [])
    assert seeds
    states = search_read_backwards(read, seeds, 4, idx)
    assert states == []
