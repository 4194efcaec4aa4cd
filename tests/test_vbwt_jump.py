"""vBWT jump unit tests, ported from
libgramtools tests/genotype/quasimap/search/test_vBWT_jump.cpp.
"""
import pytest

from gramtools_tpu.index.build import build_prg_index
from gramtools_tpu.mapping.search import (
    SearchState,
    left_markers_search,
    search_state_vbwt_jumps,
)
from gramtools_tpu.prg.linearise import (PrgString, encode_prg,
                                         normalise_legacy_end_markers,
                                         prg_string_to_ints)
from gramtools_tpu.prg.markers import ALLELE_UNKNOWN, FIRST_ALLELE


def make_idx(raw, bracketed=False):
    if bracketed:
        ints = prg_string_to_ints(raw)
    else:
        ints = normalise_legacy_end_markers(encode_prg(raw))
    return build_prg_index(PrgString(ints))


def test_left_markers_search_char_a():
    # test_vBWT_jump.cpp:57-74
    idx = make_idx("gcgct5c6g6a6agtcct")
    result = left_markers_search(SearchState(1, 2), idx)
    assert result == [(6, ALLELE_UNKNOWN), (5, FIRST_ALLELE + 2)]
    assert len(search_state_vbwt_jumps(SearchState(1, 2), idx)) == 2


def test_site_marker_entry_or_exit():
    idx = make_idx("gcgct5C6g6a6Agtcct")
    # char a at site entry point
    result = left_markers_search(SearchState(1, 1), idx)
    assert result[0][0] % 2 == 0  # allele marker -> entry
    # char c at site exit point
    result = left_markers_search(SearchState(7, 7), idx)
    assert result[0][0] % 2 == 1  # site marker -> exit


def test_left_markers_search_char_g():
    idx = make_idx("gcgct5c6g6a6agtcct")
    result = left_markers_search(SearchState(8, 11), idx)
    assert result == [(5, FIRST_ALLELE + 1)]


def test_single_char_allele_skip_to_site_start():
    idx = make_idx("gcgct5c6g6a6agtcct")
    states = search_state_vbwt_jumps(SearchState(8, 11), idx)
    assert len(states) == 1
    assert (states[0].lo, states[0].hi) == (15, 15)


def test_char_c_jump_to_site_start():
    idx = make_idx("gcgct5c6g6a6agtcct")
    states = search_state_vbwt_jumps(SearchState(3, 7), idx)
    assert len(states) == 1
    assert (states[0].lo, states[0].hi) == (15, 15)


def test_allele_marker_interval_three_alleles():
    idx = make_idx("gcgct5c6g6a6agtcct")
    assert idx.fm.symbol_interval(6) == (16, 18)


def test_allele_marker_interval_two_alleles():
    idx = make_idx("aca5g6t6catt")
    assert idx.fm.symbol_interval(6) == (11, 12)


def test_non_continuous_alphabet_allele_marker_boundary():
    idx = make_idx("7g8c8g9t10a10")
    assert idx.fm.symbol_interval(8) == (7, 8)


def test_at_site_entry_jump():
    # test_vBWT_jump.cpp:222-240
    idx = make_idx("gcgct5c6g6t6Agtcct")
    states = search_state_vbwt_jumps(SearchState(1, 1), idx)
    assert states == [SearchState(16, 18, (), ((5, ALLELE_UNKNOWN),))]


def test_allele2_site_exit_jump():
    idx = make_idx("gcgct5c6g6t6agtcct")
    states = search_state_vbwt_jumps(SearchState(7, 10), idx)
    assert states == [SearchState(15, 15, ((5, FIRST_ALLELE + 1),), ())]


def test_allele1_site_exit_jump():
    idx = make_idx("gcgct5c6g6t6agtcct")
    states = search_state_vbwt_jumps(SearchState(2, 6), idx)
    assert states == [SearchState(15, 15, ((5, FIRST_ALLELE),), ())]
