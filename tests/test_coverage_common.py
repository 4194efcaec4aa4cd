"""Mapping-selection / LocusFinder tests, ported from
libgramtools tests/genotype/quasimap/coverage/test_coverage_common.cpp.
"""
import pytest

from gramtools_tpu.index.build import build_prg_index
from gramtools_tpu.mapping.coverage import LocusFinder, select_mapping_instance
from gramtools_tpu.mapping.search import PrgIndex, SearchState
from gramtools_tpu.prg.linearise import PrgString, prg_string_to_ints
from gramtools_tpu.prg.markers import ALLELE_UNKNOWN, FIRST_ALLELE


class FinderHarness(LocusFinder):
    """Incremental access to the finder's phases (C++ tests call the
    methods directly on a default-constructed object)."""

    def __init__(self, state=None, idx=None):
        self.state = state
        self.idx = idx
        self.base_sites = set()
        self.used_sites = set()
        self.unique_loci = set()


class FakeGraph:
    def __init__(self, par_map):
        self.par_map = par_map


class FakeIdx:
    def __init__(self, par_map):
        self.graph = FakeGraph(par_map)


PAR_MAP = {9: (7, FIRST_ALLELE), 7: (5, FIRST_ALLELE + 2)}


def test_check_site_uniqueness_throws():
    state = SearchState(0, 0, ((5, FIRST_ALLELE + 1),), ((5, ALLELE_UNKNOWN),))
    f = FinderHarness(state, FakeIdx({}))
    with pytest.raises(RuntimeError):
        f._check_site_uniqueness()


def test_assign_nested_locus_correct_dispatching():
    f = FinderHarness(None, FakeIdx(PAR_MAP))
    f._assign_nested_locus((9, FIRST_ALLELE + 2))
    assert f.base_sites == {5}
    assert f.used_sites == {5, 7, 9}
    assert f.unique_loci == {(5, FIRST_ALLELE + 2), (7, FIRST_ALLELE),
                             (9, FIRST_ALLELE + 2)}
    # second addition: nothing changes
    f._assign_nested_locus((9, 2))
    assert f.base_sites == {5}
    assert f.used_sites == {5, 7, 9}
    assert len(f.unique_loci) == 3


def test_assign_traversed_loci_correct_dispatching():
    state = SearchState(2, 2, ((11, FIRST_ALLELE), (9, FIRST_ALLELE + 2)))
    f = FinderHarness(state, FakeIdx(PAR_MAP))
    f._assign_traversed_loci()
    assert f.base_sites == {5, 11}
    assert f.unique_loci == {(5, FIRST_ALLELE + 2), (7, FIRST_ALLELE),
                             (9, FIRST_ALLELE + 2), (11, FIRST_ALLELE)}


@pytest.fixture(scope="module")
def nested_idx():
    return build_prg_index(PrgString(prg_string_to_ints("A[[G[AC,TC],A]C,T]T")))


def test_assign_traversing_loci_all_unknown(nested_idx):
    # pretense: mapped the read "CCT" (test_coverage_common.cpp:196-211)
    state = SearchState(5, 6, (), ((5, ALLELE_UNKNOWN), (7, ALLELE_UNKNOWN),
                                   (9, ALLELE_UNKNOWN)))
    f = FinderHarness(state, nested_idx)
    f._assign_traversing_loci()
    assert f.base_sites == {5}
    assert f.unique_loci == {(5, FIRST_ALLELE), (7, FIRST_ALLELE),
                             (9, FIRST_ALLELE), (9, FIRST_ALLELE + 1)}


def test_selection_groups_by_base_sites(nested_idx):
    """Full-path states with identical base-site sets share one class."""
    s1 = SearchState(1, 1, ((9, 0),))
    s2 = SearchState(2, 2, ((9, 1),))
    nonvar = SearchState(3, 4)  # two non-variant occurrences
    selected = select_mapping_instance([s1, s2, nonvar], nested_idx,
                                       selection_seed=42)
    # one equivalence class {5,7,9} + 2 non-variant instances = 3 options;
    # whatever the RNG picks, the result is consistent
    assert (selected.states == [] or
            all(st in (s1, s2) for st in selected.states))
