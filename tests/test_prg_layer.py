"""PRG layer tests.

Ported case-for-case from the reference C++ suite:
libgramtools/tests/prg/test_linearised_prg.cpp and test_covGraph.cpp.
"""
import numpy as np
import pytest

from gramtools_tpu.prg.linearise import (
    PrgString,
    encode_prg,
    ints_to_prg_string,
    prg_string_to_ints,
)
from gramtools_tpu.prg.graph import build_cov_graph
from gramtools_tpu.prg.markers import ALLELE_UNKNOWN, FIRST_ALLELE

first = FIRST_ALLELE
unkn = ALLELE_UNKNOWN


def graph_of(prg_string: str):
    return build_cov_graph(PrgString(prg_string_to_ints(prg_string)))


# --- linearised PRG converters ---------------------------------------------


def test_prg_string_to_ints_roundtrip():
    s = "[A,AA,A[A,C]A]C[AC,C]G"
    ints = prg_string_to_ints(s)
    assert ints_to_prg_string(ints) == s.upper()


def test_prg_string_to_ints_simple():
    assert list(prg_string_to_ints("[A,C]")) == [5, 1, 6, 2, 6]


def test_prg_string_nested_markers():
    # nested site gets next odd marker pair
    assert list(prg_string_to_ints("[A[G,T],C]")) == [5, 1, 7, 3, 8, 4, 8, 6, 2, 6]


def test_encode_prg_numbered():
    assert list(encode_prg("a5g6t6cccc11g12tttt12")) == [
        1, 5, 3, 6, 4, 6, 2, 2, 2, 2, 11, 3, 12, 4, 4, 4, 4, 12,
    ]


def test_non_nucleotide_raises():
    with pytest.raises(ValueError):
        prg_string_to_ints("[A,N]")


def test_binary_roundtrip(tmp_path):
    ints = prg_string_to_ints("AAA[CC,TA]AC[TTTT,GGG]")
    p = PrgString(ints)
    fpath = tmp_path / "prg.bin"
    p.write(fpath)
    p2 = PrgString.from_file(fpath)
    assert p == p2


# --- PRG consistency checks (test_covGraph.cpp:17-32) -----------------------


def test_duplicate_site_markers_fails():
    with pytest.raises(ValueError):
        PrgString([5, 1, 6, 2, 6, 2, 5, 1, 6, 3, 6])


def test_site_with_no_alleles_fails():
    p = PrgString([5, 6, 2, 7, 1, 8, 3, 8])
    with pytest.raises(ValueError):
        build_cov_graph(p)


def test_site_with_one_allele_fails():
    p = PrgString([5, 2, 6, 2, 7, 1, 8, 3, 8])
    with pytest.raises(ValueError):
        build_cov_graph(p)


# --- nesting status (test_covGraph.cpp:34-48) -------------------------------


def test_is_nested_status():
    assert not graph_of("ATCG[GC,G]A[AT,T]A").is_nested
    assert graph_of("[A,]A[[G,A]A,C,T]").is_nested


# --- bubble positions (test_covGraph.cpp:50-86) -----------------------------


def bubble_entry_pos(g, site_id):
    for entry, _ in g.bubbles:
        if g.node(entry).site_id == site_id:
            return g.node(entry).pos
    raise KeyError(site_id)


def test_sequence_positions():
    g = graph_of("ATCG[G[A,CCC]C,G]A[AT,T]A")
    assert bubble_entry_pos(g, 5) == 4
    assert bubble_entry_pos(g, 7) == 5
    assert bubble_entry_pos(g, 9) == 8


def test_sequence_positions2():
    g = graph_of("ATCG[G[A,CCC]C,GGG[AAA,C]]AA[T,C]")
    assert bubble_entry_pos(g, 5) == 4
    assert bubble_entry_pos(g, 7) == 5
    assert bubble_entry_pos(g, 9) == 7
    assert bubble_entry_pos(g, 11) == 9


# --- target map (test_covGraph.cpp:88-160) ----------------------------------


def test_target_map_site_entry_three_cases():
    v = [5, 1, 6, 2, 6, 7, 1, 2, 8, 2, 8, 2, 9, 11, 1, 12, 3,
         12, 2, 10, 1, 10, 1, 13, 2, 14, 15, 1, 16, 2, 16, 4, 14]
    g = build_cov_graph(PrgString(v))
    assert g.target_map == {
        7: [(6, unkn)],
        11: [(9, unkn)],
        15: [(13, unkn)],
    }


def test_target_map_site_exit_two_cases():
    v = [15, 1, 16, 2, 19, 1, 20, 2, 20, 16, 3, 3, 7, 4, 8, 8, 1]
    g = build_cov_graph(PrgString(v))
    assert g.target_map == {
        16: [(20, unkn)],
        8: [(7, first + 1)],
    }


def test_target_map_allele_end_three_cases():
    v = [2, 3, 9, 2, 11, 3, 12, 3, 12, 10, 1, 10, 4, 4, 4, 5, 6, 4, 6,
         1, 2, 3, 7, 2, 8, 8, 1, 8]
    g = build_cov_graph(PrgString(v))
    assert g.target_map == {
        6: [(5, first)],
        8: [(7, first + 1)],
        10: [(12, unkn)],
    }


def test_target_map_allele_marker_multiple_targets():
    v = [2, 3, 7, 8, 3, 9, 2, 10, 1, 10, 8, 3]
    g = build_cov_graph(PrgString(v))
    assert g.target_map == {
        8: [(7, first), (10, unkn)],
    }


# --- nested builder fixture (test_covGraph.cpp:166-280) ---------------------


@pytest.fixture(scope="module")
def nested():
    return graph_of("[A,AA,A[A,C]A]C[AC,C]G")


def test_parental_map(nested):
    assert nested.par_map == {7: (5, 2)}


def test_site_and_allele_ids(nested):
    expected = [
        (5, unkn), (5, first), (5, unkn), (5, first + 1),
        (5, first + 1), (5, unkn), (5, first + 2), (7, unkn),
        (7, first), (7, unkn), (7, first + 1), (7, unkn),
        (5, first + 2), (5, unkn), (0, unkn), (9, unkn),
        (9, first), (9, first), (9, unkn), (9, first + 1),
        (9, unkn), (0, unkn),
    ]
    res = [
        (nested.node(i).site_id, nested.node(i).allele_id)
        for i in nested.ra_node
    ]
    assert res == expected


def test_node_positions(nested):
    expected = [0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 1, 1, 2, 2, 2, 2, 2, 4, 4]
    assert [nested.node(i).pos for i in nested.ra_node] == expected


def test_coverage_allocation(nested):
    for node in nested.nodes:
        if node.in_bubble() and node.has_sequence():
            assert nested.node_coverage(node.idx).size == node.seq_size


# --- adjacent markers fixture (test_covGraph.cpp:322-446) -------------------


@pytest.fixture(scope="module")
def adj():
    return graph_of("[A,]A[[G,A]A,C,T]")


def test_adj_marker_wiring(adj):
    # site 5's entry has a direct edge to its exit (deletion allele)
    entry5 = next(e for e, _ in adj.bubbles if adj.node(e).site_id == 5)
    exit5 = next(x for e, x in adj.bubbles if adj.node(e).site_id == 5)
    assert len(adj.node(entry5).edges) == 2
    assert adj.node(entry5).edges[1] == exit5
    # site 7's entry points directly at site 9's entry
    entry7 = next(e for e, _ in adj.bubbles if adj.node(e).site_id == 7)
    entry9 = next(e for e, _ in adj.bubbles if adj.node(e).site_id == 9)
    assert adj.node(entry7).edges[0] == entry9


def test_bubble_ordering(adj):
    # child-first: site indices 2 (ID 9), 1 (ID 7), 0 (ID 5)
    site_indices = [(adj.node(e).site_id - 5) // 2 for e, _ in adj.bubbles]
    assert site_indices == [2, 1, 0]


def test_adj_random_access_targets(adj):
    expected_sites = [0, 5, 0, 0, 6, 0, 0, 9, 0, 10, 0, 10, 0, 8, 0, 8, 0]
    expected_alleles = [
        unkn, first, unkn, unkn, unkn, unkn, unkn, first, unkn,
        first + 1, unkn, first, unkn, first + 1, unkn, first + 2, unkn,
    ]
    assert list(adj.ra_target_site) == expected_sites
    assert list(adj.ra_target_allele) == expected_alleles


def test_adj_target_map(adj):
    assert adj.target_map == {
        6: [(5, first + 1)],
        9: [(7, unkn)],
    }


def test_adj_parental_map(adj):
    assert adj.par_map == {9: (7, first)}
