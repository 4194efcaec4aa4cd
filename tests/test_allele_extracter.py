"""Allele extracter tests, ported from
libgramtools tests/genotype/infer/test_allele_extracter.cpp.
"""
import pytest

from gramtools_tpu.index.build import build_prg_index
from gramtools_tpu.infer.allele_extracter import AlleleExtracter, extract_ref_allele
from gramtools_tpu.infer.types import Allele, GenotypedSite
from gramtools_tpu.prg.linearise import PrgString, prg_string_to_ints


def make_idx(raw):
    return build_prg_index(PrgString(prg_string_to_ints(raw)))


def bubble(idx, site_id):
    return next((e, x) for e, x in idx.graph.bubbles
                if idx.graph.node(e).site_id == site_id)


def as_tuples(alleles):
    return [(a.sequence, a.pb_cov, a.haplogroup) for a in alleles]


def test_extract_ref_allele():
    idx = make_idx("AT[[C,A,G]T[G[,C]C,T],TTA]T")
    entry, exit_ = bubble(idx, 5)
    ref = extract_ref_allele(idx, entry, exit_)
    assert ref.haplogroup == 0
    assert ref.sequence == "CTGC"


def combine(site, existing):
    class Harness(AlleleExtracter):
        def __init__(self):
            self.genotyped_sites = [site]

    return Harness()._allele_combine(existing, 0)


EXISTING = [Allele("ATTG", (0, 1, 2, 3), 0), Allele("ATCG", (0, 0, 1, 1), 0)]


def test_combine_one_called_allele_keeps_left_haplogroup():
    site = GenotypedSite(alleles=[Allele("CCC", (1, 1, 1), 2)], genotype=[0])
    result = combine(site, [EXISTING[0]])
    assert as_tuples(result) == [("ATTGCCC", (0, 1, 2, 3, 1, 1, 1), 0)]


def test_combine_extra_allele_and_callable_propagation():
    site = GenotypedSite(
        alleles=[Allele("CCC", (1, 1, 1)), Allele("GGG", (2, 2, 2))],
        genotype=[1])
    site.extra_alleles = [Allele("AAA", (2, 1, 0), 2, callable=False)]
    result = combine(site, [EXISTING[0]])
    assert as_tuples(result) == [
        ("ATTGGGG", (0, 1, 2, 3, 2, 2, 2), 0),
        ("ATTGAAA", (0, 1, 2, 3, 2, 1, 0), 0),
    ]
    assert result[0].callable and not result[1].callable


def test_combine_null_genotype_uses_first_allele():
    site = GenotypedSite(
        alleles=[Allele("TTT", (1, 1, 1)), Allele("CCC", (0, 1, 1))],
        genotype=[-1])
    result = combine(site, [EXISTING[0]])
    assert as_tuples(result) == [("ATTGTTT", (0, 1, 2, 3, 1, 1, 1), 0)]
    assert result[0].callable


def test_combine_heterozygous_four_combinations():
    site = GenotypedSite(
        alleles=[Allele("CCC", (1, 1, 1), 0), Allele("TTT", (5, 5, 5), 1)],
        genotype=[0, 1])
    result = combine(site, EXISTING)
    assert as_tuples(result) == [
        ("ATTGCCC", (0, 1, 2, 3, 1, 1, 1), 0),
        ("ATTGTTT", (0, 1, 2, 3, 5, 5, 5), 0),
        ("ATCGCCC", (0, 0, 1, 1, 1, 1, 1), 0),
        ("ATCGTTT", (0, 0, 1, 1, 5, 5, 5), 0),
    ]


# --- nested PRG fixture (test_allele_extracter.cpp:133-226) -----------------


@pytest.fixture
def nested():
    idx = make_idx("AT[GCC[C,A,G]T,TTA]T")
    sites = [None, GenotypedSite()]
    sites[1].site_end_node = bubble(idx, 7)[1]
    return idx, sites


def test_nested_bubble_correct_alleles(nested):
    idx, sites = nested
    entry, exit_ = bubble(idx, 7)
    extracter = AlleleExtracter(idx, entry, exit_, sites)
    assert as_tuples(extracter.alleles) == [
        ("C", (0,), 0), ("A", (0,), 1), ("G", (0,), 2)]
    assert extracter.alleles[0].callable


def test_outer_bubble_haploid_nested(nested):
    idx, sites = nested
    sites[1].genotype = [0]
    sites[1].alleles = [Allele("C", (0,), 0)]
    entry, exit_ = bubble(idx, 5)
    extracter = AlleleExtracter(idx, entry, exit_, sites)
    assert as_tuples(extracter.alleles) == [
        ("GCCCT", (0, 0, 0, 0, 0), 0), ("TTA", (0, 0, 0), 1)]


def test_outer_bubble_triploid_nested(nested):
    idx, sites = nested
    sites[1].genotype = [0, 1, 2]
    sites[1].alleles = [Allele("C", (0,), 0), Allele("A", (0,), 1),
                        Allele("G", (0,), 2)]
    entry, exit_ = bubble(idx, 5)
    extracter = AlleleExtracter(idx, entry, exit_, sites)
    assert as_tuples(extracter.alleles) == [
        ("GCCCT", (0, 0, 0, 0, 0), 0),
        ("GCCAT", (0, 0, 0, 0, 0), 0),
        ("GCCGT", (0, 0, 0, 0, 0), 0),
        ("TTA", (0, 0, 0), 1)]


def test_outer_bubble_nonref_nested_ref_gets_produced(nested):
    idx, sites = nested
    sites[1].genotype = [1]
    sites[1].alleles = [Allele("C", (0,), 0), Allele("G", (0,), 2)]
    entry, exit_ = bubble(idx, 5)
    extracter = AlleleExtracter(idx, entry, exit_, sites)
    assert as_tuples(extracter.alleles) == [
        ("GCCCT", (0, 0, 0, 0, 0), 0),
        ("GCCGT", (0, 0, 0, 0, 0), 0),
        ("TTA", (0, 0, 0), 1)]
    assert not extracter.alleles[0].callable


def test_nested_next_best_allele_produced(nested):
    idx, sites = nested
    sites[1].genotype = [1]
    sites[1].alleles = [Allele("C", (0,), 0), Allele("G", (0,), 2)]
    sites[1].extra_alleles = [Allele("A", (0,), 1)]
    entry, exit_ = bubble(idx, 5)
    extracter = AlleleExtracter(idx, entry, exit_, sites)
    assert as_tuples(extracter.alleles) == [
        ("GCCCT", (0, 0, 0, 0, 0), 0),
        ("GCCGT", (0, 0, 0, 0, 0), 0),
        ("GCCAT", (0, 0, 0, 0, 0), 0),
        ("TTA", (0, 0, 0), 1)]


def test_direct_deletion_allele_present():
    idx = make_idx("AT[GCC,TTA,]T")
    entry, exit_ = bubble(idx, 5)
    extracter = AlleleExtracter(idx, entry, exit_, [])
    assert as_tuples(extracter.alleles) == [
        ("GCC", (0, 0, 0), 0), ("TTA", (0, 0, 0), 1), ("", (), 2)]
