"""Personalised reference tests, ported from
libgramtools tests/genotype/infer/test_personalised_reference.cpp.
"""
import pytest

from gramtools_tpu.index.build import build_prg_index
from gramtools_tpu.infer.personalised_ref import (
    InconsistentPloidyError,
    _alleles_to_paste,
    get_personalised_ref,
)
from gramtools_tpu.infer.segment_tracker import SegmentTracker
from gramtools_tpu.infer.types import Allele, GenotypedSite
from gramtools_tpu.prg.linearise import PrgString, prg_string_to_ints


def test_alleles_to_paste_inconsistent_ploidy_throws():
    site = GenotypedSite(alleles=[Allele("ATA"), Allele("TTA"), Allele("TTT")],
                         genotype=[0, 1])
    with pytest.raises(InconsistentPloidyError):
        _alleles_to_paste(site, 3)


def test_alleles_to_paste_correct_alleles():
    site = GenotypedSite(alleles=[Allele("ATA"), Allele("TTA"), Allele("TTT")],
                         genotype=[0, 2])
    assert _alleles_to_paste(site, 2) == ["ATA", "TTT"]


def test_alleles_to_paste_null_gives_ref():
    site = GenotypedSite(alleles=[Allele("ATA"), Allele("TTA")],
                         genotype=[-1])
    assert _alleles_to_paste(site, 3) == ["ATA", "ATA", "ATA"]


@pytest.fixture
def setup():
    idx = build_prg_index(PrgString(
        prg_string_to_ints("AT[CG[C,G]T,C]TT[AT,TT][C,G]")))

    def bubble_exit(site_id):
        return next(x for e, x in idx.graph.bubbles
                    if idx.graph.node(e).site_id == site_id)

    site1 = GenotypedSite(alleles=[Allele("CGCT", (), 0),
                                   Allele("CGGT", (), 0), Allele("C", (), 1)],
                          site_end_node=bubble_exit(5))
    site2 = GenotypedSite(alleles=[Allele("C"), Allele("G")],
                          site_end_node=bubble_exit(7))
    site3 = GenotypedSite(alleles=[Allele("AT"), Allele("TT")],
                          site_end_node=bubble_exit(9))
    site4 = GenotypedSite(alleles=[Allele("C"), Allele("G")],
                          site_end_node=bubble_exit(11))
    return idx, [site1, site2, site3, site4]


def null_all(sites):
    for s in sites:
        s.genotype = [-1]


def seqs(records):
    return [seq for _, seq in records]


def test_all_null_gts(setup):
    idx, sites = setup
    null_all(sites)
    records = get_personalised_ref(idx, sites, SegmentTracker(""))
    assert seqs(records)[0] == "ATCGCTTTATC"


def test_haploid_gts(setup):
    idx, sites = setup
    null_all(sites)
    sites[0].genotype = [2]
    sites[2].genotype = [1]
    sites[3].genotype = [1]
    records = get_personalised_ref(idx, sites, SegmentTracker(""))
    assert seqs(records)[0] == "ATCTTTTG"


def test_het_diploid_two_refs(setup):
    idx, sites = setup
    null_all(sites)
    sites[0].genotype = [1, 2]
    sites[2].genotype = [0, 1]
    sites[3].genotype = [0, 1]
    records = get_personalised_ref(idx, sites, SegmentTracker(""))
    assert seqs(records) == ["ATCGGTTTATC", "ATCTTTTG"]


def test_hom_diploid_duplicated_refs(setup):
    idx, sites = setup
    null_all(sites)
    sites[0].genotype = [0, 0]
    sites[2].genotype = [1, 1]
    sites[3].genotype = [1, 1]
    records = get_personalised_ref(idx, sites, SegmentTracker(""))
    assert len(records) == 2
    assert set(seqs(records)) == {"ATCGCTTTTTG"}


@pytest.mark.parametrize("coords,expected", [
    ("chr1\t2\nchr2\t9\n", ["AT", "CGCTTTATC"]),
    ("chr1\t6\nchr2\t5\n", ["ATCGCT", "TTATC"]),
    ("chr1\t10\nchr2\t1\n", ["ATCGCTTTAT", "C"]),
    ("chr1\t7\nchr2\t4\n", ["ATCGCTT", "TATC"]),
])
def test_multi_segment_refs(setup, coords, expected):
    idx, sites = setup
    null_all(sites)
    records = get_personalised_ref(idx, sites, SegmentTracker(coords))
    assert seqs(records) == expected
    assert [rid for rid, _ in records] == ["chr1", "chr2"]
