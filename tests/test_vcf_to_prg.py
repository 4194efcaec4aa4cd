"""VCF -> PRG string tests, ported from
gramtools/tests/build_command/test_vcf_to_prg_string.py.
"""
import pytest

from gramtools_tpu.common.vcf import VcfRecord
from gramtools_tpu.prg.vcf_to_prg import VcfToPrg, cluster_vcf_records

CHROMS = {"ref1": "AGCAGC", "ref2": "CCC", "ref3": "GGG"}


def rec(pos, ref, alts, chrom):
    return VcfRecord(chrom=chrom, pos=pos, id=".", ref=ref,
                     alts=tuple(alts) if isinstance(alts, (list, tuple))
                     else (alts,), filter=("PASS",))


def test_no_variants_returns_ref_chroms():
    c = VcfToPrg.from_records([], CHROMS)
    assert c.prg_string() == "AGCAGCCCCGGG"


def test_one_variant_chroms_with_no_vars_in_same_order():
    recs = [rec(2, "G", ["CAAA", "CA"], "ref3")]
    c = VcfToPrg.from_records(recs, CHROMS)
    assert c.prg_string() == "AGCAGCCCCG5G6CAAA6CA6G"


def test_two_snps_same_chrom():
    recs = [rec(1, "A", "G", "ref1"), rec(3, "C", ["T", "G"], "ref1")]
    c = VcfToPrg.from_records(recs, CHROMS)
    assert c.prg_string() == "5A6G6G7C8T8G8AGCCCCGGG"


def test_one_ins_and_one_del_diff_chroms():
    recs = [rec(3, "C", ["CGG"], "ref1"), rec(1, "CCC", ["C"], "ref2")]
    c = VcfToPrg.from_records(recs, CHROMS)
    assert c.prg_string() == "AG5C6CGG6AGC7CCC8C8GGG"


def test_adjacent_snps_kept():
    recs = [rec(1, "C", ["G"], "ref2"), rec(2, "C", ["A"], "ref2")]
    c = VcfToPrg.from_records(recs, CHROMS)
    assert c.prg_string() == "AGCAGC5C6G67C8A8CGGG"


def test_legacy_representation():
    chroms = {"ref1": "ACACAA"}
    recs = [rec(1, "A", ["G"], "ref1"), rec(5, "A", ["AAA"], "ref1")]
    c = VcfToPrg.from_records(recs, chroms, mode="legacy")
    assert c.prg_string() == "5A6G5CAC7A8AAA7A"


def test_integer_representation():
    chroms = {"ref1": "ACACAA"}
    recs = [rec(1, "A", ["G"], "ref1"), rec(5, "A", ["AAA"], "ref1")]
    c = VcfToPrg.from_records(recs, chroms)
    assert list(c.prg_ints()) == [5, 1, 6, 3, 6, 2, 1, 2, 7, 1, 8, 1, 1, 1, 8, 1]


def test_overlapping_records_first_kept():
    chroms = {"ref1": "TTTT"}
    recs = [rec(1, "TTT", ["A"], "ref1"), rec(2, "T", ["C"], "ref1")]
    c = VcfToPrg.from_records(recs, chroms)
    assert c.prg_string() == "5TTT6A6T"


def test_non_pass_records_skipped():
    chroms = {"ref1": "TTTT"}
    failing = VcfRecord(chrom="ref1", pos=1, id=".", ref="T", alts=("A",),
                        filter=("LOW_QUAL",))
    c = VcfToPrg.from_records([failing], chroms)
    assert c.prg_string() == "TTTT"
    assert c.skipped_records == 1


def test_mismatching_ref_raises():
    chroms = {"ref1": "TTTT"}
    with pytest.raises(Exception):
        VcfToPrg.from_records([rec(1, "AA", ["G"], "ref1")], chroms)


# --- clustering -------------------------------------------------------------


def test_cluster_merges_overlapping():
    recs = [rec(1, "AAA", ["T"], "ref1"), rec(2, "A", ["C"], "ref1")]
    out = cluster_vcf_records(recs)
    assert len(out) == 1
    merged = out[0]
    assert merged.pos == 1 and merged.ref == "AAA"
    assert set(merged.alts) == {"T", "ACA"}


def test_cluster_keeps_disjoint():
    recs = [rec(1, "A", ["T"], "ref1"), rec(5, "A", ["C"], "ref1")]
    out = cluster_vcf_records(recs)
    assert len(out) == 2
