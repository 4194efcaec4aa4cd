"""Rebasing algebra tests, ported from
gramtools/tests/discover/test_discover_unit_tests.py (all cases).
"""
import pytest

from gramtools_tpu.common.vcf import VcfRecord
from gramtools_tpu.commands.discover_command import rebase_vcf_record
from gramtools_tpu.commands.seq_region_map import (
    SearchableSeqRegionsMap,
    SeqRegionMapper,
)


def rec(pos, ref, alts, chrom="chr0", gt="1/1"):
    return VcfRecord(chrom=chrom, pos=pos, id=".", ref=ref, alts=tuple(alts),
                     filter=("PASS",), format="GT", samples=(gt,))


def run_rebase(discov_record, base_records, chrom_sizes):
    names = [f"chr{i}" for i in range(len(chrom_sizes))]
    named = dict(zip(names, chrom_sizes))
    region_map = SeqRegionMapper(base_records, named).get_map()
    searcher = SearchableSeqRegionsMap(region_map)
    return rebase_vcf_record(discov_record, discov_record.chrom, searcher)


def same(a, b):
    return (a.pos, a.ref, tuple(a.alts), a.chrom) == (b.pos, b.ref, tuple(b.alts), b.chrom)


def test_rebasing_in_unknown_chromosome_fails():
    base = [rec(2, "T", ["G"])]
    discov = rec(3, "C", ["G"], chrom="chr1")
    with pytest.raises(KeyError):
        run_rebase(discov, base, [5])


def test_variant_in_invariant_chromosome():
    base = [rec(2, "TAT", ["G"])]
    discov = rec(1, "TT", ["GA"], chrom="chr1")
    assert same(run_rebase(discov, base, [7, 5]), discov)


def test_variant_covering_all_of_invariant_region():
    base = [rec(1, "AA", ["T"])]
    discov = rec(2, "ATATA", ["C"])
    assert same(run_rebase(discov, base, [7]), rec(3, "ATATA", ["C"]))


def test_variant_covering_part_of_invariant_region():
    base = [rec(1, "AA", ["T"])]
    discov = rec(4, "C", ["G"])
    assert same(run_rebase(discov, base, [7]), rec(5, "C", ["G"]))


def test_variant_covering_all_of_variant_region():
    base = [rec(2, "TAT", ["G"])]
    discov = rec(3, "G", ["C"])
    assert same(run_rebase(discov, base, [7]), rec(5, "G", ["C"]))


def test_variant_covering_part_of_variant_region():
    base = [rec(2, "TAAAT", ["TAT"])]
    discov = rec(3, "A", ["C"])
    assert same(run_rebase(discov, base, [9]), rec(2, "TAAAT", ["TCT"]))


def test_overlap_two_regions_all_of_var_part_of_invar():
    base = [rec(1, "AAA", ["TTTT"]), rec(7, "A", ["C"])]
    discov = rec(1, "TTTTAG", ["TATTAC"])
    assert same(run_rebase(discov, base, [7]), rec(1, "AAAAG", ["TATTAC"]))


def test_overlap_two_regions_part_of_var_all_of_invar():
    base = [rec(1, "AAA", ["TTTT"]), rec(7, "A", ["C"])]
    discov = rec(3, "TTAGA", ["TATGA"])
    assert same(run_rebase(discov, base, [7]), rec(1, "AAAAGA", ["TTTATGA"]))


def test_overlap_two_regions_part_of_invar_all_of_var():
    base = [rec(1, "AAA", ["TTTT"]), rec(7, "A", ["C"])]
    discov = rec(6, "GAC", ["AAT"])
    assert same(run_rebase(discov, base, [7]), rec(5, "GAA", ["AAT"]))


def test_overlap_three_regions_var_invar_var_full_span():
    base = [rec(2, "TAT", ["GG"]), rec(8, "T", ["TCTGT"])]
    discov = rec(2, "GGGGGTCTGT", ["GAGAGTCAGT"])
    assert same(run_rebase(discov, base, [13]), rec(2, "TATGGGT", ["GAGAGTCAGT"]))


def test_overlap_three_regions_var_invar_var_partial_span():
    base = [rec(2, "TAT", ["GG"]), rec(8, "T", ["TCTGT"])]
    discov = rec(3, "GGGGTCT", ["ACCCTCA"])
    assert same(run_rebase(discov, base, [13]), rec(2, "TATGGGT", ["GACCCTCAGT"]))


def test_overlap_three_regions_invar_var_invar_full_span():
    base = [rec(2, "TAT", ["GG"]), rec(8, "T", ["TCTGT"])]
    discov = rec(4, "GGGTCTGTATTTT", ["GCGTCAGTATTCT"])
    assert same(run_rebase(discov, base, [13]), rec(5, "GGGTATTTT", ["GCGTCAGTATTCT"]))


def test_overlap_three_regions_invar_var_invar_partial_span():
    base = [rec(2, "TAT", ["GG"]), rec(8, "T", ["TCTGT"])]
    discov = rec(5, "GGTCTGTAT", ["T"])
    assert same(run_rebase(discov, base, [13]), rec(6, "GGTAT", ["T"]))
