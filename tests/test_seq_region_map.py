"""Region map tests, ported from gramtools/tests/genotype/test_seq_region_map.py."""
import pytest

from gramtools_tpu.common.vcf import VcfRecord
from gramtools_tpu.commands.seq_region_map import (
    BisectTarget,
    SearchableSeqRegionsMap,
    SeqRegion,
    SeqRegionMapper,
)


def rec(pos, ref, alts, chrom="JAC", gt="1/1"):
    return VcfRecord(chrom=chrom, pos=pos, id=".", ref=ref, alts=tuple(alts),
                     filter=("PASS",), format="GT", samples=(gt,))


def test_single_base_alt_correct_region():
    base = [rec(2, "TAT", ["G"])]
    result = SeqRegionMapper(base, {"JAC": 7}).get_map()
    assert result["JAC"] == [
        SeqRegion(1, 1, 1),
        SeqRegion(2, 2, 1, "TAT", "G"),
        SeqRegion(5, 3, 3),
    ]


def test_ref_call_produces_invariant_region_only():
    base = [rec(2, "TAT", ["G"], gt="0")]
    result = SeqRegionMapper(base, {"JAC": 7}).get_map()
    assert result["JAC"] == [SeqRegion(1, 1, 7)]


def test_null_call_treated_as_ref():
    base = [rec(2, "TAT", ["G"], gt=".")]
    result = SeqRegionMapper(base, {"JAC": 7}).get_map()
    assert result["JAC"] == [SeqRegion(1, 1, 7)]


def test_alt_longer_than_ref_correct_region():
    base = [rec(2, "TAT", ["GCCAC"])]
    result = SeqRegionMapper(base, {"JAC": 7}).get_map()
    assert result["JAC"] == [
        SeqRegion(1, 1, 1),
        SeqRegion(2, 2, 5, "TAT", "GCCAC"),
        SeqRegion(5, 7, 3),
    ]


def test_two_records_correct_regions():
    base = [rec(2, "TAT", ["GCCAC"]), rec(6, "G", ["TTT"])]
    result = SeqRegionMapper(base, {"JAC": 7}).get_map()
    assert result["JAC"] == [
        SeqRegion(1, 1, 1),
        SeqRegion(2, 2, 5, "TAT", "GCCAC"),
        SeqRegion(5, 7, 1),
        SeqRegion(6, 8, 3, "G", "TTT"),
        SeqRegion(7, 11, 1),
    ]


def test_invariant_chrom_gets_whole_region():
    base = [rec(2, "T", ["G"], chrom="c1")]
    result = SeqRegionMapper(base, {"c1": 4, "c2": 9}).get_map()
    assert result["c2"] == [SeqRegion(1, 1, 9)]


def test_no_records_raises():
    with pytest.raises(ValueError):
        SeqRegionMapper([], {"JAC": 7})


def test_unsorted_records_raise():
    base = [rec(5, "T", ["G"]), rec(2, "T", ["G"])]
    with pytest.raises(AssertionError):
        SeqRegionMapper(base, {"JAC": 9})


# --- bisection --------------------------------------------------------------


@pytest.fixture
def searcher():
    base = [rec(2, "TAT", ["GCCAC"]), rec(6, "G", ["TTT"])]
    return SearchableSeqRegionsMap(SeqRegionMapper(base, {"JAC": 7}).get_map())


def test_bisect_pers_ref(searcher):
    assert searcher.bisect("JAC", 1, BisectTarget.PERS_REF) == 0
    assert searcher.bisect("JAC", 2, BisectTarget.PERS_REF) == 1
    assert searcher.bisect("JAC", 6, BisectTarget.PERS_REF) == 1
    assert searcher.bisect("JAC", 7, BisectTarget.PERS_REF) == 2
    assert searcher.bisect("JAC", 8, BisectTarget.PERS_REF) == 3
    assert searcher.bisect("JAC", 11, BisectTarget.PERS_REF) == 4


def test_bisect_base_ref(searcher):
    assert searcher.bisect("JAC", 1, BisectTarget.BASE_REF) == 0
    assert searcher.bisect("JAC", 3, BisectTarget.BASE_REF) == 1
    assert searcher.bisect("JAC", 5, BisectTarget.BASE_REF) == 2
    assert searcher.bisect("JAC", 6, BisectTarget.BASE_REF) == 3
    assert searcher.bisect("JAC", 7, BisectTarget.BASE_REF) == 4


def test_json_roundtrip(tmp_path, searcher):
    fname = tmp_path / "map.json"
    searcher.dump_to(fname, dump_sequences=True)
    loaded = SearchableSeqRegionsMap.load_from(fname)
    assert loaded == searcher
