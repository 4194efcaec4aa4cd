"""PRG aggregation + MSA->PRG tests (ported from
gramtools/tests/build_command/test_from_msas.py, plus native MSA builder
coverage).
"""
import numpy as np
import pytest

from gramtools_tpu.commands.from_msas import (
    BedInterval,
    PRGAggregationError,
    PRGAggregator,
    complement_intervals,
    standalone_build_from_msas,
)
from gramtools_tpu.prg.msa import msa_to_prg_string
from gramtools_tpu.prg.linearise import PrgString, prg_string_to_ints


# --- PRGAggregator (test_from_msas.py:37-92) --------------------------------


def test_translate_non_variant_marker_fails():
    with pytest.raises(PRGAggregationError):
        PRGAggregator().translate("ref", 4)


def test_translate_site_marker_more_than_twice_fails():
    agg = PRGAggregator()
    agg.translate("ref", 5)
    agg.translate("ref", 5)
    with pytest.raises(PRGAggregationError):
        agg.translate("ref", 5)


def test_translate_allele_marker_without_site_marker_fails():
    with pytest.raises(PRGAggregationError):
        PRGAggregator().translate("ref", 6)


def test_first_allocated_marker_is_fixed():
    assert PRGAggregator().translate("ref", 101) == 5


def test_translate_site_then_allele_marker():
    agg = PRGAggregator()
    assert [agg.translate("ref", m) for m in [5, 6, 6]] == [5, 6, 6]


def test_translate_site_marker_twice_legacy():
    agg = PRGAggregator()
    assert [agg.translate("ref", 5), agg.translate("ref", 5)] == [5, 6]


def test_translate_markers_across_multiple_references():
    agg = PRGAggregator()
    result = []
    for ref in ("ref1", "ref2"):
        for marker in (5, 6, 6):
            result.append(agg.translate(ref, marker))
    assert result == [5, 6, 6, 7, 8, 8]


# --- bed complement ---------------------------------------------------------


def test_complement_intervals():
    ivs = [BedInterval("c1", 3, 6, "x"), BedInterval("c1", 8, 10, "y")]
    out = complement_intervals(ivs, {"c1": 12, "c2": 5})
    assert [(i.chrom, i.start, i.end) for i in out] == [
        ("c1", 0, 3), ("c1", 6, 8), ("c1", 10, 12), ("c2", 0, 5)]


# --- native MSA builder -----------------------------------------------------


def test_msa_snp():
    rows = ["ACGTACGTAA", "ACGTACGTAA", "ACGAACGTAA"]
    prg = msa_to_prg_string(rows, min_match=3)
    assert prg == "ACG[T,A]ACGTAA"


def test_msa_indel_via_gaps():
    rows = ["AAAAAAATTTCCCCCCC", "AAAAAAA---CCCCCCC"]
    prg = msa_to_prg_string(rows, min_match=3)
    assert prg == "AAAAAAA[TTT,]CCCCCCC"


def test_msa_invariant():
    rows = ["ACGTACGT", "ACGTACGT"]
    assert msa_to_prg_string(rows) == "ACGTACGT"


def test_msa_prg_parses():
    rows = ["ACGTACAGTACGT", "ACGTACCGTACGT", "ACGTAAAGCACGT"]
    prg = msa_to_prg_string(rows, min_match=3)
    # product of variation must be a valid PRG
    ints = prg_string_to_ints(prg)
    PrgString(ints)
    # first path must equal first row (ref) with gaps removed
    from gramtools_tpu.prg.check_ref import get_first_prg_path
    from gramtools_tpu.prg.graph import build_cov_graph
    g = build_cov_graph(PrgString(ints))
    assert get_first_prg_path(g) == rows[0]


# --- end-to-end from_msas build (fixture-style) -----------------------------


def test_standalone_build_from_msas(tmp_path):
    ref = tmp_path / "ref.fa"
    ref.write_text(">c1\nAAAATTTTCCCCGGGG\n")
    coords = tmp_path / "coords.tsv"
    coords.write_text("c1\t16\n")
    msa = tmp_path / "region1.msa.fa"
    # MSA over c1[4:8] (TTTT) with a SNP
    msa.write_text(">s1\nTTTT\n>s2\nTATT\n")
    bed = tmp_path / "regions.bed"
    bed.write_text(f"c1\t4\t8\t{msa}\n")
    outdir = tmp_path / "built"
    outdir.mkdir()

    built, ints = standalone_build_from_msas(str(bed), str(ref), str(coords),
                                             str(outdir))
    prg = PrgString(np.asarray(ints, dtype=np.uint32))
    from gramtools_tpu.prg.check_ref import get_first_prg_path
    from gramtools_tpu.prg.graph import build_cov_graph
    g = build_cov_graph(prg)
    assert get_first_prg_path(g) == "AAAATTTTCCCCGGGG"
    assert g.num_sites >= 1


# --- vectorised renumber_region == scalar translate --------------------------


def test_renumber_region_matches_scalar_translate():
    import numpy as np
    from gramtools_tpu.commands.from_msas import PRGAggregator

    rng = np.random.RandomState(3)
    for trial in range(20):
        # random region PRGs: normal sites, legacy odd-closed sites,
        # repeated allele markers, interleaved across two regions
        regions = {}
        for rid in ("a", "b"):
            parts = []
            for s in range(rng.randint(1, 6)):
                m = 5 + 2 * rng.randint(0, 8)
                if rng.rand() < 0.5:
                    # normal: odd ... even ... even
                    parts += [m, 1, m + 1, 2, m + 1]
                else:
                    # legacy: odd ... even(mid) ... odd(close)
                    parts += [m, 3, m + 1, 4, m]
                parts += [rng.randint(1, 5)]
            # dedup sites reusing the same local marker twice across the
            # region would be a >2 error; filter those out
            seen = {}
            clean = []
            for v in parts:
                if v > 4:
                    key = v if v % 2 else v - 1
                    seen[key] = seen.get(key, 0) + (v % 2)
                    if seen[key] > 2:
                        continue
                clean.append(v)
            regions[rid] = np.array(clean, dtype=np.int64)

        vec = PRGAggregator()
        sca = PRGAggregator()
        for rid, ints in regions.items():
            got = vec.renumber_region(rid, ints)
            want = np.array(
                [v if v <= 4 else sca.translate(rid, int(v)) for v in ints],
                dtype=np.int64)
            assert np.array_equal(got, want), (trial, rid, ints, got, want)
        assert vec.next_allocated == sca.next_allocated


def test_renumber_region_rejects_early_allele_marker():
    import numpy as np
    import pytest
    from gramtools_tpu.commands.from_msas import (PRGAggregationError,
                                                  PRGAggregator)

    with pytest.raises(PRGAggregationError):
        PRGAggregator().renumber_region("r", np.array([6, 1, 5, 2, 6]))


def test_renumber_region_rejects_three_odd_occurrences():
    import numpy as np
    import pytest
    from gramtools_tpu.commands.from_msas import (PRGAggregationError,
                                                  PRGAggregator)

    with pytest.raises(PRGAggregationError):
        PRGAggregator().renumber_region("r", np.array([5, 1, 5, 2, 5]))
