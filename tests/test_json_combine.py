"""jVCF combine tests, ported from
libgramtools tests/genotype/infer/test_json_spec.cpp.
"""
import copy

import pytest

from gramtools_tpu.infer.json_prg import (
    JSONCombineError,
    combine_json_prgs,
    combine_json_sites,
)


def mock_site(als, gts, hapgs, covs, dps, pos=3, seg="gene1"):
    return {
        "ALS": list(als),
        "GT": [list(g) if g is not None else [None] for g in gts],
        "HAPG": [list(h) for h in hapgs],
        "COV": [list(c) for c in covs],
        "DP": list(dps),
        "FT": [[] for _ in gts],
        "POS": pos,
        "SEG": seg,
    }


def sample1():
    return mock_site(["CTCCT", "CTT"], [[0, 0]], [[0, 0]], [[10, 2]], [11])


def sample2():
    return mock_site(["CTCCT", "CTT"], [[1, 1]], [[1, 1]], [[2, 10]], [11])


def sample3():
    return mock_site(["CTCCT", "GTT"], [[0, 1]], [[0, 2]], [[5, 5]], [12])


def test_same_jsons_no_fail():
    s1, s2 = sample1(), sample1()
    combine_json_sites(s1, s2)
    assert s1["GT"] == [[0, 0], [0, 0]]


def test_different_ref_allele_fails():
    s1 = sample1()
    s2 = mock_site(["GTCCT", "CTT"], [[0, 0]], [[0, 0]], [[10, 2]], [11])
    with pytest.raises(JSONCombineError):
        combine_json_sites(s1, s2)


def test_different_seg_fails():
    s1, s2 = sample1(), sample1()
    s2["SEG"] = "gene2"
    with pytest.raises(JSONCombineError):
        combine_json_sites(s1, s2)


def test_different_pos_fails():
    s1, s2 = sample1(), sample1()
    s2["POS"] = 8
    with pytest.raises(JSONCombineError):
        combine_json_sites(s1, s2)


def test_cov_als_cardinality_mismatch_fails():
    s1, s2 = sample1(), sample1()
    s2["COV"] = [[10, 2, 4]]
    with pytest.raises(JSONCombineError):
        combine_json_sites(s1, s2)


def test_one_null_gt_site_succeeds():
    s1 = sample1()
    nulled = sample1()
    nulled["GT"] = [[None]]
    combine_json_sites(s1, nulled)
    assert s1["GT"][0] == [0, 0]
    assert s1["GT"][1] == [None]


def test_three_sites_correct_combined_site():
    """test_json_spec.cpp:220-247, including associativity."""
    expected = mock_site(
        ["CTCCT", "CTT", "GTT"],
        [[0, 0], [1, 1], [0, 2]],
        [[0, 0], [1, 1], [0, 2]],
        [[10, 2, 0], [2, 10, 0], [5, 0, 5]],
        [11, 11, 12])

    s1, s2, s3 = sample1(), sample2(), sample3()
    combine_json_sites(s1, s2)
    combine_json_sites(s1, s3)
    assert {k: s1[k] for k in expected} == expected

    # associativity: s1 + (s2 + s3) == (s1 + s2) + s3
    s1, s2, s3 = sample1(), sample2(), sample3()
    combine_json_sites(s2, s3)
    combine_json_sites(s1, s2)
    assert {k: s1[k] for k in expected} == expected


def base_prg(sites):
    return {
        "Model": "M1",
        "Site_Fields": {"GT": {"Desc": "Genotype"}},
        "Filters": {},
        "Samples": [{"Name": "s1", "Desc": ""}],
        "Sites": [copy.deepcopy(s) for s in sites],
        "Lvl1_Sites": [0],
        "Child_Map": {"0": {"1": [2, 3]}},
    }


def test_prg_combine_different_models_fails():
    p1 = base_prg([sample1()])
    p2 = base_prg([sample2()])
    p2["Model"] = "A_different_model"
    with pytest.raises(JSONCombineError):
        combine_json_prgs(p1, p2)


def test_prg_combine_different_prgs_fails():
    p1 = base_prg([sample1()])
    p2 = base_prg([sample2()])
    p2["Child_Map"] = {}
    with pytest.raises(JSONCombineError):
        combine_json_prgs(p1, p2)


def test_prg_combine_different_num_sites_fails():
    p1 = base_prg([sample1()])
    p2 = base_prg([sample2(), sample3()])
    with pytest.raises(JSONCombineError):
        combine_json_prgs(p1, p2)


def test_prg_combine_two_prgs():
    p1 = base_prg([sample1(), sample3()])
    p2 = base_prg([sample2(), sample3()])
    p2["Samples"] = [{"Name": "s2", "Desc": ""}]
    combined = combine_json_prgs(p1, p2)
    assert [s["Name"] for s in combined["Samples"]] == ["s1", "s2"]
    assert combined["Sites"][0]["GT"] == [[0, 0], [1, 1]]
    assert combined["Sites"][0]["COV"] == [[10, 2], [2, 10]]
    assert combined["Sites"][1]["COV"] == [[5, 5], [5, 5]]
