"""Grouped allele count tests, ported from
libgramtools tests/genotype/quasimap/coverage/test_grouped_allele_counts.cpp.
"""
import json

import pytest

from gramtools_tpu.index.build import build_prg_index
from gramtools_tpu.mapping.coverage import (Coverage, dump_all,
                                            record_grouped_counts)
from gramtools_tpu.prg.linearise import (PrgString, encode_prg,
                                         normalise_legacy_end_markers,
                                         prg_string_to_ints)
from gramtools_tpu.prg.markers import FIRST_ALLELE


def make_idx(raw, bracketed=False):
    ints = (prg_string_to_ints(raw) if bracketed
            else normalise_legacy_end_markers(encode_prg(raw)))
    return build_prg_index(PrgString(ints))


def test_two_sites_empty_structure():
    idx = make_idx("gct5c6g6t6ac7cc8a8")
    cov = Coverage.empty(idx)
    assert len(cov.grouped_counts) == 2


def test_single_mapping_correct_coverage():
    idx = make_idx("gct[c,,t]ac[cc,a]", bracketed=True)
    cov = Coverage.empty(idx)
    record_grouped_counts(cov, {(5, FIRST_ALLELE + 1)})
    assert cov.grouped_counts == [{(1,): 1}, {}]


def test_multiple_mappings_correct_coverage():
    idx = make_idx("gct5c6g6t6ac7cc8a8")
    cov = Coverage.empty(idx)
    record_grouped_counts(cov, {(7, FIRST_ALLELE), (5, FIRST_ALLELE),
                                (5, FIRST_ALLELE + 1)})
    assert cov.grouped_counts == [{(0, 1): 1}, {(0,): 1}]


def test_multiple_reads_correct_coverage():
    idx = make_idx("gct5c6g6t6ac7cc8a8")
    cov = Coverage.empty(idx)
    record_grouped_counts(cov, {(7, 1), (5, 2), (5, 0)})
    record_grouped_counts(cov, {(7, 1), (5, 3), (5, 0)})
    assert cov.grouped_counts == [{(0, 2): 1, (0, 3): 1}, {(1,): 2}]


def test_grouped_dump_hashing(tmp_path):
    """Group IDs are distinct and allocated from 0 increasing
    (grouped_allele_counts.cpp:51-67); dump JSON structure parity."""
    idx = make_idx("gct5c6g6t6ac7cc8a8")
    cov = Coverage.empty(idx)
    record_grouped_counts(cov, {(5, 1), (5, 3)})
    record_grouped_counts(cov, {(7, 0)})
    dump_all(cov, idx, tmp_path / "sum", tmp_path / "pb.json",
             tmp_path / "gped.json")
    data = json.load(open(tmp_path / "gped.json"))["grouped_allele_counts"]
    groups = data["allele_groups"]
    assert sorted(int(k) for k in groups) == list(range(len(groups)))
    # per-site counts reference registered groups
    for site in data["site_counts"]:
        for gid in site:
            assert gid in groups
    # group content round-trips
    gid_of = {tuple(v): k for k, v in groups.items()}
    assert tuple([1, 3]) in gid_of
    assert tuple([0]) in gid_of
