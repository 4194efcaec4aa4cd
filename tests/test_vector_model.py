"""Vectorised simple-site genotyping vs the scalar model (the oracle).

batch_simple_sites must be bit-identical to LevelGenotyperModel on
every site it claims; these tests fuzz random graphs + coverages at
both ploidies and compare every observable site field.
"""
import numpy as np
import pytest

from gramtools_tpu.index.build import build_prg_index
from gramtools_tpu.infer.runner import LevelGenotyper
from gramtools_tpu.mapping.coverage import Coverage
from gramtools_tpu.prg.linearise import PrgString, prg_string_to_ints


class _Stats:
    def __init__(self, mean, var, err):
        self.mean_cov_depth = mean
        self.variance_cov_depth = var
        self.mean_pb_error = err


def _random_prg(rng, n_sites=30, nested_every=0):
    parts = []
    letters = "ACGT"
    for s in range(n_sites):
        parts.append("".join(rng.choice(list(letters), size=rng.randint(1, 8))))
        n_alleles = rng.randint(2, 5)
        alleles = []
        for a in range(n_alleles):
            if rng.rand() < 0.15:
                alleles.append("")  # direct deletion
            else:
                alleles.append("".join(rng.choice(list(letters),
                                                  size=rng.randint(1, 6))))
        if nested_every and s % nested_every == 1:
            alleles[0] = alleles[0] + "[A,C]" + "G"
        parts.append("[" + ",".join(alleles) + "]")
    parts.append("TTAG")
    return "".join(parts)


def _random_coverage(rng, idx, density=0.8):
    from gramtools_tpu.prg.markers import site_id_to_index

    cov = Coverage.empty(idx)
    g = idx.graph
    edges_by_site = {
        site_id_to_index(g.node(entry).site_id): len(g.node(entry).edges)
        for entry, _ in g.bubbles}
    for s in range(idx.num_sites):
        if rng.rand() > density:
            continue  # uncovered site
        n_groups = rng.randint(1, 4)
        n_h = edges_by_site[s]
        for _ in range(n_groups):
            size = rng.randint(1, min(3, n_h) + 1)
            group = tuple(sorted(rng.choice(n_h, size=size, replace=False)))
            cov.grouped_counts[s][group] = (cov.grouped_counts[s].get(group, 0)
                                            + int(rng.randint(1, 30)))
    if g.coverage.size:
        g.coverage[:] = rng.randint(0, 25, size=g.coverage.size).astype(
            g.coverage.dtype)
    return cov


def _site_key(site):
    return (
        [(a.sequence, a.pb_cov, a.haplogroup, a.callable)
         for a in site.alleles],
        site.genotype, site.allele_covs, site.total_coverage,
        site.haplogroups, sorted(site.filters), site.gt_conf,
        None if site.extra_alleles is None else
        [(a.sequence, a.pb_cov, a.haplogroup, a.callable)
         for a in site.extra_alleles],
        site.num_haplogroups,
    )


@pytest.mark.parametrize("ploidy", [1, 2])
@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("nested_every", [0, 3])
def test_fast_matches_scalar(ploidy, seed, nested_every):
    rng = np.random.RandomState(seed)
    prg_str = _random_prg(rng, n_sites=25, nested_every=nested_every)
    idx = build_prg_index(PrgString(prg_string_to_ints(prg_str)))
    cov = _random_coverage(rng, idx)
    stats = _Stats(18.0, 25.0 if seed % 2 else 10.0, 0.01)

    lg_fast = LevelGenotyper(idx, cov, stats, ploidy, get_gcp=False,
                             use_fast=True)
    lg_slow = LevelGenotyper(idx, cov, stats, ploidy, get_gcp=False,
                             use_fast=False)
    n_checked = 0
    for a, b in zip(lg_fast.genotyped_records, lg_slow.genotyped_records):
        assert _site_key(a) == _site_key(b)
        n_checked += 1
    assert n_checked == idx.num_sites


def test_fast_path_actually_used():
    """Guard: on a flat biallelic graph every site must take the fast path."""
    from gramtools_tpu.infer import vector_model

    rng = np.random.RandomState(7)
    prg_str = _random_prg(rng, n_sites=10)
    idx = build_prg_index(PrgString(prg_string_to_ints(prg_str)))
    cov = _random_coverage(rng, idx, density=1.0)
    stats = _Stats(18.0, 10.0, 0.01)
    sites = vector_model.batch_simple_sites(
        idx, cov, LevelGenotyper(idx, cov, stats, 1, get_gcp=False,
                                 use_fast=False).l_stats, 1,
        idx.graph.child_map())
    assert len(sites) == idx.num_sites


def test_zero_coverage_and_zero_mean():
    rng = np.random.RandomState(3)
    prg_str = _random_prg(rng, n_sites=8)
    idx = build_prg_index(PrgString(prg_string_to_ints(prg_str)))
    cov = Coverage.empty(idx)  # no reads at all
    stats = _Stats(0.0, 0.0, 0.01)
    for ploidy in (1, 2):
        lg_fast = LevelGenotyper(idx, cov, stats, ploidy, get_gcp=False,
                                 use_fast=True)
        lg_slow = LevelGenotyper(idx, cov, stats, ploidy, get_gcp=False,
                                 use_fast=False)
        for a, b in zip(lg_fast.genotyped_records, lg_slow.genotyped_records):
            assert _site_key(a) == _site_key(b)
