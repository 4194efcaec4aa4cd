"""Level genotyping model tests, ported from
libgramtools/tests/genotype/infer/level_genotyping/test_model.cpp.
"""
import math

import pytest

from gramtools_tpu.infer.model import (DIPLOID, HAPLOID, LevelGenotyperModel,
                                       ModelData)
from gramtools_tpu.infer.probs import make_l_stats
from gramtools_tpu.infer.types import Allele


class ModelHarness(LevelGenotyperModel):
    """Construct without running the full pipeline (parity with the C++
    tests' default-constructed LevelGenotyperModel)."""

    def __init__(self):
        pass


def test_haploid_coverages_singleton_only():
    gp = {(0,): 5, (1,): 10, (3,): 1}
    m = ModelHarness()
    m._set_haploid_coverages(gp, 4)
    assert m.haploid_allele_coverages == [5, 10, 0, 1]
    assert m.singleton_allele_coverages == [5, 10, 0, 1]


def test_haploid_coverages_multiallelic():
    gp = {(0,): 5, (0, 1): 4, (1,): 10, (2, 3): 1}
    m = ModelHarness()
    m._set_haploid_coverages(gp, 4)
    assert m.haploid_allele_coverages == [9, 14, 1, 1]
    assert m.singleton_allele_coverages == [5, 10, 0, 0]


def test_diploid_coverages_multiallelic():
    gp = {(0,): 7, (0, 1): 4, (1,): 20, (0, 3): 3, (2, 3): 1}
    m = ModelHarness()
    m._set_haploid_coverages(gp, 4)
    m.computed_coverages = {}
    c1, c2 = m._diploid_cov(gp, [0, 1], [False] * 4)
    assert c1 == pytest.approx(10 + 4 / 3)
    assert c2 == pytest.approx(20 + 8 / 3)


def test_diploid_coverages_only_multiallelic():
    gp = {(0, 1): 3, (2, 3): 1}
    m = ModelHarness()
    m._set_haploid_coverages(gp, 4)
    m.computed_coverages = {}
    c1, c2 = m._diploid_cov(gp, [0, 1], [False] * 4)
    assert c1 == pytest.approx(1.5)
    assert c2 == pytest.approx(1.5)


def test_direct_deletion_assigns_coverage():
    alleles = [Allele("C", (8,), 0), Allele("G", (8,), 0), Allele("", (), 1)]
    gp = {(0,): 8, (1,): 8, (0, 1): 1}
    m = ModelHarness()
    m._set_haploid_coverages(gp, 2)
    out = m._assign_coverage_to_empty_alleles(alleles)
    assert out[2].pb_cov == (9,)


def test_diploid_one_dominating_class_different_haplogroups():
    gp = {(0,): 8, (0, 1): 4}
    m = ModelHarness()
    m._set_haploid_coverages(gp, 2)
    m.computed_coverages = {}
    c1, c2 = m._diploid_cov(gp, [0, 1], [False, False])
    assert c1 == pytest.approx(12)
    assert c2 == pytest.approx(0)


def test_diploid_one_dominating_class_same_haplogroup():
    gp = {(0,): 8, (0, 1): 4}
    m = ModelHarness()
    m._set_haploid_coverages(gp, 2)
    m.computed_coverages = {}
    c1, c2 = m._diploid_cov(gp, [0, 0], [True])
    assert c1 == pytest.approx(6)
    assert c2 == pytest.approx(6)


def test_fraction_noncredible_positions():
    from types import SimpleNamespace
    allele = Allele("ATCGCCG", (0, 0, 2, 3, 3, 5, 4, 4), 0)
    m = ModelHarness()
    m.data = SimpleNamespace(l_stats=SimpleNamespace(credible_cov_t=3))
    assert m._fraction_noncredible_positions(allele) == 0.375


def test_count_total_coverage():
    assert sum({}.values()) == 0
    gp2 = {(0,): 5, (0, 1): 4, (1,): 10, (2, 3): 1}
    assert sum(gp2.values()) == 20


def test_haplogroup_multiplicities():
    m = ModelHarness()
    a1 = [Allele("", ()), Allele("", ())]
    assert m._haplogroup_multiplicities(a1) == [True]
    a2 = [Allele("", (), 0), Allele("", (), 1), Allele("", (), 1)]
    assert m._haplogroup_multiplicities(a2) == [False, True]


def test_rescale_genotypes():
    m = ModelHarness()
    assert m._rescale_genotypes([1, 3]) == [1, 2]
    assert m._rescale_genotypes([0, 4, 4]) == [0, 1, 1]
    assert m._rescale_genotypes([4, 2]) == [1, 2]


# --- full model runs --------------------------------------------------------


def l_stats_poisson(mean=15, err=0.01):
    return make_l_stats(mean, 0, err)


class TestNullGTs:
    alleles = [Allele("A", (0,), 0), Allele("G", (0,), 1)]

    def test_duplicated_allele_null_and_ambig(self):
        alleles = self.alleles + [Allele("A", (1,), 1)]
        m = LevelGenotyperModel(ModelData(alleles, {}, HAPLOID,
                                          l_stats_poisson()))
        assert m.get_site().is_null()
        assert m.get_site().has_filter("AMBIG")

    def test_zero_mean_coverage_null(self):
        ls = make_l_stats(0, 0, 0.01)
        m = LevelGenotyperModel(ModelData(self.alleles, {(0,): 5}, HAPLOID, ls))
        assert m.get_site().is_null()

    def test_no_coverage_null(self):
        m = LevelGenotyperModel(ModelData(self.alleles, {}, HAPLOID,
                                          l_stats_poisson()))
        assert m.get_site().is_null()

    def test_same_coverage_null(self):
        gp = {(0,): 5, (1,): 5}
        m = LevelGenotyperModel(ModelData(self.alleles, gp, HAPLOID,
                                          l_stats_poisson()))
        assert m.get_site().is_null()


class TestGTCalls:
    alleles = [
        Allele("ATC", (0, 0, 1), 0),
        Allele("GGGCC", (10, 12, 12, 14, 14), 1),
    ]
    gp = {(0,): 1, (1,): 13}

    def test_correct_diploid_call(self):
        m = LevelGenotyperModel(ModelData(self.alleles, self.gp, DIPLOID,
                                          l_stats_poisson()))
        assert m.get_site().genotype == [1, 1]

    def test_correct_haploid_call(self):
        m = LevelGenotyperModel(ModelData(self.alleles, self.gp, HAPLOID,
                                          l_stats_poisson()))
        site = m.get_site()
        assert site.genotype == [1]
        assert site.alleles == [self.alleles[0], self.alleles[1]]

    def test_negative_binomial_call(self):
        ls = make_l_stats(15, 16, 0.01)
        m = LevelGenotyperModel(ModelData(self.alleles, self.gp, HAPLOID, ls))
        assert m.get_site().genotype == [1]


class TestIgnoredRef:
    alleles = [
        Allele("A", (10,), 0, callable=False),
        Allele("C", (9,), 1),
        Allele("G", (10,), 2),
    ]
    gp = {(0,): 20, (1,): 9, (2,): 10}

    def test_correct_number_of_likelihoods(self):
        ls = make_l_stats(10, 0, 0.01)
        m = LevelGenotyperModel(ModelData(self.alleles, self.gp, HAPLOID, ls))
        assert len(m.likelihoods) == 2
        m2 = LevelGenotyperModel(ModelData(self.alleles, self.gp, DIPLOID, ls))
        assert len(m2.likelihoods) == 3  # two homs, one het

    def test_rescaled_gt_and_ref_in_output(self):
        ls = make_l_stats(10, 0, 0.01)
        m = LevelGenotyperModel(ModelData(self.alleles, self.gp, HAPLOID, ls))
        info = m.get_site()
        assert info.alleles == [self.alleles[0], self.alleles[2]]
        assert info.genotype == [1]
