"""Probability pmf tests, ported from
libgramtools tests/genotype/infer/level_genotyping/test_probabilities.cpp.
"""
import pytest

from gramtools_tpu.infer.probs import (
    NegBinomLogPmf,
    PoissonLogPmf,
    find_minimum_non_error_cov,
    make_l_stats,
)


def test_dynamic_choice_of_distribution():
    lstats = make_l_stats(10, 5, 0.01)
    assert isinstance(lstats.pmf_full_depth, PoissonLogPmf)
    assert (lstats.data_params.mean_cov, lstats.data_params.mean_pb_error) == (10.0, 0.01)

    lstats = make_l_stats(10, 15, 0.01)
    assert isinstance(lstats.pmf_full_depth, NegBinomLogPmf)


def test_dynamic_data_params():
    lstats = make_l_stats(10, 20, 0.01)
    assert lstats.data_params.num_successes == 10.0
    assert lstats.data_params.success_prob == 0.5
    k, p = lstats.data_params.num_successes, lstats.data_params.success_prob
    assert int(k * (1 - p) / p) == 10
    assert int(k * (1 - p) / p ** 2) == 20


def test_log_pmfs_against_scipy_truth():
    dpois = PoissonLogPmf(2)
    assert dpois(2) == pytest.approx(-1.3068528194400546)
    dpois = PoissonLogPmf(2.5)
    assert dpois(2) == pytest.approx(-1.3605657168116352, abs=1e-12)
    dnbinom = NegBinomLogPmf(2, 0.5)
    assert dnbinom(2) == pytest.approx(-1.6739764335716716, abs=1e-12)
    dnbinom = NegBinomLogPmf(2.5, 0.5)
    assert dnbinom(4) == pytest.approx(-2.3056313146033682, abs=1e-12)


def test_poisson_pmf_at_zero():
    assert PoissonLogPmf(2)(0) == -2


def test_min_cov_more_likely_than_error():
    cases = [(10, 0.0001, 1), (10, 0.001, 2), (100, 0.001, 10)]
    for mean_depth, err, expected in cases:
        pmf = PoissonLogPmf(mean_depth)
        assert find_minimum_non_error_cov(err, pmf) == expected


def test_min_cov_zero_mean_depth_terminates():
    pmf = PoissonLogPmf(0)
    assert find_minimum_non_error_cov(0.01, pmf) >= 0


def test_vectorised_pmfs_match_scalar():
    import numpy as np
    dpois = PoissonLogPmf(3.7)
    xs = np.array([0.0, 1.0, 2.5, 10.0])
    assert np.allclose(dpois.vectorised(xs), [dpois(x) for x in xs])
    dnb = NegBinomLogPmf(2.5, 0.4)
    assert np.allclose(dnb.vectorised(xs), [dnb(x) for x in xs])
