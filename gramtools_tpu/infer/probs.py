"""Log probability mass functions + likelihood-related statistics.

Parity: libgramtools src/genotype/infer/level_genotyping/probabilities.cpp
and runner.cpp:209-260 (make_l_stats). Vectorised variants back the
batched site-genotyping path.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import numpy as np


def _lgamma(x: float) -> float:
    return math.lgamma(x)


class PoissonLogPmf:
    """log Poisson pmf, continuous in cov (probabilities.cpp:18-27)."""

    def __init__(self, lam: float):
        self.lam = lam

    def __call__(self, cov: float) -> float:
        lam = self.lam
        if lam == 0:
            # log(0^cov e^0 / cov!) -> 0 at cov=0 else -inf
            return 0.0 if cov == 0 else -math.inf
        return -lam + cov * math.log(lam) - _lgamma(cov + 1)

    def vectorised(self, cov: np.ndarray) -> np.ndarray:
        lam = self.lam
        with np.errstate(divide="ignore", invalid="ignore"):
            return -lam + cov * np.log(lam) - _lgamma_vec(cov + 1)


class NegBinomLogPmf:
    """log NB pmf: prob of `cov` failures given k successes with prob p
    (probabilities.cpp:29-39)."""

    def __init__(self, k: float, p: float):
        self.k = k
        self.p = p

    def __call__(self, cov: float) -> float:
        k, p = self.k, self.p
        return (_lgamma(k + cov) - _lgamma(cov + 1) - _lgamma(k)
                + k * math.log(p) + cov * math.log(1 - p))

    def vectorised(self, cov: np.ndarray) -> np.ndarray:
        k, p = self.k, self.p
        return (_lgamma_vec(k + cov) - _lgamma_vec(cov + 1) - _lgamma(k)
                + k * math.log(p) + cov * math.log(1 - p))


_lgamma_vec = np.vectorize(math.lgamma, otypes=[np.float64])


@dataclass
class DataParams:
    mean_cov: float
    mean_pb_error: float
    num_successes: float = 0.0
    success_prob: float = 0.0


@dataclass
class LikelihoodStats:
    """likelihood_related_stats parity (probabilities.hpp)."""

    data_params: DataParams
    log_mean_pb_error: float
    log_zero: float            # log pmf(0) at full depth
    log_zero_half_depth: float
    log_no_zero: float
    log_no_zero_half_depth: float
    credible_cov_t: int        # minimum non-error coverage
    pmf_full_depth: object
    pmf_half_depth: object


def find_minimum_non_error_cov(mean_pb_error: float, pmf) -> int:
    """runner.cpp:249-260."""
    min_count = 1
    if math.isinf(pmf(min_count)):
        return min_count
    while pmf(min_count) <= min_count * math.log(mean_pb_error):
        min_count += 1
    return min_count


def make_l_stats(mean_cov: float, var_cov: float, mean_pb_error: float
                 ) -> LikelihoodStats:
    """runner.cpp:209-247: NB if over-dispersed else Poisson.

    NOTE: the half-depth NB num_successes uses var^2/(var - mean/2),
    faithfully reproducing the reference (runner.cpp:222)."""
    data_params = DataParams(mean_cov, mean_pb_error)
    if var_cov > mean_cov:
        num_successes = mean_cov ** 2 / (var_cov - mean_cov)
        success_prob = num_successes / (mean_cov + num_successes)
        pmf = NegBinomLogPmf(num_successes, success_prob)
        prob_no_zero = math.log(1 - success_prob ** num_successes)
        data_params.num_successes = num_successes
        data_params.success_prob = success_prob

        num_successes_h = var_cov ** 2 / (var_cov - mean_cov / 2)
        success_prob_h = num_successes_h / (mean_cov / 2 + num_successes_h)
        pmf_half = NegBinomLogPmf(num_successes_h, success_prob_h)
        prob_no_zero_half = math.log(1 - success_prob_h ** num_successes_h)
    else:
        pmf = PoissonLogPmf(mean_cov)
        prob_no_zero = (math.log(1 - math.exp(-mean_cov))
                        if mean_cov > 0 else -math.inf)
        pmf_half = PoissonLogPmf(mean_cov / 2)
        prob_no_zero_half = (math.log(1 - math.exp(-mean_cov / 2))
                             if mean_cov > 0 else -math.inf)

    return LikelihoodStats(
        data_params=data_params,
        log_mean_pb_error=math.log(mean_pb_error) if mean_pb_error > 0 else -math.inf,
        log_zero=pmf(0),
        log_zero_half_depth=pmf_half(0),
        log_no_zero=prob_no_zero,
        log_no_zero_half_depth=prob_no_zero_half,
        credible_cov_t=find_minimum_non_error_cov(mean_pb_error, pmf)
        if mean_pb_error > 0 else 1,
        pmf_full_depth=pmf,
        pmf_half_depth=pmf_half,
    )
