"""Genotype confidence percentiles (GCP).

Parity: libgramtools lib/GCP/GCP.h (Percentiler) and
runner.cpp:262-337 (confidence simulation). The reference's simulation
draws from libstdc++ distributions seeded by std::random_device when
empirical sites suffice, i.e. is nondeterministic there; we use a fixed
numpy seed, making our percentiles deterministic and distributionally
equivalent.
"""
from __future__ import annotations

import bisect
from typing import List

import numpy as np

CONF_DISTRIB_SIZE = 10000  # include/.../runner.hpp:14


class Percentiler:
    """GCP.h:96-160: confidence -> percentile with averaging of ties and
    linear interpolation between knots."""

    def __init__(self, sorted_confidences: List[float]):
        if len(sorted_confidences) < 2:
            raise ValueError("need at least two confidences")
        entries_keys: List[float] = []
        entries_vals: List[float] = []
        n = len(sorted_confidences)
        i = 0
        while i < n:
            v = sorted_confidences[i]
            hi = bisect.bisect_right(sorted_confidences, v)
            cur_percentile = 100.0 * (i + 1) / n
            if hi - 1 == i:
                entries_keys.append(v)
                entries_vals.append(cur_percentile)
            else:
                hi_percentile = 100.0 * hi / n
                entries_keys.append(v)
                entries_vals.append(cur_percentile + (hi_percentile - cur_percentile) / 2)
            i = hi
        self.keys = entries_keys
        self.vals = entries_vals

    def get_confidence_percentile(self, query: float) -> float:
        pos = bisect.bisect_right(self.keys, query)  # first key > query
        if pos == len(self.keys):
            return 100.0
        if pos == 0:
            return 0.0
        x1, x2 = self.keys[pos - 1], self.keys[pos]
        y1, y2 = self.vals[pos - 1], self.vals[pos]
        slope = (y2 - y1) / (x2 - x1)
        return y1 + slope * (query - x1)


def simulate_confidences(num: int, l_stats, ploidy: int, seed: int = 42
                         ) -> List[float]:
    """runner.cpp:262-297 (ModelDataProducer): one simulated biallelic
    site per draw; returns its GT_CONF."""
    from .model import LevelGenotyperModel, ModelData
    from .probs import PoissonLogPmf
    from .types import Allele

    rng = np.random.RandomState(seed)
    confidences = []
    dp = l_stats.data_params
    is_poisson = isinstance(l_stats.pmf_full_depth, PoissonLogPmf)
    for _ in range(num):
        if is_poisson:
            correct_cov = int(rng.poisson(dp.mean_cov))
        else:
            correct_cov = int(rng.negative_binomial(dp.num_successes,
                                                    dp.success_prob))
        incorrect_cov = int(rng.binomial(int(dp.mean_cov), dp.mean_pb_error))
        alleles = [
            Allele("C", (correct_cov,), 0),
            Allele("A", (incorrect_cov,), 1),
        ]
        gp_counts = {(0,): correct_cov, (1,): incorrect_cov}
        data = ModelData(alleles, gp_counts, ploidy, l_stats)
        model = LevelGenotyperModel(data)
        confidences.append(model.get_genotype_confidence())
    return confidences
