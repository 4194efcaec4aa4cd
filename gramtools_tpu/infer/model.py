"""Level genotyping model: likelihood computation and genotype calling.

Parity: libgramtools src/genotype/infer/level_genotyping/model.cpp.
Haploid and diploid, with haplogroup coverage apportioning.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, replace
from typing import Dict, List, Optional, Tuple

from .probs import LikelihoodStats
from .types import Allele, GenotypedSite

HAPLOID = 1
DIPLOID = 2

GroupedCounts = Dict[Tuple[int, ...], int]


@dataclass
class ModelData:
    input_alleles: List[Allele]
    gp_counts: GroupedCounts
    ploidy: int
    l_stats: LikelihoodStats
    debug: bool = False


class LevelGenotyperModel:
    def __init__(self, data: ModelData):
        self.data = data
        assert len(data.input_alleles) > 1
        ref_allele = data.input_alleles[0]
        self.site = GenotypedSite()
        # (loglik, indices) in insertion order; sorted stably at call time,
        # matching multimap<double, ..., greater<>> semantics
        self.likelihoods: List[Tuple[float, List[int]]] = []
        self.computed_coverages: Dict[Tuple[int, ...], List[float]] = {}

        hap_mults = self._haplogroup_multiplicities(data.input_alleles)
        self.site.num_haplogroups = len(hap_mults)

        if self._find_duplicate(data.input_alleles):
            self.site.set_filter("AMBIG")

        self.total_coverage = sum(data.gp_counts.values())
        if self.total_coverage == 0 or data.l_stats.data_params.mean_cov == 0:
            self.site.alleles = [ref_allele]
            self.site.make_null()
            return

        self._set_haploid_coverages(data.gp_counts, len(hap_mults))
        used_alleles = self._assign_coverage_to_empty_alleles(data.input_alleles)

        if data.ploidy == HAPLOID:
            self._compute_haploid_log_likelihoods(used_alleles)
        elif data.ploidy == DIPLOID:
            self._compute_homozygous_log_likelihoods(used_alleles, hap_mults)
            self._compute_heterozygous_log_likelihoods(used_alleles, hap_mults)
        else:
            raise ValueError(f"unsupported ploidy {data.ploidy}")

        self._call_genotype(data.input_alleles, hap_mults, data.ploidy)

    # -- preparations (model.cpp:8-16, 58-197) -------------------------------

    @staticmethod
    def _find_duplicate(alleles: List[Allele]) -> Optional[Allele]:
        seen = set()
        for a in alleles:
            if a.sequence in seen:  # std::set<Allele> compares sequence only
                return a
            seen.add(a.sequence)
        return None

    @staticmethod
    def _haplogroup_multiplicities(alleles: List[Allele]) -> List[bool]:
        counts: Dict[int, int] = {}
        for a in alleles:
            counts[a.haplogroup] = counts.get(a.haplogroup, 0) + 1
        return [counts.get(h, 0) > 1 for h in range(len(counts))]

    def _set_haploid_coverages(self, gp_counts: GroupedCounts, num_haplogroups):
        self.haploid_allele_coverages = [0] * num_haplogroups
        self.singleton_allele_coverages = [0] * num_haplogroups
        for group, count in gp_counts.items():
            for allele_id in group:
                self.haploid_allele_coverages[allele_id] += count
            if len(group) == 1:
                self.singleton_allele_coverages[group[0]] = count

    def _assign_coverage_to_empty_alleles(self, alleles: List[Allele]
                                          ) -> List[Allele]:
        out = []
        for a in alleles:
            if not a.sequence:
                cov = self.haploid_allele_coverages[a.haplogroup]
                a = replace(a, pb_cov=(cov,))
            out.append(a)
        return out

    def ignore_ref_allele(self) -> bool:
        return not self.data.input_alleles[0].callable

    # -- coverages (model.cpp:84-153) ----------------------------------------

    def _diploid_cov(self, gp_counts: GroupedCounts, haplogroups: List[int],
                     hap_mults: List[bool]) -> Tuple[float, float]:
        haplogroups = sorted(haplogroups)
        key = tuple(haplogroups)
        if key in self.computed_coverages:
            c = self.computed_coverages[key]
            return c[0], c[1]
        if haplogroups[0] == haplogroups[1]:
            cov = self.haploid_allele_coverages[haplogroups[0]] / 2
            self.computed_coverages[key] = [cov, cov]
            return cov, cov
        a1, a2 = haplogroups
        cov1 = float(self.haploid_allele_coverages[a1])
        cov2 = float(self.haploid_allele_coverages[a2])
        shared = 0
        for group, count in gp_counts.items():
            if a1 in group and a2 in group:
                shared += count
        spec1, spec2 = cov1 - shared, cov2 - shared
        if spec1 == 0 and spec2 == 0:
            belonging = 0.5
        else:
            belonging = spec1 / (spec1 + spec2)
        cov1 -= (1 - belonging) * shared
        cov2 -= belonging * shared
        if hap_mults[a1]:
            cov1 /= 2
        if hap_mults[a2]:
            cov2 /= 2
        self.computed_coverages[key] = [cov1, cov2]
        return cov1, cov2

    # -- likelihoods (model.cpp:155-333) -------------------------------------

    def _fraction_noncredible_positions(self, allele: Allele) -> float:
        threshold = self.data.l_stats.credible_cov_t
        noncredible = sum(1 for c in allele.pb_cov if c < threshold)
        return noncredible / len(allele.pb_cov)

    def _add_likelihood(self, alleles: List[Allele], incompatible_cov: float,
                        indices: List[int]):
        l_stats = self.data.l_stats
        log_likelihood = incompatible_cov * l_stats.log_mean_pb_error
        for allele in alleles:
            compatible_cov = allele.average_cov()
            gap = self._fraction_noncredible_positions(allele)
            log_likelihood += l_stats.pmf_full_depth(compatible_cov)
            log_likelihood += gap * l_stats.log_zero
        self.likelihoods.append((log_likelihood, list(indices)))

    def _compute_haploid_log_likelihoods(self, alleles: List[Allele]):
        for i, allele in enumerate(alleles):
            if i == 0 and self.ignore_ref_allele():
                continue
            hap_cov = self.haploid_allele_coverages[allele.haplogroup]
            self._add_likelihood([allele], self.total_coverage - hap_cov, [i])

    def _compute_homozygous_log_likelihoods(self, alleles, hap_mults):
        for i, allele in enumerate(alleles):
            if i == 0 and self.ignore_ref_allele():
                continue
            c1, c2 = self._diploid_cov(self.data.gp_counts,
                                       [allele.haplogroup, allele.haplogroup],
                                       hap_mults)
            self._add_likelihood([allele, allele],
                                 self.total_coverage - c1 - c2, [i, i])

    def _compute_heterozygous_log_likelihoods(self, alleles, hap_mults):
        selected = []
        for i, allele in enumerate(alleles):
            if i == 0 and self.ignore_ref_allele():
                continue
            if self.singleton_allele_coverages[allele.haplogroup] != 0:
                selected.append(i)
        if len(selected) < 2:
            return
        for x in range(len(selected)):
            for y in range(x + 1, len(selected)):
                i, j = selected[x], selected[y]
                a1, a2 = alleles[i], alleles[j]
                c1, c2 = self._diploid_cov(self.data.gp_counts,
                                           [a1.haplogroup, a2.haplogroup],
                                           hap_mults)
                self._add_likelihood([a1, a2],
                                     self.total_coverage - c1 - c2, [i, j])

    # -- genotype call (model.cpp:335-466) -----------------------------------

    def _sorted_likelihoods(self):
        """Descending loglik; ties keep insertion order (multimap parity)."""
        return sorted(self.likelihoods, key=lambda e: -e[0])

    def _choose_max_likelihood(self, ordered, alleles):
        if len(ordered) < 2:
            raise RuntimeError("Less than 2 alleles have a likelihood")
        pos = 0
        while pos < len(ordered):
            if all(alleles[gt].callable for gt in ordered[pos][1]):
                break
            pos += 1
        if len(ordered) - pos < 2:
            raise RuntimeError("Fewer than 2 alleles are callable")
        return pos

    @staticmethod
    def _rescale_genotypes(genotypes: List[int]) -> List[int]:
        """model.cpp:199-216 (allele 0 always maps to 0)."""
        rescaler = {0: 0}
        result = []
        next_index = 1
        for gt in genotypes:
            if gt not in rescaler:
                rescaler[gt] = next_index
                next_index += 1
            result.append(rescaler[gt])
        return result

    def _get_haplogroups(self, alleles, gtype) -> List[int]:
        return sorted(alleles[i].haplogroup for i in gtype)

    def _add_next_best_alleles(self, alleles, chosen_gt, next_best_gt):
        """model.cpp:335-360."""
        chosen_cov_allele = alleles[chosen_gt[0]]
        next_cov_allele = alleles[next_best_gt[0]]
        low_total = self.total_coverage < self.data.l_stats.data_params.mean_cov / 4
        low_relative = (
            self.haploid_allele_coverages[chosen_cov_allele.haplogroup]
            < self.haploid_allele_coverages[next_cov_allele.haplogroup] * 2)
        if low_total or low_relative:
            next_best = set(next_best_gt) - set(chosen_gt)
            self.site.extra_alleles = [
                replace(alleles[gt], callable=False) for gt in sorted(next_best)
            ]

    def _add_all_best_alleles(self, alleles, chosen_gt, next_best_gt):
        all_best = sorted(set(next_best_gt) | set(chosen_gt))
        self.site.extra_alleles = [alleles[gt] for gt in all_best]

    def _call_genotype(self, input_alleles, hap_mults, ploidy):
        ref_allele = input_alleles[0]
        ordered = self._sorted_likelihoods()
        pos = self._choose_max_likelihood(ordered, input_alleles)
        best_likelihood, chosen_gt = ordered[pos]
        next_likelihood, next_best_gt = ordered[pos + 1]
        gt_confidence = best_likelihood - next_likelihood

        if gt_confidence == 0.0:
            self.site.alleles = [ref_allele]
            self.site.make_null()
            self._add_all_best_alleles(input_alleles, chosen_gt, next_best_gt)
            return
        self._add_next_best_alleles(input_alleles, chosen_gt, next_best_gt)

        chosen_alleles = [input_alleles[i] for i in sorted(set(chosen_gt))]
        chosen_haplotypes = self._get_haplogroups(input_alleles, chosen_gt)
        if ploidy == HAPLOID:
            allele_covs = [float(self.haploid_allele_coverages[chosen_haplotypes[0]])]
        else:
            allele_covs = list(self.computed_coverages[tuple(chosen_haplotypes)])
            if chosen_gt[0] == chosen_gt[1]:  # homozygous: pool the coverage
                allele_covs = [allele_covs[0] + allele_covs[1]]

        rescaled_gt = self._rescale_genotypes(chosen_gt)
        if rescaled_gt[0] != 0:
            chosen_alleles = [ref_allele] + chosen_alleles
            ref_cov = float(self.singleton_allele_coverages[0])
            if hap_mults[0]:
                ref_cov /= 2
            allele_covs = [ref_cov] + allele_covs

        assert len(chosen_alleles) == len(allele_covs)
        self.site.alleles = chosen_alleles
        self.site.genotype = rescaled_gt
        self.site.allele_covs = allele_covs
        self.site.total_coverage = self.total_coverage
        self.site.haplogroups = self.site.get_genotyped_haplogroups(
            chosen_alleles, rescaled_gt)
        self.site.gt_conf = gt_confidence

        if self.data.debug:
            info = "\tnext_best_seq: "
            for gt in next_best_gt:
                info += input_alleles[gt].sequence + ","
            info += "\tnext_best_cov: "
            for hapg in self._get_haplogroups(input_alleles, next_best_gt):
                info += str(self.haploid_allele_coverages[hapg]) + ","
            self.site.debug_info = info

    # -- API ------------------------------------------------------------------

    def get_site(self) -> GenotypedSite:
        return self.site

    def get_genotype_confidence(self) -> float:
        return self.site.gt_conf
