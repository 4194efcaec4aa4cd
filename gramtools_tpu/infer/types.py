"""Genotyping data types.

Parity: libgramtools include/genotype/infer/types.hpp (Allele),
interfaces.hpp (GenotypedSite), level_genotyping/site.hpp
(LevelGenotypedSite).
"""
from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import List, Optional, Tuple


@dataclass(frozen=True, slots=True)
class Allele:
    sequence: str = ""
    pb_cov: Tuple[int, ...] = ()
    haplogroup: int = 0
    callable: bool = True

    def __add__(self, other: "Allele") -> "Allele":
        """Concatenation keeps the left haplogroup; non-callable is
        contagious (types.hpp:32-44)."""
        return Allele(
            self.sequence + other.sequence,
            self.pb_cov + other.pb_cov,
            self.haplogroup,
            self.callable and other.callable,
        )

    def same_key(self, other: "Allele") -> bool:
        """operator== parity: callable excluded (types.hpp:52-58)."""
        return (self.sequence == other.sequence
                and self.pb_cov == other.pb_cov
                and self.haplogroup == other.haplogroup)

    def average_cov(self) -> float:
        if not self.pb_cov:
            return float("nan")
        return sum(self.pb_cov) / len(self.pb_cov)


@dataclass(slots=True)
class GenotypedSite:
    """gtype_information + site state (interfaces.hpp:39-124)."""

    alleles: List[Allele] = field(default_factory=list)
    genotype: List[int] = field(default_factory=list)
    allele_covs: List[float] = field(default_factory=list)
    total_coverage: int = 0
    haplogroups: List[int] = field(default_factory=list)
    filters: List[str] = field(default_factory=list)
    pos: int = 0
    site_end_node: int = -1
    num_haplogroups: int = 0
    extra_alleles: Optional[List[Allele]] = None
    debug_info: str = ""
    # LevelGenotypedSite extras
    gt_conf: float = 0.0
    gt_conf_percentile: float = 0.0

    def is_null(self) -> bool:
        return len(self.genotype) > 0 and self.genotype[0] == -1

    def make_null(self):
        self.genotype = [-1]
        self.total_coverage = 0
        self.gt_conf = 0.0
        self.gt_conf_percentile = 0.0

    def has_filter(self, name: str) -> bool:
        return name in self.filters

    def set_filter(self, name: str):
        self.filters.append(name)

    def get_unique_genotyped_alleles(self, all_alleles=None, genotype=None
                                     ) -> List[Allele]:
        """Distinct genotype indices, sorted, -> alleles
        (interfaces.cpp:13-30)."""
        if all_alleles is None:
            all_alleles = self.alleles
        if genotype is None:
            genotype = self.genotype
        if self.is_null() and genotype is self.genotype:
            return []
        distinct = sorted(set(genotype))
        return [all_alleles[i] for i in distinct]

    def get_genotyped_haplogroups(self, input_alleles, input_gts) -> List[int]:
        return [input_alleles[gt].haplogroup for gt in input_gts]

    def get_nongenotyped_haplogroups(self) -> List[int]:
        """site.cpp:6-21."""
        assert self.alleles and self.num_haplogroups > 0
        genotyped = set()
        if not self.is_null():
            for gt in self.genotype:
                genotyped.add(self.alleles[gt].haplogroup)
        return [h for h in range(self.num_haplogroups) if h not in genotyped]

    def get_all_haplogroups(self) -> List[int]:
        return list(range(self.num_haplogroups))
