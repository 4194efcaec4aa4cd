"""Allele extraction from bubbles, combining nested genotyped sites.

Parity: libgramtools src/genotype/infer/allele_extracter.cpp.
"""
from __future__ import annotations

from typing import List

from ..mapping.search import PrgIndex
from ..prg.markers import site_id_to_index
from .types import Allele, GenotypedSite

MAX_COMBINATIONS = 10000  # allele_extracter.cpp:6


def extract_ref_allele(idx: PrgIndex, start_node: int, end_node: int) -> Allele:
    """First path through the bubble (allele_extracter.cpp:76-89)."""
    g = idx.graph
    result = Allele("", (), 0)
    cur = start_node
    while cur != end_node:
        node = g.node(cur)
        if node.seq_size > 0:
            result = result + Allele(node.seq_str(),
                                     tuple(g.node_coverage(cur).tolist()))
        cur = node.edges[0]
    return result


class AlleleExtracter:
    def __init__(self, idx: PrgIndex, site_start: int, site_end: int,
                 genotyped_sites: List[GenotypedSite]):
        self.idx = idx
        self.genotyped_sites = genotyped_sites
        g = idx.graph
        assert g.node(site_start).is_bubble_start()
        self.alleles: List[Allele] = []
        for haplogroup, start in enumerate(g.node(site_start).edges):
            self.alleles.extend(self._extract(haplogroup, start, site_end))

    def _allele_combine(self, existing: List[Allele], site_index: int
                        ) -> List[Allele]:
        """Cartesian product with a nested site's called + extra alleles
        (allele_extracter.cpp:25-57)."""
        referent = self.genotyped_sites[site_index]
        relevant = referent.get_unique_genotyped_alleles()
        if referent.extra_alleles is not None:
            relevant = relevant + list(referent.extra_alleles)
        if not relevant:
            relevant = [referent.alleles[0]]
        while len(existing) * len(relevant) > MAX_COMBINATIONS:
            relevant = relevant[:-1]
        return [a + b for a in existing for b in relevant]

    def _extract(self, haplogroup: int, start: int, site_end: int
                 ) -> List[Allele]:
        """allele_extracter.cpp:91-124."""
        g = self.idx.graph
        alleles = [Allele("", (), haplogroup)]
        cur = start
        while cur != site_end:
            node = g.node(cur)
            if node.is_bubble_start():
                site_index = site_id_to_index(node.site_id)
                alleles = self._allele_combine(alleles, site_index)
                cur = self.genotyped_sites[site_index].site_end_node
                node = g.node(cur)
            else:
                if node.seq_size > 0:
                    paste = Allele(node.seq_str(),
                                   tuple(g.node_coverage(cur).tolist()))
                    alleles = [a + paste for a in alleles]
            assert len(node.edges) == 1
            cur = node.edges[0]

        if haplogroup == 0:
            ref_allele = extract_ref_allele(self.idx, start, site_end)
            alleles = self._place_ref_first(alleles, ref_allele)
        return alleles

    @staticmethod
    def _place_ref_first(alleles: List[Allele], ref_allele: Allele
                         ) -> List[Allele]:
        """allele_extracter.cpp:66-74 (match by ==, callable excluded)."""
        for i, a in enumerate(alleles):
            if a.same_key(ref_allele):
                if i != 0:
                    alleles = list(alleles)
                    alleles[0], alleles[i] = alleles[i], alleles[0]
                return alleles
        from dataclasses import replace
        return [replace(ref_allele, callable=False)] + alleles
