"""Level genotyper runner: per-bubble genotyping, child-first, with
nested-site invalidation and filter propagation.

Parity: libgramtools src/genotype/infer/level_genotyping/runner.cpp.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..mapping.coverage import Coverage
from ..mapping.search import PrgIndex
from ..prg.markers import site_id_to_index
from .allele_extracter import AlleleExtracter
from .gcp import CONF_DISTRIB_SIZE, Percentiler, simulate_confidences
from .model import LevelGenotyperModel, ModelData
from .probs import make_l_stats
from .types import GenotypedSite


class LevelGenotyper:
    def __init__(self, idx: PrgIndex, coverage: Coverage, read_stats,
                 ploidy: int, get_gcp: bool = True,
                 debug_fpath: Optional[str] = None, use_fast: bool = True):
        # genotyping allocates millions of small container objects that
        # all survive (sites, alleles, coverage tuples); with the cyclic
        # GC enabled, recurring full collections over that heap dominate
        # wall time at ~1M sites. Nothing here creates cycles: pause the
        # collector for the duration.
        import gc
        gc_was_enabled = gc.isenabled()
        if gc_was_enabled:
            gc.disable()
        try:
            self._init(idx, coverage, read_stats, ploidy, get_gcp,
                       debug_fpath, use_fast)
        finally:
            if gc_was_enabled:
                gc.enable()

    def _batch_nonsimple_sites(self, fast_sites, coverage):
        """Wave-batched genotyping of every site the simple-site fast
        path skipped (nested bubbles, multi-node branches): per wave of
        ready sites (all children already genotyped), extraction runs
        on the host and the vectorised haploid model evaluates the whole
        wave at once (vector_model.batch_extracted_model); sites the
        batch declines fall back to the scalar oracle. Mirrors the
        child-first order of runner.cpp:54-92 -- a site's children are
        always genotyped in an earlier wave."""
        from .vector_model import batch_extracted_model

        g = self.idx.graph
        # parent extraction jumps via the child's site_end_node, which
        # the ordered loop normally sets: set pos/end-node up front
        # (the loop later re-sets them identically)
        meta = {}
        pending = []
        for entry, exit_ in g.bubbles:
            site_index = site_id_to_index(g.node(entry).site_id)
            meta[site_index] = (g.node(entry).pos, exit_)
            if site_index not in fast_sites:
                pending.append((entry, exit_, site_index))
        for si, site in fast_sites.items():
            site.pos, site.site_end_node = meta[si]
            self.genotyped_records[si] = site
        while pending:
            wave, rest = [], []
            for entry, exit_, site_index in pending:
                site_id = g.node(entry).site_id
                children = [c for haplo in
                            self.child_map.get(site_id, {}).values()
                            for c in haplo]
                if all(self.genotyped_records[site_id_to_index(c)]
                       is not None for c in children):
                    wave.append((entry, exit_, site_index))
                else:
                    rest.append((entry, exit_, site_index))
            if not wave:
                break       # cycle guard; the ordered loop handles rest
            sites_data = []
            for entry, exit_, site_index in wave:
                extracter = AlleleExtracter(self.idx, entry, exit_,
                                            self.genotyped_records)
                sites_data.append((site_index, extracter.alleles,
                                   coverage.grouped_counts[site_index]))
            batched, leftover = batch_extracted_model(sites_data,
                                                      self.l_stats)
            for site_index, site in batched.items():
                site.pos, site.site_end_node = meta[site_index]
                fast_sites[site_index] = site
                self.genotyped_records[site_index] = site
            for site_index, alleles, gp_counts in leftover:
                data = ModelData(alleles, gp_counts, self.ploidy,
                                 self.l_stats, False)
                site = LevelGenotyperModel(data).get_site()
                site.pos, site.site_end_node = meta[site_index]
                fast_sites[site_index] = site
                self.genotyped_records[site_index] = site
            pending = rest

    def _init(self, idx: PrgIndex, coverage: Coverage, read_stats,
              ploidy: int, get_gcp: bool, debug_fpath, use_fast: bool):
        self.idx = idx
        self.ploidy = ploidy
        g = idx.graph
        self.child_map = g.child_map()
        self.genotyped_records: List[Optional[GenotypedSite]] = [None] * g.num_sites

        self.l_stats = make_l_stats(read_stats.mean_cov_depth,
                                    read_stats.variance_cov_depth,
                                    read_stats.mean_pb_error)

        debug_lines: List[str] = []
        debug = debug_fpath is not None

        # simple (childless) sites depend only on coverage, so they are
        # batch-genotyped upfront by the vectorised model; the bubble
        # loop below then runs in reference order, so invalidation and
        # filter propagation see sites in exactly the reference sequence
        fast_sites = {}
        if not debug and use_fast:
            from .vector_model import batch_simple_sites
            fast_sites = batch_simple_sites(idx, coverage, self.l_stats,
                                            ploidy, self.child_map)
            if ploidy == 1:
                # batch the remaining (nested / multi-node) sites too:
                # extraction is host-side per wave of ready sites, the
                # model is the vectorised haploid twin. Safe ahead of the
                # ordered loop below because invalidation only ever
                # flows from LATER-processed parents (child-first
                # order), so extraction inputs never see it.
                self._batch_nonsimple_sites(fast_sites, coverage)

        # child-first bubble iteration (runner.cpp:54-92)
        for entry, exit_ in g.bubbles:
            site_id = g.node(entry).site_id
            site_index = site_id_to_index(site_id)
            site = fast_sites.get(site_index)
            if site is None:
                extracter = AlleleExtracter(idx, entry, exit_,
                                            self.genotyped_records)
                gped_covs_for_site = coverage.grouped_counts[site_index]
                data = ModelData(extracter.alleles, gped_covs_for_site,
                                 ploidy, self.l_stats, debug)
                model = LevelGenotyperModel(data)
                site = model.get_site()
            site.pos = g.node(entry).pos
            site.site_end_node = exit_
            self.genotyped_records[site_index] = site

            if debug:
                line = f"site index: \t{site_index}"
                if site.is_null():
                    line += "\tnull gt "
                else:
                    line += site.debug_info
                debug_lines.append(line)

            self._run_invalidation_process(site, site_id)
            if site.has_filter("AMBIG"):
                self._downpropagate_filter("AMBIG", site_id)
            else:
                self._uppropagate_filter("AMBIG", site_id)

        if get_gcp:
            confidences = self.get_gtconf_distrib()
            self._add_percentiles(confidences)

        if debug_fpath:
            with open(debug_fpath, "a") as fh:
                dp = self.l_stats.data_params
                fh.write(
                    f"Model params: \nmean cov: {dp.mean_cov:f}\n"
                    f"mean per-base error: {dp.mean_pb_error:f}\n"
                    f"num successes: {dp.num_successes:f}\n"
                    f"prob of success: {dp.success_prob:f} \n"
                    f"log_prob_zero_cov: {self.l_stats.log_zero:f} \n"
                    f"log_prob_nonzero_cov: {self.l_stats.log_no_zero:f}\n")
                for line in debug_lines:
                    fh.write(line + "\n")

    # -- filter propagation (runner.cpp:109-143) -----------------------------

    def _uppropagate_filter(self, name: str, parent_site_id: int):
        if parent_site_id not in self.child_map:
            return
        focal_index = site_id_to_index(parent_site_id)
        for children in self.child_map[parent_site_id].values():
            for child_marker in children:
                child = self.genotyped_records[site_id_to_index(child_marker)]
                if child.has_filter(name):
                    self.genotyped_records[focal_index].set_filter(name)
                    return

    def _downpropagate_filter(self, name: str, parent_site_id: int):
        to_process = [parent_site_id]
        while to_process:
            cur = to_process.pop()
            if cur not in self.child_map:
                continue
            for children in self.child_map[cur].values():
                for child_marker in children:
                    child = self.genotyped_records[site_id_to_index(child_marker)]
                    if not child.has_filter(name):
                        child.set_filter(name)
                        to_process.append(child_marker)

    # -- invalidation (runner.cpp:145-197) -----------------------------------

    def _run_invalidation_process(self, site: GenotypedSite, site_id: int):
        if site_id not in self.child_map:
            return
        candidates = site.get_nongenotyped_haplogroups()
        with_sites = self._haplogroups_with_sites(site_id, candidates)
        self._invalidate_if_needed(site_id, with_sites)

    def _haplogroups_with_sites(self, site_id: int, candidates: List[int]
                                ) -> List[int]:
        entry = self.child_map.get(site_id)
        if entry is None:
            return []
        return [c for c in candidates if c in entry]

    def _invalidate_if_needed(self, parent_site_id: int, haplogroups: List[int]):
        if not haplogroups:
            return
        to_process = [(parent_site_id, h) for h in haplogroups]
        while to_process:
            site_id, haplo = to_process.pop()
            for child_marker in self.child_map[site_id][haplo]:
                child = self.genotyped_records[site_id_to_index(child_marker)]
                if child.is_null():
                    continue
                child.make_null()
                haplos = self._haplogroups_with_sites(
                    child_marker, child.get_all_haplogroups())
                for h in haplos:
                    to_process.append((child_marker, h))

    # -- percentiles (runner.cpp:299-337, 16-25) -----------------------------

    def get_gtconf_distrib(self) -> List[float]:
        sites = self.genotyped_records
        if len(sites) > CONF_DISTRIB_SIZE:
            rng = np.random.RandomState(42)
            picks = rng.randint(0, len(sites), size=CONF_DISTRIB_SIZE)
            confidences = [sites[i].gt_conf for i in picks]
        else:
            confidences = [s.gt_conf for s in sites]
            num_sim = CONF_DISTRIB_SIZE - len(confidences)
            confidences.extend(
                simulate_confidences(num_sim, self.l_stats, self.ploidy))
        confidences.sort()
        return confidences

    def _add_percentiles(self, confidences: List[float]):
        percentiler = Percentiler(confidences)
        for site in self.genotyped_records:
            site.gt_conf_percentile = percentiler.get_confidence_percentile(
                site.gt_conf)
