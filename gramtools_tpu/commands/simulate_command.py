"""`simulate` command: sample random paths through the PRG, or thread
given sequences through it, emitting fasta + combined jVCF.

Parity: gramtools/commands/simulate/simulate.py +
libgramtools src/simulate/{simulate.cpp,induce_genotypes.cpp}.
"""
from __future__ import annotations

import logging
from dataclasses import replace
from typing import List, Optional, Tuple

import numpy as np

from ..common.rng import RandomInclusiveInt
from ..common.seq import iter_fastx
from ..infer.json_prg import combine_json_prgs, make_json_prg, write_json_prg
from ..infer.personalised_ref import get_personalised_ref
from ..infer.allele_extracter import AlleleExtracter
from ..infer.segment_tracker import SegmentTracker
from ..infer.types import Allele, GenotypedSite
from ..mapping.search import PrgIndex
from ..prg.graph import build_cov_graph
from ..prg.linearise import PrgString
from ..prg.markers import ALLELE_UNKNOWN, site_id_to_index
from . import report
from .paths import SimulatePaths

log = logging.getLogger("gramtools_tpu")


def run(args):
    log.info("Start process: simulate")
    sim_paths = SimulatePaths(args.output_dir, args.sample_id, args.prg,
                              args.induce_genotypes, args.force)
    sim_paths.setup()

    prg = PrgString.from_file(sim_paths.prg_fpath)
    graph = build_cov_graph(prg)
    idx = PrgIndex(prg.ints, graph, None, dict(prg.end_positions))

    seed = getattr(args, "seed", None)
    if args.induce_genotypes:
        simu_json = induce_genotypes_all_seqs(idx, str(sim_paths.input_multifasta))
    else:
        simu_json = simulate_paths(idx, args.max_num_paths, args.sample_id,
                                   sim_paths.fasta_out, seed)
    write_json_prg(simu_json, sim_paths.json_out)
    log.info("End process: simulate")


# --- random path sampling (simulate.cpp:19-139) -----------------------------


def make_randomly_genotyped_site(rand, alleles: List[Allele]) -> GenotypedSite:
    """simulate.cpp:46-76."""
    picked_alleles = [alleles[0]]  # always keep REF
    use_ref = alleles[0].callable
    lo = 0 if use_ref else 1
    picked_index = rand.generate(lo, len(alleles) - 1)
    chosen_hapg = alleles[picked_index].haplogroup
    covs = [1.0]
    if picked_index != 0:
        picked_alleles.append(alleles[picked_index])
        covs = [0.0, 1.0]
        picked_index = 1
    site = GenotypedSite()
    site.alleles = picked_alleles
    site.genotype = [picked_index]
    site.allele_covs = covs
    site.total_coverage = 1
    site.haplogroups = [chosen_hapg]
    site.num_haplogroups = len(alleles)
    return site


class SimulationGenotyper:
    """simulate.cpp:19-44: random allele per bubble + invalidation."""

    def __init__(self, idx: PrgIndex, rand=None):
        g = idx.graph
        self.idx = idx
        self.child_map = g.child_map()
        self.genotyped_records: List[Optional[GenotypedSite]] = [None] * g.num_sites
        for entry, exit_ in g.bubbles:
            site_id = g.node(entry).site_id
            site_index = site_id_to_index(site_id)
            extracter = AlleleExtracter(idx, entry, exit_, self.genotyped_records)
            local_rand = rand if rand is not None else RandomInclusiveInt(None)
            site = make_randomly_genotyped_site(local_rand, extracter.alleles)
            site.pos = g.node(entry).pos
            site.site_end_node = exit_
            self.genotyped_records[site_index] = site
            self._run_invalidation_process(site, site_id)

    def _haplogroups_with_sites(self, site_id, candidates):
        entry = self.child_map.get(site_id)
        if entry is None:
            return []
        return [c for c in candidates if c in entry]

    def _run_invalidation_process(self, site: GenotypedSite, site_id: int):
        if site_id not in self.child_map:
            return
        candidates = site.get_nongenotyped_haplogroups()
        to_process = [(site_id, h)
                      for h in self._haplogroups_with_sites(site_id, candidates)]
        while to_process:
            cur_id, haplo = to_process.pop()
            for child_marker in self.child_map[cur_id][haplo]:
                child = self.genotyped_records[site_id_to_index(child_marker)]
                if child is None or child.is_null():
                    continue
                child.make_null()
                for h in self._haplogroups_with_sites(
                        child_marker, child.get_all_haplogroups()):
                    to_process.append((child_marker, h))


def _sim_json(idx, sites, tracker, sample_id, desc, model="Simulated_Path"):
    j = make_json_prg(idx, sites, tracker, sample_id, desc)
    j["Model"] = model
    for site in j["Sites"]:
        site.pop("GT_CONF", None)
        site.pop("GT_CONF_PERCENTILE", None)
    return j


def simulate_paths(idx: PrgIndex, max_num_paths: int, sample_id: str,
                   fasta_out, seed=None) -> dict:
    """simulate.cpp:101-139."""
    tracker = SegmentTracker("")
    rand = RandomInclusiveInt(seed) if seed is not None else None
    unique_paths = {}
    ordered: List[Tuple[str, str]] = []
    simu_json = None
    num_sampled = 0
    for _ in range(max_num_paths):
        gtyper = SimulationGenotyper(idx, rand)
        tracker.reset()
        p_ref = get_personalised_ref(idx, gtyper.genotyped_records, tracker)[0]
        seq = p_ref[1]
        if seq in unique_paths:
            continue
        num_sampled += 1
        this_id = f"{sample_id}{num_sampled}"
        unique_paths[seq] = this_id
        ordered.append((this_id, seq))
        tracker.reset()
        new_json = _sim_json(idx, gtyper.genotyped_records, tracker, this_id,
                             "path through prg made by gramtools simulate")
        simu_json = new_json if simu_json is None else combine_json_prgs(
            simu_json, new_json)

    log.info("Made %d simulated paths.", len(ordered))
    with open(fasta_out, "w") as fh:
        for rid, seq in ordered:
            fh.write(f">{rid} made by gramtools simulate\n")
            for i in range(0, len(seq), 60):
                fh.write(seq[i : i + 60] + "\n")
    return simu_json


# --- genotype induction (induce_genotypes.cpp) ------------------------------


def make_nulled_sites(idx: PrgIndex) -> List[GenotypedSite]:
    """induce_genotypes.cpp:7-26."""
    g = idx.graph
    records: List[Optional[GenotypedSite]] = [None] * g.num_sites
    for entry, exit_ in g.bubbles:
        extracter = AlleleExtracter(idx, entry, exit_, records)
        site = GenotypedSite()
        site.alleles = [extracter.alleles[0]]
        site.pos = g.node(entry).pos
        site.make_null()
        site.site_end_node = exit_
        records[site_id_to_index(g.node(entry).site_id)] = site
    return records


def thread_sequence(idx: PrgIndex, sequence: str):
    """BFS-threads a sequence through the graph (induce_genotypes.cpp:28-55).
    Returns list of endpoint threads: each a chain of (parent_idx, node,
    offset) tuples; represented as python lists of (node, offset) paths."""
    g = idx.graph
    # thread: (node_idx, offset, parent_thread)
    root_thread = (g.root, 0, None)
    to_visit = [root_thread]
    endpoints = []
    while to_visit:
        cur = to_visit.pop()
        node_idx, offset, _ = cur
        node = g.node(node_idx)
        if not node.edges:
            endpoints.append(cur)
            continue
        node_size = node.seq_size
        if node_size > 0:
            if sequence[offset : offset + node_size] != node.seq_str():
                continue
        for nxt in node.edges:
            to_visit.append((nxt, offset + node_size, cur))
    return endpoints


class NoEndpoints(Exception):
    pass


def get_single_endpoint(endpoints, seq_id: str, no_ambiguous: bool = False):
    """induce_genotypes.cpp:57-86."""
    if not endpoints:
        raise NoEndpoints(
            f"Could not thread a path through the prg for sequence: {seq_id}")
    if len(endpoints) == 1:
        return False, endpoints[-1]
    if no_ambiguous:
        raise RuntimeError(
            f"Found more than one path through the prg for sequence: {seq_id}")
    max_offset, max_loc = 0, 0
    for i, ep in enumerate(endpoints):
        if ep[1] > max_offset:
            max_offset, max_loc = ep[1], i
    return True, endpoints[max_loc]


def _extract_allele(idx: PrgIndex, end_thread, target_site_id: int) -> Allele:
    """induce_genotypes.cpp:88-105: walk parents to the site's bubble
    start, collecting sequence."""
    g = idx.graph
    cur = end_thread[2]  # parent
    sequence = ""
    haplogroup = ALLELE_UNKNOWN
    while True:
        node = g.node(cur[0])
        if node.is_bubble_start() and node.site_id == target_site_id:
            break
        if haplogroup == ALLELE_UNKNOWN and node.site_id == target_site_id:
            haplogroup = node.allele_id
        sequence = node.seq_str() + sequence
        cur = cur[2]
    return Allele(sequence, (), haplogroup)


def apply_genotypes(idx: PrgIndex, end_thread, has_ambiguity: bool,
                    sites: List[GenotypedSite]):
    """induce_genotypes.cpp:107-135."""
    g = idx.graph
    cur = end_thread
    while cur[2] is not None:
        node = g.node(cur[0])
        if node.is_bubble_end():
            site_id = node.site_id
            site = sites[site_id_to_index(site_id)]
            extracted = _extract_allele(idx, cur, site_id)
            site_alleles = list(site.alleles)
            if extracted.sequence == site_alleles[0].sequence:
                site.alleles = site_alleles
                site.genotype = [0]
                site.allele_covs = [1]
                site.total_coverage = 1
                site.haplogroups = [0]
            else:
                site_alleles.append(extracted)
                site.alleles = site_alleles
                site.genotype = [1]
                site.allele_covs = [0, 1]
                site.total_coverage = 1
                site.haplogroups = [extracted.haplogroup]
            if has_ambiguity:
                site.set_filter("AMBIG")
        cur = cur[2]


def induce_genotypes_one_seq(idx, template_sites, sequence: str, seq_id: str):
    import copy
    result = [copy.deepcopy(s) for s in template_sites]
    endpoints = thread_sequence(idx, sequence)
    has_ambiguity, endpoint = get_single_endpoint(endpoints, seq_id, False)
    apply_genotypes(idx, endpoint, has_ambiguity, result)
    return result


def induce_genotypes_all_seqs(idx: PrgIndex, fasta_fpath: str) -> dict:
    """induce_genotypes semantics of simulate.cpp:141-178."""
    template_sites = make_nulled_sites(idx)
    tracker = SegmentTracker("")
    simu_json = None
    desc = "induced genotypes made by gramtools simulate"
    for name, seq, _ in iter_fastx(fasta_fpath):
        gtyped = induce_genotypes_one_seq(idx, template_sites, seq, name)
        tracker.reset()
        new_json = _sim_json(idx, gtyped, tracker, name, desc)
        simu_json = new_json if simu_json is None else combine_json_prgs(
            simu_json, new_json)
    return simu_json
