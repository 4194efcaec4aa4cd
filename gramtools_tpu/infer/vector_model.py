"""Vectorised level genotyping for simple sites.

A "simple" site is a bubble with no nested children: every haplogroup
branch is a chain of plain sequence nodes (possibly empty = direct
deletion), so allele extraction is a slice walk and the model inputs
(per-allele average coverage, gap fraction, haplogroup coverages) are
computable as flat arrays over all such sites at once. The likelihood
arithmetic reproduces LevelGenotyperModel (model.py / reference
model.cpp) operation-for-operation so calls are bit-identical; the
scalar model remains the oracle (tests/test_vector_model.py fuzzes
equality) and handles every non-simple site.

Production graphs are dominated by simple biallelic sites (VCF-built
SNP/indel records), where the scalar model's per-site Python objects
cost ~60us/site; this path runs them at ~2us/site.
"""
from __future__ import annotations

from dataclasses import replace
from typing import Dict, List, Optional

import numpy as np

from ..common.seq import _DECODE_LUT
from ..mapping.search import PrgIndex
from ..prg.markers import site_id_to_index
from .probs import LikelihoodStats
from .types import Allele, GenotypedSite

HAPLOID = 1
DIPLOID = 2

MAX_FAST_ALLELES = 8


def _decode(seq: np.ndarray) -> str:
    return _DECODE_LUT[seq].tobytes().decode("ascii")


class _SimpleSite:
    """Collected branch data for one candidate site. Each branch is a
    list of (cov_start, length) segments into the graph's flat
    coverage/sequence arrays."""

    __slots__ = ("site_index", "segs")

    def __init__(self, site_index: int):
        self.site_index = site_index
        self.segs: List[List[tuple]] = []

    def seq(self, flat_seq: str, branch: int) -> str:
        segs = self.segs[branch]
        if len(segs) == 1:
            s, n = segs[0]
            return flat_seq[s:s + n]
        return "".join(flat_seq[s:s + n] for s, n in segs)

    def cov(self, flat_cov: np.ndarray, branch: int) -> np.ndarray:
        parts = [flat_cov[s:s + n] for s, n in self.segs[branch]]
        if not parts:
            return np.empty(0, dtype=flat_cov.dtype)
        return parts[0] if len(parts) == 1 else np.concatenate(parts)


def _flat_seq_str(g) -> str:
    """Decoded base string aligned with the graph's flat coverage array
    (built once, cached on the graph)."""
    cached = getattr(g, "_flat_seq_str", None)
    if cached is None:
        flat = np.zeros(g.coverage.size, dtype=np.uint8)
        for nd in g.nodes:
            if nd.cov_start >= 0 and nd.seq.size and nd.in_bubble():
                flat[nd.cov_start:nd.cov_start + nd.seq.size] = nd.seq
        cached = g._flat_seq_str = _decode(flat)
    return cached


def _collect_simple_sites(idx: PrgIndex, child_map, ploidy: int):
    """Walk each childless bubble's branches; returns the per-site branch
    data for sites the fast path can genotype."""
    g = idx.graph
    nt = g.node_tables()
    n_edges = nt.n_edges
    edge_offset = nt.edge_offset
    edges = nt.edges
    seq_len = nt.seq_len
    cov_start = nt.cov_start
    site_of = nt.site_id
    # vectorised pre-pass: for candidate bubbles, classify every branch
    # as empty (edge straight to exit), one-hop (one seq node to exit),
    # or "long" (python walk below)
    entries = np.array([e for e, _ in g.bubbles], dtype=np.int64)
    exits = np.array([x for _, x in g.bubbles], dtype=np.int64)
    ne_all = n_edges[entries].astype(np.int64)
    cand = np.array([site_of[e] not in child_map for e in entries])
    cand &= ne_all <= MAX_FAST_ALLELES
    if ploidy == DIPLOID:
        cand &= ne_all == 2
    A = int(ne_all[cand].max()) if cand.any() else 0
    out: List[_SimpleSite] = []
    if A == 0:
        return out
    e0_all = edge_offset[entries].astype(np.int64)
    amask = np.arange(A)[None, :] < ne_all[:, None]
    tgt = edges[np.minimum(e0_all[:, None] + np.arange(A)[None, :],
                           edges.size - 1)].astype(np.int64)
    is_empty = tgt == exits[:, None]
    one_edge = n_edges[tgt] == 1
    hop2 = edges[np.where(one_edge, edge_offset[tgt],
                          0)].astype(np.int64)
    is_onehop = ~is_empty & one_edge & (hop2 == exits[:, None])
    simple_vec = (is_empty | is_onehop | ~amask).all(axis=1) & cand

    for bi in np.flatnonzero(cand):
        entry = int(entries[bi])
        exit_ = int(exits[bi])
        ne = int(ne_all[bi])
        rec = _SimpleSite(site_id_to_index(int(site_of[entry])))
        if simple_vec[bi]:
            for b in range(ne):
                if is_empty[bi, b]:
                    rec.segs.append([])
                else:
                    node = int(tgt[bi, b])
                    ln = int(seq_len[node])
                    rec.segs.append([(int(cov_start[node]), ln)]
                                    if ln > 0 else [])
            out.append(rec)
            continue
        ok = True
        e0 = int(edge_offset[entry])
        for b in range(ne):
            cur = int(edges[e0 + b])
            segs: List[tuple] = []
            while cur != exit_:
                if n_edges[cur] != 1:
                    ok = False
                    break
                ln = int(seq_len[cur])
                if ln > 0:
                    segs.append((int(cov_start[cur]), ln))
                cur = int(edges[edge_offset[cur]])
            if not ok:
                break
            rec.segs.append(segs)
        if ok and len(rec.segs) > 1:
            out.append(rec)
    return out


def batch_simple_sites(idx: PrgIndex, coverage, l_stats: LikelihoodStats,
                       ploidy: int, child_map) -> Dict[int, GenotypedSite]:
    """Genotype all simple sites; returns {site_index: GenotypedSite}.

    Bit-identical to LevelGenotyperModel on the same inputs (asserted by
    tests); the runner routes any site not in the result to the scalar
    model."""
    recs = _collect_simple_sites(idx, child_map, ploidy)
    if not recs:
        return {}
    g = idx.graph
    flat_cov = g.coverage
    flat_seq = _flat_seq_str(g)
    S = len(recs)
    A = max(len(r.segs) for r in recs)
    n_all = np.array([len(r.segs) for r in recs], dtype=np.int64)

    # --- coverage inputs ----------------------------------------------------
    total = np.zeros(S, dtype=np.int64)
    hapcov = np.zeros((S, A), dtype=np.int64)
    singleton = np.zeros((S, A), dtype=np.int64)
    for si, rec in enumerate(recs):
        for group, count in coverage.grouped_counts[rec.site_index].items():
            total[si] += count
            for allele_id in group:
                if allele_id < A:
                    hapcov[si, allele_id] += count
            if len(group) == 1 and group[0] < A:
                singleton[si, group[0]] = count

    # per-allele average coverage + non-credible fraction (model.cpp
    # uses sum/len over per-base counts; empty alleles take the
    # haplogroup coverage as a single pseudo-base). Segment sums come
    # from two graph-wide cumsums, O(1) per segment.
    t = l_stats.credible_cov_t
    csum = np.zeros(flat_cov.size + 1, dtype=np.int64)
    np.cumsum(flat_cov, out=csum[1:])
    ncred = np.zeros(flat_cov.size + 1, dtype=np.int64)
    np.cumsum(flat_cov < t, out=ncred[1:])
    seg_start, seg_len, seg_flat = [], [], []
    for si, rec in enumerate(recs):
        for ai, segs in enumerate(rec.segs):
            for s0, n in segs:
                seg_start.append(s0)
                seg_len.append(n)
                seg_flat.append(si * A + ai)
    seg_start = np.array(seg_start, dtype=np.int64)
    seg_len = np.array(seg_len, dtype=np.int64)
    seg_flat = np.array(seg_flat, dtype=np.int64)
    sums = np.zeros(S * A, dtype=np.int64)
    ncreds = np.zeros(S * A, dtype=np.int64)
    lens = np.zeros(S * A, dtype=np.int64)
    if seg_start.size:
        np.add.at(sums, seg_flat, csum[seg_start + seg_len] - csum[seg_start])
        np.add.at(ncreds, seg_flat,
                  ncred[seg_start + seg_len] - ncred[seg_start])
        np.add.at(lens, seg_flat, seg_len)
    sums = sums.reshape(S, A)
    ncreds = ncreds.reshape(S, A)
    lens = lens.reshape(S, A)
    nonempty = lens > 0
    safe_len = np.where(nonempty, lens, 1)
    avg = np.where(nonempty, sums / safe_len, hapcov.astype(np.float64))
    gap = np.where(nonempty, ncreds / safe_len,
                   (hapcov < t).astype(np.float64))

    valid = np.arange(A)[None, :] < n_all[:, None]

    # --- likelihoods (exact op order of model.py _add_likelihood) -----------
    log_err = l_stats.log_mean_pb_error
    log_zero = l_stats.log_zero
    pmf = l_stats.pmf_full_depth.vectorised(np.where(valid, avg, 0.0))
    mean_cov = l_stats.data_params.mean_cov

    sites: Dict[int, GenotypedSite] = {}

    if ploidy == HAPLOID:
        incompat = (total[:, None] - hapcov).astype(np.float64)
        ll = (incompat * log_err + pmf) + gap * log_zero
        ll = np.where(valid, ll, -np.inf)
        order = np.argsort(-ll, axis=1, kind="stable")
        best = order[:, 0]
        second = order[:, 1]
        ar = np.arange(S)
        conf = ll[ar, best] - ll[ar, second]
    else:
        # A == 2 enforced at collection: entries in multimap insertion
        # order are hom(0), hom(1), het(0,1) (model.cpp order)
        h0 = hapcov[:, 0].astype(np.float64)
        h1 = hapcov[:, 1].astype(np.float64)
        c_hom = hapcov.astype(np.float64) / 2.0
        incompat_hom = total[:, None].astype(np.float64) - c_hom - c_hom
        gz = gap * log_zero
        ll_hom = (((incompat_hom * log_err + pmf) + gz) + pmf) + gz
        ll_hom = np.where(valid, ll_hom, -np.inf)
        # heterozygous pair: shared coverage apportioned by belonging
        shared = np.zeros(S, dtype=np.int64)
        for si, rec in enumerate(recs):
            for group, count in coverage.grouped_counts[rec.site_index].items():
                if 0 in group and 1 in group:
                    shared[si] += count
        sh = shared.astype(np.float64)
        spec0, spec1 = h0 - sh, h1 - sh
        denom = spec0 + spec1
        with np.errstate(invalid="ignore", divide="ignore"):
            belonging = np.where(denom == 0, 0.5, spec0 / np.where(denom == 0,
                                                                   1.0, denom))
        c0 = h0 - (1 - belonging) * sh
        c1 = h1 - belonging * sh
        het_ok = (singleton[:, 0] != 0) & (singleton[:, 1] != 0)
        incompat_het = total.astype(np.float64) - c0 - c1
        ll_het = ((((incompat_het * log_err) + pmf[:, 0]) + gz[:, 0])
                  + pmf[:, 1]) + gz[:, 1]
        ll_het = np.where(het_ok, ll_het, -np.inf)

    def _alleles_of(rec: _SimpleSite, indices) -> List[Allele]:
        return [Allele(rec.seq(flat_seq, i),
                       tuple(int(c) for c in rec.cov(flat_cov, i)), i)
                for i in indices]

    # --- assemble sites (small per-site Python; heavy math done above) -----
    for si, rec in enumerate(recs):
        nA = int(n_all[si])
        site = GenotypedSite()
        site.num_haplogroups = nA
        seqs = [rec.seq(flat_seq, i) for i in range(nA)]
        if len(set(seqs)) < nA:
            site.set_filter("AMBIG")
        tot = int(total[si])
        if tot == 0 or mean_cov == 0:
            site.alleles = _alleles_of(rec, [0])
            site.make_null()
            sites[rec.site_index] = site
            continue

        if ploidy == HAPLOID:
            b, s2 = int(best[si]), int(second[si])
            gt_conf = float(conf[si])
            chosen_gt, next_gt = [b], [s2]
        else:
            entries = [(float(ll_hom[si, 0]), [0, 0]),
                       (float(ll_hom[si, 1]), [1, 1])]
            if het_ok[si]:
                entries.append((float(ll_het[si]), [0, 1]))
            ordered = sorted(entries, key=lambda e: -e[0])
            gt_conf = ordered[0][0] - ordered[1][0]
            chosen_gt, next_gt = ordered[0][1], ordered[1][1]

        if gt_conf == 0.0:
            site.alleles = _alleles_of(rec, [0])
            site.make_null()
            all_best = sorted(set(next_gt) | set(chosen_gt))
            site.extra_alleles = _alleles_of(rec, all_best)
            sites[rec.site_index] = site
            continue

        # extra alleles (model.cpp:335-360)
        low_total = tot < mean_cov / 4
        low_rel = (hapcov[si, chosen_gt[0]] < hapcov[si, next_gt[0]] * 2)
        if low_total or low_rel:
            extra = sorted(set(next_gt) - set(chosen_gt))
            if extra:
                site.extra_alleles = [replace(a, callable=False)
                                      for a in _alleles_of(rec, extra)]
            else:
                site.extra_alleles = []

        chosen_sorted = sorted(set(chosen_gt))
        chosen_alleles = _alleles_of(rec, chosen_sorted)
        if ploidy == HAPLOID:
            allele_covs = [float(hapcov[si, chosen_gt[0]])]
            rescaled = [0] if chosen_gt[0] == 0 else [1]
        else:
            g0, g1 = chosen_gt
            if g0 == g1:  # homozygous: pooled halves
                half = float(c_hom[si, g0])
                allele_covs = [half + half]
            else:
                allele_covs = [float(c0[si]), float(c1[si])]
            rescaled = ([0] * 2 if g0 == g1 == 0 else
                        [1] * 2 if g0 == g1 else [0, 1])
        if rescaled[0] != 0:
            chosen_alleles = _alleles_of(rec, [0]) + chosen_alleles
            allele_covs = [float(singleton[si, 0])] + allele_covs

        site.alleles = chosen_alleles
        site.genotype = rescaled
        site.allele_covs = allele_covs
        site.total_coverage = tot
        site.haplogroups = site.get_genotyped_haplogroups(chosen_alleles,
                                                          rescaled)
        site.gt_conf = gt_conf
        sites[rec.site_index] = site
    return sites
