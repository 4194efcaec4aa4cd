"""Vectorised level genotyping for simple sites.

A "simple" site is a bubble with no nested children whose every
haplogroup branch is empty (direct deletion) or a single plain sequence
node ending at the bubble exit — the shape VCF-built production graphs
are dominated by. Allele extraction is then a column gather and the
model inputs (per-allele average coverage, gap fraction, haplogroup
coverages) are flat arrays over all such sites at once. The likelihood
arithmetic reproduces LevelGenotyperModel (model.py / reference
model.cpp) operation-for-operation so calls are bit-identical; the
scalar model remains the oracle (tests/test_vector_model.py fuzzes
equality) and handles every non-simple site (nested, multi-node
branches, >MAX_FAST_ALLELES).

Everything up to the final GenotypedSite assembly is columnar numpy;
the assembly loop touches Python lists only (no numpy scalars), which
is what lets this path run at >100k sites/s where the scalar model's
per-site objects cost ~60us/site.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..common.seq import _DECODE_LUT
from ..mapping.search import PrgIndex
from ..prg.markers import site_id_to_index
from .probs import LikelihoodStats
from .types import Allele, GenotypedSite

HAPLOID = 1
DIPLOID = 2

MAX_FAST_ALLELES = 8

# wall-clock of the last batch_simple_sites call's stages (profiling aid)
LAST_TIMINGS: dict = {}


def _decode(seq: np.ndarray) -> str:
    return _DECODE_LUT[seq].tobytes().decode("ascii")


MAX_BATCH_ALLELES = 32


def batch_extracted_model(sites_data, l_stats: LikelihoodStats):
    """Vectorised HAPLOID LevelGenotyperModel over already-extracted
    alleles: the batched twin of the scalar model for NON-simple sites
    (nested bubbles, multi-node branches) whose extraction ran on the
    host (allele_extracter). Bit-identical to LevelGenotyperModel on the
    same ModelData (fuzzed by tests/test_vector_model.py).

    sites_data: list of (site_index, input_alleles, gp_counts).
    Returns (sites dict, leftover list) -- leftover sites hit a scalar-
    only condition (huge allele counts, <2 likelihood entries, no
    callable entry: cases where the scalar model raises or that are not
    worth padding for) and must run through LevelGenotyperModel.
    """
    from dataclasses import replace

    sites: Dict[int, GenotypedSite] = {}
    leftover = []
    batch = []
    for entry in sites_data:
        site_index, alleles, gp_counts = entry
        if len(alleles) > MAX_BATCH_ALLELES or len(alleles) < 2:
            leftover.append(entry)
        else:
            batch.append(entry)
    if not batch:
        return sites, leftover

    S = len(batch)
    A = max(len(a) for _, a, _ in batch)
    n_all = np.array([len(a) for _, a, _ in batch], dtype=np.int64)
    valid = np.arange(A)[None, :] < n_all[:, None]

    # per-allele haplogroup + callability; per-site haplogroup coverages
    hap = np.zeros((S, A), dtype=np.int64)
    callable_ = np.zeros((S, A), dtype=bool)
    n_hap = np.zeros(S, dtype=np.int64)
    for si, (_, alleles, _) in enumerate(batch):
        for ai, a in enumerate(alleles):
            hap[si, ai] = a.haplogroup
            callable_[si, ai] = a.callable
        n_hap[si] = len({a.haplogroup for a in alleles})
    H = int(hap.max()) + 1
    hapcov = np.zeros((S, H), dtype=np.int64)
    singleton = np.zeros((S, H), dtype=np.int64)
    total = np.zeros(S, dtype=np.int64)
    hap_mult_count = np.zeros((S, H), dtype=np.int64)
    for si, (_, alleles, gp_counts) in enumerate(batch):
        tot = 0
        for group, count in gp_counts.items():
            tot += count
            for allele_id in group:
                if allele_id < H:
                    hapcov[si, allele_id] += count
            if len(group) == 1 and group[0] < H:
                singleton[si, group[0]] = count
        total[si] = tot
        for a in alleles:
            hap_mult_count[si, a.haplogroup] += 1
    hapcov_a = hapcov[np.arange(S)[:, None], hap]         # (S, A)

    # per-allele average coverage + gap fraction from pb_cov (empty
    # alleles take their haplogroup coverage as one pseudo-base,
    # model.py _assign_coverage_to_empty_alleles)
    t = l_stats.credible_cov_t
    sums = np.zeros((S, A), dtype=np.int64)
    lens = np.ones((S, A), dtype=np.int64)
    ncred = np.zeros((S, A), dtype=np.int64)
    for si, (_, alleles, _) in enumerate(batch):
        for ai, a in enumerate(alleles):
            if a.sequence:
                pb = a.pb_cov
                sums[si, ai] = sum(pb)
                lens[si, ai] = len(pb)
                ncred[si, ai] = sum(1 for c in pb if c < t)
            else:
                cov = int(hapcov[si, a.haplogroup])
                sums[si, ai] = cov
                ncred[si, ai] = 1 if cov < t else 0
    gap = ncred / lens

    # pmf via unique (sum, len) keys (scalar pmf = the oracle)
    M = int(lens.max()) + 1
    key = sums * M + lens
    vkey = key[valid]
    uniq, inv = np.unique(vkey, return_inverse=True)
    pmf_scalar = l_stats.pmf_full_depth
    pmf_uniq = np.array([pmf_scalar((u // M) / (u % M)) for u in
                         uniq.tolist()])
    pmf = np.zeros(valid.shape)
    pmf[valid] = pmf_uniq[inv]

    # likelihood entries: one per allele, skipping an uncallable REF
    # (model.py _compute_haploid_log_likelihoods)
    ignore_ref = ~callable_[:, 0]
    entry_ok = valid.copy()
    entry_ok[:, 0] &= ~ignore_ref
    log_err = l_stats.log_mean_pb_error
    log_zero = l_stats.log_zero
    incompat = (total[:, None] - hapcov_a).astype(np.float64)
    with np.errstate(invalid="ignore"):
        ll = (incompat * log_err + pmf) + gap * log_zero
    ll = np.where(entry_ok, ll, -np.inf)
    # multimap-greater parity: stable descending sort keeps insertion
    # order among ties; -inf padding sorts last
    order = np.argsort(-ll, axis=1, kind="stable")
    ar = np.arange(S)
    n_entries = entry_ok.sum(axis=1)
    cal_sorted = callable_[ar[:, None], order] & entry_ok[ar[:, None], order]
    has_cal = cal_sorted.any(axis=1)
    pos = np.argmax(cal_sorted, axis=1)
    need_two = (pos + 1 < n_entries) & has_cal & (n_entries >= 2)

    mean_cov = l_stats.data_params.mean_cov
    quarter_mean = mean_cov / 4
    for si, (site_index, alleles, gp_counts) in enumerate(batch):
        site = GenotypedSite()
        site.num_haplogroups = int(n_hap[si])
        seqs = [a.sequence for a in alleles]
        if len(set(seqs)) < len(seqs):
            site.set_filter("AMBIG")
        tot = int(total[si])
        if tot == 0 or mean_cov == 0:
            site.alleles = [alleles[0]]
            site.make_null()
            sites[site_index] = site
            continue
        if not need_two[si]:
            leftover.append((site_index, alleles, gp_counts))
            sites.pop(site_index, None)
            continue
        p = int(pos[si])
        b = int(order[si, p])
        s2 = int(order[si, p + 1])
        gt_conf = float(ll[si, b] - ll[si, s2])
        if gt_conf == 0.0:
            site.alleles = [alleles[0]]
            site.make_null()
            site.extra_alleles = [alleles[i] for i in sorted({b, s2})]
            sites[site_index] = site
            continue
        # next-best alleles (model.cpp:335-360)
        if (tot < quarter_mean
                or hapcov_a[si, b] < hapcov_a[si, s2] * 2):
            extra = sorted({s2} - {b})
            site.extra_alleles = [replace(alleles[i], callable=False)
                                  for i in extra]
        chosen_hap = int(hap[si, b])
        if b == 0:
            site.alleles = [alleles[0]]
            site.genotype = [0]
            site.allele_covs = [float(hapcov[si, chosen_hap])]
        else:
            site.alleles = [alleles[0], alleles[b]]
            site.genotype = [1]
            ref_cov = float(singleton[si, 0])
            if hap_mult_count[si, 0] > 1:
                ref_cov /= 2
            site.allele_covs = [ref_cov, float(hapcov[si, chosen_hap])]
        site.total_coverage = tot
        # get_genotyped_haplogroups over the chosen allele (types.py:89)
        site.haplogroups = [chosen_hap]
        site.gt_conf = gt_conf
        sites[site_index] = site
    return sites, leftover


def _flat_seq(g):
    """(decoded string, uint8 codes) aligned with the graph's flat
    coverage array (built once, cached on the graph)."""
    cached = getattr(g, "_flat_seq_pair", None)
    if cached is None:
        flat = np.zeros(g.coverage.size, dtype=np.uint8)
        for nd in g.nodes:
            if nd.cov_start >= 0 and nd.seq.size and nd.in_bubble():
                flat[nd.cov_start:nd.cov_start + nd.seq.size] = nd.seq
        cached = g._flat_seq_pair = (_decode(flat), flat)
    return cached


def _collect_simple_sites(idx: PrgIndex, child_map, ploidy: int):
    """Columnar branch table of the fast-path sites.

    Returns (site_index (S,), n_alleles (S,), seg_start (S, A),
    seg_len (S, A)) where a branch's segment is its single sequence
    node's slice of the flat coverage array; empty branches (direct
    deletions) have seg_len 0 and seg_start -1. Sites with nested
    children, >A alleles, multi-node branches, or (diploid) != 2
    alleles are left to the scalar model."""
    g = idx.graph
    nt = g.node_tables()
    n_edges = nt.n_edges
    edge_offset = nt.edge_offset
    edges = nt.edges
    entries = np.array([e for e, _ in g.bubbles], dtype=np.int64)
    exits = np.array([x for _, x in g.bubbles], dtype=np.int64)
    ne_all = n_edges[entries].astype(np.int64)
    cand = np.array([nt.site_id[e] not in child_map for e in entries])
    cand &= ne_all <= MAX_FAST_ALLELES
    if ploidy == DIPLOID:
        cand &= ne_all == 2
    empty = (np.zeros((0,), np.int64), np.zeros((0,), np.int64),
             np.zeros((0, 1), np.int64), np.zeros((0, 1), np.int64))
    if not cand.any():
        return empty
    A = int(ne_all[cand].max())
    e0_all = edge_offset[entries].astype(np.int64)
    amask = np.arange(A)[None, :] < ne_all[:, None]
    tgt = edges[np.minimum(e0_all[:, None] + np.arange(A)[None, :],
                           edges.size - 1)].astype(np.int64)
    is_empty = tgt == exits[:, None]
    one_edge = n_edges[tgt] == 1
    hop2 = edges[np.where(one_edge, edge_offset[tgt], 0)].astype(np.int64)
    is_onehop = ~is_empty & one_edge & (hop2 == exits[:, None])
    simple = (is_empty | is_onehop | ~amask).all(axis=1) & cand
    if not simple.any():
        return empty

    tgt = tgt[simple]
    is_onehop = is_onehop[simple] & amask[simple]
    site_index = ((nt.site_id[entries[simple]].astype(np.int64) - 5) // 2)
    n_alleles = ne_all[simple]
    seg_len = np.where(is_onehop, nt.seq_len[tgt].astype(np.int64), 0)
    seg_start = np.where(seg_len > 0,
                         nt.cov_start[tgt].astype(np.int64), -1)
    seg_len = np.where(seg_start >= 0, seg_len, 0)
    return site_index, n_alleles, seg_start, seg_len


def batch_simple_sites(idx: PrgIndex, coverage, l_stats: LikelihoodStats,
                       ploidy: int, child_map) -> Dict[int, GenotypedSite]:
    """Genotype all simple sites; returns {site_index: GenotypedSite}.

    Bit-identical to LevelGenotyperModel on the same inputs (asserted by
    tests); the runner routes any site not in the result to the scalar
    model."""
    import time as _time
    _t0 = _time.perf_counter()
    site_index, n_all, seg_start, seg_len = _collect_simple_sites(
        idx, child_map, ploidy)
    LAST_TIMINGS["collect"] = _time.perf_counter() - _t0
    _t0 = _time.perf_counter()
    S = site_index.shape[0]
    if S == 0:
        return {}
    A = seg_start.shape[1]
    g = idx.graph
    flat_cov = g.coverage
    flat_seq, flat_codes = _flat_seq(g)
    valid = np.arange(A)[None, :] < n_all[:, None]

    # --- coverage inputs (per-site grouped-count dicts) ----------------------
    # plain-Python accumulators: indexing lists with numpy scalars and
    # numpy element updates cost ~1us each, which dominates at 1M sites
    site_index_l = site_index.tolist()
    total_py = [0] * S
    hap_py = [[0] * A for _ in range(S)]
    single_py = [[0] * A for _ in range(S)]
    shared_py = [0] * S  # diploid het pair (0,1)
    gp_all = coverage.grouped_counts
    for si in range(S):
        tot = 0
        row = hap_py[si]
        for group, count in gp_all[site_index_l[si]].items():
            tot += count
            for allele_id in group:
                if allele_id < A:
                    row[allele_id] += count
            if len(group) == 1:
                if group[0] < A:
                    single_py[si][group[0]] = count
            elif 0 in group and 1 in group:
                shared_py[si] += count
        total_py[si] = tot
    total = np.array(total_py, dtype=np.int64)
    hapcov = np.array(hap_py, dtype=np.int64)
    singleton = np.array(single_py, dtype=np.int64)
    shared01 = np.array(shared_py, dtype=np.int64)
    LAST_TIMINGS["cov_inputs"] = _time.perf_counter() - _t0
    _t0 = _time.perf_counter()

    # per-allele average coverage + non-credible fraction (model.cpp
    # uses sum/len over per-base counts; empty alleles take the
    # haplogroup coverage as a single pseudo-base). Single-segment
    # branches make the sums direct prefix-sum gathers.
    t = l_stats.credible_cov_t
    csum = np.zeros(flat_cov.size + 1, dtype=np.int64)
    np.cumsum(flat_cov, out=csum[1:])
    ncred = np.zeros(flat_cov.size + 1, dtype=np.int64)
    np.cumsum(flat_cov < t, out=ncred[1:])
    nonempty = seg_len > 0
    s0 = np.where(nonempty, seg_start, 0)
    s1 = s0 + seg_len
    sums = np.where(nonempty, csum[s1] - csum[s0], 0)
    ncreds = np.where(nonempty, ncred[s1] - ncred[s0], 0)
    safe_len = np.where(nonempty, seg_len, 1)
    avg = np.where(nonempty, sums / safe_len, hapcov.astype(np.float64))
    gap = np.where(nonempty, ncreds / safe_len,
                   (hapcov < t).astype(np.float64))

    # --- likelihoods (exact op order of model.py _add_likelihood) -----------
    log_err = l_stats.log_mean_pb_error
    log_zero = l_stats.log_zero
    # pmf per allele via unique (sum, len) pairs: avg has small integer
    # structure (sums/len; empty alleles hapcov/1), so the scalar pmf --
    # bit-identical to the oracle by construction -- runs once per
    # distinct value instead of per allele
    M = int(safe_len.max()) + 1
    key = np.where(nonempty, sums * M + seg_len, hapcov * M + 1)
    vkey = key[valid]
    uniq, inv = np.unique(vkey, return_inverse=True)
    pmf_scalar = l_stats.pmf_full_depth
    pmf_uniq = np.array([pmf_scalar((u // M) / (u % M) if u % M else 0.0)
                         for u in uniq.tolist()])
    pmf = np.full(valid.shape, pmf_scalar(0.0))
    pmf[valid] = pmf_uniq[inv]
    mean_cov = l_stats.data_params.mean_cov

    if ploidy == HAPLOID:
        incompat = (total[:, None] - hapcov).astype(np.float64)
        # no-reads runs have log_err = -inf (probs.py:123): 0 * -inf is
        # the scalar oracle's own silent NaN (model.py:150; such sites
        # null out downstream) -- keep bit-parity and acknowledge the
        # lane instead of emitting a RuntimeWarning
        with np.errstate(invalid="ignore"):
            ll = (incompat * log_err + pmf) + gap * log_zero
        ll = np.where(valid, ll, -np.inf)
        order = np.argsort(-ll, axis=1, kind="stable")
        best_l = order[:, 0].tolist()
        second_l = order[:, 1].tolist()
        ar = np.arange(S)
        conf_l = (ll[ar, order[:, 0]] - ll[ar, order[:, 1]]).tolist()
    else:
        # A == 2 enforced at collection: entries in multimap insertion
        # order are hom(0), hom(1), het(0,1) (model.cpp order)
        h0 = hapcov[:, 0].astype(np.float64)
        h1 = hapcov[:, 1].astype(np.float64)
        c_hom = hapcov.astype(np.float64) / 2.0
        incompat_hom = total[:, None].astype(np.float64) - c_hom - c_hom
        gz = gap * log_zero
        # scoped for the same 0 * -inf oracle-parity lane as HAPLOID
        with np.errstate(invalid="ignore"):
            ll_hom = (((incompat_hom * log_err + pmf) + gz) + pmf) + gz
        ll_hom = np.where(valid, ll_hom, -np.inf)
        # heterozygous pair: shared coverage apportioned by belonging
        sh = shared01.astype(np.float64)
        spec0, spec1 = h0 - sh, h1 - sh
        denom = spec0 + spec1
        with np.errstate(invalid="ignore", divide="ignore"):
            belonging = np.where(denom == 0, 0.5,
                                 spec0 / np.where(denom == 0, 1.0, denom))
        c0 = h0 - (1 - belonging) * sh
        c1 = h1 - belonging * sh
        het_ok_l = ((singleton[:, 0] != 0) & (singleton[:, 1] != 0)).tolist()
        incompat_het = total.astype(np.float64) - c0 - c1
        with np.errstate(invalid="ignore"):
            ll_het = ((((incompat_het * log_err) + pmf[:, 0]) + gz[:, 0])
                      + pmf[:, 1]) + gz[:, 1]
        ll_hom0_l = ll_hom[:, 0].tolist()
        ll_hom1_l = ll_hom[:, 1].tolist()
        ll_het_l = ll_het.tolist()
        c_hom_l = c_hom.tolist()
        c0_l = c0.tolist()
        c1_l = c1.tolist()

    LAST_TIMINGS["likelihoods"] = _time.perf_counter() - _t0
    _t0 = _time.perf_counter()
    # --- duplicate-sequence (AMBIG) detection, vectorised ---------------------
    # two branches share a sequence iff their packed (length, content)
    # codes match; sequences longer than _PACK bases (rare) fall back to
    # a per-site string comparison in the assembly loop
    _PACK = 16  # 3 bits/base * 16 + length in the high bits
    slen_sorted = np.sort(np.where(valid, seg_len, -np.arange(A)[None, :] - 1),
                          axis=1)
    dup_cand = (slen_sorted[:, 1:] == slen_sorted[:, :-1]).any(axis=1)
    ambig = np.zeros(S, dtype=bool)
    needs_str = np.zeros(S, dtype=bool)
    cand_rows = np.flatnonzero(dup_cand)
    if cand_rows.size:
        sub_start = seg_start[cand_rows]
        sub_len = seg_len[cand_rows]
        sub_valid = valid[cand_rows]
        too_long = ((sub_len > _PACK) & sub_valid).any(axis=1)
        code = sub_len.astype(np.int64) << 48
        top = int(min(sub_len.max(initial=0), _PACK))
        for j in range(top):
            m = sub_len > j
            idx = np.where(m, sub_start + j, 0)
            code |= np.where(m, flat_codes[idx].astype(np.int64) << (3 * j),
                             0)
        code = np.where(sub_valid, code,
                        -1 - np.arange(A, dtype=np.int64)[None, :])
        cs = np.sort(code, axis=1)
        dup = (cs[:, 1:] == cs[:, :-1]).any(axis=1)
        ambig[cand_rows] = dup & ~too_long
        needs_str[cand_rows] = too_long

    LAST_TIMINGS["ambig"] = _time.perf_counter() - _t0
    _t0 = _time.perf_counter()
    # --- assembly (pure-Python loop over plain scalars) ----------------------
    # everything the loop touches is pre-gathered into flat column lists
    # (nested .tolist() rows and numpy-scalar indexing cost more than the
    # whole likelihood math at 1M sites)
    flat_cov_l = flat_cov.tolist()
    site_index_l = site_index  # already a list
    n_all_l = n_all.tolist()
    total_l = total.tolist()
    sing0_l = singleton[:, 0].tolist()
    ambig_l = ambig.tolist()
    needs_str_l = needs_str.tolist()
    quarter_mean = mean_cov / 4
    ar = np.arange(S)
    st0_l = seg_start[:, 0].tolist()
    ln0_l = seg_len[:, 0].tolist()
    if ploidy == HAPLOID:
        bcol = order[:, 0]
        scol = order[:, 1]
        stb_l = seg_start[ar, bcol].tolist()
        lnb_l = seg_len[ar, bcol].tolist()
        sts_l = seg_start[ar, scol].tolist()
        lns_l = seg_len[ar, scol].tolist()
        hb_l = hapcov[ar, bcol].tolist()
        hs_l = hapcov[ar, scol].tolist()
    else:
        st1_l = seg_start[:, 1].tolist()
        ln1_l = seg_len[:, 1].tolist()
        h0_l = hapcov[:, 0].tolist()
        h1_l = hapcov[:, 1].tolist()

    def mk_allele(s, n, i, callable=True):
        if n:
            return Allele(flat_seq[s:s + n], tuple(flat_cov_l[s:s + n]), i,
                          callable)
        return Allele("", (), i, callable)

    LAST_TIMINGS["gather_lists"] = _time.perf_counter() - _t0
    _t0 = _time.perf_counter()
    sites: Dict[int, GenotypedSite] = {}
    for si in range(S):
        nA = n_all_l[si]
        site = GenotypedSite()
        site.num_haplogroups = nA
        if ambig_l[si]:
            site.filters.append("AMBIG")
        elif needs_str_l[si]:
            starts = seg_start[si]
            lens = seg_len[si]
            seqs = [flat_seq[starts[i]:starts[i] + lens[i]]
                    for i in range(nA)]
            if len(set(seqs)) < nA:
                site.filters.append("AMBIG")
        tot = total_l[si]
        if tot == 0 or mean_cov == 0:
            site.alleles = [mk_allele(st0_l[si], ln0_l[si], 0)]
            site.make_null()
            sites[site_index_l[si]] = site
            continue

        if ploidy == HAPLOID:
            gt_conf = conf_l[si]
            b = best_l[si]
            s2 = second_l[si]
            if gt_conf == 0.0:
                site.alleles = [mk_allele(st0_l[si], ln0_l[si], 0)]
                site.make_null()
                a_b = mk_allele(stb_l[si], lnb_l[si], b)
                a_s = mk_allele(sts_l[si], lns_l[si], s2)
                site.extra_alleles = ([a_b, a_s] if b < s2 else [a_s, a_b])
                sites[site_index_l[si]] = site
                continue
            if tot < quarter_mean or hb_l[si] < hs_l[si] * 2:
                # extra alleles (model.cpp:335-360)
                site.extra_alleles = [mk_allele(sts_l[si], lns_l[si], s2,
                                                callable=False)]
            if b == 0:
                site.alleles = [mk_allele(st0_l[si], ln0_l[si], 0)]
                site.genotype = [0]
                site.allele_covs = [float(hb_l[si])]
            else:
                site.alleles = [mk_allele(st0_l[si], ln0_l[si], 0),
                                mk_allele(stb_l[si], lnb_l[si], b)]
                site.genotype = [1]
                site.allele_covs = [float(sing0_l[si]), float(hb_l[si])]
            site.total_coverage = tot
            site.haplogroups = [b]
            site.gt_conf = gt_conf
            sites[site_index_l[si]] = site
            continue

        # --- diploid (A == 2) -------------------------------------------
        entries = [(ll_hom0_l[si], [0, 0]), (ll_hom1_l[si], [1, 1])]
        if het_ok_l[si]:
            entries.append((ll_het_l[si], [0, 1]))
        ordered = sorted(entries, key=lambda e: -e[0])
        gt_conf = ordered[0][0] - ordered[1][0]
        chosen_gt, next_gt = ordered[0][1], ordered[1][1]

        if gt_conf == 0.0:
            site.alleles = [mk_allele(st0_l[si], ln0_l[si], 0)]
            site.make_null()
            all_best = sorted(set(next_gt) | set(chosen_gt))
            col = ((st0_l[si], ln0_l[si]), (st1_l[si], ln1_l[si]))
            site.extra_alleles = [mk_allele(col[i][0], col[i][1], i)
                                  for i in all_best]
            sites[site_index_l[si]] = site
            continue

        # extra alleles (model.cpp:335-360)
        hrow = (h0_l[si], h1_l[si])
        col = ((st0_l[si], ln0_l[si]), (st1_l[si], ln1_l[si]))
        if tot < quarter_mean or hrow[chosen_gt[0]] < hrow[next_gt[0]] * 2:
            extra = sorted(set(next_gt) - set(chosen_gt))
            site.extra_alleles = [mk_allele(col[i][0], col[i][1], i,
                                            callable=False)
                                  for i in extra]

        g0, g1 = chosen_gt
        chosen_alleles = [mk_allele(col[g0][0], col[g0][1], g0)] \
            if g0 == g1 else [mk_allele(col[0][0], col[0][1], 0),
                              mk_allele(col[1][0], col[1][1], 1)]
        if g0 == g1:  # homozygous: pooled halves
            half = c_hom_l[si][g0]
            allele_covs = [half + half]
        else:
            allele_covs = [c0_l[si], c1_l[si]]
        rescaled = ([0] * 2 if g0 == g1 == 0 else
                    [1] * 2 if g0 == g1 else [0, 1])
        if rescaled[0] != 0:
            chosen_alleles = [mk_allele(col[0][0], col[0][1], 0)] \
                + chosen_alleles
            allele_covs = [float(sing0_l[si])] + allele_covs

        site.alleles = chosen_alleles
        site.genotype = rescaled
        site.allele_covs = allele_covs
        site.total_coverage = tot
        site.haplogroups = [g0, g1]
        site.gt_conf = gt_conf
        sites[site_index_l[si]] = site
    LAST_TIMINGS["assembly"] = _time.perf_counter() - _t0
    return sites
