"""Vectorised mapping-instance selection + coverage recording.

The scalar path (coverage.py) runs per read: LocusFinder par_map walks,
dict grouping into site-equivalence classes, one RNG pick, three
recorders. At device-engine throughput this host glue dominates
end-to-end time. Here a whole buffer's final search states arrive as
flat arrays (from the genealogy-log engine) and every stage is a numpy
batch op:

  * encapsulated-state splitting (encapsulated_search.cpp:30-107):
    occurrence expansion + run-merging via vectorised SA/random-access
    gathers and neighbour comparison;
  * LocusFinder (coverage_common.cpp:10-83): per-site ancestor chains
    precomputed once into padded arrays (SiteMeta); loci of a state =
    gathers + np.unique dedup (order-independence of the used_sites
    walk is argued below);
  * class grouping + selection (coverage_common.cpp:85-177): the
    base-site set of each state becomes a padded sorted key row;
    np.unique(axis=0) over (row, key) yields the classes of every read
    in the C++ std::map order (lexicographic over sorted site tuples,
    prefix-shorter first: pad = -1); the uniform_int pick is the
    vectorised mt19937 first-draw fast path (common/rng.py);
  * allele-sum / grouped counts: np.unique over (row, site, allele)
    triples, group tuples packed into int64 keys;
  * per-base: record_per_base_arrays (below).

Reads showing rare hard features fall back to the exact per-read scalar
path (returned to the caller): duplicate sites in one state's path
(the reference asserts there), >3 alleles of one site in one read's
loci, rejection-sampling RNG fallback, oversized occurrence expansions.

Order-independence of LocusFinder's used_sites dedup: _assign_nested
walks add, per visited site, the locus recorded in par_map (fixed per
site) -- two chains meeting at a site would add the identical locus, so
first-wins dedup equals set union. A read cannot traverse one parent
site through two haplogroups (site uniqueness is asserted), so parent
loci cannot conflict.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..prg.markers import ALLELE_UNKNOWN, site_id_to_index
from .coverage import Coverage
from .search import PrgIndex, SearchState

_URNG_RANGE = (1 << 32) - 1
_PAD = -1  # sorts before any real site marker (>= 5)
_MAX_EXPANSION = 1 << 20


class SiteMeta:
    """Per-site ancestor chains + level-1 base site, as padded arrays."""

    def __init__(self, idx: PrgIndex):
        g = idx.graph
        S = g.num_sites
        chains: List[List[Tuple[int, int]]] = []
        bases = np.zeros(S, dtype=np.int64)
        for si in range(S):
            marker = 5 + 2 * si
            chain: List[Tuple[int, int]] = []
            cur = marker
            while cur in g.par_map:
                locus = g.par_map[cur]
                chain.append(locus)
                cur = locus[0]
            chains.append(chain)
            bases[si] = cur
        A = max((len(c) for c in chains), default=0)
        self.anc_len = np.array([len(c) for c in chains], dtype=np.int64)
        self.anc_site = np.full((S, max(A, 1)), 0, dtype=np.int64)
        self.anc_allele = np.full((S, max(A, 1)), 0, dtype=np.int64)
        for si, chain in enumerate(chains):
            for a, (site, allele) in enumerate(chain):
                self.anc_site[si, a] = site
                self.anc_allele[si, a] = allele
        self.base_site = bases
        self.max_depth = A


def _expand(widths: np.ndarray):
    """Per-item [0, width) offset expansion. Returns (item_of, offset)."""
    total = int(widths.sum())
    item_of = np.repeat(np.arange(widths.size, dtype=np.int64), widths)
    off = (np.arange(total, dtype=np.int64)
           - np.repeat(np.cumsum(widths) - widths, widths))
    return item_of, off


def fold_loci_rows(coverage: Coverage, loci_rows: np.ndarray):
    """Fold sorted-unique (row, site, allele) selected-loci triples into
    the coverage's pending allele-sum / grouped-count batches (resolved
    once per run by Coverage.finalise). Shared by the numpy recorder
    below and the device recorder (record_jax.py), which ships the same
    triples home."""
    if loci_rows.shape[0] == 0:
        return
    # allele-sum: one increment per (row, site, allele)
    pk = loci_rows[:, 1] * np.int64(1 << 20) + loci_rows[:, 2]
    pair, pair_n = np.unique(pk, return_counts=True)
    coverage.pending_sum.append((pair >> 20, pair & ((1 << 20) - 1),
                                 pair_n.astype(np.int64)))

    # grouped counts: per (row, site) sorted allele tuple
    rs = loci_rows[:, 0] * (2 ** 32) + loci_rows[:, 1]
    boundaries = np.concatenate([[0], np.flatnonzero(np.diff(rs)) + 1])
    sizes = np.diff(np.concatenate([boundaries, [rs.size]]))
    big = sizes > 3
    if big.any():
        # rare: >3 alleles of one site in one read's loci -- fold in python
        for b, sz in zip(boundaries[big], sizes[big]):
            site = int(loci_rows[b, 1])
            key = tuple(int(a) for a in np.sort(loci_rows[b:b + sz, 2]))
            d = coverage.grouped_counts[site_id_to_index(site)]
            d[key] = d.get(key, 0) + 1
    small = ~big
    sb = boundaries[small]
    ssz = sizes[small]
    packed = loci_rows[sb, 2] + 1
    for extra in (1, 2):
        has = ssz > extra
        packed = packed + np.where(
            has, (loci_rows[np.minimum(sb + extra, rs.size - 1), 2] + 1)
            << np.int64(20 * extra), 0)
    coverage.pending_group.append((loci_rows[sb, 1], ssz, packed,
                                   np.ones(sb.size, dtype=np.int64)))


def select_and_record(
    idx: PrgIndex,
    coverage: Coverage,
    # per final state (all device-mapped rows):
    st_row: np.ndarray,        # (S,) row index of the oriented read
    st_lo: np.ndarray, st_hi: np.ndarray,
    st_trav: np.ndarray,       # (S, T, 2)
    st_ntrav: np.ndarray,
    st_ing: np.ndarray,        # (S, I, 2)
    st_ning: np.ndarray,
    # per row:
    row_seed: np.ndarray,      # (R,) selection seeds
    row_first_raw: np.ndarray, # (R,) precomputed first mt19937 draws
    row_read_len: np.ndarray,  # (R,)
    site_meta: Optional[SiteMeta] = None,
) -> np.ndarray:
    """Selection + recording for every row at once. Returns a boolean
    (R,) array of rows that must be re-done by the scalar path (the
    vector path recorded nothing for them)."""
    g = idx.graph
    nt = g.node_tables()
    sm = site_meta if site_meta is not None else SiteMeta(idx)
    R = row_seed.shape[0]
    fallback = np.zeros(R, dtype=bool)
    S = st_row.shape[0]
    if S == 0:
        return fallback
    st_row = np.asarray(st_row, dtype=np.int64)
    st_lo = np.asarray(st_lo, dtype=np.int64)
    st_hi = np.asarray(st_hi, dtype=np.int64)
    st_ntrav = np.asarray(st_ntrav, dtype=np.int64)
    st_ning = np.asarray(st_ning, dtype=np.int64)

    has_path = (st_ntrav > 0) | (st_ning > 0)

    # ---- encapsulated split of no-path states (per-occurrence) ------------
    np_idx = np.flatnonzero(~has_path)
    widths = st_hi[np_idx] - st_lo[np_idx] + 1
    if widths.sum() > _MAX_EXPANSION:
        # pathological interval widths: push the offending rows to scalar
        too_big = widths > (_MAX_EXPANSION // max(len(np_idx), 1) + 1024)
        fallback[st_row[np_idx[too_big]]] = True
        np_idx = np_idx[~too_big]
        widths = widths[~too_big]
    item_of, off = _expand(widths)
    occ_state = np_idx[item_of]
    occ_sa = st_lo[occ_state] + off
    occ_prg = idx.fm.sa[occ_sa].astype(np.int64)
    occ_node = g.ra_node[occ_prg].astype(np.int64)
    occ_site = nt.site_id[occ_node].astype(np.int64)
    occ_allele = nt.allele_id[occ_node].astype(np.int64)
    occ_row = st_row[occ_state]

    nonvar = np.bincount(occ_row[occ_site == 0], minlength=R)

    # run-merge consecutive same-(site, allele) occurrences within a state
    enc = occ_site > 0
    enc_pos = np.flatnonzero(enc)
    if enc_pos.size:
        same = np.zeros(enc_pos.size, dtype=bool)
        if enc_pos.size > 1:
            same[1:] = (
                (enc_pos[1:] == enc_pos[:-1] + 1)
                & (occ_state[enc_pos[1:]] == occ_state[enc_pos[:-1]])
                & (occ_site[enc_pos[1:]] == occ_site[enc_pos[:-1]])
                & (occ_allele[enc_pos[1:]] == occ_allele[enc_pos[:-1]]))
        run_start = np.flatnonzero(~same)
        run_end = np.concatenate([run_start[1:], [enc_pos.size]]) - 1
        enc_lo = occ_sa[enc_pos[run_start]]
        enc_hi = occ_sa[enc_pos[run_end]]
        enc_row = occ_row[enc_pos[run_start]]
        enc_site = occ_site[enc_pos[run_start]]
        enc_allele = occ_allele[enc_pos[run_start]]
    else:
        enc_lo = enc_hi = enc_row = enc_site = enc_allele = np.empty(
            0, dtype=np.int64)

    # ---- unified path-state table ------------------------------------------
    # states: replayed path states then encapsulated runs
    p_idx = np.flatnonzero(has_path)
    NP_, NE = p_idx.size, enc_row.size
    NS = NP_ + NE
    if NS == 0:
        return fallback
    ps_row = np.concatenate([st_row[p_idx], enc_row])
    ps_lo = np.concatenate([st_lo[p_idx], enc_lo])
    ps_hi = np.concatenate([st_hi[p_idx], enc_hi])
    T = st_trav.shape[1] if st_trav.ndim == 3 else 1
    ps_trav = np.zeros((NS, max(T, 1), 2), dtype=np.int64)
    if NP_:
        ps_trav[:NP_, :T] = st_trav[p_idx]
    ps_ntrav = np.concatenate([st_ntrav[p_idx], np.ones(NE, dtype=np.int64)])
    if NE:
        ps_trav[NP_:, 0, 0] = enc_site
        ps_trav[NP_:, 0, 1] = enc_allele
    ps_ning = np.concatenate([st_ning[p_idx], np.zeros(NE, dtype=np.int64)])
    ing_parent = np.zeros(NS, dtype=np.int64)
    if NP_:
        last = np.clip(st_ning[p_idx] - 1, 0, max(st_ing.shape[1] - 1, 0))
        ing_parent[:NP_] = np.where(
            st_ning[p_idx] > 0,
            np.asarray(st_ing, dtype=np.int64)[p_idx, last, 0], 0)

    # ---- loci table: (state, site, allele) ---------------------------------
    loci_state: List[np.ndarray] = []
    loci_site: List[np.ndarray] = []
    loci_allele: List[np.ndarray] = []

    # traversed loci
    it, ot = _expand(ps_ntrav)
    loci_state.append(it)
    loci_site.append(ps_trav[it, ot, 0])
    loci_allele.append(ps_trav[it, ot, 1])

    # traversing-derived loci: per occurrence (parent_seed, allele_at_occ)
    tr_idx = np.flatnonzero(ps_ning > 0)
    if tr_idx.size:
        tw = ps_hi[tr_idx] - ps_lo[tr_idx] + 1
        if tw.sum() > _MAX_EXPANSION:
            fallback[ps_row[tr_idx]] = True
            tr_idx = np.empty(0, dtype=np.int64)
        else:
            ti, to = _expand(tw)
            t_state = tr_idx[ti]
            t_prg = idx.fm.sa[ps_lo[t_state] + to].astype(np.int64)
            t_node = g.ra_node[t_prg].astype(np.int64)
            loci_state.append(t_state)
            loci_site.append(ing_parent[t_state])
            loci_allele.append(nt.allele_id[t_node].astype(np.int64))

    base_state = np.concatenate(loci_state)
    base_site_ = np.concatenate(loci_site)
    base_allele = np.concatenate(loci_allele)

    # ancestor loci of every contributing site
    sidx = (base_site_ - 5) // 2
    anc_n = sm.anc_len[sidx]
    ai, ao = _expand(anc_n)
    anc_state = base_state[ai]
    anc_site = sm.anc_site[sidx[ai], ao]
    anc_allele = sm.anc_allele[sidx[ai], ao]

    l_state = np.concatenate([base_state, anc_state])
    l_site = np.concatenate([base_site_, anc_site])
    l_allele = np.concatenate([base_allele, anc_allele])

    # dedup per (state, site, allele); detect conflicting alleles per
    # (state, site) -> scalar fallback (the reference asserts/diverges)
    trip = np.stack([l_state, l_site, l_allele], axis=1)
    trip = np.unique(trip, axis=0)
    if trip.size == 0:
        return fallback
    dup = np.flatnonzero((trip[1:, 0] == trip[:-1, 0])
                         & (trip[1:, 1] == trip[:-1, 1]))
    if dup.size:
        fallback[ps_row[trip[dup, 0]]] = True

    # site-uniqueness assertion of LocusFinder: duplicate sites among one
    # state's own traversed+traversing entries -> scalar path (which raises)
    ii, io = _expand(ps_ning)
    own_state = np.concatenate([it, ii])
    own_site = np.concatenate([
        ps_trav[it, ot, 0],
        np.asarray(st_ing, dtype=np.int64)[p_idx, :, 0][ii, io]
        if NP_ and ii.size else np.empty(0, dtype=np.int64)])
    if own_state.size:
        cnt_pairs = np.stack([own_state, own_site], axis=1)
        uniq_pairs, pair_counts = np.unique(cnt_pairs, axis=0,
                                            return_counts=True)
        bad = uniq_pairs[pair_counts > 1, 0]
        if bad.size:
            fallback[ps_row[bad]] = True

    # ---- base-site key per state -------------------------------------------
    bkey = np.stack([trip[:, 0], sm.base_site[(trip[:, 1] - 5) // 2]], axis=1)
    bkey = np.unique(bkey, axis=0)
    kb_state = bkey[:, 0]
    per_state_k = np.bincount(kb_state, minlength=NS)
    Kmax = int(per_state_k.max()) if per_state_k.size else 1
    key_mat = np.full((NS, Kmax), _PAD, dtype=np.int64)
    pos_in_state = np.arange(bkey.shape[0]) - np.repeat(
        np.cumsum(per_state_k) - per_state_k, per_state_k)
    key_mat[kb_state, pos_in_state] = bkey[:, 1]  # ascending (unique-sorted)

    # ---- classes per row ----------------------------------------------------
    rows_keys = np.concatenate([ps_row[:, None], key_mat], axis=1)
    classes, class_of_state = np.unique(rows_keys, axis=0,
                                        return_inverse=True)
    class_of_state = class_of_state.reshape(-1)
    class_row = classes[:, 0]
    n_classes = np.bincount(class_row, minlength=R)
    first_class = np.concatenate([[0], np.cumsum(n_classes)])[:-1]

    # ---- uniform_int pick per row (libstdc++ algorithm, vectorised) --------
    total = nonvar + n_classes
    active = n_classes > 0
    totals = np.maximum(total, 1).astype(np.uint64)
    scaling = (np.uint64(_URNG_RANGE) // totals).astype(np.uint64)
    past = totals * scaling
    r = row_first_raw.astype(np.uint64)
    rejected = active & (r >= past)
    fallback |= rejected
    selected = 1 + (r // np.maximum(scaling, 1)).astype(np.int64)
    chosen_ord = selected - nonvar - 1  # class ordinal, <0 -> nonvariant pick

    do_record = active & ~fallback & (chosen_ord >= 0) \
        & (chosen_ord < n_classes)
    chosen_class = first_class + np.clip(chosen_ord, 0, None)

    # states of the chosen classes
    st_sel = np.flatnonzero(
        do_record[ps_row] & (class_of_state == chosen_class[ps_row]))
    if st_sel.size == 0:
        return fallback

    # ---- recording -----------------------------------------------------------
    sel_mask = np.zeros(NS, dtype=bool)
    sel_mask[st_sel] = True
    l_keep = sel_mask[trip[:, 0]]
    loci = trip[l_keep]
    # collapse state -> row; dedupe (row, site, allele) per row
    loci_rows = np.stack([ps_row[loci[:, 0]], loci[:, 1], loci[:, 2]], axis=1)
    loci_rows = np.unique(loci_rows, axis=0)
    fold_loci_rows(coverage, loci_rows)

    # per-base coverage
    record_per_base_arrays(
        idx, ps_row[st_sel], ps_lo[st_sel], ps_hi[st_sel],
        ps_trav[st_sel], ps_ntrav[st_sel],
        np.asarray(row_read_len, dtype=np.int64)[ps_row[st_sel]])

    return fallback


# ---------------------------------------------------------------------------
# vectorised per-base recording (formerly coverage_vec.py)
# ---------------------------------------------------------------------------
# The scalar recorder (coverage.py:record_per_base) walks the graph one
# node at a time per mapped read. Here all selected mapping instances of
# a whole buffer advance together: the walk state of every (state,
# occurrence) start point lives in flat numpy arrays over the graph's
# NodeTables, one masked gather-step per iteration (the host mirror of
# the device engine's design). Emitted (read, node, start, end) ranges
# union to their envelope per (read, node) -- DummyCovNode semantics
# (allele_base.cpp:109-135) -- and one bincount applies all increments
# with uint16 saturation. Bit-equal to the scalar recorder
# (tests/test_coverage_vec.py).

UINT16_MAX = np.iinfo(np.uint16).max



def record_per_base_batch(idx: PrgIndex,
                          per_read_states: Sequence[Tuple[List[SearchState], int]]):
    """Per-base coverage for many reads at once.

    per_read_states: per read, (selected navigational states, read_length).
    """
    g = idx.graph
    nt = g.node_tables()
    P = 0
    walks = []  # (read_idx, node, offset, read_size, full, trav_path)
    for read_idx, (states, read_size) in enumerate(per_read_states):
        for ss in states:
            P = max(P, len(ss.traversed))
            for occ_i, occurrence in enumerate(range(ss.lo, ss.hi + 1)):
                prg_pos = int(idx.fm.sa[occurrence])
                walks.append((read_idx, int(g.ra_node[prg_pos]),
                              int(g.ra_offset[prg_pos]), read_size,
                              occ_i == 0, ss.traversed))
    if not walks:
        return

    W = len(walks)
    read_of = np.array([w[0] for w in walks], dtype=np.int64)
    cur = np.array([w[1] for w in walks], dtype=np.int64)
    start = np.array([w[2] for w in walks], dtype=np.int64)
    remaining = np.array([w[3] for w in walks], dtype=np.int64)
    full = np.array([w[4] for w in walks], dtype=bool)
    P = max(P, 1)
    trav = np.zeros((W, P, 2), dtype=np.int64)
    trav_idx = np.zeros(W, dtype=np.int64)
    for i, w in enumerate(walks):
        path = w[5]
        trav_idx[i] = len(path)
        for pi, locus in enumerate(path):
            trav[i, pi] = locus
    _run_walks(idx, nt, read_of, cur, start, remaining, full, trav, trav_idx, P)


def record_per_base_arrays(idx: PrgIndex, st_row, st_lo, st_hi, st_trav,
                           st_ntrav, st_read_len):
    """Array-input per-base recorder: one entry per selected state.

    st_row groups states for the (read, node) envelope union; st_trav is
    (S, P, 2) with st_ntrav valid entries per state. Occurrence expansion
    (one walk per SA position, first = full walk) is vectorised."""
    g = idx.graph
    nt = g.node_tables()
    S = st_lo.shape[0]
    if S == 0:
        return
    w = (st_hi - st_lo + 1).astype(np.int64)
    total = int(w.sum())
    state_of = np.repeat(np.arange(S, dtype=np.int64), w)
    off = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(w) - w, w)
    occ_sa = st_lo[state_of].astype(np.int64) + off
    prg_pos = idx.fm.sa[occ_sa].astype(np.int64)
    cur = g.ra_node[prg_pos].astype(np.int64)
    start = g.ra_offset[prg_pos].astype(np.int64)
    read_of = np.asarray(st_row, dtype=np.int64)[state_of]
    remaining = np.asarray(st_read_len, dtype=np.int64)[state_of]
    full = off == 0
    P = max(int(np.max(st_ntrav)) if S else 1, 1)
    trav = np.asarray(st_trav, dtype=np.int64)[state_of, :P]
    trav_idx = np.asarray(st_ntrav, dtype=np.int64)[state_of]
    _run_walks(idx, nt, read_of, cur, start, remaining, full, trav, trav_idx, P)


def _run_walks(idx: PrgIndex, nt, read_of, cur, start, remaining, full, trav,
               trav_idx, P):
    g = idx.graph
    W = read_of.shape[0]
    emit_read, emit_node, emit_s, emit_e = [], [], [], []
    active = np.ones(W, dtype=bool)
    emitted_once = np.zeros(W, dtype=bool)  # non-full walks stop after 1 emit
    first_iter = np.ones(W, dtype=bool)

    max_iters = int(remaining.max()) * 2 + 2 * P + 8
    for _ in range(max_iters):
        if not active.any():
            break
        # --- advance (not on the very first iteration of each walk) ----
        move = active & ~first_iter
        n_edges = nt.n_edges[cur]
        # stop conditions mirroring Traverser: out of bases at a
        # single-edge chain, or no outgoing edges (sink)
        dead = move & ((remaining <= 0) | (n_edges == 0))
        active &= ~dead
        move &= ~dead

        is_bubble_entry = move & (n_edges > 1)
        # allele choice consumes the traversed path from the end
        trav_idx = np.where(is_bubble_entry, trav_idx - 1, trav_idx)
        choice = np.where(is_bubble_entry,
                          trav[np.arange(W), np.clip(trav_idx, 0, P - 1), 1], 0)
        nxt = nt.edges[np.clip(nt.edge_offset[cur] + choice, 0,
                               nt.edges.size - 1)]
        cur = np.where(move, nxt, cur)
        start = np.where(move, 0, start)

        # --- consume this node's sequence -------------------------------
        consume = active & (first_iter | move)
        seq_len = nt.seq_len[cur]
        has_seq = seq_len > 0
        end = np.where(has_seq,
                       np.minimum(seq_len - 1, start + remaining - 1), 0)
        used = np.where(consume & has_seq, end - start + 1, 0)
        remaining = remaining - used

        # --- emit in-bubble sequence nodes ------------------------------
        emit = consume & has_seq & nt.in_bubble[cur]
        if emit.any():
            emit_read.append(read_of[emit])
            emit_node.append(cur[emit])
            emit_s.append(start[emit])
            emit_e.append(end[emit])

        # A walk's "returned node" in the scalar Traverser is the node
        # ending a next_node() call: the first node if it starts in a
        # bubble, any in-bubble node reached while chaining, or the node
        # picked by an allele choice. Non-full walks (alternative SA
        # occurrences) process exactly ONE returned node then stop
        # (allele_base.cpp:260-268).
        returned_now = np.where(first_iter,
                                consume & nt.in_bubble[cur],
                                move & (nt.in_bubble[cur] | is_bubble_entry))
        active &= ~(~full & returned_now)
        first_iter &= False

    if not emit_read:
        return

    reads = np.concatenate(emit_read)
    nodes = np.concatenate(emit_node)
    starts = np.concatenate(emit_s)
    ends = np.concatenate(emit_e)

    # envelope per (read, node): group and take min start / max end
    key = reads * len(g.nodes) + nodes
    order = np.argsort(key, kind="stable")
    key = key[order]
    starts = starts[order]
    ends = ends[order]
    nodes = nodes[order]
    boundaries = np.concatenate([[0], np.flatnonzero(np.diff(key)) + 1])
    env_start = np.minimum.reduceat(starts, boundaries)
    env_end = np.maximum.reduceat(ends, boundaries)
    env_node = nodes[boundaries]

    cov_start = nt.cov_start[env_node]
    keep = cov_start >= 0
    cov_start = cov_start[keep]
    env_start = env_start[keep]
    env_end = env_end[keep]

    # expand ranges to flat positions and apply with saturation
    lengths = (env_end - env_start + 1).astype(np.int64)
    total = int(lengths.sum())
    if total == 0:
        return
    firsts = cov_start + env_start
    offsets = np.repeat(np.cumsum(lengths) - lengths, lengths)
    flat = np.repeat(firsts, lengths) + (np.arange(total) - offsets)
    counts = np.bincount(flat, minlength=g.coverage.size)
    merged = g.coverage.astype(np.int64) + counts[: g.coverage.size]
    np.minimum(merged, UINT16_MAX, out=merged)
    g.coverage[:] = merged.astype(np.uint16)
