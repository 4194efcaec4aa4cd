"""Vectorised per-base coverage recording.

The scalar recorder (coverage.py:record_per_base) walks the graph one
node at a time per mapped read. Here all selected mapping instances of a
whole buffer advance together: the walk state of every (state,
occurrence) start point lives in flat numpy arrays over the graph's
NodeTables, one masked gather-step per iteration (the host mirror of the
device engine's design). Emitted (read, node, start, end) ranges union
to their envelope per (read, node) -- DummyCovNode semantics
(allele_base.cpp:109-135) -- and one bincount applies all increments
with uint16 saturation.

Exactness: tests/test_coverage_vec.py checks bit-equality against the
scalar recorder on randomised PRGs and the reference fixtures.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from ..prg.markers import ALLELE_UNKNOWN
from .search import PrgIndex, SearchState

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
