"""Kmer index: seed table for quasimap.

The reference enumerates all 4^k kmers in suffix-sharing order and
backward-searches each with a shared-suffix cache
(build/kmer_index/kmers.cpp, build.cpp). Here the same sharing is a DFS
over the 4-ary suffix trie: a node at depth d holds the SearchStates of
the last d bases; children extend by one base to the left. Subtrees with
no matches are pruned (the reference computes but never stores them, so
the resulting index is identical).

Index maps kmer (as bytes of the int-encoded bases) -> list of
SearchState. Only kmers with matches are stored (build.cpp:126-128).
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, List

import numpy as np

from ..mapping.search import (
    PrgIndex,
    SearchState,
    initial_state,
    process_markers_search_states,
    search_base_backwards,
)

KmerIndex = Dict[bytes, List[SearchState]]


def build_kmer_index(idx: PrgIndex, kmer_size: int) -> KmerIndex:
    index: KmerIndex = {}
    # stack entries: (suffix_bases_right_to_left, states)
    # suffix at depth d covers kmer positions [k-d, k); children prepend a base.
    root_states = [initial_state(idx)]
    stack = [((), root_states)]
    while stack:
        suffix, states = stack.pop()
        depth = len(suffix)
        if depth == kmer_size:
            # suffix holds bases right-to-left; the kmer reads left-to-right
            kmer = bytes(reversed(suffix))
            index[kmer] = states
            continue
        for base in (4, 3, 2, 1):  # pop order -> kmers visited in sorted order
            if depth == 0:
                new_states = search_base_backwards(base, states, idx)
            else:
                new_states = process_markers_search_states(list(states), idx)
                new_states = search_base_backwards(base, new_states, idx)
            if new_states:
                stack.append((suffix + (base,), new_states))
    return index


# --- serialisation ----------------------------------------------------------


def save_kmer_index(index: KmerIndex, path: str | Path, kmer_size: int):
    """Flat-array serialisation (replaces the reference's four sdsl int
    vectors, build/kmer_index/dump.cpp:10-142)."""
    kmers = sorted(index.keys())
    num_states = []
    intervals = []
    path_lens = []  # (n_traversed, n_traversing) per state
    loci = []
    for kmer in kmers:
        states = index[kmer]
        num_states.append(len(states))
        for s in states:
            intervals.append((s.lo, s.hi))
            path_lens.append((len(s.traversed), len(s.traversing)))
            loci.extend(s.traversed)
            loci.extend(s.traversing)
    np.savez_compressed(
        path,
        kmer_size=np.int32(kmer_size),
        kmers=np.frombuffer(b"".join(kmers), dtype=np.uint8).reshape(-1, kmer_size)
        if kmers else np.empty((0, kmer_size), dtype=np.uint8),
        num_states=np.asarray(num_states, dtype=np.int32),
        intervals=np.asarray(intervals, dtype=np.int32).reshape(-1, 2),
        path_lens=np.asarray(path_lens, dtype=np.int32).reshape(-1, 2),
        loci=np.asarray(loci, dtype=np.int32).reshape(-1, 2),
    )


def load_kmer_index(path: str | Path) -> KmerIndex:
    with np.load(path) as z:
        kmer_size = int(z["kmer_size"])
        kmers = z["kmers"]
        num_states = z["num_states"]
        intervals = z["intervals"]
        path_lens = z["path_lens"]
        loci = z["loci"]
    index: KmerIndex = {}
    si = 0  # state cursor
    li = 0  # locus cursor
    for ki in range(kmers.shape[0]):
        kmer = kmers[ki].tobytes()
        states = []
        for _ in range(int(num_states[ki])):
            lo, hi = map(int, intervals[si])
            n_trav, n_ing = map(int, path_lens[si])
            traversed = tuple(map(tuple, loci[li : li + n_trav]))
            li += n_trav
            traversing = tuple(map(tuple, loci[li : li + n_ing]))
            li += n_ing
            states.append(SearchState(lo, hi, traversed, traversing))
            si += 1
        index[kmer] = states
    return index
