"""Multiple-sequence-alignment -> PRG construction.

Native replacement for the external make_prg dependency (the reference
delegates to make_prg.PrgBuilder,
/root/reference/gramtools/commands/build/from_msas.py:124-134). Like
make_prg, the builder is recursive:

1. split the alignment into match intervals (runs >= min_match_length
   of columns where every row agrees, no gaps) and variant intervals;
2. a variant interval becomes a site; its alleles come from CLUSTERING
   the interval's rows by k-mer profile (K-means over degapped k-mer
   count vectors, K chosen by silhouette score, deterministic
   farthest-first seeding). Each cluster's sub-alignment recurses into
   steps 1-2, producing nested sites, until max_nesting, a
   single-sequence cluster, or an unsplittable interval -- whose
   distinct degapped sequences become flat alleles.

The guaranteed invariant (pinned by tests): every original MSA row
threads exactly through the resulting PRG. Graph structure follows
make_prg's nested-site decomposition in spirit; exact cluster
boundaries can differ from make_prg's (different clusterer seeds), a
documented divergence (docs/PARITY.md).
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..common.seq import iter_fastx

MIN_MATCH_LENGTH = 7   # make_prg default
MAX_NESTING = 5        # make_prg default max nesting depth
CLUSTER_KMER = 4
MIN_SILHOUETTE = 0.3
MAX_CLUSTERS = 5


def load_msa(path) -> List[str]:
    rows = [seq.upper() for _, seq, _ in iter_fastx(path)]
    if not rows:
        raise ValueError(f"no sequences in MSA {path}")
    width = len(rows[0])
    if any(len(r) != width for r in rows):
        raise ValueError(f"MSA rows have unequal lengths in {path}")
    return rows


def _match_columns(rows: List[str]) -> np.ndarray:
    arr = np.frombuffer("".join(rows).encode(), dtype="S1").reshape(len(rows), -1)
    same = (arr == arr[0]).all(axis=0)
    non_gap = (arr != b"-").all(axis=0)
    return same & non_gap


def _intervals(match: np.ndarray, min_match: int) -> List[Tuple[int, int, bool]]:
    """(start, end_exclusive, is_match) runs; match runs < min_match are
    merged into their neighbouring variant runs."""
    runs = []
    n = match.size
    i = 0
    while i < n:
        j = i
        while j < n and match[j] == match[i]:
            j += 1
        runs.append((i, j, bool(match[i])))
        i = j
    # demote short match runs (except at the ends, which make_prg keeps)
    merged: List[Tuple[int, int, bool]] = []
    for start, end, is_match in runs:
        if (is_match and end - start < min_match
                and start != 0 and end != n):
            is_match = False
        if merged and merged[-1][2] == is_match:
            merged[-1] = (merged[-1][0], end, is_match)
        else:
            merged.append((start, end, is_match))
    return merged


def _dedup_keep_order(seqs: List[str]) -> List[str]:
    seen = set()
    out = []
    for s in seqs:
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


# ---------------------------------------------------------------------------
# clustering (make_prg's KMeans-over-kmer-counts, self-contained numpy)
# ---------------------------------------------------------------------------

def _kmer_profiles(seqs: List[str], k: int = CLUSTER_KMER) -> np.ndarray:
    """L2-normalised k-mer count vectors of degapped sequences (rows
    shorter than k fall back to base composition)."""
    lut = np.full(256, -1, np.int64)
    for i, c in enumerate("ACGT"):
        lut[ord(c)] = i
    out = np.zeros((len(seqs), 4 ** k), dtype=np.float64)
    for r, s in enumerate(seqs):
        enc = lut[np.frombuffer(s.replace("-", "").encode(), np.uint8)]
        enc = enc[enc >= 0]
        kk = k if enc.size >= k else 1
        if enc.size == 0:
            continue
        w = np.lib.stride_tricks.sliding_window_view(enc, kk)
        codes = w @ (4 ** np.arange(kk - 1, -1, -1))
        np.add.at(out[r], codes, 1.0)
    norms = np.linalg.norm(out, axis=1)
    out /= np.where(norms == 0, 1.0, norms)[:, None]
    return out


def _kmeans(X: np.ndarray, K: int, iters: int = 25) -> np.ndarray:
    """Deterministic K-means: farthest-first init, Lloyd iterations."""
    n = X.shape[0]
    centroids = [0]
    d = np.linalg.norm(X - X[0], axis=1)
    for _ in range(K - 1):
        nxt = int(np.argmax(d))
        centroids.append(nxt)
        d = np.minimum(d, np.linalg.norm(X - X[nxt], axis=1))
    C = X[centroids].copy()
    labels = np.zeros(n, np.int64)
    for _ in range(iters):
        dist = np.linalg.norm(X[:, None, :] - C[None], axis=2)
        new = np.argmin(dist, axis=1)
        if (new == labels).all() and _ > 0:
            break
        labels = new
        for j in range(K):
            m = labels == j
            if m.any():
                C[j] = X[m].mean(axis=0)
    return labels


def _silhouette(X: np.ndarray, labels: np.ndarray) -> float:
    """Mean silhouette over all points (O(n^2), fine at MSA scale)."""
    n = X.shape[0]
    D = np.linalg.norm(X[:, None, :] - X[None], axis=2)
    scores = []
    for i in range(n):
        same = labels == labels[i]
        same[i] = False
        a = D[i][same].mean() if same.any() else 0.0
        bs = [D[i][labels == l].mean() for l in np.unique(labels)
              if l != labels[i]]
        b = min(bs) if bs else 0.0
        denom = max(a, b)
        scores.append(0.0 if denom == 0 else (b - a) / denom)
    return float(np.mean(scores))


def _cluster(sub_rows: List[str]) -> List[List[int]]:
    """Cluster aligned rows by degapped k-mer profile; returns groups of
    row indices (singleton list = no credible split)."""
    distinct = _dedup_keep_order(sub_rows)
    if len(distinct) < 3:
        return [list(range(len(sub_rows)))]
    X = _kmer_profiles(sub_rows)
    # parsimony: the SMALLEST K with an acceptable silhouette wins (a
    # larger K always flatters the score when within-cluster noise is
    # tiny, but over-splitting buries the family structure make_prg's
    # nesting is meant to expose)
    for K in range(2, min(MAX_CLUSTERS, len(distinct)) + 1):
        labels = _kmeans(X, K)
        if np.unique(labels).size < K:
            continue
        if _silhouette(X, labels) >= MIN_SILHOUETTE:
            return [list(np.flatnonzero(labels == l))
                    for l in np.unique(labels)]
    return [list(range(len(sub_rows)))]


# ---------------------------------------------------------------------------
# recursive PRG construction
# ---------------------------------------------------------------------------

def msa_to_prg_string(rows: List[str], min_match: int = MIN_MATCH_LENGTH,
                      depth: int = 0, max_depth: int = MAX_NESTING) -> str:
    """Bracketed PRG string ('[' site, ',' allele, ']' end) from MSA rows."""
    match = _match_columns(rows)
    parts: List[str] = []
    for start, end, is_match in _intervals(match, min_match):
        if is_match:
            parts.append(rows[0][start:end].replace("-", ""))
            continue
        sub_rows = [r[start:end] for r in rows]
        flat = _dedup_keep_order([r.replace("-", "") for r in sub_rows])
        if len(flat) == 1:
            parts.append(flat[0])
            continue
        if depth >= max_depth or end - start < min_match:
            parts.append("[" + ",".join(flat) + "]")
            continue
        groups = _cluster(sub_rows)
        if len(groups) == 1:
            parts.append("[" + ",".join(flat) + "]")
            continue
        allele_parts = []
        for group in groups:
            grp_rows = [sub_rows[i] for i in group]
            grp_flat = _dedup_keep_order(
                [r.replace("-", "") for r in grp_rows])
            if len(grp_flat) == 1:
                allele_parts.append(grp_flat[0])
            else:
                allele_parts.append(msa_to_prg_string(
                    grp_rows, min_match, depth + 1, max_depth))
        # a recursion that degenerates (e.g. all-variant interval again)
        # must still thread every row: fall back to flat alleles
        if any(p == "" for p in allele_parts) and "" not in flat:
            parts.append("[" + ",".join(flat) + "]")
        else:
            parts.append("[" + ",".join(allele_parts) + "]")
    return "".join(parts)


def msa_file_to_prg_string(path, min_match: int = MIN_MATCH_LENGTH) -> str:
    return msa_to_prg_string(load_msa(path), min_match)
