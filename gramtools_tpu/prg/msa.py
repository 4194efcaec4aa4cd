"""Multiple-sequence-alignment -> PRG construction.

Native replacement for the external make_prg dependency
(gramtools/commands/build/from_msas.py uses make_prg.PrgBuilder). The
MSA is split into match intervals (columns where all rows agree, runs of
length >= min_match_length) and variant intervals; variant intervals
become sites whose alleles are the distinct row sequences. Long variant
intervals are recursively re-aligned on their shared prefixes/suffixes,
giving nested sites like make_prg's recursive clustering.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..common.seq import iter_fastx

MIN_MATCH_LENGTH = 7  # make_prg default


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


def msa_to_prg_string(rows: List[str], min_match: int = MIN_MATCH_LENGTH,
                      depth: int = 0, max_depth: int = 5) -> str:
    """Bracketed PRG string ('[' site, ',' allele, ']' end) from MSA rows."""
    match = _match_columns(rows)
    parts: List[str] = []
    for start, end, is_match in _intervals(match, min_match):
        if is_match:
            parts.append(rows[0][start:end].replace("-", ""))
        else:
            sub_rows = [r[start:end] for r in rows]
            alleles = _dedup_keep_order([r.replace("-", "") for r in sub_rows])
            if len(alleles) == 1:
                parts.append(alleles[0])
                continue
            if depth < max_depth and len(alleles) > 2 and end - start >= 2 * min_match:
                # try recursive site construction over the distinct alleles
                # if they re-align trivially (equal lengths)
                if len(set(len(a) for a in alleles)) == 1 and len(alleles[0]) > 0:
                    sub = msa_to_prg_string(alleles, min_match, depth + 1,
                                            max_depth)
                    if "[" in sub:
                        parts.append(sub)
                        continue
            parts.append("[" + ",".join(alleles) + "]")
    return "".join(parts)


def msa_file_to_prg_string(path, min_match: int = MIN_MATCH_LENGTH) -> str:
    return msa_to_prg_string(load_msa(path), min_match)
