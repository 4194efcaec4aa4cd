"""Suffix array construction over the int-encoded PRG.

The reference delegates to sdsl's suffix sorting
(libgramtools src/prg/make_data_structures.cpp:9-33). Here:

  * a native C++ SA-IS implementation (gramtools_tpu/native/) is used
    when built -- linear time, the production path;
  * a numpy prefix-doubling fallback (O(n log^2 n), vectorised) keeps
    the package dependency-free.

The text is the PRG int sequence with a single 0 sentinel appended
(unique smallest symbol), matching sdsl's convention so SA/BWT/occ
tables are directly comparable with the reference FM-index.
"""
from __future__ import annotations

import numpy as np

from .native import native_suffix_array


def suffix_array(text: np.ndarray) -> np.ndarray:
    """SA of ``text + [0]``, int32. text values must all be >= 1."""
    native = native_suffix_array(text)
    if native is not None:
        return native
    return _suffix_array_doubling(text)


def _suffix_array_doubling(text: np.ndarray) -> np.ndarray:
    t = np.empty(text.size + 1, dtype=np.int64)
    t[:-1] = text
    t[-1] = 0
    n = t.size
    # dense initial ranks from symbol values
    _, rank = np.unique(t, return_inverse=True)
    rank = rank.astype(np.int64)
    k = 1
    while True:
        rank_shift = np.full(n, -1, dtype=np.int64)
        rank_shift[: n - k] = rank[k:]
        order = np.lexsort((rank_shift, rank))
        r1, r2 = rank[order], rank_shift[order]
        changed = np.ones(n, dtype=bool)
        changed[1:] = (r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[order] = np.cumsum(changed) - 1
        rank = new_rank
        if rank[order[-1]] == n - 1:  # all ranks distinct
            return order.astype(np.int32)
        k *= 2
