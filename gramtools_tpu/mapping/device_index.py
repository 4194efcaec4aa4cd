"""Device-staged index tables + shape helpers (TPU-first).

``DeviceIndex`` stages the FM-index occ/SA tables, the marker-rank ->
jump-locus table and the jump-outcome tables (mapping/jump_table.py) as
device arrays, registered as a pytree so jitted kernels receive them as
buffers (reused across graphs of identical shapes), not baked-in
constants. Shared by the production genealogy-log engine
(search_jax_log.py), the device recorder (record_jax.py) and the
SA-range index sharding (parallel/sharded_index.py).

Reference tables this corresponds to: PRG_Info's fm_index + masks
(libgramtools include/prg/prg_info.hpp:22-59), re-designed as dense
int32 occ prefix rows + full SA for batched gathers (SURVEY &sect;7.1).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .jump_table import JumpTable, build_jump_table
from .search import PrgIndex


def _next_pow2(x: int, floor: int = 1) -> int:
    out = floor
    while out < x:
        out *= 2
    return out


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m if x > 0 else 0


@dataclass
class DeviceIndex:
    """PrgIndex arrays staged for device kernels.

    Registered as a pytree (int metadata static) so it is passed to
    jitted kernels as device buffers, not baked-in constants."""

    occ: jnp.ndarray            # (n+1, 4) prefix counts, transposed for gathers
    sym_start: jnp.ndarray      # (max_sym+1,)
    sa: jnp.ndarray             # (n,)
    marker_prefix: jnp.ndarray  # (n+1,)
    marker_sa_pos: jnp.ndarray  # (n_markers,) padded to >=1
    pos_to_locus: jnp.ndarray   # (len_prg,)
    marker_rank_locus: jnp.ndarray  # (n_markers,) jump locus per marker rank
    sentinel_row: jnp.ndarray   # () BWT row holding the 0 sentinel
    out_lo: jnp.ndarray         # (L, B)
    out_hi: jnp.ndarray
    ops_kind: jnp.ndarray       # (L, B, O)
    ops_site: jnp.ndarray
    ops_allele: jnp.ndarray
    size: int                   # n = fm size
    n_outcomes: int             # B
    n_ops: int                  # O

    @classmethod
    def build(cls, idx: PrgIndex, jt: Optional[JumpTable] = None) -> "DeviceIndex":
        if jt is None:
            jt = build_jump_table(idx)
        fm = idx.fm
        marker_sa_pos = fm.marker_sa_pos
        if marker_sa_pos.size == 0:
            marker_sa_pos = np.zeros(1, dtype=np.int32)
        # marker rank -> jump locus directly (collapses the dependent
        # marker_sa_pos -> sa -> pos_to_locus gather chain to one gather)
        marker_prg_pos = fm.sa[np.clip(marker_sa_pos, 0, fm.size - 1)]
        marker_rank_locus = jt.pos_to_locus[
            np.clip(marker_prg_pos, 0, jt.pos_to_locus.shape[0] - 1)]
        return cls(
            occ=jnp.asarray(np.ascontiguousarray(fm.occ.T)),
            sym_start=jnp.asarray(fm.sym_start),
            sa=jnp.asarray(fm.sa),
            marker_prefix=jnp.asarray(fm.marker_prefix),
            marker_sa_pos=jnp.asarray(marker_sa_pos),
            pos_to_locus=jnp.asarray(jt.pos_to_locus),
            marker_rank_locus=jnp.asarray(marker_rank_locus),
            sentinel_row=jnp.asarray(
                np.int32(np.flatnonzero(fm.bwt == 0)[0])),
            out_lo=jnp.asarray(jt.out_lo),
            out_hi=jnp.asarray(jt.out_hi),
            ops_kind=jnp.asarray(jt.ops_kind.astype(np.int32)),
            ops_site=jnp.asarray(jt.ops_site),
            ops_allele=jnp.asarray(jt.ops_allele),
            size=fm.size,
            n_outcomes=jt.max_outcomes,
            n_ops=jt.max_ops,
        )


jax.tree_util.register_dataclass(
    DeviceIndex,
    data_fields=["occ", "sym_start", "sa", "marker_prefix", "marker_sa_pos",
                 "pos_to_locus", "marker_rank_locus", "sentinel_row",
                 "out_lo", "out_hi", "ops_kind", "ops_site", "ops_allele"],
    meta_fields=["size", "n_outcomes", "n_ops"],
)


