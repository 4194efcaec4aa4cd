"""Batched vBWT backward search on device (JAX/XLA, TPU-first).

The reference maps one read per OpenMP thread with divergent per-read
state lists (quasimap.cpp:90-117). Here a whole read buffer is one
device batch:

  * the frontier of SearchStates is a fixed-shape array (R reads x S
    state slots), expanded by masked fan-out instead of list growth;
  * the per-base step is: marker fan-out via the precomputed jump table
    (jump_table.py) -> LF base extension via the dense occ tables ->
    valid-first compaction. Everything is gathers + where-masks: no
    data-dependent control flow, so XLA pipelines the whole read loop
    (lax.scan over base positions) on-chip;
  * reads whose frontier/hits/paths exceed the static bounds get an
    overflow flag and are re-mapped exactly by the host engine
    (mapping/search.py) -- the bounds are sized so this is rare.

Coverage recording stays on the host in this engine; the data-parallel
multi-chip path (parallel/) additionally accumulates device-side
per-site coverage and psums it across the mesh.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..prg.markers import ALLELE_UNKNOWN
from .jump_table import JumpTable, build_jump_table, OP_EXIT, OP_ENTER
from .search import PrgIndex, SearchState

# static bounds (overflow -> host fallback)
MAX_STATES = 16     # frontier slots per read
MAX_HITS = 4        # marker hits processed per state per step
MAX_PATH = 8        # traversed/traversing loci per state


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


def _build_search_step(di: DeviceIndex):
    """Returns step(carry, base) for lax.scan over read positions.

    Cost shape: the candidate pool (originals + marker fan-out) carries
    only SA intervals; the frontier is compacted to S slots with top_k,
    and the (rarely non-trivial) path operations are applied only to the
    S survivors -- keeping the per-step HBM traffic at O(R*C) ints plus
    O(R*S*P) path words.
    """
    B = di.n_outcomes
    O = di.n_ops
    S = MAX_STATES
    H = MAX_HITS
    P = MAX_PATH
    C = S + S * H * B  # candidate pool: originals then (s, h, b) fan-out

    def step(carry, base):
        lo, hi, valid, trav, n_trav, ing, n_ing, overflow = carry
        R = lo.shape[0]
        active = base > 0  # (R,) padding steps are no-ops

        # ---- 1. marker hits per state -----------------------------------
        mstart = di.marker_prefix[jnp.clip(lo, 0, di.size - 1)]          # (R,S)
        mend = di.marker_prefix[jnp.clip(hi + 1, 0, di.size)]            # (R,S)
        cnt = jnp.where(valid, mend - mstart, 0)
        hit_overflow = jnp.any((cnt > H) & active[:, None], axis=1)

        j = jnp.arange(H)
        hit_idx = mstart[:, :, None] + j                                  # (R,S,H)
        hit_valid = j < jnp.minimum(cnt, H)[:, :, None]
        sa_row = di.marker_sa_pos[jnp.clip(hit_idx, 0, di.marker_sa_pos.shape[0] - 1)]
        prg_pos = di.sa[jnp.clip(sa_row, 0, di.size - 1)]
        loc_idx = jnp.where(hit_valid,
                            di.pos_to_locus[jnp.clip(prg_pos, 0, di.pos_to_locus.shape[0] - 1)],
                            -1)                                           # (R,S,H)

        # ---- 2. jump outcome intervals (R,S,H,B) ------------------------
        li = jnp.clip(loc_idx, 0, di.out_lo.shape[0] - 1)
        cand_lo = di.out_lo[li]                                           # (R,S,H,B)
        cand_hi = di.out_hi[li]
        cand_valid = (loc_idx[..., None] >= 0) & (cand_lo >= 0)

        # ---- 3. pool intervals: originals + fan-out (R, C) --------------
        def flat(x):
            return x.reshape(R, S * H * B)

        pool_lo = jnp.concatenate([lo, flat(cand_lo)], axis=1)
        pool_hi = jnp.concatenate([hi, flat(cand_hi)], axis=1)
        pool_valid = jnp.concatenate([valid, flat(cand_valid)], axis=1)

        # ---- 4. LF base extension over the pool -------------------------
        first = di.sym_start[base]                                        # (R,)
        b_idx = jnp.clip(base - 1, 0, 3)
        occ_lo = di.occ[jnp.clip(pool_lo, 0, di.size), b_idx[:, None]]
        occ_hi = di.occ[jnp.clip(pool_hi + 1, 0, di.size), b_idx[:, None]]
        new_lo = first[:, None] + occ_lo
        new_hi = first[:, None] + occ_hi - 1
        pool_valid &= new_lo <= new_hi

        # ---- 5. compact valid-first to S slots via top_k ----------------
        n_valid = jnp.sum(pool_valid, axis=1)
        frontier_overflow = n_valid > S
        key = pool_valid.astype(jnp.int32) * (2 * C) + (C - 1 - jnp.arange(C))
        _, order = jax.lax.top_k(key, S)                                  # (R,S)
        take = lambda x: jnp.take_along_axis(x, order, axis=1)
        sel_lo = take(new_lo)
        sel_hi = take(new_hi)
        sel_valid = take(pool_valid)

        # ---- 6. path bookkeeping for the S survivors only ---------------
        # pool slot -> (parent state, hit, outcome); originals: slot itself
        is_original = order < S
        parent = jnp.where(is_original, order, (order - S) // (H * B))    # (R,S)
        ev = jnp.clip(order - S, 0, S * H * B - 1)
        ev_h = (ev // B) % H
        ev_b = ev % B
        gather_p = lambda x: jnp.take_along_axis(x, parent[:, :, None, None], axis=1)
        sel_trav = gather_p(trav)
        sel_ing = gather_p(ing)
        sel_n_trav = jnp.take_along_axis(n_trav, parent, axis=1)
        sel_n_ing = jnp.take_along_axis(n_ing, parent, axis=1)

        # the event's jump locus + outcome (only meaningful for fan-out slots)
        sel_loc = jnp.take_along_axis(
            loc_idx.reshape(R, S * H), parent * H + ev_h, axis=1)         # (R,S)
        sel_li = jnp.clip(sel_loc, 0, di.out_lo.shape[0] - 1)
        has_event = (~is_original) & sel_valid

        kinds = di.ops_kind[sel_li, ev_b]                                 # (R,S,O)
        sites = di.ops_site[sel_li, ev_b]
        alleles = di.ops_allele[sel_li, ev_b]

        arange_p = jnp.arange(P)
        path_overflow = jnp.zeros((R, S), dtype=bool)
        for o in range(O):
            kind = jnp.where(has_event, kinds[..., o], 0)                 # (R,S)
            is_exit = kind == OP_EXIT
            is_enter = kind == OP_ENTER
            site = sites[..., o]
            allele = alleles[..., o]
            # exit: pop traversing if nonempty, append to traversed
            has_ing = sel_n_ing > 0
            sel_n_ing = jnp.where(is_exit & has_ing, sel_n_ing - 1, sel_n_ing)
            slot = arange_p == jnp.clip(sel_n_trav, 0, P - 1)[..., None]  # (R,S,P)
            write = is_exit[..., None] & slot
            sel_trav = jnp.where(write[..., None],
                                 jnp.stack([site, allele], axis=-1)[:, :, None, :],
                                 sel_trav)
            path_overflow |= is_exit & (sel_n_trav >= P)
            sel_n_trav = jnp.where(is_exit, jnp.minimum(sel_n_trav + 1, P),
                                   sel_n_trav)
            # enter: push (site, ALLELE_UNKNOWN) on traversing
            slot_i = arange_p == jnp.clip(sel_n_ing, 0, P - 1)[..., None]
            write_i = is_enter[..., None] & slot_i
            sel_ing = jnp.where(
                write_i[..., None],
                jnp.stack([site, jnp.full_like(site, ALLELE_UNKNOWN)],
                          axis=-1)[:, :, None, :],
                sel_ing)
            path_overflow |= is_enter & (sel_n_ing >= P)
            sel_n_ing = jnp.where(is_enter, jnp.minimum(sel_n_ing + 1, P),
                                  sel_n_ing)

        hit_overflow |= jnp.any(path_overflow & sel_valid, axis=1)

        # ---- 7. no-op masking for padded steps --------------------------
        keep = lambda new, old: jnp.where(active[:, None], new, old)
        out_lo_ = keep(sel_lo, lo)
        out_hi_ = keep(sel_hi, hi)
        out_valid = keep(sel_valid, valid)
        out_trav = jnp.where(active[:, None, None, None], sel_trav, trav)
        out_ing = jnp.where(active[:, None, None, None], sel_ing, ing)
        out_n_trav = keep(sel_n_trav, n_trav)
        out_n_ing = keep(sel_n_ing, n_ing)
        out_overflow = overflow | (active & (hit_overflow | frontier_overflow))

        return (out_lo_, out_hi_, out_valid, out_trav, out_n_trav, out_ing,
                out_n_ing, out_overflow), None

    return step


@jax.jit
def _search_impl(di: DeviceIndex, reads_T, carry):
    step = _build_search_step(di)
    final_carry, _ = jax.lax.scan(step, carry, reads_T)
    return final_carry


def make_batched_search(di: DeviceIndex):
    """Returns jitted fn: (reads_T, seed_carry) -> final carry.

    reads_T: (steps, R) base codes, right-to-left order, 0 = no-op pad.
    The index rides along as a pytree argument (device buffers), so the
    compiled kernel is reused across graphs of identical table shapes.
    """
    return partial(_search_impl, di)


def empty_carry(R: int):
    S, P = MAX_STATES, MAX_PATH
    z = np.zeros
    return (
        z((R, S), np.int32), z((R, S), np.int32), z((R, S), bool),
        z((R, S, P, 2), np.int32), z((R, S), np.int32),
        z((R, S, P, 2), np.int32), z((R, S), np.int32),
        z((R,), bool),
    )


def load_seed_states(carry, row: int, states: List[SearchState]) -> bool:
    """Host-side: place kmer-index seed states into carry row. Returns
    False if the seeds exceed static bounds (-> host fallback)."""
    lo, hi, valid, trav, n_trav, ing, n_ing, overflow = carry
    if len(states) > MAX_STATES:
        return False
    for si, s in enumerate(states):
        if len(s.traversed) > MAX_PATH or len(s.traversing) > MAX_PATH:
            return False
        lo[row, si] = s.lo
        hi[row, si] = s.hi
        valid[row, si] = True
        for pi, (site, allele) in enumerate(s.traversed):
            trav[row, si, pi] = (site, allele)
        n_trav[row, si] = len(s.traversed)
        for pi, (site, allele) in enumerate(s.traversing):
            ing[row, si, pi] = (site, allele)
        n_ing[row, si] = len(s.traversing)
    return True


def decode_states(carry_np, row: int) -> List[SearchState]:
    lo, hi, valid, trav, n_trav, ing, n_ing, overflow = carry_np
    out: List[SearchState] = []
    for si in range(MAX_STATES):
        if not valid[row, si]:
            continue
        nt = int(n_trav[row, si])
        ni = int(n_ing[row, si])
        traversed = tuple((int(a), int(b)) for a, b in trav[row, si, :nt])
        traversing = tuple((int(a), int(b)) for a, b in ing[row, si, :ni])
        out.append(SearchState(int(lo[row, si]), int(hi[row, si]),
                               traversed, traversing))
    return out


class BatchedSearchEngine:
    """Buffer-level engine used by quasimap_reads (engine= parameter)."""

    def __init__(self, idx: PrgIndex, kmer_size: int):
        self.idx = idx
        self.kmer_size = kmer_size
        self.di = DeviceIndex.build(idx)
        self.search_fn = make_batched_search(self.di)
        self.host_fallbacks = 0
        self.device_mapped = 0

    def search_buffer(self, buffer, kmer_index, kmer_size, stats):
        """Returns per input read a list of (states, read_len) for fwd and
        reverse-complement mapping attempts (after encapsulated-state
        handling), mirroring quasimap_forward_reverse. Counts
        missing-kmer/skipped reads into stats."""
        from ..common.seq import revcomp
        from .quasimap import all_read_kmers_in_index
        from .search import (handle_allele_encapsulated_states,
                             search_read_backwards)

        k = kmer_size
        vec_filter = getattr(kmer_index, "all_kmers_indexed", None)
        if vec_filter is not None:
            kmer_filter = vec_filter
        else:
            kmer_filter = lambda r: all_read_kmers_in_index(k, r, kmer_index)
        # assemble rows: each mappable (read, orientation) is one row
        rows = []       # (buffer_index, read_array)
        results = [[] for _ in buffer]
        for i, read in enumerate(buffer):
            stats.all_reads_count += 2
            if read.size == 0:
                stats.skipped_reads_count += 2
                continue
            for oriented in (read, revcomp(read)):
                if not kmer_filter(oriented):
                    stats.missing_kmer_reads_count += 1
                    continue
                rows.append((i, oriented))

        if not rows:
            return results

        # bucket shapes so the jitted scan is compiled once per bucket,
        # not once per buffer
        R = _next_pow2(len(rows), floor=8)
        max_len = max(r.size for _, r in rows)
        steps = _round_up(max(max_len - k, 0), 32)
        carry = empty_carry(R)
        host_rows = set()
        reads_T = np.zeros((max(steps, 0), R), dtype=np.int32)
        for row, (i, read) in enumerate(rows):
            seed = read[read.size - k:].astype(np.uint8).tobytes()
            states = kmer_index.get(seed, [])
            if not states or not load_seed_states(carry, row, states):
                host_rows.add(row)
                continue
            # right-to-left bases before the seed kmer
            body = read[: read.size - k][::-1]
            reads_T[: body.size, row] = body

        if steps > 0:
            carry_j = self.search_fn(jnp.asarray(reads_T), jax.device_put(carry))
            carry_np = jax.tree_util.tree_map(np.asarray, carry_j)
        else:
            carry_np = carry
        overflow = carry_np[7]

        for row, (i, read) in enumerate(rows):
            if row in host_rows or bool(overflow[row]):
                # exact host re-map
                self.host_fallbacks += 1
                seed = read[read.size - k:].astype(np.uint8).tobytes()
                seed_states = kmer_index.get(seed, [])
                states = (search_read_backwards(read, seed_states, k, self.idx)
                          if seed_states else [])
                results[i].append((states, int(read.size)))
            else:
                self.device_mapped += 1
                states = decode_states(carry_np, row)
                states = handle_allele_encapsulated_states(states, self.idx)
                results[i].append((states, int(read.size)))
        return results
