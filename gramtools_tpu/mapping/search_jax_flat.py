"""Flat-pool batched vBWT search: device cost scales with live states.

The slot engine (search_jax.py) extends R x S state slots every step;
profiling on TPU v5e shows per-step cost is dominated by HBM gathers,
which that layout issues for every slot whether or not it holds a state
(~650k gathers/step at R=4096). This engine keeps ONE flat pool of live
states across all reads:

  pool[i] = (read_id, sa_lo, sa_hi, paths); read_id == -1 -> free slot

Per step:
  1. one occ-ROW gather per pool slot at lo and hi+1 serves BOTH the LF
     extension (select base column) and the marker count (markers<i =
     i - sum(occ_row) - sentinel<i) -- no marker_prefix table;
  2. marker hits are enumerated GLOBALLY (cumsum over per-state counts,
     searchsorted to map hit->state), bounded by a global budget G that
     tracks actual hit volume instead of a per-slot worst case;
  3. jump outcomes fan out through the precomputed tables
     (jump_table.py) and are LF-extended with the same base;
  4. survivors + newborns repack densely via cumsum positions; states
     dropped by the pool cap flag their read for exact host re-mapping.

Bounds (pool size N, hit budget G) are soft: overflow is per read and
rare, and overflowing reads fall back to the scalar engine.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..prg.markers import ALLELE_UNKNOWN
from .jump_table import OP_ENTER, OP_EXIT
from .search import PrgIndex, SearchState
from .search_jax import DeviceIndex, MAX_PATH, _next_pow2, _round_up


@dataclass
class FlatConfig:
    pool: int = 16384    # N: live states across the whole batch
    hits: int = 2048     # G: marker hits processed per step (global)
    # path capacity: reads crossing more sites than this overflow to the
    # exact host engine; 8 keeps the known-fast compiled shape (raise via
    # FlatConfig(path=...) when overflow rates warrant it)
    path: int = MAX_PATH


def _build_flat_step(di: DeviceIndex, cfg: FlatConfig, num_reads: int):
    B = di.n_outcomes
    O = di.n_ops
    N = cfg.pool
    G = cfg.hits
    P = cfg.path
    n = di.size

    def step(carry, base_row):
        (read_id, lo, hi, trav, n_trav, ing, n_ing, overflow) = carry
        valid = read_id >= 0
        rid = jnp.clip(read_id, 0, num_reads - 1)
        base = jnp.where(valid, base_row[rid], 0)       # (N,)
        active = valid & (base > 0)

        # ---- 1. occ row gathers: LF + marker counts ---------------------
        row_lo = di.occ[jnp.clip(lo, 0, n)]             # (N,4)
        row_hi = di.occ[jnp.clip(hi + 1, 0, n)]         # (N,4)
        onehot = (base[:, None] == jnp.arange(1, 5))    # (N,4)
        first = di.sym_start[jnp.clip(base, 0, 4)]
        nlo = first + jnp.sum(row_lo * onehot, axis=1)
        nhi = first + jnp.sum(row_hi * onehot, axis=1) - 1
        ext_alive = active & (nlo <= nhi)
        kept_lo = jnp.where(active, nlo, lo)
        kept_hi = jnp.where(active, nhi, hi)
        keep = ext_alive | (valid & ~active)            # padding steps persist

        # markers in bwt[0:i) = i - #dna(<i) - #sentinel(<i)
        sent = di.sentinel_row
        m_lo = lo - jnp.sum(row_lo, axis=1) - (lo > sent)
        m_hi = (hi + 1) - jnp.sum(row_hi, axis=1) - (hi + 1 > sent)
        cnt = jnp.where(active, m_hi - m_lo, 0)         # (N,)

        # ---- 2. global hit enumeration ----------------------------------
        cum = jnp.cumsum(cnt)
        total = cum[-1]
        g = jnp.arange(G)
        s_of_g = jnp.searchsorted(cum, g, side="right") # (G,) state index
        s_of_g = jnp.clip(s_of_g, 0, N - 1)
        hit_ok = g < jnp.minimum(total, G)
        cum_before = cum[s_of_g] - cnt[s_of_g]
        hit_pos = m_lo[s_of_g] + (g - cum_before)
        # states whose hits spill past the budget flag their read
        spilled = active & (cum > G) & (cnt > 0)
        overflow = overflow.at[jnp.where(spilled, rid, num_reads)].set(
            True, mode="drop")

        sa_row = di.marker_sa_pos[
            jnp.clip(hit_pos, 0, di.marker_sa_pos.shape[0] - 1)]
        prg_pos = di.sa[jnp.clip(sa_row, 0, n - 1)]
        loc = jnp.where(hit_ok,
                        di.pos_to_locus[jnp.clip(prg_pos, 0,
                                                 di.pos_to_locus.shape[0] - 1)],
                        -1)                              # (G,)

        # ---- 3. outcomes + LF of newborns (G,B) -------------------------
        li = jnp.clip(loc, 0, di.out_lo.shape[0] - 1)
        j_lo = di.out_lo[li]                             # (G,B)
        j_hi = di.out_hi[li]
        cand_ok = (loc >= 0)[:, None] & (j_lo >= 0)
        jrow_lo = di.occ[jnp.clip(j_lo, 0, n)]           # (G,B,4)
        jrow_hi = di.occ[jnp.clip(j_hi + 1, 0, n)]
        j_base = base[s_of_g]                            # (G,)
        j_onehot = (j_base[:, None] == jnp.arange(1, 5))  # (G,4)
        j_first = di.sym_start[jnp.clip(j_base, 0, 4)]
        e_lo = j_first[:, None] + jnp.sum(jrow_lo * j_onehot[:, None, :], axis=2)
        e_hi = j_first[:, None] + jnp.sum(jrow_hi * j_onehot[:, None, :], axis=2) - 1
        cand_ok &= e_lo <= e_hi

        # paths of newborns: parent paths + outcome ops
        p_trav = trav[s_of_g][:, None]                   # (G,1,P,2)
        p_ing = ing[s_of_g][:, None]
        c_trav = jnp.broadcast_to(p_trav, (G, B, P, 2))
        c_ing = jnp.broadcast_to(p_ing, (G, B, P, 2))
        c_n_trav = jnp.broadcast_to(n_trav[s_of_g][:, None], (G, B))
        c_n_ing = jnp.broadcast_to(n_ing[s_of_g][:, None], (G, B))
        kinds = di.ops_kind[li]                          # (G,B,O)
        sites = di.ops_site[li]
        alleles = di.ops_allele[li]
        arange_p = jnp.arange(P)
        path_ovf = jnp.zeros((G, B), dtype=bool)
        for o in range(O):
            kind = jnp.where(cand_ok, kinds[..., o], 0)
            is_exit = kind == OP_EXIT
            is_enter = kind == OP_ENTER
            site = sites[..., o]
            allele = alleles[..., o]
            has_ing = c_n_ing > 0
            c_n_ing = jnp.where(is_exit & has_ing, c_n_ing - 1, c_n_ing)
            slot = arange_p == jnp.clip(c_n_trav, 0, P - 1)[..., None]
            write = is_exit[..., None] & slot
            c_trav = jnp.where(write[..., None],
                               jnp.stack([site, allele], -1)[:, :, None, :],
                               c_trav)
            path_ovf |= is_exit & (c_n_trav >= P)
            c_n_trav = jnp.where(is_exit, jnp.minimum(c_n_trav + 1, P), c_n_trav)
            slot_i = arange_p == jnp.clip(c_n_ing, 0, P - 1)[..., None]
            write_i = is_enter[..., None] & slot_i
            c_ing = jnp.where(
                write_i[..., None],
                jnp.stack([site, jnp.full_like(site, ALLELE_UNKNOWN)],
                          -1)[:, :, None, :], c_ing)
            path_ovf |= is_enter & (c_n_ing >= P)
            c_n_ing = jnp.where(is_enter, jnp.minimum(c_n_ing + 1, P), c_n_ing)

        c_rid = jnp.broadcast_to(rid[s_of_g][:, None], (G, B))
        overflow = overflow.at[jnp.where(path_ovf & cand_ok, c_rid,
                                         num_reads)].set(True, mode="drop")

        # ---- 4. dense repack: survivors then newborns -------------------
        flags = jnp.concatenate([keep, cand_ok.reshape(-1)])
        pos = jnp.cumsum(flags) - 1
        dest = jnp.where(flags & (pos < N), pos, N)      # N = dump slot
        # reads of dropped entries (pos >= N) overflow
        all_rid = jnp.concatenate([rid, c_rid.reshape(-1)])
        dropped = flags & (pos >= N)
        overflow = overflow.at[jnp.where(dropped, all_rid, num_reads)].set(
            True, mode="drop")

        def repack(old, new_vals, fill):
            cat = jnp.concatenate([old, new_vals])
            out = jnp.full((N + 1,) + cat.shape[1:], fill, dtype=cat.dtype)
            return out.at[dest].set(cat, mode="drop")[:N]

        new_read_id = repack(jnp.where(keep, read_id, -1),
                             jnp.where(cand_ok, c_rid, -1).reshape(-1), -1)
        new_lo = repack(kept_lo, e_lo.reshape(-1), 0)
        new_hi = repack(kept_hi, e_hi.reshape(-1), 0)
        new_trav = repack(trav, c_trav.reshape(G * B, P, 2), 0)
        new_n_trav = repack(n_trav, c_n_trav.reshape(-1), 0)
        new_ing = repack(ing, c_ing.reshape(G * B, P, 2), 0)
        new_n_ing = repack(n_ing, c_n_ing.reshape(-1), 0)

        return (new_read_id, new_lo, new_hi, new_trav, new_n_trav, new_ing,
                new_n_ing, overflow), None

    return step


@partial(jax.jit, static_argnames=("pool", "hits", "path", "num_reads"))
def _flat_search_impl(di: DeviceIndex, reads_T, carry, pool, hits, path,
                      num_reads):
    cfg = FlatConfig(pool=pool, hits=hits, path=path)
    step = _build_flat_step(di, cfg, num_reads)
    final, _ = jax.lax.scan(step, carry, reads_T)
    return final


def make_flat_search(di: DeviceIndex, cfg: FlatConfig, num_reads: int):
    return lambda reads_T, carry: _flat_search_impl(
        di, reads_T, carry, cfg.pool, cfg.hits, cfg.path, num_reads)


def empty_flat_carry(num_reads: int, cfg: FlatConfig):
    N, P = cfg.pool, cfg.path
    z = np.zeros
    return (
        np.full((N,), -1, np.int32), z((N,), np.int32), z((N,), np.int32),
        z((N, P, 2), np.int32), z((N,), np.int32),
        z((N, P, 2), np.int32), z((N,), np.int32),
        z((num_reads,), bool),
    )


class FlatBatchedEngine:
    """Drop-in engine for quasimap_reads (same contract as
    BatchedSearchEngine.search_buffer)."""

    def __init__(self, idx: PrgIndex, kmer_size: int,
                 cfg: Optional[FlatConfig] = None):
        import os

        from ..common.jax_setup import enable_compile_cache
        enable_compile_cache()
        self.idx = idx
        self.kmer_size = kmer_size
        self.di = DeviceIndex.build(idx)
        idx.graph.node_tables()  # pre-build for the batched coverage recorder
        if cfg is None:
            cfg = FlatConfig(
                pool=int(os.environ.get("GRAMTOOLS_TPU_POOL", FlatConfig.pool)),
                hits=int(os.environ.get("GRAMTOOLS_TPU_HITS", FlatConfig.hits)))
        self.cfg = cfg
        self.host_fallbacks = 0
        self.device_mapped = 0

    def search_buffer(self, buffer, kmer_index, kmer_size, stats):
        from ..common.seq import revcomp
        from .quasimap import all_read_kmers_in_index
        from .search import (handle_allele_encapsulated_states,
                             search_read_backwards)

        k = kmer_size
        P = self.cfg.path
        results = [[] for _ in buffer]

        # batch kmer-presence screen over all orientations at once
        oriented_all = []
        owners = []
        for i, read in enumerate(buffer):
            stats.all_reads_count += 2
            if read.size == 0:
                stats.skipped_reads_count += 2
                continue
            oriented_all.append(read)
            oriented_all.append(revcomp(read))
            owners.extend((i, i))
        if not oriented_all:
            return results
        batch_filter = getattr(kmer_index, "batch_all_indexed", None)
        if batch_filter is not None:
            passed = batch_filter(oriented_all)
        else:
            passed = np.array([all_read_kmers_in_index(k, r, kmer_index)
                               for r in oriented_all])
        rows = []
        for j, (i, oriented) in enumerate(zip(owners, oriented_all)):
            if passed[j]:
                rows.append((i, oriented))
            else:
                stats.missing_kmer_reads_count += 1

        if not rows:
            return results

        R = _next_pow2(len(rows), floor=8)
        max_len = max(r.size for _, r in rows)
        steps = _round_up(max(max_len - k, 0), 32)
        carry = empty_flat_carry(R, self.cfg)
        read_id, lo, hi, trav, n_trav, ing, n_ing, _ = carry
        reads_T = np.zeros((steps, R), dtype=np.int32)
        host_rows = set()

        seed_fn = getattr(kmer_index, "seed_batch", None)
        if seed_fn is not None and getattr(kmer_index, "trav", None) is not None \
                and kmer_index.trav.shape[1] <= P:
            # vectorised seeding from the array-backed kmer index
            last_kmers = np.zeros((len(rows), k), dtype=np.uint8)
            for row, (i, read) in enumerate(rows):
                last_kmers[row] = read[read.size - k:]
                body = read[: read.size - k][::-1]
                reads_T[: body.size, row] = body
            owner, s_lo, s_hi, s_trav, s_nt, s_ing, s_ni = seed_fn(last_kmers)
            if s_trav.shape[1] < P:  # pad kmer path capacity to engine's
                pad = ((0, 0), (0, P - s_trav.shape[1]), (0, 0))
                s_trav = np.pad(s_trav, pad)
                s_ing = np.pad(s_ing, pad)
            n_states = owner.size
            if n_states > self.cfg.pool:
                # rows whose seeds do not fit go to the host engine
                for r in np.unique(owner[self.cfg.pool:]):
                    host_rows.add(int(r))
                n_states = self.cfg.pool
            read_id[:n_states] = owner[:n_states]
            lo[:n_states] = s_lo[:n_states]
            hi[:n_states] = s_hi[:n_states]
            trav[:n_states] = s_trav[:n_states]
            n_trav[:n_states] = s_nt[:n_states]
            ing[:n_states] = s_ing[:n_states]
            n_ing[:n_states] = s_ni[:n_states]
            seeded = set(np.unique(owner[:n_states]).tolist())
            for row in range(len(rows)):
                if row not in seeded:
                    host_rows.add(row)
            cursor = n_states
        else:
            cursor = 0
            for row, (i, read) in enumerate(rows):
                seed = read[read.size - k:].astype(np.uint8).tobytes()
                states = kmer_index.get(seed, [])
                ok = bool(states) and cursor + len(states) <= self.cfg.pool
                if ok:
                    for s in states:
                        if len(s.traversed) > P or len(s.traversing) > P:
                            ok = False
                            break
                if not ok:
                    host_rows.add(row)
                    continue
                for s in states:
                    read_id[cursor] = row
                    lo[cursor] = s.lo
                    hi[cursor] = s.hi
                    for pi, locus in enumerate(s.traversed):
                        trav[cursor, pi] = locus
                    n_trav[cursor] = len(s.traversed)
                    for pi, locus in enumerate(s.traversing):
                        ing[cursor, pi] = locus
                    n_ing[cursor] = len(s.traversing)
                    cursor += 1
                body = read[: read.size - k][::-1]
                reads_T[: body.size, row] = body

        if steps > 0 and cursor > 0:
            import logging
            import time
            t0 = time.perf_counter()
            fn = make_flat_search(self.di, self.cfg, R)
            out = fn(jnp.asarray(reads_T), jax.device_put(carry))
            jax.block_until_ready(out)
            carry_np = jax.tree_util.tree_map(np.asarray, out)
            logging.getLogger("gramtools_tpu").debug(
                "device search: %d rows, %d seed states, %.2fs",
                len(rows), cursor, time.perf_counter() - t0)
        else:
            carry_np = carry
        (f_read_id, f_lo, f_hi, f_trav, f_n_trav, f_ing, f_n_ing,
         overflow) = carry_np

        # group final pool states by read
        per_row_states: dict = {}
        order = np.argsort(f_read_id, kind="stable")
        for pi in order:
            r = int(f_read_id[pi])
            if r < 0:
                continue
            nt, ni = int(f_n_trav[pi]), int(f_n_ing[pi])
            state = SearchState(
                int(f_lo[pi]), int(f_hi[pi]),
                tuple(map(tuple, f_trav[pi, :nt].tolist())),
                tuple(map(tuple, f_ing[pi, :ni].tolist())))
            per_row_states.setdefault(r, []).append(state)

        for row, (i, read) in enumerate(rows):
            if row in host_rows or bool(overflow[row]):
                self.host_fallbacks += 1
                seed = read[read.size - k:].astype(np.uint8).tobytes()
                seed_states = kmer_index.get(seed, [])
                states = (search_read_backwards(read, seed_states, k, self.idx)
                          if seed_states else [])
            else:
                self.device_mapped += 1
                states = handle_allele_encapsulated_states(
                    per_row_states.get(row, []), self.idx)
            results[i].append((states, int(read.size)))
        return results
