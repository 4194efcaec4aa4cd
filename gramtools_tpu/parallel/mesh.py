"""Multi-chip data parallelism: reads sharded over a device mesh,
coverage merged with psum.

The reference's scaling story is OpenMP threads over a 5,000-read buffer
with atomic coverage updates (quasimap.cpp:90-117, §2.3 of SURVEY). The
TPU-native equivalent: the vBWT index is replicated across the mesh,
read batches are sharded over the 'data' axis with shard_map, each shard
runs the same fixed-shape search scan, and the dense per-site coverage
accumulators are all-reduced with psum over ICI -- no locks, no atomics.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..mapping.search_jax import (
    MAX_PATH,
    MAX_STATES,
    DeviceIndex,
    _build_search_step,
    empty_carry,
)


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def make_sharded_quasimap(mesh: Mesh, di: DeviceIndex, num_sites: int,
                          max_alleles: int):
    """Returns a jitted step: (reads_T, carry) -> (final_carry, coverage).

    reads_T (steps, R) and carry are sharded over rows (R) on the 'data'
    axis; the returned allele-sum-style coverage (num_sites, max_alleles)
    is psum-reduced across the mesh, so every host sees the global
    accumulation -- the analogue of the reference's shared-memory
    atomic-add coverage, as one collective.
    """
    def shard_fn(di, reads_T, carry):
        step = _build_search_step(di)
        final_carry, _ = jax.lax.scan(step, carry, reads_T)
        lo, hi, valid, trav, n_trav, ing, n_ing, overflow = final_carry

        # dense per-(site, allele) coverage from the traversed loci of all
        # valid final states (device-side accumulate; the exact
        # RNG-selected recording runs on host -- this array drives the
        # scaling path and read-depth screens)
        site_idx = (trav[..., 0] - 5) // 2                     # (R,S,P)
        allele_idx = trav[..., 1]
        in_path = (jnp.arange(MAX_PATH)[None, None, :]
                   < n_trav[:, :, None]) & valid[:, :, None]
        flat = jnp.where(in_path,
                         site_idx * max_alleles + jnp.clip(allele_idx, 0),
                         num_sites * max_alleles)
        cov = jnp.zeros(num_sites * max_alleles + 1, dtype=jnp.int32)
        cov = cov.at[flat.reshape(-1)].add(1)
        cov = cov[:-1].reshape(num_sites, max_alleles)
        cov = jax.lax.psum(cov, axis_name="data")
        return final_carry, cov

    di_specs = jax.tree_util.tree_map(lambda _: P(), di)  # index replicated
    sharded = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(di_specs, P(None, "data"), (P("data"),) * 7 + (P("data"),)),
        out_specs=((P("data"),) * 7 + (P("data"),), P(None, None)),
        check_vma=False,
    )
    jitted = jax.jit(sharded)
    return partial(jitted, di)


def run_sharded_quasimap(mesh: Mesh, di: DeviceIndex, reads: "list[np.ndarray]",
                         num_sites: int, max_alleles: int,
                         kmer_size: int = 0):
    """Full-read (seedless) sharded mapping of a batch of same-length
    reads; returns (final_carry, global_coverage). Row count is padded
    to a multiple of the mesh size."""
    n_dev = mesh.devices.size
    R = len(reads)
    R_pad = ((R + n_dev - 1) // n_dev) * n_dev
    max_len = max(r.size for r in reads)
    steps = max_len - 1
    reads_T = np.zeros((steps, R_pad), dtype=np.int32)
    carry = empty_carry(R_pad)
    lo, hi, valid = carry[0], carry[1], carry[2]
    # seed each row with the full SA interval extended by its last base
    # (host-side: one LF step), remaining bases stream through the scan
    occ = np.asarray(di.occ)
    sym_start = np.asarray(di.sym_start)
    for row, read in enumerate(reads):
        base = int(read[-1])
        first = sym_start[base]
        lo[row, 0] = first
        hi[row, 0] = first + occ[di.size, base - 1] - 1
        valid[row, 0] = lo[row, 0] <= hi[row, 0]
        body = read[:-1][::-1]
        reads_T[: body.size, row] = body

    fn = make_sharded_quasimap(mesh, di, num_sites, max_alleles)
    return fn(jnp.asarray(reads_T), jax.device_put(carry))


# --- flat-pool engine over the mesh ----------------------------------------


def make_sharded_flat_quasimap(mesh: Mesh, di: DeviceIndex, cfg,
                               reads_per_shard: int, num_sites: int,
                               max_alleles: int):
    """Data-parallel flat-pool search (search_jax_flat): each shard owns a
    local state pool + its slice of the read batch; per-site coverage is
    accumulated from final traversed paths and psum-reduced over ICI."""
    from ..mapping.search_jax_flat import _build_flat_step

    def shard_fn(di, reads_T, carry):
        step = _build_flat_step(di, cfg, reads_per_shard)
        final, _ = jax.lax.scan(step, carry, reads_T)
        read_id, lo, hi, trav, n_trav, ing, n_ing, overflow = final

        valid = read_id >= 0
        site_idx = (trav[..., 0] - 5) // 2                    # (N,P)
        allele_idx = trav[..., 1]
        in_path = (jnp.arange(trav.shape[1])[None, :]
                   < n_trav[:, None]) & valid[:, None]
        flat = jnp.where(in_path,
                         site_idx * max_alleles + jnp.clip(allele_idx, 0),
                         num_sites * max_alleles)
        cov = jnp.zeros(num_sites * max_alleles + 1, dtype=jnp.int32)
        cov = cov.at[flat.reshape(-1)].add(1)
        cov = cov[:-1].reshape(num_sites, max_alleles)
        cov = jax.lax.psum(cov, axis_name="data")
        return final, cov

    di_specs = jax.tree_util.tree_map(lambda _: P(), di)
    carry_specs = (P("data"),) * 7 + (P("data"),)
    sharded = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(di_specs, P(None, "data"), carry_specs),
        out_specs=(carry_specs, P(None, None)),
        check_vma=False,
    )
    return partial(jax.jit(sharded), di)


def make_sharded_log_search(mesh: Mesh, di: DeviceIndex, cfg,
                            reads_per_shard: int, phases=None):
    """Data-parallel PRODUCTION engine (genealogy-log scan,
    search_jax_log): reads_T columns and the carry shard over 'data',
    the index is replicated, and each shard runs the identical phased
    scan. Per-shard genealogy logs return sharded (concatenated in
    shard order, each of the static per-shard length), so the host-side
    replay/recording pipeline applies per shard unchanged. Combine with
    parallel/sharded_index.py for a ('data', 'idx') mesh when the occ
    table itself must shard."""
    import functools

    from ..mapping.search_jax_log import _log_search_phases, auto_phases

    def shard_fn(di_rep, reads_T, carry, p):
        return _log_search_phases(di_rep, reads_T, carry, p, reads_per_shard)

    di_specs = jax.tree_util.tree_map(lambda _: P(), di)
    carry_specs = (P("data"),) * 5
    log_spec = (P("data"), P("data"))

    @functools.lru_cache(maxsize=None)
    def build(p):
        sharded = shard_map(
            functools.partial(shard_fn, p=p), mesh=mesh,
            in_specs=(di_specs, P(None, "data"), carry_specs),
            out_specs=(carry_specs, log_spec),
            check_vma=False,
        )
        return jax.jit(sharded)

    def run(reads_T, carry):
        p = phases
        if p is None:
            p = auto_phases(reads_T.shape[0], reads_per_shard, cfg)
        return build(tuple(p))(di, reads_T, carry)

    return run


class MeshLogEngine:
    """Data-parallel PRODUCTION mapping engine over a device mesh.

    Drop-in for ``quasimap_reads(engine=...)`` via the ``search_buffer``
    contract: each buffer's mappable (read, orientation) rows are
    interleaved round-robin across the mesh's 'data' axis, every shard
    runs the identical phased genealogy-log scan
    (mapping/search_jax_log.py) on its row slice, and the per-shard
    logs/carries come back sharded for the host replay. Selection +
    coverage recording then run through the exact scalar recorder, whose
    per-read seeded RNG (SURVEY §7.1 determinism) makes results
    shard-count invariant by construction -- the multi-chip analogue of
    the reference's OpenMP buffer loop (quasimap.cpp:90-117) with no
    atomics.
    """

    def __init__(self, idx, kmer_size: int, mesh: Optional[Mesh] = None,
                 cfg=None):
        from ..mapping.jump_table import build_jump_table
        from ..mapping.search_jax_log import LogConfig, PathReplayer

        self.idx = idx
        self.kmer_size = kmer_size
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_shards = int(self.mesh.devices.size)
        self.jt = build_jump_table(idx)
        self.di = DeviceIndex.build(idx, self.jt)
        self.cfg = cfg if cfg is not None else LogConfig()
        self.replayer = PathReplayer(self.jt, self.di.n_outcomes)
        self.host_fallbacks = 0
        self.device_mapped = 0
        self.device_retried = 0
        self._run_cache: dict = {}

    def _runner(self, R_shard: int, phases):
        key = (R_shard, phases)
        if key not in self._run_cache:
            self._run_cache[key] = make_sharded_log_search(
                self.mesh, self.di, self.cfg, R_shard, phases=phases)
        return self._run_cache[key]

    def search_buffer(self, buffer, kmer_index, kmer_size, stats):
        from ..mapping.search import (handle_allele_encapsulated_states,
                                      search_read_backwards)
        from ..mapping.search_jax import _round_up
        from ..mapping.search_jax_log import (
            _filter_buffer_rows, _row_capacity, auto_phases)

        k = kmer_size
        results, rows, rows_mat = _filter_buffer_rows(buffer, kmer_index, k,
                                                      stats)
        if not rows:
            return results
        n = len(rows)
        S = self.n_shards
        # row r -> shard r % S, local column r // S (round-robin keeps
        # shards balanced when n is not a multiple of S)
        R_shard = _row_capacity(-(-n // S))
        R_total = R_shard * S
        max_len = max(r.size for _, r in rows)
        steps = _round_up(max(max_len - k, 0), 16)

        # vectorised seeding (the array-backed kmer index is required --
        # the oracle dict index has no seed_batch)
        if rows_mat is not None:
            last_kmers = rows_mat[:, rows_mat.shape[1] - k:]
        else:
            last_kmers = np.stack([r[r.size - k:] for _, r in rows])
        owner, s_lo, s_hi, s_trav, s_nt, s_ing, s_ni = \
            kmer_index.seed_batch(last_kmers)

        # per-shard seed placement
        shard_of = owner % S
        counts = np.bincount(shard_of, minlength=S)
        phases = auto_phases(steps, R_shard, self.cfg,
                             n_seed_states=int(counts.max(initial=0)))
        pool0 = phases[0][1]
        host_rows = set()
        read_id = np.full(S * pool0, -1, dtype=np.int32)
        lo = np.zeros(S * pool0, dtype=np.int32)
        hi = np.zeros(S * pool0, dtype=np.int32)
        pref = np.zeros(S * pool0, dtype=np.int32)
        overflow = np.zeros(S * R_shard, dtype=bool)
        cursors = np.zeros(S, dtype=np.int64)
        for g in range(owner.size):
            row = int(owner[g])
            s = row % S
            if cursors[s] >= pool0:
                host_rows.add(row)
                continue
            slot = s * pool0 + cursors[s]
            read_id[slot] = row // S          # local row id in shard
            lo[slot] = s_lo[g]
            hi[slot] = s_hi[g]
            pref[slot] = -(g + 1)             # global seed index
            cursors[s] += 1
        seeded = set(int(r) for r in np.unique(owner))
        for row in range(n):
            if row not in seeded:
                host_rows.add(row)

        reads_T = np.zeros((steps, R_total), dtype=np.uint8)
        for row, (i, read) in enumerate(rows):
            col = (row % S) * R_shard + row // S
            body = read[: read.size - k][::-1]
            reads_T[: body.size, col] = body

        run = self._runner(R_shard, tuple(phases))
        carry = (read_id, lo, hi, pref, overflow)
        carry_f, (lp, le) = run(jnp.asarray(reads_T), jax.device_put(carry))
        f_rid, f_lo, f_hi, f_pref, ovf = (np.asarray(a) for a in carry_f)
        lp = np.asarray(lp)
        le = np.asarray(le)
        # per-shard log records concatenate in shard order: globalise
        # every non-negative parent pointer by its shard's log offset
        # (negative = global seed index already)
        L = lp.size // S
        lp = lp.reshape(S, L)
        lp = np.where(lp >= 0, lp + np.arange(S, dtype=lp.dtype)[:, None] * L,
                      lp).reshape(-1)
        pool_f = f_rid.size // S

        def seed_paths(gi):
            nt, ni = int(s_nt[gi]), int(s_ni[gi])
            return (tuple(map(tuple, s_trav[gi, :nt].tolist())),
                    tuple(map(tuple, s_ing[gi, :ni].tolist())))

        per_row_states: dict = {}
        for s in range(S):
            seg = slice(s * pool_f, (s + 1) * pool_f)
            rid_s = f_rid[seg]
            for j in np.flatnonzero(rid_s >= 0):
                row = int(rid_s[j]) * S + s
                if row >= n:
                    continue
                p = int(f_pref[seg][j])
                if p >= 0:
                    p += s * L
                trav, ing = self.replayer.replay(p, lp, le, seed_paths)
                from ..mapping.search import SearchState
                state = SearchState(int(f_lo[seg][j]), int(f_hi[seg][j]),
                                    trav, ing)
                per_row_states.setdefault(row, []).append(state)

        ovf_rows = np.zeros(n, dtype=bool)
        for s in range(S):
            seg = ovf[s * R_shard : (s + 1) * R_shard]
            for local in np.flatnonzero(seg):
                row = int(local) * S + s
                if row < n:
                    ovf_rows[row] = True

        for row, (i, read) in enumerate(rows):
            if row in host_rows or ovf_rows[row]:
                self.host_fallbacks += 1
                seed = read[read.size - k:].astype(np.uint8).tobytes()
                seed_states = kmer_index.get(seed, [])
                states = (search_read_backwards(read, seed_states, k,
                                                self.idx)
                          if seed_states else [])
            else:
                self.device_mapped += 1
                states = handle_allele_encapsulated_states(
                    per_row_states.get(row, []), self.idx)
            results[i].append((states, int(read.size)))
        return results


def run_sharded_flat_quasimap(mesh: Mesh, di: DeviceIndex,
                              reads: "list[np.ndarray]", num_sites: int,
                              max_alleles: int):
    """Seedless sharded mapping of same-length reads through the flat
    engine; returns (final_carry, global_coverage)."""
    from ..mapping.search_jax_flat import FlatConfig, empty_flat_carry

    n_dev = mesh.devices.size
    R = ((len(reads) + n_dev - 1) // n_dev) * n_dev
    reads_per_shard = R // n_dev
    pool_per_shard = max(4 * reads_per_shard, 8)
    shard_cfg = FlatConfig(pool=pool_per_shard,
                           hits=max(reads_per_shard // 2, 8))
    global_cfg = FlatConfig(pool=pool_per_shard * n_dev,
                            hits=shard_cfg.hits * n_dev)

    max_len = max(r.size for r in reads)
    steps = max_len - 1
    reads_T = np.zeros((steps, R), dtype=np.int32)
    carry = empty_flat_carry(R, global_cfg)
    read_id, lo, hi = carry[0], carry[1], carry[2]

    occ = np.asarray(di.occ)
    sym_start = np.asarray(di.sym_start)
    for row, read in enumerate(reads):
        shard = row // reads_per_shard
        local_row = row % reads_per_shard
        slot = shard * pool_per_shard + local_row  # one seed state per read
        base = int(read[-1])
        first = sym_start[base]
        read_id[slot] = local_row
        lo[slot] = first
        hi[slot] = first + occ[di.size, base - 1] - 1
        if lo[slot] > hi[slot]:
            read_id[slot] = -1
        body = read[:-1][::-1]
        reads_T[: body.size, row] = body

    fn = make_sharded_flat_quasimap(mesh, di, shard_cfg, reads_per_shard,
                                    num_sites, max_alleles)
    return fn(jnp.asarray(reads_T), jax.device_put(carry))
