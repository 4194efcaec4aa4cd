"""SA-range index sharding (parallel/sharded_index): the occ table is
partitioned over an 'idx' mesh axis and gathers are reconstructed by
psum of per-shard masked lookups. The sharded search must be bit-equal
to the replicated log engine, including over a combined ('data','idx')
mesh (reads x index sharding)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from gramtools_tpu.index.build import build_prg_index
from gramtools_tpu.mapping.device_index import DeviceIndex
from gramtools_tpu.mapping.search_jax_log import (
    LogConfig,
    empty_log_carry,
    make_log_search,
)
from gramtools_tpu.parallel.sharded_index import make_index_sharded_log_search
from gramtools_tpu.prg.linearise import PrgString, prg_string_to_ints

PRG = ("ACGTACGT[AC,GT]TTACG[A,C,GG]ACACG"
       "[T[A,C]G,AA]CGTACGTTTT[AAA,]GGGCACGT")


@pytest.fixture(scope="module")
def setup():
    idx = build_prg_index(PrgString(prg_string_to_ints(PRG)))
    di = DeviceIndex.build(idx)
    return idx, di


def seeded_batch(idx, rng, n_reads, length, cfg):
    """reads_T + carry with one full-interval seed state per read."""
    ref_path = idx.prg[idx.prg <= 4].astype(np.int32)
    starts = rng.randint(0, ref_path.size - length, size=n_reads)
    reads = np.stack([ref_path[s:s + length][::-1] for s in starts])
    carry = empty_log_carry(n_reads, cfg)
    read_id, lo, hi, pref, _ = carry
    for row in range(n_reads):
        read_id[row] = row
        lo[row] = 0
        hi[row] = idx.fm.size - 1
        pref[row] = -(row + 1)
    return jnp.asarray(reads.T), carry


def assert_same(out_a, out_b):
    carry_a, logs_a = out_a
    carry_b, logs_b = out_b
    for a, b in zip(carry_a, carry_b):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(logs_a, logs_b):
        assert np.array_equal(np.asarray(a), np.asarray(b))


PHASES = ((4, 64, 16), (12, 32, 8))


@pytest.mark.parametrize("n_idx", [2, 4, 8])
def test_idx_sharded_equals_replicated(setup, n_idx):
    idx, di = setup
    cfg = LogConfig(pool=64, hits=16)
    R = 6
    reads_T, carry = seeded_batch(idx, np.random.RandomState(0), R, 16, cfg)

    ref = make_log_search(di, cfg, R, phases=PHASES)(
        reads_T, jax.device_put(carry))

    mesh = Mesh(np.array(jax.devices()[:n_idx]), axis_names=("idx",))
    run = make_index_sharded_log_search(mesh, di, cfg, R, phases=PHASES)
    out = run(reads_T, jax.device_put(carry))
    assert_same(out, ref)


def test_data_and_idx_sharded(setup):
    """(2, 4) mesh: reads split over 'data', occ split over 'idx'; each
    data shard's final carry and log equal an unsharded run on its
    half of the batch."""
    idx, di = setup
    cfg = LogConfig(pool=64, hits=16)
    R_shard, length = 4, 16
    rng = np.random.RandomState(1)
    rt0, c0 = seeded_batch(idx, rng, R_shard, length, cfg)
    rt1, c1 = seeded_batch(idx, rng, R_shard, length, cfg)

    ref0 = make_log_search(di, cfg, R_shard, phases=PHASES)(
        rt0, jax.device_put(c0))
    ref1 = make_log_search(di, cfg, R_shard, phases=PHASES)(
        rt1, jax.device_put(c1))

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                axis_names=("data", "idx"))
    run = make_index_sharded_log_search(mesh, di, cfg, R_shard, phases=PHASES)
    reads_T = jnp.concatenate([rt0, rt1], axis=1)
    carry = tuple(np.concatenate([a, b]) for a, b in zip(c0, c1))
    (read_id, lo, hi, pref, ovf), (lp, le) = run(
        reads_T, jax.device_put(carry))

    pool_f = np.asarray(ref0[0][0]).shape[0]  # final per-shard pool
    for shard, ref in enumerate((ref0, ref1)):
        (r_id, r_lo, r_hi, r_pref, r_ovf), (r_lp, r_le) = ref
        s = slice(shard * pool_f, (shard + 1) * pool_f)
        assert np.array_equal(np.asarray(read_id)[s], np.asarray(r_id))
        assert np.array_equal(np.asarray(lo)[s], np.asarray(r_lo))
        assert np.array_equal(np.asarray(hi)[s], np.asarray(r_hi))
        assert np.array_equal(np.asarray(pref)[s], np.asarray(r_pref))
        so = slice(shard * R_shard, (shard + 1) * R_shard)
        assert np.array_equal(np.asarray(ovf)[so], np.asarray(r_ovf))
        L = np.asarray(r_lp).size
        sl = slice(shard * L, (shard + 1) * L)
        assert np.array_equal(np.asarray(lp)[sl], np.asarray(r_lp))
        assert np.array_equal(np.asarray(le)[sl], np.asarray(r_le))


def test_occ_shard_memory(setup):
    """Each device holds only its occ slice: per-shard rows ~= total/D."""
    from gramtools_tpu.parallel.sharded_index import shard_occ

    _, di = setup
    occ = np.asarray(di.occ)
    padded, rows_per_shard = shard_occ(occ, 8)
    assert rows_per_shard == -(-occ.shape[0] // 8)
    assert padded.shape[0] == rows_per_shard * 8
    assert np.array_equal(padded[:occ.shape[0]], occ)


def test_data_parallel_log_search(setup):
    """Pure data-parallel production engine (parallel/mesh.py
    make_sharded_log_search): each shard's result equals an unsharded
    run on its slice of the batch."""
    from gramtools_tpu.parallel.mesh import make_sharded_log_search

    idx, di = setup
    cfg = LogConfig(pool=64, hits=16)
    R_shard, length = 4, 16
    n_dev = 4
    rng = np.random.RandomState(2)
    parts = [seeded_batch(idx, rng, R_shard, length, cfg)
             for _ in range(n_dev)]
    refs = [make_log_search(di, cfg, R_shard, phases=PHASES)(
        rt, jax.device_put(c)) for rt, c in parts]

    mesh = Mesh(np.array(jax.devices()[:n_dev]), axis_names=("data",))
    run = make_sharded_log_search(mesh, di, cfg, R_shard, phases=PHASES)
    reads_T = jnp.concatenate([rt for rt, _ in parts], axis=1)
    carry = tuple(np.concatenate(cs) for cs in zip(*[c for _, c in parts]))
    (read_id, lo, hi, pref, ovf), (lp, le) = run(reads_T,
                                                 jax.device_put(carry))

    pool_f = np.asarray(refs[0][0][0]).shape[0]
    L = np.asarray(refs[0][1][0]).size
    for shard, ref in enumerate(refs):
        (r_id, r_lo, r_hi, r_pref, r_ovf), (r_lp, r_le) = ref
        s = slice(shard * pool_f, (shard + 1) * pool_f)
        assert np.array_equal(np.asarray(read_id)[s], np.asarray(r_id))
        assert np.array_equal(np.asarray(lo)[s], np.asarray(r_lo))
        assert np.array_equal(np.asarray(hi)[s], np.asarray(r_hi))
        assert np.array_equal(np.asarray(pref)[s], np.asarray(r_pref))
        so = slice(shard * R_shard, (shard + 1) * R_shard)
        assert np.array_equal(np.asarray(ovf)[so], np.asarray(r_ovf))
        sl = slice(shard * L, (shard + 1) * L)
        assert np.array_equal(np.asarray(lp).reshape(-1)[sl],
                              np.asarray(r_lp).reshape(-1))
        assert np.array_equal(np.asarray(le).reshape(-1)[sl],
                              np.asarray(r_le).reshape(-1))
