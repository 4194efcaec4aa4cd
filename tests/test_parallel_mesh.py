"""Mesh-sharded engine paths beyond the fused-record pipeline (which
tests/test_mesh_engine.py pins): the non-fused search_buffer states,
the sharded overflow->retry pass, and the dict-index fail-fast."""
import numpy as np
import pytest

from gramtools_tpu.common.seq import encode_dna, revcomp
from gramtools_tpu.index.build import build_prg_index
from gramtools_tpu.index.kmer_index import build_kmer_index
from gramtools_tpu.index.kmer_index_vec import build_kmer_index_vectorised
from gramtools_tpu.mapping.quasimap import all_read_kmers_in_index
from gramtools_tpu.mapping.search import search_read_backwards
from gramtools_tpu.mapping.search_jax_log import LogConfig
from gramtools_tpu.parallel.mesh import MeshLogEngine, make_mesh
from gramtools_tpu.prg.linearise import PrgString, prg_string_to_ints

PRG = "ACGT[AC,GT]TTACG[A,C]ACACGTT[TG,AA]CGT"


class _Stats:
    all_reads_count = 0
    skipped_reads_count = 0
    missing_kmer_reads_count = 0
    no_extension_reads_count = 0
    exact_mapped_reads_count = 0


def _states_key(states):
    return sorted((s.lo, s.hi, s.traversed, s.traversing) for s in states)


def _expected(reads, kmer_index, idx, k):
    out = []
    for read in reads:
        exp = []
        for oriented in (read, revcomp(read)):
            if not all_read_kmers_in_index(k, oriented, kmer_index):
                continue
            seed = oriented[oriented.size - k:].astype(np.uint8).tobytes()
            seed_states = kmer_index.get(seed, [])
            states = (search_read_backwards(oriented, seed_states, k, idx)
                      if seed_states else [])
            exp.append((states, int(oriented.size)))
        out.append(exp)
    return out


@pytest.mark.parametrize("n_devices", [1, 2, 8])
def test_mesh_search_buffer_matches_host(n_devices):
    """Non-fused path: per-read SearchStates equal the scalar oracle at
    every shard count (device_record off forces the packed scan +
    host replay)."""
    idx = build_prg_index(PrgString(prg_string_to_ints(PRG)))
    k = 3
    kmer_index = build_kmer_index_vectorised(idx, k)
    kmer_oracle = build_kmer_index(idx, k)
    rng = np.random.RandomState(3)
    reads = [rng.randint(1, 5, size=rng.randint(4, 12)).astype(np.uint8)
             for _ in range(24)]

    engine = MeshLogEngine(idx, k, mesh=make_mesh(n_devices))
    results = engine.search_buffer(reads, kmer_index, k, _Stats())
    expected = _expected(reads, kmer_oracle, idx, k)
    for got, exp in zip(results, expected):
        assert len(got) == len(exp)
        for (g_states, g_len), (e_states, e_len) in zip(got, exp):
            assert g_len == e_len
            assert _states_key(g_states) == _states_key(e_states)


def test_mesh_retry_pass_shard_count_invariant():
    """A hit-budget-starved config overflows on every shard; the retry
    pass must recover the reads identically on 1 and 8 shards."""
    rng = np.random.RandomState(7)
    tail = "".join(rng.choice(list("ACGT"), size=60))
    prg_str = "GT" + "[A,C]" * 10 + tail
    idx = build_prg_index(PrgString(prg_string_to_ints(prg_str)))
    k = 3
    kmer_index = build_kmer_index_vectorised(idx, k)
    kmer_oracle = build_kmer_index(idx, k)
    read = encode_dna("GT" + "A" * 10 + tail)
    reads = [read.copy() for _ in range(20)]
    expected = _expected(reads, kmer_oracle, idx, k)

    for n_dev in (1, 8):
        # per-shard budget: keep the TOTAL hit budget constant so the
        # scan starves (and retries) at every shard count
        engine = MeshLogEngine(idx, k, mesh=make_mesh(n_dev),
                               cfg=LogConfig(pool=512,
                                             hits=max(64 // n_dev, 8)))
        engine.retry_min = 1
        results = engine.search_buffer(reads, kmer_index, k, _Stats())
        assert engine.device_retried > 0, "retry path not exercised"
        for got, exp in zip(results, expected):
            assert len(got) == len(exp)
            for (g_states, g_len), (e_states, e_len) in zip(got, exp):
                assert g_len == e_len
                assert _states_key(g_states) == _states_key(e_states)


def test_mesh_rejects_dict_kmer_index():
    """ADVICE r2: the dict-based oracle index must fail fast with a
    clear error, not AttributeError mid-buffer."""
    idx = build_prg_index(PrgString(prg_string_to_ints(PRG)))
    k = 3
    kmer_oracle = build_kmer_index(idx, k)
    engine = MeshLogEngine(idx, k, mesh=make_mesh(2))
    reads = [encode_dna("ACGTAC")]
    with pytest.raises(TypeError, match="seed_batch"):
        engine.search_buffer(reads, kmer_oracle, k, _Stats())
