"""Slot-locked narrow tail phase equivalence (search_jax_log
_build_narrow_step(locked=True) + _lock_pool).

Production 150bp reads spend ~96% of their scan steps in the locked
phase (auto_phases: locked from step GRAMTOOLS_TPU_LOCK_AFTER=14), so
this pins, on a graph large enough that reads are ~unique:

  * the default plan engages narrow AND locked segments;
  * device results (including multi-state reads flagged to the exact
    host path) match the scalar oracle per read+orientation;
  * a repeat-heavy graph (every read multi-mapping at lock time) falls
    back to the host path and STILL matches the oracle -- locking is a
    performance trade, never a correctness one.
"""
import numpy as np
import pytest

from gramtools_tpu.index.build import build_prg_index
from gramtools_tpu.index.kmer_index import build_kmer_index
from gramtools_tpu.mapping.search import search_read_backwards
from gramtools_tpu.mapping.search_jax_log import (LogBatchedEngine,
                                                  LogConfig, auto_phases)
from gramtools_tpu.prg.linearise import PrgString, prg_string_to_ints


class _Stats:
    all_reads_count = 0
    skipped_reads_count = 0
    missing_kmer_reads_count = 0
    no_extension_reads_count = 0
    exact_mapped_reads_count = 0


def _random_site_prg(rng, genome_len, num_sites):
    seq = rng.choice(list("ACGT"), size=genome_len)
    pos = np.sort(rng.choice(np.arange(10, genome_len - 10), size=num_sites,
                             replace=False))
    parts = []
    prev = 0
    for p in pos:
        parts.append("".join(seq[prev:p]))
        ref = seq[p]
        alt = "ACGT"[("ACGT".index(ref) + 1) % 4]
        parts.append(f"[{ref},{alt}]")
        prev = p + 1
    parts.append("".join(seq[prev:]))
    return "".join(parts)


def _oracle(read, kmer_index, idx, k):
    from gramtools_tpu.common.seq import revcomp
    from gramtools_tpu.mapping.quasimap import all_read_kmers_in_index

    out = []
    for oriented in (read, revcomp(read)):
        if not all_read_kmers_in_index(k, oriented, kmer_index):
            continue
        seed_states = kmer_index.get(
            oriented[oriented.size - k:].astype(np.uint8).tobytes(), [])
        states = (search_read_backwards(oriented, seed_states, k, idx)
                  if seed_states else [])
        out.append((states, int(oriented.size)))
    return out


def _key(states):
    return sorted((s.lo, s.hi, s.traversed, s.traversing) for s in states)


def test_default_plan_has_locked_tail():
    plan = auto_phases(140, 40960, LogConfig(pool=262144, hits=20480))
    assert plan[-1][-1] == "locked"
    assert plan[-1][1] == 40960          # pool == rows: slot i <-> read i
    kinds = [e[-1] if len(e) == 5 else "" for e in plan]
    assert kinds.count("locked") == 1 and kinds[-1] == "locked"
    # narrow (hole-allocated) segment sits between the wide warm-up and
    # the locked tail
    assert any(len(e) == 4 for e in plan)


def test_locked_tail_matches_oracle():
    rng = np.random.RandomState(7)
    prg_str = _random_site_prg(rng, 4000, 40)
    idx = build_prg_index(PrgString(prg_string_to_ints(prg_str)))
    k = 5
    kmer_index = build_kmer_index(idx, k)
    engine = LogBatchedEngine(idx, k, LogConfig(pool=4096, hits=256))

    # 60bp reads -> 55 steps: warm 2, mid 4, narrow 8, locked 41
    reads = []
    dna = idx.prg[(idx.prg >= 1) & (idx.prg <= 4)].astype(np.uint8)
    for _ in range(40):
        start = rng.randint(0, dna.size - 60)
        reads.append(dna[start:start + 60].copy())
    for _ in range(10):     # random reads: mostly unmappable
        reads.append(rng.randint(1, 5, size=60).astype(np.uint8))

    results = engine.search_buffer(reads, kmer_index, k, _Stats())
    for i, read in enumerate(reads):
        expected = _oracle(read, kmer_index, idx, k)
        assert len(results[i]) == len(expected)
        for (got, gl), (exp, el) in zip(results[i], expected):
            assert gl == el
            assert _key(got) == _key(exp)


def test_repeat_heavy_graph_still_exact(monkeypatch):
    # tandem-duplicated genome: every read maps twice. A multi-mapped
    # read is ONE state with a WIDE interval (hi > lo), which the
    # locked step's wide-budget sub-path keeps on device -- this pins
    # that repeats neither corrupt results nor force host fallbacks
    monkeypatch.setenv("GRAMTOOLS_TPU_LOCK_AFTER", "6")
    rng = np.random.RandomState(3)
    unit = "".join(rng.choice(list("ACGT"), size=600))
    prg_str = unit + "[A,C]" + unit
    idx = build_prg_index(PrgString(prg_string_to_ints(prg_str)))
    k = 4
    kmer_index = build_kmer_index(idx, k)
    engine = LogBatchedEngine(idx, k, LogConfig(pool=2048, hits=128))

    reads = []
    enc = np.frombuffer(unit.encode(), dtype="S1")
    lut = {b"A": 1, b"C": 2, b"G": 3, b"T": 4}
    unit_i = np.array([lut[bytes(c)] for c in enc], dtype=np.uint8)
    for _ in range(20):
        start = rng.randint(0, unit_i.size - 30)
        reads.append(unit_i[start:start + 30].copy())

    results = engine.search_buffer(reads, kmer_index, k, _Stats())
    assert engine.device_mapped > 0        # wide states stay on device
    for i, read in enumerate(reads):
        expected = _oracle(read, kmer_index, idx, k)
        assert len(results[i]) == len(expected)
        for (got, gl), (exp, el) in zip(results[i], expected):
            assert gl == el
            assert _key(got) == _key(exp)
