"""Native C++/OpenMP quasimap baseline (native/quasimap.cpp) vs the host
scalar engine: the compiled baseline used by bench.py must produce the
same final SA intervals as the reference-semantics Python oracle.
"""
import numpy as np
import pytest

from gramtools_tpu.index.build import build_prg_index
from gramtools_tpu.index.kmer_index import build_kmer_index
from gramtools_tpu.index.native import cpu_quasimap_baseline, get_native_lib
from gramtools_tpu.mapping.jump_table import build_jump_table
from gramtools_tpu.mapping.search import (
    process_markers_search_states, search_base_backwards)
from gramtools_tpu.prg.linearise import PrgString, prg_string_to_ints

from test_search_jax import HARD_NESTED_PRGS, random_prg

pytestmark = pytest.mark.skipif(
    get_native_lib() is None
    or not hasattr(get_native_lib(), "gram_tpu_cpu_quasimap"),
    reason="native library unavailable")


def host_scan_states(read, seed_states, k, idx):
    """The scalar engine's per-base loop WITHOUT the final encapsulated-
    state split (the C++ baseline measures the search scan only)."""
    states = seed_states
    for pos in range(len(read) - k - 1, -1, -1):
        base = int(read[pos])
        if base == 0:
            return []
        states = process_markers_search_states(states, idx)
        states = search_base_backwards(base, states, idx)
        if not states:
            break
    return states


@pytest.mark.parametrize("seed,nested", [(0, False), (2, True), (4, True),
                                         (100, "hard0"), (101, "hard1"),
                                         (102, "hard2")])
def test_cpu_baseline_matches_host(seed, nested):
    rng = np.random.RandomState(seed)
    if isinstance(nested, str):
        prg_str = HARD_NESTED_PRGS[int(nested[-1])]
    else:
        prg_str = random_prg(rng, nested=nested)
    try:
        prg = PrgString(prg_string_to_ints(prg_str))
        idx = build_prg_index(prg)
    except ValueError:
        pytest.skip("randomly generated inconsistent PRG")
    k = 3
    kmer_index = build_kmer_index(idx, k)
    jt = build_jump_table(idx)

    # reads sampled from the PRG's non-marker symbols + random reads
    syms = np.asarray(prg.ints)
    dna = syms[syms <= 4].astype(np.uint8)
    reads = []
    for _ in range(40):
        if rng.rand() < 0.7 and dna.size >= 8:
            start = rng.randint(0, dna.size - 7)
            reads.append(dna[start : start + rng.randint(5, 8)].copy())
        else:
            reads.append(rng.randint(1, 5, size=rng.randint(5, 9))
                         .astype(np.uint8))

    rows = []           # (read, seed_states)
    for read in reads:
        seed = read[read.size - k:].astype(np.uint8).tobytes()
        states = kmer_index.get(seed)
        if states:
            rows.append((read, states))
    if not rows:
        pytest.skip("no seedable reads")

    max_steps = max(r.size - k for r, _ in rows)
    reads_arr = np.zeros((len(rows), max(max_steps, 1)), dtype=np.int32)
    n_steps = np.zeros(len(rows), dtype=np.int32)
    seed_ptr = [0]
    seed_lo, seed_hi = [], []
    for i, (read, states) in enumerate(rows):
        body = read[: read.size - k][::-1]
        reads_arr[i, : body.size] = body
        n_steps[i] = body.size
        for s in states:
            seed_lo.append(s.lo)
            seed_hi.append(s.hi)
        seed_ptr.append(len(seed_lo))

    result = cpu_quasimap_baseline(
        idx, jt, reads_arr, n_steps, np.array(seed_ptr, dtype=np.int64),
        np.array(seed_lo, dtype=np.int32), np.array(seed_hi, dtype=np.int32),
        iv_cap=64, num_threads=2)
    assert result is not None
    out_states, total, out_iv = result

    checked = 0
    for i, (read, states) in enumerate(rows):
        expected = host_scan_states(read, states, k, idx)
        exp_iv = sorted((s.lo, s.hi) for s in expected)
        assert out_states[i] == len(expected), (i, prg_str)
        got_iv = sorted(map(tuple, out_iv[i, : out_states[i]].tolist()))
        assert got_iv == exp_iv, (i, prg_str)
        checked += 1
    assert checked == len(rows)
    assert total == int(np.maximum(out_states, 0).sum())
