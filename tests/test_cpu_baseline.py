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


def test_cpu_e2e_baseline_mapped_flags_match_oracle():
    """Full-pipeline baseline (gram_tpu_cpu_quasimap_e2e): its per-read
    mapped verdicts (either orientation screened + seeded + scanned)
    must match the host scalar oracle's, and selected-loci tallies must
    stay within the mapped-read budget."""
    from gramtools_tpu.common.seq import revcomp
    from gramtools_tpu.index.kmer_index_vec import build_kmer_index_vectorised
    from gramtools_tpu.index.native import cpu_quasimap_e2e_baseline
    from gramtools_tpu.mapping.quasimap import all_read_kmers_in_index
    from gramtools_tpu.mapping.search import search_read_backwards

    rng = np.random.RandomState(5)
    tail = "".join(rng.choice(list("ACGT"), size=300))
    prg_str = (tail[:80] + "[A,C]" + tail[80:160] + "[AG,T]"
               + tail[160:240] + "[G,C,T]" + tail[240:])
    prg = PrgString(prg_string_to_ints(prg_str))
    idx = build_prg_index(prg)
    k = 5
    kmer_index = build_kmer_index_vectorised(idx, k)
    jt = build_jump_table(idx)

    syms = np.asarray(prg.ints)
    dna = syms[syms <= 4].astype(np.uint8)
    n_reads, L = 60, 40
    reads = np.empty((n_reads, L), dtype=np.uint8)
    for i in range(n_reads):
        start = rng.randint(0, dna.size - L)
        reads[i] = dna[start:start + L]
        if i % 3 == 2:          # a third of reads reverse-complemented
            reads[i] = revcomp(reads[i])
    seeds = rng.randint(0, 2 ** 32, size=n_reads).astype(np.uint32)

    res = cpu_quasimap_e2e_baseline(idx, jt, kmer_index, reads, seeds,
                                    n_sites=3, max_alleles=4, num_threads=2)
    assert res is not None, "native e2e baseline unavailable"
    mapped, total, allele_sum = res
    assert total == int(mapped.sum())

    expected = []
    for r in reads:
        m = False
        for oriented in (r, revcomp(r)):
            if not all_read_kmers_in_index(k, oriented, kmer_index):
                continue
            seed_states = kmer_index.get(
                oriented[oriented.size - k:].astype(np.uint8).tobytes(), [])
            states = (search_read_backwards(oriented, seed_states, k, idx)
                      if seed_states else [])
            if states:
                m = True
        expected.append(m)
    assert np.array_equal(mapped, np.asarray(expected))
    # each mapped orientation contributes at most its loci once per site
    assert allele_sum.sum() <= 2 * total * 3
