"""Benchmark: batched vBWT quasimap throughput on one TPU chip.

Workload (BASELINE.md): an M. tuberculosis-scale genome graph (4.4Mb,
SNP-dense -- 100k biallelic sites, the reference's primary production
use case) with 150bp reads sampled from random haplotype paths. The
metric is device-mapped reads/sec/chip through the batched search scan
(search_jax): the exact per-base vBWT extension loop that dominates the
reference's runtime (SURVEY.md §3.2 hot loops).

vs_baseline: speedup over this package's host (scalar, reference-
semantics) engine on the same workload -- the reference repo publishes
no benchmark numbers (BASELINE.md), so the scalar engine is the
recorded baseline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

import numpy as np

GENOME_MB = float(os.environ.get("BENCH_GENOME_MB", "4.4"))
NUM_SITES = int(os.environ.get("BENCH_NUM_SITES", "100000"))
READ_LEN = int(os.environ.get("BENCH_READ_LEN", "150"))
KMER_SIZE = int(os.environ.get("BENCH_KMER_SIZE", "10"))
BATCH = int(os.environ.get("BENCH_BATCH", "4096"))
BATCHES = int(os.environ.get("BENCH_BATCHES", "8"))
HOST_READS = int(os.environ.get("BENCH_HOST_READS", "20"))
ENGINE = os.environ.get("BENCH_ENGINE", "log")  # log | flat


def build_synthetic_mtb_graph(rng, genome_len, num_sites):
    """Linear PRG: random genome with evenly spread biallelic SNPs."""
    seq = rng.randint(1, 5, size=genome_len).astype(np.uint32)
    positions = np.sort(rng.choice(np.arange(1, genome_len - 1), size=num_sites,
                                   replace=False))
    out = np.empty(genome_len + 4 * num_sites, dtype=np.uint32)
    cursor = 0
    prev = 0
    for i, pos in enumerate(positions):
        site = 5 + 2 * i
        chunk = seq[prev:pos]
        out[cursor : cursor + chunk.size] = chunk
        cursor += chunk.size
        ref_base = seq[pos]
        alt_base = ref_base % 4 + 1
        out[cursor : cursor + 5] = [site, ref_base, site + 1, alt_base, site + 1]
        cursor += 5
        prev = pos + 1
    chunk = seq[prev:]
    out[cursor : cursor + chunk.size] = chunk
    cursor += chunk.size
    return out[:cursor]


def sample_reads(rng, prg_ints, n_reads, read_len):
    """Reads from random haplotype paths (random allele at each site)."""
    markers = prg_ints > 4
    # haplotype: drop markers, pick ref or alt per site
    is_site = (prg_ints > 4) & (prg_ints % 2 == 1)
    # reconstruct per-position allele membership for biallelic SNP prg:
    # layout ... site ref alt_marker alt alt_marker ...
    site_pos = np.flatnonzero(is_site)
    keep = ~markers
    ref_mask = keep.copy()
    alt_mask = keep.copy()
    ref_mask[site_pos + 3] = False  # drop alt base from ref path
    alt_mask[site_pos + 1] = False  # drop ref base from alt path
    ref_path = prg_ints[ref_mask].astype(np.uint8)
    alt_path = prg_ints[alt_mask].astype(np.uint8)
    assert ref_path.size == alt_path.size
    reads = np.empty((n_reads, read_len), dtype=np.uint8)
    for i in range(n_reads):
        path = ref_path if rng.rand() < 0.5 else alt_path
        start = rng.randint(0, path.size - read_len)
        reads[i] = path[start : start + read_len]
    return reads


def main():
    t0 = time.time()
    rng = np.random.RandomState(42)
    genome_len = int(GENOME_MB * 1e6)

    # persistent XLA compile cache: repeated bench runs skip the (slow)
    # TPU compile of the search scan
    import jax
    try:
        cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from gramtools_tpu.index.fm import FMIndex
    from gramtools_tpu.prg.graph import build_cov_graph
    from gramtools_tpu.prg.linearise import PrgString
    from gramtools_tpu.mapping.search import PrgIndex
    from gramtools_tpu.mapping.search_jax import DeviceIndex

    print(f"# building synthetic graph: {GENOME_MB}Mb, {NUM_SITES} sites",
          file=sys.stderr)
    prg_ints = build_synthetic_mtb_graph(rng, genome_len, NUM_SITES)
    prg = PrgString(prg_ints)
    graph = build_cov_graph(prg)
    fm = FMIndex.build(prg_ints)
    idx = PrgIndex(prg_ints, graph, fm, dict(prg.end_positions))
    print(f"# index built in {time.time()-t0:.1f}s; fm size {fm.size}",
          file=sys.stderr)

    from gramtools_tpu.index.kmer_index_vec import build_kmer_index_vectorised

    t_k = time.time()
    kmer_index = build_kmer_index_vectorised(idx, KMER_SIZE)
    print(f"# kmer index k={KMER_SIZE}: {kmer_index.num_kmers()} kmers, "
          f"{kmer_index.lo.size} states, {time.time()-t_k:.1f}s",
          file=sys.stderr)

    di = DeviceIndex.build(idx)

    reads = sample_reads(rng, prg_ints, BATCH, READ_LEN)

    import jax
    import jax.numpy as jnp

    pool = int(os.environ.get("BENCH_POOL", 4 * BATCH))
    hits = int(os.environ.get("BENCH_HITS", BATCH // 2))
    if ENGINE == "log":
        from gramtools_tpu.mapping.search_jax_log import (
            LogConfig, empty_log_carry, make_log_search)
        cfg = LogConfig(pool=pool, hits=hits)
        search = make_log_search(di, cfg, BATCH)
        empty_carry_fn = lambda R: empty_log_carry(R, cfg)
    else:
        from gramtools_tpu.mapping.search_jax_flat import (
            FlatConfig, empty_flat_carry, make_flat_search)
        cfg = FlatConfig(pool=pool, hits=hits)
        search = make_flat_search(di, cfg, BATCH)
        empty_carry_fn = lambda R: empty_flat_carry(R, cfg)

    def make_args(reads_arr):
        """Kmer-seeded batch: vectorised seed of the state pool from the
        last-kmer index hits, stream the remaining bases."""
        R = reads_arr.shape[0]
        k = KMER_SIZE
        carry = empty_carry_fn(R)
        owner, s_lo, s_hi, s_trav, s_nt, s_ing, s_ni = kmer_index.seed_batch(
            reads_arr[:, READ_LEN - k:])
        n_states = min(owner.size, cfg.pool)
        if ENGINE == "log":
            read_id, lo, hi, pref, _ = carry
            pref[:n_states] = -np.arange(1, n_states + 1, dtype=np.int32)
        else:
            read_id, lo, hi, trav, n_trav, ing, n_ing, _ = carry
            if s_trav.shape[1] < cfg.path:
                pad = ((0, 0), (0, cfg.path - s_trav.shape[1]), (0, 0))
                s_trav = np.pad(s_trav, pad)
                s_ing = np.pad(s_ing, pad)
            trav[:n_states] = s_trav[:n_states]
            n_trav[:n_states] = s_nt[:n_states]
            ing[:n_states] = s_ing[:n_states]
            n_ing[:n_states] = s_ni[:n_states]
        read_id[:n_states] = owner[:n_states]
        lo[:n_states] = s_lo[:n_states]
        hi[:n_states] = s_hi[:n_states]
        reads_T = np.ascontiguousarray(
            reads_arr[:, : READ_LEN - k][:, ::-1].T).astype(np.int32)
        n_seeded = np.unique(owner[:n_states]).size
        print(f"# {n_seeded}/{R} reads seeded, {n_states} seed states",
              file=sys.stderr)
        return jnp.asarray(reads_T), jax.device_put(carry)

    t_s = time.time()
    reads_T, carry = make_args(reads)
    seed_time = time.time() - t_s

    # warmup + compile
    out = search(reads_T, carry)
    jax.block_until_ready(out)
    final = out[0] if ENGINE == "log" else out
    final_read_id = np.asarray(final[0])
    n_mapped = np.unique(final_read_id[final_read_id >= 0]).size
    n_overflow = int(np.asarray(final[4 if ENGINE == "log" else 7]).sum())
    print(f"# warmup done; {n_mapped}/{BATCH} reads mapped, "
          f"{n_overflow} overflowed", file=sys.stderr)

    t1 = time.time()
    for _ in range(BATCHES):
        out = search(reads_T, carry)
    jax.block_until_ready(out)
    t2 = time.time()
    device_rps = BATCH * BATCHES / (t2 - t1)
    total_rps = BATCH * BATCHES / ((t2 - t1) + seed_time * BATCHES)
    print(f"# device scan: {device_rps:.0f} reads/s; incl. host seeding: "
          f"{total_rps:.0f} reads/s", file=sys.stderr)

    # host scalar engine baseline on a subset (same seeding strategy)
    from gramtools_tpu.mapping.search import search_read_backwards
    t3 = time.time()
    for i in range(HOST_READS):
        seed_states = kmer_index.get(reads[i, READ_LEN - KMER_SIZE:].tobytes())
        if seed_states:
            search_read_backwards(reads[i], seed_states, KMER_SIZE, idx)
    t4 = time.time()
    host_rps = HOST_READS / (t4 - t3)
    print(f"# host scalar: {host_rps:.1f} reads/s", file=sys.stderr)

    print(json.dumps({
        "metric": "quasimap_reads_per_sec_per_chip",
        "value": round(device_rps, 1),
        "unit": "reads/s (150bp, 4.4Mb SNP graph)",
        "vs_baseline": round(device_rps / host_rps, 2),
    }))


if __name__ == "__main__":
    main()
