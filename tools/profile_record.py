"""Per-phase host-cost profile of the device-engine record path (CPU backend).

Times each stage of LogBatchedEngine.record_complete on a realistic
5,000-read buffer so device-recorder work targets the real bottleneck.
Run: JAX_PLATFORMS=cpu python tools/profile_record.py [genome_mb] [sites]
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import build_synthetic_mtb_graph, sample_reads

GENOME_MB = float(sys.argv[1]) if len(sys.argv) > 1 else 0.5
NUM_SITES = int(sys.argv[2]) if len(sys.argv) > 2 else 12000
READ_LEN = 150
KMER = 10
NREADS = 2500  # buffer of 2500 reads = 5000 oriented rows


def main():
    rng = np.random.RandomState(7)
    t0 = time.perf_counter()
    prg_ints = build_synthetic_mtb_graph(rng, int(GENOME_MB * 1e6), NUM_SITES)
    from gramtools_tpu.prg.linearise import PrgString
    from gramtools_tpu.prg.graph import build_cov_graph
    from gramtools_tpu.index.fm import FMIndex
    from gramtools_tpu.mapping.search import PrgIndex

    prg = PrgString(prg_ints)
    graph = build_cov_graph(prg)
    fm = FMIndex.build(prg_ints)
    idx = PrgIndex(prg_ints, graph, fm, dict(prg.end_positions))
    from gramtools_tpu.index.kmer_index_vec import build_kmer_index_vectorised
    kmer_index = build_kmer_index_vectorised(idx, KMER)
    print(f"# setup {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    from gramtools_tpu.mapping.search_jax_log import (
        LogBatchedEngine, replay_paths_vectorised)
    from gramtools_tpu.mapping.quasimap import QuasimapStats
    from gramtools_tpu.mapping.coverage import Coverage
    from gramtools_tpu.mapping.coverage_fast import SiteMeta, select_and_record
    from gramtools_tpu.common.rng import RandomInclusiveInt, first_raw_draws

    engine = LogBatchedEngine(idx, KMER)
    reads = sample_reads(rng, prg_ints, NREADS, READ_LEN)
    buffer = [reads[i] for i in range(NREADS)]
    seeds = RandomInclusiveInt(42).raw_block(5000)
    first_raws = first_raw_draws(np.asarray(seeds, dtype=np.uint32))

    for rep in range(3):
        stats = QuasimapStats()
        coverage = Coverage.empty(idx)
        t = {}
        t1 = time.perf_counter()
        token = engine.scan_submit(buffer, kmer_index, KMER, stats)
        t["submit"] = time.perf_counter() - t1

        t1 = time.perf_counter()
        (results, rows, carry_np, log_parent, log_event, sseeds,
         host_rows) = engine.scan_complete(token)
        t["scan_wait"] = time.perf_counter() - t1

        (f_read_id, f_lo, f_hi, f_pref, overflow) = carry_np
        s_trav, s_nt, s_ing, s_ni = sseeds
        t1 = time.perf_counter()
        sel, trav, n_trav, ing, n_ing = replay_paths_vectorised(
            f_read_id, f_pref, log_parent, log_event,
            s_trav, s_nt, s_ing, s_ni, engine.jt, engine.di.n_outcomes)
        t["replay"] = time.perf_counter() - t1

        nrows = len(rows)
        scalar_rows = np.zeros(nrows, dtype=bool)
        for r in host_rows:
            scalar_rows[r] = True
        scalar_rows |= overflow[:nrows]
        st_row = f_read_id[sel].astype(np.int64)
        keep = (st_row < nrows) & ~scalar_rows[np.clip(st_row, 0, nrows - 1)]
        sel2, st_row = sel[keep], st_row[keep]
        trav, n_trav, ing, n_ing = trav[keep], n_trav[keep], ing[keep], n_ing[keep]
        row_seed = np.array([seeds[i] for i, _ in rows], dtype=np.int64)
        row_first = np.array([int(first_raws[i]) for i, _ in rows], dtype=np.int64)
        row_len = np.array([r.size for _, r in rows], dtype=np.int64)
        if engine._site_meta is None:
            engine._site_meta = SiteMeta(idx)

        t1 = time.perf_counter()
        vec_fb = select_and_record(
            idx, coverage, st_row,
            f_lo[sel2].astype(np.int64), f_hi[sel2].astype(np.int64),
            trav, n_trav, ing, n_ing, row_seed, row_first, row_len,
            site_meta=engine._site_meta)
        t["select_record"] = time.perf_counter() - t1

        print(f"rep{rep}: rows={nrows} states={sel.size} "
              + " ".join(f"{k}={v*1e3:.0f}ms" for k, v in t.items()),
              file=sys.stderr)
        print(f"  fallbacks={int(vec_fb.sum())} host_rows={len(host_rows)} "
              f"overflow={int(overflow[:nrows].sum())}", file=sys.stderr)


if __name__ == "__main__":
    main()
