"""End-to-end TPU profile of the pipelined quasimap record path.

Runs N buffers of 5000 reads through scan_submit/record_complete with
wall timers around every phase, plus explicit transfer-cost probes, so
optimisation targets the measured bottleneck (not the assumed one).

Run EXCLUSIVELY (single-claim TPU): python tools/profile_tpu_e2e.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GENOME_MB = float(os.environ.get("PROF_GENOME_MB", "4.4"))
NUM_SITES = int(os.environ.get("PROF_NUM_SITES", "100000"))
READ_LEN = 150
KMER = int(os.environ.get("PROF_KMER", "10"))
NBUF = int(os.environ.get("PROF_NBUF", "6"))
BUFREADS = int(os.environ.get("PROF_BUFREADS", "5000"))


def main():
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"# devices: {jax.devices()}", file=sys.stderr)

    from bench import build_synthetic_mtb_graph, sample_reads
    from gramtools_tpu.prg.linearise import PrgString
    from gramtools_tpu.prg.graph import build_cov_graph
    from gramtools_tpu.index.fm import FMIndex
    from gramtools_tpu.mapping.search import PrgIndex
    from gramtools_tpu.index.kmer_index_vec import build_kmer_index_vectorised
    from gramtools_tpu.mapping.search_jax_log import (
        LogBatchedEngine, replay_paths_vectorised)
    from gramtools_tpu.mapping.quasimap import QuasimapStats
    from gramtools_tpu.mapping.coverage import Coverage
    from gramtools_tpu.mapping.coverage_fast import SiteMeta, select_and_record
    from gramtools_tpu.common.rng import RandomInclusiveInt, first_raw_draws

    rng = np.random.RandomState(7)
    t0 = time.perf_counter()
    prg_ints = build_synthetic_mtb_graph(rng, int(GENOME_MB * 1e6), NUM_SITES)
    prg = PrgString(prg_ints)
    graph = build_cov_graph(prg)
    fm = FMIndex.build(prg_ints)
    idx = PrgIndex(prg_ints, graph, fm, dict(prg.end_positions))
    kmer_index = build_kmer_index_vectorised(idx, KMER)
    print(f"# setup {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    engine = LogBatchedEngine(idx, KMER)
    reads = sample_reads(rng, prg_ints, BUFREADS * NBUF, READ_LEN)
    buffers = [[reads[b * BUFREADS + i] for i in range(BUFREADS)]
               for b in range(NBUF)]
    master = RandomInclusiveInt(42)

    # --- raw transfer probes -------------------------------------------
    import jax.numpy as jnp
    payload = np.zeros((150, 8192), dtype=np.int32)
    t1 = time.perf_counter()
    dev = jax.device_put(payload)
    jax.block_until_ready(dev)
    put_t = time.perf_counter() - t1
    t1 = time.perf_counter()
    _ = np.asarray(dev)
    get_t = time.perf_counter() - t1
    print(f"# transfer probe 4.9MB: put={put_t*1e3:.0f}ms get={get_t*1e3:.0f}ms",
          file=sys.stderr)

    phases_acc = {}
    stats = QuasimapStats()
    coverage = Coverage.empty(idx)
    engine._site_meta = SiteMeta(idx)

    def record_timed(token, seeds, first_raws, t):
        t1 = time.perf_counter()
        (results, rows, carry_np, log_parent, log_event, sseeds,
         host_rows) = engine.scan_complete(token)
        t["wait+get"] = t.get("wait+get", 0) + time.perf_counter() - t1
        (f_read_id, f_lo, f_hi, f_pref, overflow) = carry_np
        s_trav, s_nt, s_ing, s_ni = sseeds
        t1 = time.perf_counter()
        sel, trav, n_trav, ing, n_ing = replay_paths_vectorised(
            f_read_id, f_pref, log_parent, log_event,
            s_trav, s_nt, s_ing, s_ni, engine.jt, engine.di.n_outcomes)
        t["replay"] = t.get("replay", 0) + time.perf_counter() - t1
        nrows = len(rows)
        scalar_rows = np.zeros(nrows, dtype=bool)
        for r in host_rows:
            scalar_rows[r] = True
        scalar_rows |= overflow[:nrows]
        st_row = f_read_id[sel].astype(np.int64)
        keep = (st_row < nrows) & ~scalar_rows[np.clip(st_row, 0, nrows - 1)]
        sel2, st_row = sel[keep], st_row[keep]
        row_seed = np.array([seeds[i] for i, _ in rows], dtype=np.int64)
        row_first = np.array([int(first_raws[i]) for i, _ in rows],
                             dtype=np.int64)
        row_len = np.array([r.size for _, r in rows], dtype=np.int64)
        t1 = time.perf_counter()
        select_and_record(
            idx, coverage, st_row,
            f_lo[sel2].astype(np.int64), f_hi[sel2].astype(np.int64),
            trav[keep], n_trav[keep], ing[keep], n_ing[keep],
            row_seed, row_first, row_len, site_meta=engine._site_meta)
        t["select_record"] = t.get("select_record", 0) + time.perf_counter() - t1
        return int(overflow[:nrows].sum()), len(host_rows)

    # warmup buffer (compile)
    print("# warmup (compile)...", file=sys.stderr)
    tw = time.perf_counter()
    seeds0 = master.raw_block(BUFREADS)
    fr0 = first_raw_draws(np.asarray(seeds0, dtype=np.uint32))
    tok = engine.scan_submit(buffers[0], kmer_index, KMER, stats)
    twarm = {}
    ovf, hr = record_timed(tok, seeds0, fr0, twarm)
    print(f"# warmup {time.perf_counter()-tw:.1f}s "
          f"(ovf={ovf} host_rows={hr}) {twarm}", file=sys.stderr)

    # steady-state: pipelined loop
    t_start = time.perf_counter()
    in_flight = None
    submit_t = 0.0
    for b in range(1, NBUF):
        seeds = master.raw_block(BUFREADS)
        frs = first_raw_draws(np.asarray(seeds, dtype=np.uint32))
        t1 = time.perf_counter()
        token = engine.scan_submit(buffers[b], kmer_index, KMER, stats)
        submit_t += time.perf_counter() - t1
        if in_flight is not None:
            record_timed(*in_flight, phases_acc)
        in_flight = (token, seeds, frs)
    if in_flight is not None:
        record_timed(*in_flight, phases_acc)
    total = time.perf_counter() - t_start
    n = NBUF - 1
    rps = BUFREADS * n / total
    print(f"# steady: {n} buffers in {total:.2f}s = {rps:.0f} reads/s e2e",
          file=sys.stderr)
    print(f"# per-buffer: submit={submit_t/n*1e3:.0f}ms "
          + " ".join(f"{k}={v/n*1e3:.0f}ms" for k, v in phases_acc.items()),
          file=sys.stderr)
    print(f"# retried={engine.device_retried} fallbacks={engine.host_fallbacks} "
          f"hits_boost={engine.hits_boost}", file=sys.stderr)
    if engine.timers:
        print("# engine timers/buffer: "
              + " ".join(f"{k}={v/n*1e3:.0f}ms"
                         for k, v in sorted(engine.timers.items())),
              file=sys.stderr)
    print(json.dumps({"e2e_reads_per_sec": round(rps, 1),
                      "submit_ms": round(submit_t / n * 1e3, 1),
                      **{k: round(v / n * 1e3, 1)
                         for k, v in phases_acc.items()}}))


if __name__ == "__main__":
    main()
