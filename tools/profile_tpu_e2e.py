"""End-to-end TPU profile of the pipelined quasimap record path.

Drives the engine's production scan_submit/record_complete loop on
NBUF x 5000-read buffers with the engine's own phase timers
(GRAMTOOLS_TPU_TIMERS=1 is forced), so optimisation targets the
measured bottleneck.

Run EXCLUSIVELY (single-claim TPU): python tools/profile_tpu_e2e.py
"""
import json
import os
import sys
import time

os.environ["GRAMTOOLS_TPU_TIMERS"] = "1"
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
    # share bench.py's persistent cache (~/.cache/gramtools_tpu_xla) so
    # profile runs pre-seed the driver's bench warmup
    from gramtools_tpu.common.jax_setup import enable_compile_cache
    enable_compile_cache()
    print(f"# devices: {jax.devices()}", file=sys.stderr)

    from bench import (build_synthetic_mtb_graph, sample_haplotypes,
                       sample_reads)
    from gramtools_tpu.prg.linearise import PrgString
    from gramtools_tpu.prg.graph import build_cov_graph
    from gramtools_tpu.index.fm import FMIndex
    from gramtools_tpu.mapping.search import PrgIndex
    from gramtools_tpu.index.kmer_index_vec import build_kmer_index_vectorised
    from gramtools_tpu.mapping.search_jax_log import LogBatchedEngine
    from gramtools_tpu.mapping.quasimap import QuasimapStats
    from gramtools_tpu.mapping.coverage import Coverage
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
    print(f"# device_record={engine.device_record}", file=sys.stderr)
    paths = sample_haplotypes(prg_ints, dict(prg.end_positions), rng,
                              n_paths=8)
    reads = sample_reads(rng, paths, BUFREADS * NBUF, READ_LEN)
    buffers = [[reads[b * BUFREADS + i] for i in range(BUFREADS)]
               for b in range(NBUF)]
    master = RandomInclusiveInt(42)
    stats = QuasimapStats()
    coverage = Coverage.empty(idx)

    def draw():
        seeds = master.raw_block(BUFREADS)
        return seeds, first_raw_draws(np.asarray(seeds, dtype=np.uint32))

    # warmup: two buffers, so the post-hits-boost shape (if the first
    # buffer steps the budget up) also compiles before timing
    print("# warmup (compile)...", file=sys.stderr)
    tw = time.perf_counter()
    for b in range(2):
        seeds0, fr0 = draw()
        t_s = time.perf_counter()
        tok = engine.scan_submit(buffers[b], kmer_index, KMER, stats,
                                 first_raws=fr0)
        t_c = time.perf_counter()
        engine.record_complete(tok, seeds0, fr0, stats, coverage)
        print(f"# warm buf{b}: submit={t_c-t_s:.1f}s "
              f"complete={time.perf_counter()-t_c:.1f}s "
              f"timers={ {k: round(v, 2) for k, v in sorted(engine.timers.items())} }",
              file=sys.stderr)
    print(f"# warmup {time.perf_counter()-tw:.1f}s "
          f"shapes={len(engine.dispatch_shapes)}", file=sys.stderr)
    engine.timers.clear()

    # steady-state: pipelined loop (same structure as quasimap_reads)
    t_start = time.perf_counter()
    in_flight = None
    for b in range(2, NBUF):
        seeds, frs = draw()
        tb = time.perf_counter()
        token = engine.scan_submit(buffers[b], kmer_index, KMER, stats,
                                   first_raws=frs)
        ts = time.perf_counter()
        if in_flight is not None:
            engine.record_complete(*in_flight, stats, coverage)
        print(f"# buf{b}: submit={ts-tb:.2f}s "
              f"complete={time.perf_counter()-ts:.2f}s", file=sys.stderr)
        in_flight = (token, seeds, frs)
    if in_flight is not None:
        engine.record_complete(*in_flight, stats, coverage)
    engine.flush_device_coverage()
    total = time.perf_counter() - t_start
    n = NBUF - 2
    rps = BUFREADS * n / total
    print(f"# steady: {n} buffers in {total:.2f}s = {rps:.0f} reads/s e2e",
          file=sys.stderr)
    print(f"# retried={engine.device_retried} fallbacks={engine.host_fallbacks} "
          f"hits_boost={engine.hits_boost} "
          f"shapes={len(engine.dispatch_shapes)} "
          f"reasons={dict(engine.fallback_reasons)}", file=sys.stderr)
    print("# engine timers/buffer: "
          + " ".join(f"{k}={v/n*1e3:.0f}ms"
                     for k, v in sorted(engine.timers.items())),
          file=sys.stderr)
    print(f"# stats: {stats.as_dict()}", file=sys.stderr)
    print(json.dumps({"e2e_reads_per_sec": round(rps, 1),
                      **{k: round(v / n * 1e3, 1)
                         for k, v in sorted(engine.timers.items())}}))


if __name__ == "__main__":
    main()
