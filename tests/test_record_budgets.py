"""Device-record expansion budgets hold at production density.

Round-5 regression: two under-sized budgets (compacted-loci lanes,
per-base walk-lane compaction) flagged ~40% of rows to the exact host
path on the M.tb-density bench graph -- correct output, catastrophic
throughput, and invisible to the small-fixture tests. This pins the
fallback RATE (not just correctness) on a graph with the production
site density (1 site / 44bp) and 150bp reads, where reads cross ~3.4
sites like the real workload.
"""
import numpy as np

from gramtools_tpu.index.build import build_prg_index
from gramtools_tpu.index.kmer_index_vec import build_kmer_index_vectorised
from gramtools_tpu.mapping.coverage import Coverage
from gramtools_tpu.mapping.quasimap import QuasimapStats
from gramtools_tpu.mapping.search_jax_log import LogBatchedEngine
from gramtools_tpu.common.rng import RandomInclusiveInt, first_raw_draws
from gramtools_tpu.prg.linearise import PrgString


def test_fallback_rate_at_production_density():
    from bench import build_synthetic_mtb_graph, sample_haplotypes, \
        sample_reads

    rng = np.random.RandomState(5)
    prg_ints = build_synthetic_mtb_graph(rng, 120_000, 2700)
    prg = PrgString(prg_ints.astype(np.uint32))
    idx = build_prg_index(prg)
    k = 10
    kmer_index = build_kmer_index_vectorised(idx, k)
    paths = sample_haplotypes(prg_ints, dict(prg.end_positions), rng, 4)
    n_reads = 768
    reads = sample_reads(rng, paths, n_reads, 150)

    engine = LogBatchedEngine(idx, k)
    stats = QuasimapStats()
    coverage = Coverage.empty(idx)
    master = RandomInclusiveInt(42)
    seeds = master.raw_block(n_reads)
    frs = first_raw_draws(np.asarray(seeds, dtype=np.uint32))
    buffer = [reads[i] for i in range(n_reads)]
    tok = engine.scan_submit(buffer, kmer_index, k, stats, first_raws=frs)
    engine.record_complete(tok, seeds, frs, stats, coverage)

    # mappable rows = rows that passed the kmer screen (the revcomp
    # orientation of a forward-sampled read rarely does)
    mappable = engine.device_mapped + engine.host_fallbacks
    assert mappable >= n_reads
    budget_spills = sum(v for r, v in engine.fallback_reasons.items()
                        if r.startswith("record:"))
    # budget spills must be a rare-case path, never a bulk one
    assert budget_spills < 0.02 * mappable, dict(engine.fallback_reasons)
    assert engine.host_fallbacks < 0.05 * mappable, \
        dict(engine.fallback_reasons)
    assert engine.device_mapped > 0.95 * mappable
