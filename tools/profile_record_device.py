"""Device-side timing of the fused record program's pieces.

Times standalone jits of replay_device and select_and_record_device at
production e2e shapes (R rows/dispatch) with shape-realistic synthetic
inputs over the REAL bench-graph tables, so record-path optimisation
targets the measured piece, not a guess. The scan piece is measured by
bench.py's scan phase; this covers the other half of device time.

Run EXCLUSIVELY (single-claim TPU):
    python tools/profile_record_device.py [R]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

R = int(sys.argv[1]) if len(sys.argv) > 1 else 40960


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from gramtools_tpu.common.jax_setup import enable_compile_cache
    enable_compile_cache()

    import bench
    prg_ints, idx, kmer_index, end_positions, paths, _ = \
        bench._load_or_build_workload()

    from gramtools_tpu.mapping.search_jax_log import (LogBatchedEngine,
                                                      auto_phases, LogConfig)
    from gramtools_tpu.mapping.record_jax import (replay_device,
                                                  select_and_record_device,
                                                  SeedTables, RecordTables,
                                                  MAX_CHAIN, TCAP)

    engine = LogBatchedEngine(idx, 10)
    engine._ensure_record_tables()
    engine._ensure_seed_tables(kmer_index)
    di, rt, st = engine.di, engine.rt, engine.st

    rng = np.random.RandomState(0)
    cfg = LogConfig(pool=engine.cfg.pool, hits=2048 * (R // 4096))
    phases = auto_phases(140, R, cfg, n_seed_states=3 * R)
    N = phases[-1][1]
    Lg = sum(e[0] * e[2] for e in phases) * di.n_outcomes
    print(f"# R={R} N={N} log={Lg} phases={phases}", file=sys.stderr)

    # synthetic-but-shape-real inputs: ~85% live states, chains depth
    # 1-6 through a consistent log, wide intervals for ~1%
    f_rid = np.where(rng.rand(N) < 0.85, np.arange(N) % R, -1).astype(np.int32)
    depth = rng.randint(1, 7, size=N)
    log_parent = np.full(Lg, -1, np.int32)
    log_event = rng.randint(0, max(di.out_lo.shape[0] * di.n_outcomes, 1),
                            size=Lg).astype(np.int32)
    f_pref = np.empty(N, np.int32)
    cursor = 0
    nst = max(st.n_states, 1)
    for i in range(N):
        d = depth[i]
        prev = -(rng.randint(0, nst) + 1)
        for _ in range(d):
            if cursor >= Lg:
                break
            log_parent[cursor] = prev
            prev = cursor
            cursor += 1
        f_pref[i] = prev
    sa_pos = rng.randint(0, di.size - 2, size=N).astype(np.int32)
    width = np.where(rng.rand(N) < 0.99, 1, rng.randint(1, 4, size=N))
    f_lo = sa_pos
    f_hi = (sa_pos + width - 1).astype(np.int32)
    alive = f_rid >= 0

    args_r = (jnp.asarray(f_pref), jnp.asarray(log_parent),
              jnp.asarray(log_event), jnp.asarray(alive))

    @partial(jax.jit, static_argnames=("stage",))
    def run_replay(f_pref, lp, le, alive, stage=99):
        out = replay_device(di, f_pref, lp, le, st, alive, stage=stage)
        return [jnp.sum(o.astype(jnp.int32)) for o in out]

    def timeit(name, fn, *a):
        t = time.time()
        d = fn(*a)
        jax.tree_util.tree_map(lambda x: np.asarray(x), d)
        tc = time.time() - t
        best = 1e9
        for _ in range(3):
            t = time.time()
            d = fn(*a)
            jax.tree_util.tree_map(lambda x: np.asarray(x), d)
            best = min(best, time.time() - t)
        print(f"# {name}: {best*1000:.1f} ms (compile {tc:.0f}s)",
              file=sys.stderr, flush=True)
        return best

    rstages = [int(s) for s in os.environ.get(
        "PROF_RSTAGES", "99").split(",")]
    for rs in rstages:
        t_replay = timeit(f"replay_device stage<={rs}",
                          lambda *a: run_replay(*a, stage=rs), *args_r)

    # replay outputs for select: run once and reuse
    @jax.jit
    def run_replay_full(f_pref, lp, le, alive):
        return replay_device(di, f_pref, lp, le, st, alive)
    trav, n_trav, ing, n_ing, bad = run_replay_full(*args_r)

    trip_cap = 4 * R
    row_ok = jnp.asarray(np.ones(R, bool))
    row_first = jnp.asarray(rng.randint(0, 2 ** 31, size=R).astype(np.uint32)
                            .astype(np.int64))
    row_len = jnp.asarray(np.full(R, 150, np.int32))
    cov = jnp.asarray(np.zeros(rt.cov_size + 1, np.int32))

    @partial(jax.jit, static_argnames=("tc", "stage"), donate_argnums=(8,))
    def run_select(f_rid, f_lo, f_hi, trav, n_trav, ing, n_ing, bad, cov,
                   tc, stage):
        out = select_and_record_device(
            di, rt, f_rid, f_lo, f_hi, trav, n_trav, ing, n_ing, bad,
            row_ok, row_first, row_len, cov, trip_cap=tc, stage=stage)
        return [jnp.sum(o.astype(jnp.int32)) if o.ndim else o
                for o in out[:-1]], out[-1]

    stages = [int(s) for s in os.environ.get(
        "PROF_STAGES", "1,2,3,4,5,6,99").split(",")]
    results = {"R": R, "replay_ms": round(t_replay * 1e3, 1)}
    for stage in stages:
        cov = jnp.asarray(np.zeros(rt.cov_size + 1, np.int32))

        def sel(cov_in):
            return run_select(jnp.asarray(f_rid), jnp.asarray(f_lo),
                              jnp.asarray(f_hi), trav, n_trav, ing, n_ing,
                              bad, cov_in, trip_cap, stage)

        t = time.time()
        s, cov = sel(cov)
        jax.tree_util.tree_map(lambda x: np.asarray(x), s)
        tc0 = time.time() - t
        best = 1e9
        for _ in range(3):
            t = time.time()
            s, cov = sel(cov)
            jax.tree_util.tree_map(lambda x: np.asarray(x), s)
            best = min(best, time.time() - t)
        print(f"# select stage<={stage}: {best*1000:.1f} ms "
              f"(compile {tc0:.0f}s)", file=sys.stderr, flush=True)
        results[f"select_stage{stage}_ms"] = round(best * 1e3, 1)
    import json
    print(json.dumps(results))


if __name__ == "__main__":
    main()
