"""Decompose the per-step device cost of the vBWT scan at production
shapes: times each constituent op of _build_log_step as its own jitted
program (distinct inputs per iteration; 1-scalar digest fetched per
iteration to force execution through the lazy relay), then the full
step alone and under lax.scan.

Run EXCLUSIVELY (single-claim TPU): python tools/step_microbench.py
Shapes via env: MB_POOL (51200), MB_HITS (10240), MB_B (3), MB_N (4.8M).
"""
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

POOL = int(os.environ.get("MB_POOL", "51200"))
HITS = int(os.environ.get("MB_HITS", "10240"))
B = int(os.environ.get("MB_B", "3"))
N_OCC = int(os.environ.get("MB_N", str(4_800_001)))
L_LOCI = int(os.environ.get("MB_L", "200000"))
ITERS = int(os.environ.get("MB_ITERS", "10"))
SCAN_STEPS = int(os.environ.get("MB_SCAN", "16"))


def main():
    import jax
    import jax.numpy as jnp
    from gramtools_tpu.common.jax_setup import enable_compile_cache
    from gramtools_tpu.ops.prefix import mm_cumsum

    enable_compile_cache()
    print(f"# devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.RandomState(0)

    occ = jnp.asarray(rng.randint(0, 1 << 20, size=(N_OCC, 4), dtype=np.int32))
    out_cat = jnp.asarray(
        rng.randint(-1, 1 << 20, size=(2 * L_LOCI, B), dtype=np.int32))
    mrl = jnp.asarray(
        rng.randint(0, L_LOCI, size=(N_OCC // 10,), dtype=np.int32))

    N, G = POOL, HITS
    results = {}

    def timeit(name, fn, arg_batches):
        # warmup/compile on batch 0
        t0 = time.time()
        int(fn(arg_batches[0]))
        compile_s = time.time() - t0
        t0 = time.time()
        acc = 0
        for a in arg_batches[1:]:
            acc ^= int(fn(a))
        dt = (time.time() - t0) / (len(arg_batches) - 1)
        results[name] = round(dt * 1e3, 3)
        print(f"# {name}: {dt*1e3:.3f} ms/iter (compile {compile_s:.1f}s)",
              file=sys.stderr)
        return dt

    def batches(shape, hi, dtype=np.int32, n=ITERS + 1):
        return [jnp.asarray(rng.randint(0, hi, size=shape, dtype=dtype))
                for _ in range(n)]

    # 1. the LF occ gather: 2N rows from the (n+1, 4) table
    @jax.jit
    def occ_gather(rows):
        return jnp.sum(occ[rows])
    timeit("occ_gather_2N", occ_gather, batches((2 * N,), N_OCC - 1))

    # 2. newborn occ gather: 2G*B rows
    @jax.jit
    def occ_gather_newborn(rows):
        return jnp.sum(occ[rows].reshape(2 * G, B, 4))
    timeit("occ_gather_2GB", occ_gather_newborn, batches((2 * G * B,),
                                                         N_OCC - 1))

    # 3. jump-outcome gather: 2G rows from (2L, B)
    @jax.jit
    def jump_gather(rows):
        return jnp.sum(out_cat[rows])
    timeit("jump_gather_2G", jump_gather, batches((2 * G,), 2 * L_LOCI - 1))

    # 4. marker-rank gather: G rows from the rank->locus table
    @jax.jit
    def rank_gather(rows):
        return jnp.sum(mrl[rows])
    timeit("rank_gather_G", rank_gather, batches((G,), N_OCC // 10 - 1))

    # 5. repack scatter: (N+GB+1, 4) rows scattered to (N+1, 4)
    M = N + G * B
    @jax.jit
    def repack_scatter(dest):
        cat = jnp.ones((M, 4), jnp.int32)
        out = jnp.zeros((N + 1, 4), jnp.int32).at[dest].set(cat, mode="drop")
        return jnp.sum(out[:N])
    timeit("repack_scatter", repack_scatter, batches((M,), N))

    # 6. mm_cumsum over (2, N)
    @jax.jit
    def cumsum2(x):
        return jnp.sum(mm_cumsum(x))
    timeit("mm_cumsum_2xN", cumsum2, batches((2, N), 3))

    # 6b. plain jnp.cumsum over (2, N)
    @jax.jit
    def cumsumj(x):
        return jnp.sum(jnp.cumsum(x, axis=1))
    timeit("jnp_cumsum_2xN", cumsumj, batches((2, N), 3))

    # 7. mm_cumsum over the repack flags (N+GB,)
    @jax.jit
    def cumsum_repack(x):
        return jnp.sum(mm_cumsum(x))
    timeit("mm_cumsum_M", cumsum_repack, batches((M,), 2))

    # 8. hit scatter (2G+1 buffer, 2N writes)
    @jax.jit
    def hit_scatter(idx2n):
        vals = jnp.ones((2 * N,), jnp.int32)
        sc = jnp.zeros((2 * G + 1,), jnp.int32).at[idx2n].set(vals,
                                                              mode="drop")
        return jnp.sum(sc)
    timeit("hit_scatter_2N", hit_scatter, batches((2 * N,), 2 * G))

    # 9. stacked (N,5) state gather by hit owner
    state_cols = jnp.asarray(rng.randint(0, 1 << 20, size=(N, 5),
                                         dtype=np.int32))
    @jax.jit
    def state_gather(s_of_g):
        return jnp.sum(state_cols[s_of_g])
    timeit("state_gather_G", state_gather, batches((G,), N - 1))

    # 10. full step body alone (real tables, synthetic carry)
    from gramtools_tpu.mapping.search_jax_log import (LogConfig,
                                                      _build_log_step)
    from gramtools_tpu.mapping.device_index import DeviceIndex

    class _DI:
        pass

    # synthetic DeviceIndex-like namespace with the fields the step uses
    import types
    di = types.SimpleNamespace(
        occ=occ, sym_start=jnp.asarray([0, 1, 2, 3, 4], jnp.int32) * 100,
        sentinel_row=jnp.int32(0),
        marker_rank_locus=mrl, out_lo=out_cat[:L_LOCI],
        out_hi=out_cat[L_LOCI:], n_outcomes=B, size=N_OCC - 1)
    num_reads = max(N // 4, 1)
    step = _build_log_step(di, LogConfig(pool=N, hits=G), num_reads)

    def carry_batch():
        return ((jnp.asarray(rng.randint(-1, num_reads, size=(N,),
                                         dtype=np.int32)),
                 jnp.asarray(rng.randint(0, N_OCC - 2, size=(N,),
                                         dtype=np.int32)),
                 jnp.asarray(rng.randint(0, N_OCC - 2, size=(N,),
                                         dtype=np.int32)),
                 jnp.asarray(rng.randint(0, 1 << 20, size=(N,),
                                         dtype=np.int32)),
                 jnp.zeros((num_reads,), bool)),
                (jnp.asarray(rng.randint(1, 5, size=(num_reads,),
                                         dtype=np.int32)),
                 jnp.int32(0)))

    @jax.jit
    def one_step(carry, xs):
        carry, (lp, le) = step(carry, xs)
        return (jnp.sum(carry[0]) + jnp.sum(carry[1]) + jnp.sum(lp)
                + jnp.sum(le))
    cbs = [carry_batch() for _ in range(ITERS + 1)]
    timeit("full_step", lambda cb: one_step(*cb), cbs)

    # 11. the same step under lax.scan x SCAN_STEPS
    @jax.jit
    def scan_steps(carry, base_rows):
        lb = jnp.arange(SCAN_STEPS, dtype=jnp.int32) * (G * B)
        carry, (lp, le) = jax.lax.scan(step, carry, (base_rows, lb))
        return jnp.sum(carry[0]) + jnp.sum(carry[3]) + jnp.sum(le)

    def scan_batch():
        c, _ = carry_batch()
        return (c, jnp.asarray(rng.randint(1, 5,
                                           size=(SCAN_STEPS, num_reads),
                                           dtype=np.int32)))
    sbs = [scan_batch() for _ in range(ITERS + 1)]
    dt = timeit(f"scan_{SCAN_STEPS}_steps", lambda sb: scan_steps(*sb), sbs)
    results["per_step_in_scan_ms"] = round(dt * 1e3 / SCAN_STEPS, 3)
    print(f"# per-step inside scan: {dt*1e3/SCAN_STEPS:.3f} ms",
          file=sys.stderr)

    print(json.dumps({"pool": N, "hits": G, "B": B, **results}))


if __name__ == "__main__":
    main()
