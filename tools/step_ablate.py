"""Ablation timing of the vBWT scan step: compiles variants of the
production step body with individual op groups removed and times each
under lax.scan at production pool shapes, so optimisation targets the
op group that actually owns the per-step cost (per-dispatch relay
overhead ~30ms makes single-op microbenches meaningless; a 140-step
scan amortises it away).

Variants (cumulative op groups of _build_log_step):
  lf        LF occ gather + extension arithmetic
  markers   marker-count arithmetic (occ rows reused)
  hitenum   global hit enumeration: mm_cumsum + 2 scatters + state gather
  newborn   jump-outcome gather + newborn occ gather + log records
  repack    dense repack: flag cumsum + (N+GB,4) row scatter
  full      everything (the real step)

Run EXCLUSIVELY (single-claim TPU): python tools/step_ablate.py
Env: AB_POOL (51200) AB_HITS (20480) AB_B (3) AB_STEPS (96) AB_ITERS (6)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

POOL = int(os.environ.get("AB_POOL", "51200"))
HITS = int(os.environ.get("AB_HITS", "20480"))
B = int(os.environ.get("AB_B", "3"))
N_OCC = int(os.environ.get("AB_N", str(4_800_001)))
L_LOCI = int(os.environ.get("AB_L", "200000"))
STEPS = int(os.environ.get("AB_STEPS", "96"))
ITERS = int(os.environ.get("AB_ITERS", "6"))


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial
    from gramtools_tpu.common.jax_setup import enable_compile_cache
    from gramtools_tpu.ops.prefix import mm_cumsum

    enable_compile_cache()
    print(f"# devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.RandomState(0)
    N, G = POOL, HITS
    num_reads = max(N // 4, 1)

    occ = jnp.asarray(rng.randint(0, 1 << 20, size=(N_OCC, 4),
                                  dtype=np.int32))
    out_cat = jnp.asarray(
        rng.randint(0, N_OCC - 2, size=(2 * L_LOCI, B), dtype=np.int32))
    mrl = jnp.asarray(rng.randint(0, L_LOCI, size=(N_OCC // 10,),
                                  dtype=np.int32))
    sym_start = jnp.asarray([0, 1, 2, 3, 4], jnp.int32)

    def build_step(groups):
        lf = "lf" in groups
        markers = "markers" in groups
        hitenum = "hitenum" in groups
        newborn = "newborn" in groups
        repack = "repack" in groups

        def step(carry, xs):
            base_all, log_base = xs
            (read_id, lo, hi, pref) = carry
            valid = read_id >= 0
            rid = jnp.clip(read_id, 0, num_reads - 1)
            base = jnp.where(valid, base_all[rid], 0)
            active = valid & (base > 0)

            kept_lo, kept_hi, keep = lo, hi, valid
            cnt = (lo + hi) & 1   # stand-in when markers off
            if lf:
                rows2 = occ[jnp.clip(jnp.concatenate([lo, hi + 1]), 0,
                                     N_OCC - 1)]
                row_lo, row_hi = rows2[:N], rows2[N:]
                onehot = (base[:, None] == jnp.arange(1, 5))
                first = sym_start[jnp.clip(base, 0, 4)]
                nlo = first + jnp.sum(row_lo * onehot, axis=1)
                nhi = first + jnp.sum(row_hi * onehot, axis=1) - 1
                ext_alive = active & (nlo <= nhi)
                kept_lo = jnp.where(active, nlo % jnp.int32(N_OCC - 1), lo)
                kept_hi = jnp.where(active, kept_lo + (nhi - nlo) % 8, hi)
                keep = ext_alive | (valid & ~active)
                if markers:
                    m_lo = lo - jnp.sum(row_lo, axis=1) - (lo > 0)
                    m_hi = (hi + 1) - jnp.sum(row_hi, axis=1) - (hi + 1 > 0)
                    cnt = jnp.where(active, (m_hi - m_lo) % 4, 0)

            g = jnp.arange(G)
            s_of_g = (g * 7) % N
            hit_ok = g < G
            hit_pos = g
            j_base = jnp.ones((G,), jnp.int32)
            c_pref = log_base + g[:, None] * B + jnp.arange(B)[None, :]
            if hitenum:
                nz = cnt > 0
                two = mm_cumsum(jnp.stack([cnt, nz.astype(jnp.int32)]))
                cum, nzc = two[0], two[1]
                start_of = cum - cnt
                rank = nzc - nz.astype(jnp.int32)
                sc = jnp.zeros((2 * G + 1,), jnp.int32).at[jnp.concatenate([
                    jnp.where(nz & (rank < G), rank, 2 * G),
                    jnp.where(nz & (start_of < G), G + start_of,
                              2 * G)])].set(
                    jnp.concatenate([jnp.arange(N, dtype=jnp.int32),
                                     jnp.ones((N,), jnp.int32)]),
                    mode="drop")
                nz_states, starts01 = sc[:G], sc[G:2 * G]
                rank_of_g = mm_cumsum(starts01)
                s_of_g = jnp.clip(nz_states[jnp.clip(rank_of_g - 1, 0,
                                                     G - 1)], 0, N - 1)
                state_cols = jnp.stack([start_of, cnt, base, pref, rid],
                                       axis=1)
                hit_cols = state_cols[s_of_g]
                hit_pos = hit_cols[:, 1] + (g - hit_cols[:, 0])
                j_base = hit_cols[:, 2]
                c_pref = log_base + g[:, None] * B + jnp.arange(B)[None, :]

            cand_ok = jnp.zeros((G, B), bool)
            e_lo = jnp.zeros((G, B), jnp.int32)
            e_hi = jnp.zeros((G, B), jnp.int32)
            rec_parent = jnp.zeros((G, B), jnp.int32)
            rec_event = jnp.zeros((G, B), jnp.int32)
            c_rid = jnp.zeros((G, B), jnp.int32)
            if newborn:
                loc = jnp.where(hit_ok, mrl[jnp.clip(hit_pos, 0,
                                                     mrl.shape[0] - 1)], -1)
                li = jnp.clip(loc, 0, L_LOCI - 1)
                jbound = out_cat[jnp.concatenate([li, li + L_LOCI])]
                j_lo, j_hi = jbound[:G], jbound[G:]
                cand_ok = (loc >= 0)[:, None] & (j_lo >= 0)
                jrows = occ[jnp.clip(jnp.concatenate(
                    [j_lo, j_hi + 1]).reshape(-1), 0, N_OCC - 1)].reshape(
                    2 * G, B, 4)
                jrow_lo, jrow_hi = jrows[:G], jrows[G:]
                j_onehot = (j_base[:, None] == jnp.arange(1, 5))
                j_first = sym_start[jnp.clip(j_base, 0, 4)]
                e_lo = j_first[:, None] + jnp.sum(
                    jrow_lo * j_onehot[:, None, :], axis=2) % jnp.int32(
                    N_OCC - 1)
                e_hi = e_lo + jnp.sum(
                    jrow_hi * j_onehot[:, None, :], axis=2) % 8
                cand_ok &= e_lo <= e_hi
                rec_parent = jnp.broadcast_to(pref[s_of_g][:, None], (G, B))
                rec_event = li[:, None] * B + jnp.arange(B)[None, :]
                c_rid = jnp.broadcast_to(rid[s_of_g][:, None], (G, B))

            if repack:
                flags = jnp.concatenate([keep, cand_ok.reshape(-1)])
                pos = mm_cumsum(flags) - 1
                dest = jnp.where(flags & (pos < N), pos, N)
                cat = jnp.stack([
                    jnp.concatenate([jnp.where(keep, read_id, -1),
                                     jnp.where(cand_ok, c_rid,
                                               -1).reshape(-1)]),
                    jnp.concatenate([kept_lo, e_lo.reshape(-1)]),
                    jnp.concatenate([kept_hi, e_hi.reshape(-1)]),
                    jnp.concatenate([pref, c_pref.reshape(-1)]),
                ], axis=1)
                fills = jnp.array([-1, 0, 0, 0], cat.dtype)
                out = jnp.broadcast_to(fills, (N + 1, 4)).at[dest].set(
                    cat, mode="drop")[:N]
                new = (out[:, 0], jnp.clip(out[:, 1], 0, N_OCC - 2),
                       jnp.clip(out[:, 2], 0, N_OCC - 2), out[:, 3])
            else:
                new = (jnp.where(keep, read_id, -1),
                       jnp.clip(kept_lo, 0, N_OCC - 2),
                       jnp.clip(kept_hi, 0, N_OCC - 2),
                       pref + jnp.sum(cand_ok.astype(jnp.int32)))
            return new, (rec_parent.sum() + rec_event.sum())

        return step

    def make_run(groups):
        step = build_step(groups)

        @jax.jit
        def run(carry, base_rows):
            lb = jnp.arange(STEPS, dtype=jnp.int32) * (G * B)
            carry, recs = jax.lax.scan(step, carry, (base_rows, lb))
            return (jnp.sum(carry[0]) + jnp.sum(carry[1])
                    + jnp.sum(carry[2]) + jnp.sum(carry[3])
                    + jnp.sum(recs)).astype(jnp.int32)
        return run

    def batch():
        return ((jnp.asarray(rng.randint(-1, num_reads, size=(N,),
                                         dtype=np.int32)),
                 jnp.asarray(rng.randint(0, N_OCC - 2, size=(N,),
                                         dtype=np.int32)),
                 jnp.asarray(rng.randint(0, N_OCC - 2, size=(N,),
                                         dtype=np.int32)),
                 jnp.asarray(rng.randint(0, 1 << 20, size=(N,),
                                         dtype=np.int32))),
                jnp.asarray(rng.randint(1, 5, size=(STEPS, num_reads),
                                        dtype=np.int32)))

    variants = [
        ("empty", ()),
        ("lf", ("lf",)),
        ("lf+markers", ("lf", "markers")),
        ("lf+markers+hitenum", ("lf", "markers", "hitenum")),
        ("lf+markers+hitenum+newborn",
         ("lf", "markers", "hitenum", "newborn")),
        ("full", ("lf", "markers", "hitenum", "newborn", "repack")),
    ]
    results = {}
    for name, groups in variants:
        run = make_run(groups)
        bs = [batch() for _ in range(ITERS + 1)]
        t0 = time.time()
        int(run(*bs[0]))
        compile_s = time.time() - t0
        t0 = time.time()
        acc = 0
        for b in bs[1:]:
            acc ^= int(run(*b))
        per_dispatch = (time.time() - t0) / ITERS
        per_step = per_dispatch / STEPS
        results[name] = round(per_step * 1e3, 4)
        print(f"# {name}: {per_step*1e3:.3f} ms/step "
              f"({per_dispatch*1e3:.0f} ms/dispatch, compile {compile_s:.0f}s)",
              file=sys.stderr)
    print(json.dumps({"pool": N, "hits": G, "B": B, "steps": STEPS,
                      **results}))


if __name__ == "__main__":
    main()
