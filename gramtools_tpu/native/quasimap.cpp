// CPU quasimap oracle: a compiled, OpenMP-parallel re-implementation of
// the reference's per-read scalar vBWT backward search, used as the
// honest performance baseline for bench.py.
//
// Why this exists: the reference `gram` binary cannot be built in this
// environment (its deps -- sdsl-lite, boost, htslib -- are fetched over
// the network at build time via wget/conan; see BASELINE.md "reference
// binary build attempt"). This file reproduces the reference backend's
// mapping hot loop in the same style it uses:
//   * one read per OpenMP task over a read buffer
//     (libgramtools/src/genotype/quasimap/quasimap.cpp:90 `#pragma omp
//     parallel for`),
//   * per read a list of SearchStates extended base by base right-to-left
//     (quasimap.cpp:227-268), each step = marker-jump expansion
//     (vBWT_jump.cpp:119-183) then LF base extension
//     (BWT_search.cpp:45-94),
//   * per-state variant-path bookkeeping (exit/enter ops).
// It runs over this package's own index arrays (dense occ prefix tables,
// precomputed jump-outcome tables) -- which make its marker scan O(1) per
// state instead of the reference's per-SA-position scan
// (vBWT_jump.cpp:94-117), i.e. this baseline is strictly *faster* than a
// straight port of the reference algorithm would be.
#include <cstdint>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

struct Locus {
  int32_t site;
  int32_t allele;
};

struct State {
  int32_t lo;
  int32_t hi;
  std::vector<Locus> traversed;
  std::vector<Locus> traversing;
};

struct Tables {
  const int32_t* occ;          // (n+1, 4) row-major
  const int32_t* sym_start;    // (n_sym,)
  const int32_t* marker_prefix;  // (n+1,)
  const int32_t* marker_rank_locus;  // (n_markers,)
  const int32_t* out_lo;       // (L, B)
  const int32_t* out_hi;       // (L, B)
  const int8_t* ops_kind;      // (L, B, O)
  const int32_t* ops_site;     // (L, B, O)
  const int32_t* ops_allele;   // (L, B, O)
  int64_t n;                   // fm size (rows in occ = n + 1)
  int32_t B;
  int32_t O;
};

constexpr int32_t kAlleleUnknown = -1;
constexpr int8_t kOpExit = 1;
constexpr int8_t kOpEnter = 2;

inline void lf_step(const Tables& t, int32_t base, int32_t lo, int32_t hi,
                    int32_t* out_lo, int32_t* out_hi) {
  const int32_t first = t.sym_start[base];
  const int32_t c = base - 1;
  *out_lo = first + t.occ[static_cast<int64_t>(lo) * 4 + c];
  *out_hi = first + t.occ[static_cast<int64_t>(hi + 1) * 4 + c] - 1;
}

inline void apply_ops(const Tables& t, int64_t locus, int32_t b,
                      State& state) {
  const int64_t base_idx = (locus * t.B + b) * t.O;
  for (int32_t o = 0; o < t.O; ++o) {
    const int8_t kind = t.ops_kind[base_idx + o];
    if (kind == 0) break;
    const int32_t site = t.ops_site[base_idx + o];
    if (kind == kOpExit) {
      if (!state.traversing.empty()) state.traversing.pop_back();
      state.traversed.push_back({site, t.ops_allele[base_idx + o]});
    } else if (kind == kOpEnter) {
      state.traversing.push_back({site, kAlleleUnknown});
    }
  }
}

// One right-to-left base step for one read's state list: marker fan-out
// via the jump tables, then LF base extension of originals + newborns.
// Returns false if the state list exceeded the cap (overflow).
bool search_step(const Tables& t, int32_t base, std::vector<State>& states,
                 std::vector<State>& next, int32_t state_cap) {
  next.clear();
  for (const State& s : states) {
    // marker hits in [lo, hi] via the marker-rank prefix
    const int32_t a = t.marker_prefix[s.lo];
    const int32_t b_end = t.marker_prefix[s.hi + 1];
    for (int32_t r = a; r < b_end; ++r) {
      const int32_t locus = t.marker_rank_locus[r];
      if (locus < 0) continue;
      for (int32_t b = 0; b < t.B; ++b) {
        const int32_t jlo = t.out_lo[static_cast<int64_t>(locus) * t.B + b];
        if (jlo < 0) break;
        const int32_t jhi = t.out_hi[static_cast<int64_t>(locus) * t.B + b];
        int32_t nlo, nhi;
        lf_step(t, base, jlo, jhi, &nlo, &nhi);
        if (nlo > nhi) continue;
        State ns;
        ns.lo = nlo;
        ns.hi = nhi;
        ns.traversed = s.traversed;
        ns.traversing = s.traversing;
        apply_ops(t, locus, b, ns);
        next.push_back(std::move(ns));
        if (static_cast<int32_t>(next.size()) > state_cap) return false;
      }
    }
    // LF extension of the original state
    int32_t nlo, nhi;
    lf_step(t, base, s.lo, s.hi, &nlo, &nhi);
    if (nlo <= nhi) {
      State ns = s;
      ns.lo = nlo;
      ns.hi = nhi;
      next.push_back(std::move(ns));
      if (static_cast<int32_t>(next.size()) > state_cap) return false;
    }
  }
  states.swap(next);
  return true;
}

}  // namespace

extern "C" {

// Maps a buffer of reads. Layout:
//   reads:      (n_reads, max_steps) int32, bases right-to-left, 0 = pad
//   n_steps:    (n_reads,) int32 actual steps per read
//   seed_ptr:   (n_reads+1,) int64 CSR offsets into seed_lo/seed_hi
//   out_states: (n_reads,) int32 final live-state count (-1 = overflow)
//   out_iv:     (n_reads, iv_cap, 2) int32 final (lo, hi) intervals, or
//               nullptr; intervals past iv_cap are dropped
// Returns total surviving states (a checksum so the work is observable),
// or -1 on error.
int64_t gram_tpu_cpu_quasimap(
    const int32_t* occ, const int32_t* sym_start, const int32_t* marker_prefix,
    const int32_t* marker_rank_locus, const int32_t* out_lo,
    const int32_t* out_hi, const int8_t* ops_kind, const int32_t* ops_site,
    const int32_t* ops_allele, int64_t n, int32_t B, int32_t O,
    const int32_t* reads, const int32_t* n_steps, int64_t n_reads,
    int64_t max_steps, const int64_t* seed_ptr, const int32_t* seed_lo,
    const int32_t* seed_hi, int32_t state_cap, int32_t num_threads,
    int32_t track_paths, int32_t* out_states, int32_t* out_iv,
    int32_t iv_cap) {
  Tables t{occ,    sym_start, marker_prefix, marker_rank_locus,
           out_lo, out_hi,    ops_kind,      ops_site,
           ops_allele, n,     B,             O};
  (void)track_paths;
#if defined(_OPENMP)
  if (num_threads > 0) omp_set_num_threads(num_threads);
#endif
  int64_t total = 0;
#if defined(_OPENMP)
#pragma omp parallel reduction(+ : total)
#endif
  {
    std::vector<State> states;
    std::vector<State> next;
#if defined(_OPENMP)
#pragma omp for schedule(dynamic, 64)
#endif
    for (int64_t i = 0; i < n_reads; ++i) {
      states.clear();
      for (int64_t sidx = seed_ptr[i]; sidx < seed_ptr[i + 1]; ++sidx) {
        State s;
        s.lo = seed_lo[sidx];
        s.hi = seed_hi[sidx];
        states.push_back(std::move(s));
      }
      const int32_t steps = n_steps[i];
      const int32_t* row = reads + i * max_steps;
      bool ok = true;
      for (int32_t step = 0; step < steps && !states.empty(); ++step) {
        const int32_t base = row[step];
        if (base <= 0 || base > 4) continue;
        if (!search_step(t, base, states, next, state_cap)) {
          ok = false;
          break;
        }
      }
      out_states[i] = ok ? static_cast<int32_t>(states.size()) : -1;
      if (ok) {
        total += static_cast<int64_t>(states.size());
        if (out_iv != nullptr) {
          const int32_t m = static_cast<int32_t>(states.size()) < iv_cap
                                ? static_cast<int32_t>(states.size())
                                : iv_cap;
          for (int32_t j = 0; j < m; ++j) {
            out_iv[(i * iv_cap + j) * 2] = states[j].lo;
            out_iv[(i * iv_cap + j) * 2 + 1] = states[j].hi;
          }
        }
      }
    }
  }
  return total;
}

}  // extern "C"
