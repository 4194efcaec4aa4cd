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
#include <algorithm>
#include <cstdint>
#include <cstring>
#include <map>
#include <random>
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

// Full-pipeline baseline: the per-read work the reference binary does
// end-to-end for a raw read buffer (quasimap.cpp:159-194 +
// quasimap_forward_reverse), so bench.py's vs_baseline_e2e compares
// EQUAL work on both sides:
//   * both orientations (reverse complement computed per read),
//   * the kmer presence screen over every read kmer
//     (quasimap.cpp:212-225; here an O(1) bitmap per kmer -- faster
//     than the reference's per-kmer hash lookups, biasing the baseline
//     FASTER, never slower),
//   * seeding from the last kmer's precomputed search states,
//   * the scalar vBWT worklist scan with early exit on die-off,
//   * mapping-instance selection: group path-bearing states by their
//     traversed base-site set, one fresh mt19937 +
//     uniform_int_distribution draw per selection (the reference
//     constructs the engine per read, common/random.cpp:4-19),
//   * allele-sum coverage tally of the selected group's loci.
// Not replicated: per-base coverage spans and the grouped-count hash
// update (~150 stores + 1 hash insert per read, <1% of the scan cost;
// omitting them biases the baseline faster). Selection grouping keys on
// traversed sites rather than LocusFinder's base-site closure -- the
// closure walk would only ADD baseline work.
int64_t gram_tpu_cpu_quasimap_e2e(
    const int32_t* occ, const int32_t* sym_start, const int32_t* marker_prefix,
    const int32_t* marker_rank_locus, const int32_t* out_lo,
    const int32_t* out_hi, const int8_t* ops_kind, const int32_t* ops_site,
    const int32_t* ops_allele, int64_t n, int32_t B, int32_t O,
    const uint8_t* reads, int64_t n_reads, int32_t read_len,
    const uint8_t* kmer_present, const int64_t* kmer_offsets,
    const int32_t* kseed_lo, const int32_t* kseed_hi, int32_t k,
    const uint32_t* sel_seeds, int64_t n_sites, int32_t max_alleles,
    int32_t state_cap, int32_t num_threads,
    int64_t* allele_sum, int32_t* out_mapped) {
  Tables t{occ,    sym_start, marker_prefix, marker_rank_locus,
           out_lo, out_hi,    ops_kind,      ops_site,
           ops_allele, n,     B,             O};
#if defined(_OPENMP)
  if (num_threads > 0) omp_set_num_threads(num_threads);
#endif
  const uint32_t kmask = (k >= 16) ? 0xFFFFFFFFu : ((1u << (2 * k)) - 1);
  int64_t total_mapped = 0;
#if defined(_OPENMP)
#pragma omp parallel reduction(+ : total_mapped)
#endif
  {
    std::vector<State> states;
    std::vector<State> next;
    std::vector<uint8_t> oriented(read_len);
    std::vector<int64_t> local_sum(
        static_cast<size_t>(n_sites) * max_alleles, 0);
#if defined(_OPENMP)
#pragma omp for schedule(dynamic, 64)
#endif
    for (int64_t i = 0; i < n_reads; ++i) {
      const uint8_t* fwd = reads + i * read_len;
      bool mapped = false;
      for (int ori = 0; ori < 2; ++ori) {
        if (ori == 0) {
          std::memcpy(oriented.data(), fwd, read_len);
        } else {
          for (int32_t p = 0; p < read_len; ++p)
            oriented[p] = 5 - fwd[read_len - 1 - p];
        }
        // ---- kmer presence screen (all windows) ----
        bool pass = read_len >= k;
        uint32_t code = 0;
        for (int32_t p = 0; p < read_len && pass; ++p) {
          code = ((code << 2) | (oriented[p] - 1)) & kmask;
          if (p >= k - 1 && !kmer_present[code]) pass = false;
        }
        if (!pass) continue;
        // ---- seed from the last kmer ----
        states.clear();
        for (int64_t sidx = kmer_offsets[code]; sidx < kmer_offsets[code + 1];
             ++sidx) {
          State s;
          s.lo = kseed_lo[sidx];
          s.hi = kseed_hi[sidx];
          states.push_back(std::move(s));
        }
        // ---- scalar vBWT scan, right-to-left over the body ----
        bool ok = true;
        for (int32_t p = read_len - k - 1; p >= 0 && !states.empty(); --p) {
          if (!search_step(t, oriented[p], states, next, state_cap)) {
            ok = false;
            break;
          }
        }
        if (!ok || states.empty()) continue;
        mapped = true;
        // ---- selection: non-variant instances + site-set groups ----
        int64_t nonvariant = 0;
        std::map<std::vector<int32_t>, std::vector<Locus>> groups;
        for (const State& s : states) {
          if (s.traversed.empty() && s.traversing.empty()) {
            nonvariant += s.hi - s.lo + 1;
            continue;
          }
          std::vector<int32_t> key;
          key.reserve(s.traversed.size() + s.traversing.size());
          for (const Locus& l : s.traversed) key.push_back(l.site);
          for (const Locus& l : s.traversing) key.push_back(l.site);
          std::sort(key.begin(), key.end());
          key.erase(std::unique(key.begin(), key.end()), key.end());
          auto& loci = groups[key];
          for (const Locus& l : s.traversed) loci.push_back(l);
        }
        if (groups.empty()) continue;
        const int64_t total = nonvariant + static_cast<int64_t>(groups.size());
        std::mt19937 eng(sel_seeds[i]);
        std::uniform_int_distribution<uint32_t> dist(
            1, static_cast<uint32_t>(total));
        const int64_t selected = dist(eng);
        if (selected <= nonvariant) continue;
        int64_t gi = selected - nonvariant - 1;
        auto it = groups.begin();
        std::advance(it, gi);
        for (const Locus& l : it->second) {
          const int64_t site_idx = (l.site - 5) / 2;
          if (site_idx >= 0 && site_idx < n_sites && l.allele >= 1 &&
              l.allele <= max_alleles)
            local_sum[site_idx * max_alleles + (l.allele - 1)] += 1;
        }
      }
      out_mapped[i] = mapped ? 1 : 0;
      if (mapped) total_mapped += 1;
    }
#if defined(_OPENMP)
#pragma omp critical
#endif
    {
      for (size_t j = 0; j < local_sum.size(); ++j)
        allele_sum[j] += local_sum[j];
    }
  }
  return total_mapped;
}

}  // extern "C"
