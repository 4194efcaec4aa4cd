// SA-IS linear-time suffix array construction over an int alphabet.
//
// Replaces sdsl's suffix sorting used by the reference
// (libgramtools src/prg/make_data_structures.cpp:9-33) for building the
// FM-index of the linearised PRG. Exposed to Python via ctypes
// (gramtools_tpu/index/native.py).
//
// Contract: text[0..n-1] with values >= 1; the function sorts the
// suffixes of text + [0] (sentinel appended internally) and writes the
// n+1 entries of the suffix array to `out`.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

using i64 = int64_t;

void get_buckets(const int32_t* s, std::vector<i64>& bkt, i64 n, i64 K,
                 bool end) {
  std::fill(bkt.begin(), bkt.end(), 0);
  for (i64 i = 0; i < n; ++i) bkt[s[i]]++;
  i64 sum = 0;
  for (i64 i = 0; i < K; ++i) {
    sum += bkt[i];
    bkt[i] = end ? sum : sum - bkt[i];
  }
}

void sais_rec(const int32_t* s, int32_t* sa, i64 n, i64 K) {
  if (n == 1) {
    sa[0] = 0;
    return;
  }
  std::vector<bool> t(n);
  t[n - 1] = true;
  for (i64 i = n - 2; i >= 0; --i)
    t[i] = (s[i] < s[i + 1]) || (s[i] == s[i + 1] && t[i + 1]);

  auto is_lms = [&](i64 i) { return i > 0 && t[i] && !t[i - 1]; };

  std::vector<i64> bkt(K);

  auto induce_l = [&]() {
    get_buckets(s, bkt, n, K, false);
    for (i64 i = 0; i < n; ++i) {
      i64 j = sa[i] - 1;
      if (sa[i] > 0 && !t[j]) sa[bkt[s[j]]++] = (int32_t)j;
    }
  };
  auto induce_s = [&]() {
    get_buckets(s, bkt, n, K, true);
    for (i64 i = n - 1; i >= 0; --i) {
      i64 j = sa[i] - 1;
      if (sa[i] > 0 && t[j]) sa[--bkt[s[j]]] = (int32_t)j;
    }
  };

  // Stage 1: sort LMS substrings by induced sorting
  std::fill(sa, sa + n, -1);
  get_buckets(s, bkt, n, K, true);
  for (i64 i = 1; i < n; ++i)
    if (is_lms(i)) sa[--bkt[s[i]]] = (int32_t)i;
  induce_l();
  induce_s();

  // Compact sorted LMS positions
  i64 n1 = 0;
  for (i64 i = 0; i < n; ++i)
    if (sa[i] > 0 && is_lms(sa[i])) sa[n1++] = sa[i];
  std::fill(sa + n1, sa + n, -1);

  // Name LMS substrings
  i64 name = 0, prev = -1;
  for (i64 i = 0; i < n1; ++i) {
    i64 pos = sa[i];
    bool diff = false;
    if (prev == -1) {
      diff = true;
    } else {
      for (i64 d = 0; d < n; ++d) {
        if (s[pos + d] != s[prev + d] || t[pos + d] != t[prev + d]) {
          diff = true;
          break;
        }
        if (d > 0 && (is_lms(pos + d) || is_lms(prev + d))) break;
      }
    }
    if (diff) {
      ++name;
      prev = pos;
    }
    sa[n1 + pos / 2] = (int32_t)(name - 1);
  }
  for (i64 i = n - 1, j = n - 1; i >= n1; --i)
    if (sa[i] >= 0) sa[j--] = sa[i];

  // Stage 2: recurse if names are not unique
  int32_t* sa1 = sa;
  int32_t* s1 = sa + n - n1;
  if (name < n1) {
    sais_rec(s1, sa1, n1, name);
  } else {
    for (i64 i = 0; i < n1; ++i) sa1[s1[i]] = (int32_t)i;
  }

  // Stage 3: induce the full SA from the sorted LMS suffixes
  {
    i64 j = 0;
    for (i64 i = 1; i < n; ++i)
      if (is_lms(i)) s1[j++] = (int32_t)i;  // LMS positions in text order
    for (i64 i = 0; i < n1; ++i) sa1[i] = s1[sa1[i]];
    std::fill(sa + n1, sa + n, -1);
    get_buckets(s, bkt, n, K, true);
    for (i64 i = n1 - 1; i >= 0; --i) {
      i64 pos = sa[i];
      sa[i] = -1;
      sa[--bkt[s[pos]]] = (int32_t)pos;
    }
    induce_l();
    induce_s();
  }
}

}  // namespace

extern "C" {

// out must have space for n+1 int32 entries.
int gram_tpu_suffix_array(const uint32_t* text, int64_t n, int32_t* out) {
  std::vector<int32_t> s(n + 1);
  int64_t K = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (text[i] < 1 || text[i] > INT32_MAX - 1) return 1;
    s[i] = (int32_t)text[i];
    if (s[i] >= K) K = s[i] + 1;
  }
  s[n] = 0;
  sais_rec(s.data(), out, n + 1, K);
  return 0;
}
}
