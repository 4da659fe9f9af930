// Clean-room SA-IS suffix array construction + BWT / inverse BWT.
//
// Host-side native stage of the BWT pipeline (SURVEY.md section 2.6: the
// reference vendors libdivsufsort and uses the libsais submodule,
// rcbwt.c:66-80; we implement our own induced-sorting suffix array from
// the SA-IS algorithm, Nong/Zhang/Chan 2009, rather than binding either).
//
// Exposed C ABI (ctypes-friendly):
//   trc_bwt(in, out, n)            -> primary index (>=0) or -1 on error
//   trc_unbwt(in, out, n, primary) -> 0 ok / -1 error
//   trc_sais(in, sa, n)            -> 0 ok / -1 error  (sa has n+1 slots,
//                                     includes the virtual sentinel suffix)
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int32_t EMPTY = -1;

struct Level {
  const int32_t* s;
  int32_t n;
  int32_t K;
  std::vector<bool> stype;         // true = S-type
  std::vector<int32_t> cnt, bkt;

  bool is_lms(int32_t i) const {
    return i > 0 && stype[i] && !stype[i - 1];
  }
  void classify() {
    stype.assign(n, false);
    stype[n - 1] = true;  // sentinel
    for (int32_t i = n - 2; i >= 0; --i)
      stype[i] = s[i] < s[i + 1] || (s[i] == s[i + 1] && stype[i + 1]);
  }
  void counts() {
    cnt.assign(K, 0);
    for (int32_t i = 0; i < n; ++i) cnt[s[i]]++;
    bkt.resize(K);
  }
  void bucket_starts() {
    int32_t sum = 0;
    for (int32_t c = 0; c < K; ++c) { bkt[c] = sum; sum += cnt[c]; }
  }
  void bucket_ends() {
    int32_t sum = 0;
    for (int32_t c = 0; c < K; ++c) { sum += cnt[c]; bkt[c] = sum; }
  }
  void induce(int32_t* sa) {
    // L-type pass, left to right
    bucket_starts();
    for (int32_t i = 0; i < n; ++i) {
      int32_t j = sa[i] - 1;
      if (sa[i] > 0 && !stype[j]) sa[bkt[s[j]]++] = j;
    }
    // S-type pass, right to left
    bucket_ends();
    for (int32_t i = n - 1; i >= 0; --i) {
      int32_t j = sa[i] - 1;
      if (sa[i] > 0 && stype[j]) sa[--bkt[s[j]]] = j;
    }
  }
  bool lms_differ(int32_t a, int32_t b) const {
    // compare LMS substrings starting at a and b (chars + types)
    if (a == n - 1 || b == n - 1) return true;  // sentinel substring unique
    for (int32_t i = 0;; ++i) {
      bool ea = i > 0 && is_lms(a + i), eb = i > 0 && is_lms(b + i);
      if (ea && eb) return false;
      if (ea != eb) return true;
      if (s[a + i] != s[b + i] || stype[a + i] != stype[b + i]) return true;
    }
  }
};

// sa must have n slots; s[n-1] must be the unique smallest symbol (0).
void sais_rec(const int32_t* s, int32_t* sa, int32_t n, int32_t K) {
  Level lv;
  lv.s = s; lv.n = n; lv.K = K;
  lv.classify();
  lv.counts();

  // --- step 1: approximately sort LMS suffixes by first char
  std::fill(sa, sa + n, EMPTY);
  lv.bucket_ends();
  for (int32_t i = n - 1; i >= 1; --i)
    if (lv.is_lms(i)) sa[--lv.bkt[s[i]]] = i;
  lv.induce(sa);

  // --- step 2: name sorted LMS substrings
  int32_t nlms = 0;
  for (int32_t i = 0; i < n; ++i)
    if (sa[i] > 0 && lv.is_lms(sa[i])) sa[nlms++] = sa[i];
  std::fill(sa + nlms, sa + n, EMPTY);
  int32_t name = 0, prev = EMPTY;
  for (int32_t i = 0; i < nlms; ++i) {
    int32_t pos = sa[i];
    if (prev == EMPTY || lv.lms_differ(prev, pos)) { ++name; prev = pos; }
    sa[nlms + (pos >> 1)] = name - 1;
  }
  // compact names (position order) into s1 at the tail of sa
  int32_t* s1 = sa + n - nlms;
  for (int32_t i = n - 1, j = n - 1; i >= nlms; --i)
    if (sa[i] != EMPTY) sa[j--] = sa[i];

  // --- recurse if names are not unique
  std::vector<int32_t> lms_pos(nlms);
  for (int32_t i = 1, j = 0; i < n; ++i)
    if (lv.is_lms(i)) lms_pos[j++] = i;
  std::vector<int32_t> order(nlms);
  if (name < nlms) {
    std::vector<int32_t> sub(s1, s1 + nlms);
    sais_rec(sub.data(), order.data(), nlms, name);
  } else {
    for (int32_t i = 0; i < nlms; ++i) order[s1[i]] = i;
  }

  // --- step 3: induce from exactly sorted LMS suffixes
  std::fill(sa, sa + n, EMPTY);
  lv.bucket_ends();
  for (int32_t i = nlms - 1; i >= 0; --i) {
    int32_t j = lms_pos[order[i]];
    sa[--lv.bkt[s[j]]] = j;
  }
  lv.induce(sa);
}

}  // namespace

extern "C" {

// Suffix array of in[0..n-1] + virtual sentinel; sa needs n+1 entries.
// sa[0] == n (sentinel suffix).
int trc_sais(const uint8_t* in, int32_t* sa, int64_t n) {
  if (n < 0 || n > INT32_C(0x7ffffffe) - 1) return -1;
  if (n == 0) { sa[0] = 0; return 0; }
  std::vector<int32_t> t(n + 1);
  for (int64_t i = 0; i < n; ++i) t[i] = int32_t(in[i]) + 1;
  t[n] = 0;
  sais_rec(t.data(), sa, int32_t(n + 1), 257);
  return 0;
}

// BWT: out[k] = last column of the sorted rotation matrix of in+"$", with
// the "$" row dropped; returns its row index (primary).
int64_t trc_bwt(const uint8_t* in, uint8_t* out, int64_t n) {
  if (n <= 0) return n == 0 ? 0 : -1;
  std::vector<int32_t> sa(n + 1);
  if (trc_sais(in, sa.data(), n) != 0) return -1;
  int64_t primary = -1, m = 0;
  for (int64_t k = 0; k <= n; ++k) {
    int32_t j = sa[k];
    if (j == 0) { primary = k; continue; }
    out[m++] = in[j - 1];
  }
  return primary;
}

namespace {

// Shared LF table build (int32: half the memory traffic of the previous
// int64 table - the walk is memory-latency bound).
void build_lf(const uint8_t* in, int64_t n, int64_t primary, int32_t* lf) {
  int64_t C[257];
  memset(C, 0, sizeof C);
  for (int64_t i = 0; i < n; ++i) C[in[i] + 1]++;
  int64_t sum = 1;
  for (int32_t c = 0; c < 257; ++c) { int64_t t = C[c]; C[c] = sum; sum += t; }
  C[0] = 0;  // unused
  int64_t m = 0;
  for (int64_t k = 0; k <= n; ++k) {
    if (k == primary) continue;
    lf[k] = int32_t(C[in[m] + 1]++);
    ++m;
  }
  lf[primary] = 0;  // never followed; keep the slot defined
}

}  // namespace

// Inverse BWT via the LF-mapping walk.
int trc_unbwt(const uint8_t* in, uint8_t* out, int64_t n, int64_t primary) {
  if (n < 0 || primary < 0 || primary > n) return -1;
  if (n == 0) return 0;
  std::vector<int32_t> lf(n + 1);
  build_lf(in, n, primary, lf.data());
  // walk backward from row 0 (the "$..." rotation)
  int64_t r = 0;
  for (int64_t i = n - 1; i >= 0; --i) {
    out[i] = in[r - (r > primary ? 1 : 0)];
    r = lf[r];
  }
  return r == primary ? 0 : -1;  // the walk must end at the "$" row
}

// BWT with aux row indexes for the interleaved inverse (the reference
// rides libsais_bwt_aux the same way, rcbwt.c:66-80): aux[c] = the row
// whose rotation starts at text position (c+1)*mod, read straight off
// the suffix array.  naux = ceil(n/mod) - 1 entries are written.
int64_t trc_bwt_aux(const uint8_t* in, uint8_t* out, int64_t n,
                    int64_t mod, uint32_t* aux) {
  if (n <= 0 || mod <= 0) return n == 0 ? 0 : -1;
  std::vector<int32_t> sa(n + 1);
  if (trc_sais(in, sa.data(), n) != 0) return -1;
  int64_t primary = -1, m = 0;
  for (int64_t k = 0; k <= n; ++k) {
    int32_t j = sa[k];
    if (j > 0 && j < n && j % mod == 0) aux[j / mod - 1] = uint32_t(k);
    if (j == 0) { primary = k; continue; }
    out[m++] = in[j - 1];
  }
  return primary;
}

// Interleaved inverse BWT: ceil(n/mod) independent LF chains advance in
// lock-step, so the out-of-order core overlaps their cache misses
// (memory-level parallelism; the single-chain walk is latency-bound at
// ~3 MB/s on this host).  Chain c reconstructs out[c*mod .. end_c-1]
// backward from row aux[c-1] (chain 0 ends at row 0, the "$" rotation,
// which needs no stored index).
int trc_unbwt_aux(const uint8_t* in, uint8_t* out, int64_t n,
                  int64_t primary, int64_t mod, const uint32_t* aux,
                  int64_t naux) {
  if (n < 0 || primary < 0 || primary > n || mod <= 0) return -1;
  if (n == 0) return 0;
  int64_t nch = (n + mod - 1) / mod;
  if (naux != nch - 1) return -1;
  std::vector<int32_t> lf(n + 1);
  build_lf(in, n, primary, lf.data());
  std::vector<int64_t> r(nch), pos(nch), stop(nch);
  for (int64_t c = 0; c < nch; ++c) {
    int64_t end = (c + 1 < nch) ? (c + 1) * mod : n;
    r[c] = (c + 1 < nch) ? int64_t(aux[c]) : 0;
    if (r[c] > n) return -1;
    pos[c] = end - 1;
    stop[c] = c * mod;
  }
  // full rounds while every chain is active (all chains have >= the
  // last chain's length; the last is the only short one)
  int64_t full = n - (nch - 1) * mod;  // last chain's length
  for (int64_t s = 0; s < full; ++s) {
    for (int64_t c = 0; c < nch; ++c) {
      int64_t rc = r[c];
      out[pos[c]--] = in[rc - (rc > primary ? 1 : 0)];
      r[c] = lf[rc];
    }
  }
  // stragglers (chains 0..nch-2 may have up to mod-full steps left)
  for (int64_t c = 0; c + 1 < nch; ++c) {
    int64_t rc = r[c];
    for (int64_t i = pos[c]; i >= stop[c]; --i) {
      out[i] = in[rc - (rc > primary ? 1 : 0)];
      rc = lf[rc];
    }
    r[c] = rc;
  }
  return r[0] == primary ? 0 : -1;  // chain 0 must end at the "$" row
}

// 16-bit-symbol BWT (reference xbwt16 path for UTF-8 2-byte ids,
// rcbwt.c:66-80 / libsais16): same SA-IS core, alphabet 65537.
int64_t trc_bwt16(const uint16_t* in, uint16_t* out, int64_t n) {
  if (n <= 0) return n == 0 ? 0 : -1;
  if (n > INT32_C(0x7ffffffe) - 1) return -1;
  std::vector<int32_t> t(n + 1), sa(n + 1);
  for (int64_t i = 0; i < n; ++i) t[i] = int32_t(in[i]) + 1;
  t[n] = 0;
  sais_rec(t.data(), sa.data(), int32_t(n + 1), 65537);
  int64_t primary = -1, m = 0;
  for (int64_t k = 0; k <= n; ++k) {
    int32_t j = sa[k];
    if (j == 0) { primary = k; continue; }
    out[m++] = in[j - 1];
  }
  return primary;
}

static void build_lf16(const uint16_t* in, int64_t n, int64_t primary,
                       int32_t* lf) {
  std::vector<int64_t> C(65538, 0);
  for (int64_t i = 0; i < n; ++i) C[in[i] + 1]++;
  int64_t sum = 1;
  for (int64_t c = 0; c < 65537; ++c) {
    int64_t t = C[c]; C[c] = sum; sum += t;
  }
  C[0] = 0;
  int64_t m = 0;
  for (int64_t k = 0; k <= n; ++k) {
    if (k == primary) continue;
    lf[k] = int32_t(C[in[m] + 1]++);
    ++m;
  }
  lf[primary] = 0;
}

int trc_unbwt16(const uint16_t* in, uint16_t* out, int64_t n,
                int64_t primary) {
  if (n < 0 || primary < 0 || primary > n) return -1;
  if (n == 0) return 0;
  std::vector<int32_t> lf(n + 1);
  build_lf16(in, n, primary, lf.data());
  int64_t r = 0;
  for (int64_t i = n - 1; i >= 0; --i) {
    out[i] = in[r - (r > primary ? 1 : 0)];
    r = lf[r];
  }
  return r == primary ? 0 : -1;
}

int64_t trc_bwt16_aux(const uint16_t* in, uint16_t* out, int64_t n,
                      int64_t mod, uint32_t* aux) {
  if (n <= 0 || mod <= 0) return n == 0 ? 0 : -1;
  if (n > INT32_C(0x7ffffffe) - 1) return -1;
  std::vector<int32_t> t(n + 1), sa(n + 1);
  for (int64_t i = 0; i < n; ++i) t[i] = int32_t(in[i]) + 1;
  t[n] = 0;
  sais_rec(t.data(), sa.data(), int32_t(n + 1), 65537);
  int64_t primary = -1, m = 0;
  for (int64_t k = 0; k <= n; ++k) {
    int32_t j = sa[k];
    if (j > 0 && j < n && j % mod == 0) aux[j / mod - 1] = uint32_t(k);
    if (j == 0) { primary = k; continue; }
    out[m++] = in[j - 1];
  }
  return primary;
}

int trc_unbwt16_aux(const uint16_t* in, uint16_t* out, int64_t n,
                    int64_t primary, int64_t mod, const uint32_t* aux,
                    int64_t naux) {
  if (n < 0 || primary < 0 || primary > n || mod <= 0) return -1;
  if (n == 0) return 0;
  int64_t nch = (n + mod - 1) / mod;
  if (naux != nch - 1) return -1;
  std::vector<int32_t> lf(n + 1);
  build_lf16(in, n, primary, lf.data());
  std::vector<int64_t> r(nch), pos(nch), stop(nch);
  for (int64_t c = 0; c < nch; ++c) {
    int64_t end = (c + 1 < nch) ? (c + 1) * mod : n;
    r[c] = (c + 1 < nch) ? int64_t(aux[c]) : 0;
    if (r[c] > n) return -1;
    pos[c] = end - 1;
    stop[c] = c * mod;
  }
  int64_t full = n - (nch - 1) * mod;
  for (int64_t s = 0; s < full; ++s) {
    for (int64_t c = 0; c < nch; ++c) {
      int64_t rc = r[c];
      out[pos[c]--] = in[rc - (rc > primary ? 1 : 0)];
      r[c] = lf[rc];
    }
  }
  for (int64_t c = 0; c + 1 < nch; ++c) {
    int64_t rc = r[c];
    for (int64_t i = pos[c]; i >= stop[c]; --i) {
      out[i] = in[rc - (rc > primary ? 1 : 0)];
      rc = lf[rc];
    }
    r[c] = rc;
  }
  return r[0] == primary ? 0 : -1;
}

}  // extern "C"
