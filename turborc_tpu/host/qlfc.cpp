// QLFC-style move-to-front rank transform (host stage).
//
// Reference counterpart: the QLFC transform of rcutil.c:179-220 (MTF
// ranks with SIMD symbol search) feeding rcqlfc_.c.  We expose a plain
// move-to-front: BWT output turns into a rank stream dominated by zeros,
// which the TPU RLE/gamma entropy stages then code.
#include <cstdint>
#include <cstring>

extern "C" {

void trc_mtf_enc(const uint8_t* in, uint8_t* out, int64_t n) {
  uint8_t order[256];
  for (int i = 0; i < 256; ++i) order[i] = uint8_t(i);
  for (int64_t i = 0; i < n; ++i) {
    uint8_t c = in[i];
    int r = 0;
    while (order[r] != c) ++r;
    out[i] = uint8_t(r);
    memmove(order + 1, order, r);
    order[0] = c;
  }
}

void trc_mtf_dec(const uint8_t* in, uint8_t* out, int64_t n) {
  uint8_t order[256];
  for (int i = 0; i < 256; ++i) order[i] = uint8_t(i);
  for (int64_t i = 0; i < n; ++i) {
    int r = in[i];
    uint8_t c = order[r];
    out[i] = c;
    memmove(order + 1, order, r);
    order[0] = c;
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// qlfc2: context-sorted QLFC (TPU-native redesign of rcqlfc_.c:58-100).
//
// The reference codes each rank/run with a context (symbol u, RICEK of a
// per-symbol EMA) inside one sequential range coder.  A lane-parallel
// rANS kernel cannot consult sequential contexts, so qlfc2 SORTS the
// rank and run streams by their context (stable) at encode and codes the
// sorted streams with the flagship kernel, whose per-span adaptive
// models then specialize per context bucket.  Decode runs the kernel
// first (parallel), then these walks demultiplex sequentially - the
// context of element i is deterministic given elements < i, exactly as
// in the reference decoder (rcqlfc_.c:92-99, u = MTF front).
//
// Rank construction is the reference's BACKWARD walk (rcutil.c:179-220
// emits ranks right-to-left): ranks are positions in a recency list
// maintained right-to-left, so the decode-time MTF front IS the coded
// symbol and contexts keyed by u are available BEFORE the rank.
#include <cstdint>
#include <cstring>

namespace {
inline int bitlen(int64_t v) {
  int b = 0;
  while (v > 0) { ++b; v >>= 1; }
  return b;
}
constexpr int kKB = 8;        // RICEK buckets per symbol
constexpr int kNCTX = 256 * kKB;
inline int rctx_of(int64_t K) { int b = bitlen(K); return b > 7 ? 7 : b; }
}  // namespace

extern "C" {

// Backward-MTF ranks: heads -> ranks + the decode-time initial list.
void trc_qlfc2_ranks(const uint8_t* heads, int64_t m, uint8_t* ranks,
                     uint8_t* init_list) {
  uint8_t order[256];
  for (int i = 0; i < 256; ++i) order[i] = uint8_t(i);
  for (int64_t i = m - 1; i >= 0; --i) {
    uint8_t c = heads[i];
    int r = 0;
    while (order[r] != c) ++r;
    ranks[i] = uint8_t(r);
    memmove(order + 1, order, r);
    order[0] = c;
  }
  memcpy(init_list, order, 256);
}

// Forward context walk (encode side): per-element contexts for the rank
// and run streams.  K/R are per-symbol EMAs (reference PREDEMAK/R,
// rcqlfc_.c:51-55); contexts = u*8 | RICEK(EMA).
void trc_qlfc2_ctx(const uint8_t* heads, const uint8_t* ranks,
                   const uint32_t* runs, int64_t m, uint16_t* rctx,
                   uint16_t* rnctx) {
  int64_t K[256], R[256];
  for (int i = 0; i < 256; ++i) { K[i] = 4; R[i] = 1; }
  for (int64_t i = 0; i < m; ++i) {
    unsigned u = heads[i];
    rctx[i] = uint16_t(u * kKB + rctx_of(K[u]));
    int64_t k = ranks[i] > 31 ? 31 : ranks[i];
    K[u] += (k - K[u]) >> 3;
    rnctx[i] = uint16_t(u * kKB + rctx_of(R[u]));
    int64_t r = runs[i] > 31 ? 31 : int64_t(runs[i]);
    R[u] += (r - R[u]) >> 4;
  }
}

// Decode rank walk: MTF state + K EMAs replay the encoder's contexts;
// each step pulls the next rank from its context's region of the sorted
// stream.  Returns 0, or -1 when a context's region is overrun (corrupt
// stream).
int trc_qlfc2_merge(const uint8_t* sorted_ranks, const uint64_t* base,
                    const uint64_t* counts, const uint8_t* init_list,
                    int64_t m, uint8_t* heads) {
  uint8_t order[256];
  memcpy(order, init_list, 256);
  int64_t K[256];
  uint64_t cur[kNCTX], lim[kNCTX];
  for (int i = 0; i < 256; ++i) K[i] = 4;
  for (int c = 0; c < kNCTX; ++c) { cur[c] = base[c]; lim[c] = base[c] + counts[c]; }
  for (int64_t i = 0; i < m; ++i) {
    unsigned u = order[0];
    unsigned c = u * kKB + rctx_of(K[u]);
    if (cur[c] >= lim[c]) return -1;
    unsigned k = sorted_ranks[cur[c]++];
    heads[i] = uint8_t(u);
    int64_t kc = k > 31 ? 31 : int64_t(k);
    K[u] += (kc - K[u]) >> 3;
    memmove(order, order + 1, k);
    order[k] = uint8_t(u);
  }
  return 0;
}

// Decode run demux: heads are known (rank walk ran first); replay the R
// EMAs to pull each run from its context's region.
int trc_qlfc2_rdemux(const uint8_t* heads, const uint32_t* sorted_runs,
                     const uint64_t* base, const uint64_t* counts,
                     int64_t m, uint32_t* runs) {
  int64_t R[256];
  uint64_t cur[kNCTX], lim[kNCTX];
  for (int i = 0; i < 256; ++i) R[i] = 1;
  for (int c = 0; c < kNCTX; ++c) { cur[c] = base[c]; lim[c] = base[c] + counts[c]; }
  for (int64_t i = 0; i < m; ++i) {
    unsigned u = heads[i];
    unsigned c = u * kKB + rctx_of(R[u]);
    if (cur[c] >= lim[c]) return -1;
    uint32_t r = sorted_runs[cur[c]++];
    runs[i] = r;
    int64_t rc = r > 31 ? 31 : int64_t(r);
    R[u] += (rc - R[u]) >> 4;
  }
  return 0;
}

}  // extern "C"
