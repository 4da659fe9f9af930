// bec: M99-style hierarchical bit entropy coder - native host coder.
//
// Bit-exact implementation of the wire format specified by
// turborc_tpu/codecs/bec.py (the numpy coder is the executable spec;
// parity is enforced by tests/test_bec_misc.py).  Level-order forest
// coding over an ACTIVE segment set with phase-in (truncated binary)
// count codes, plus the wavelet-conditioned plane permutation
// (plane b stably sorted by each position's b-bit prefix).
//
// Reference semantics: bec_.c/bec_b.c (recursive M99 with bectab range
// codes); this module is the host-disposition redesign (SURVEY 2.6).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

using u8 = uint8_t;
using u64 = uint64_t;
using i64 = int64_t;

inline int blc(i64 m) {  // ceil(log2(m)) for m >= 1
  return m > 1 ? 64 - __builtin_clzll((u64)(m - 1)) : 0;
}

struct BitWriter {  // LSB-first within little-endian u64 words
  std::vector<u64> words;
  i64 nbits = 0;
  void put(u64 v, int w) {
    if (w <= 0) return;
    i64 word = nbits >> 6;
    int off = (int)(nbits & 63);
    if ((i64)words.size() < word + 2) words.resize(word + 2, 0);
    words[word] |= v << off;
    if (off) words[word + 1] |= v >> (64 - off);
    nbits += w;
  }
  // python _BitWriter.pack emits (nbits+63)//64 + 1 words (hi-spill slot)
  i64 packed_bytes() const { return nbits ? ((nbits + 63) / 64 + 1) * 8 : 0; }
  void pack_to(u8* out) const {
    i64 nb = packed_bytes();
    std::memset(out, 0, (size_t)nb);
    std::memcpy(out, words.data(),
                (size_t)std::min<i64>(nb, (i64)words.size() * 8));
  }
};

struct BitReader {
  const u8* buf;
  i64 nbytes;   // payload bytes available
  i64 pos = 0;  // bit position
  bool bad = false;
  // positional read: no serial dependency on a reader cursor, so
  // independent reads overlap in the out-of-order core
  u64 at(i64 p, int w) {
    if (w <= 0) return 0;
    i64 byte = p >> 3;
    u64 lo, hi;
    if (byte + 16 <= nbytes) {  // hot path: direct unaligned loads
      std::memcpy(&lo, buf + byte, 8);
      std::memcpy(&hi, buf + byte + 8, 8);
    } else {
      // python reader pads with >= 8 zero bytes and flags reads past
      // the padded length as corrupt
      if (p + w > nbytes * 8 + 64) { bad = true; return 0; }
      u8 tmp[16] = {0};
      i64 take = nbytes - byte;
      if (take > 16) take = 16;
      if (take > 0) std::memcpy(tmp, buf + byte, (size_t)take);
      std::memcpy(&lo, tmp, 8);
      std::memcpy(&hi, tmp + 8, 8);
    }
    int off = (int)(p & 7);
    u64 v = lo >> off;
    if (off) v |= hi << (64 - off);
    return w >= 64 ? v : (v & ((u64(1) << w) - 1));
  }
  u64 get(int w) {
    u64 v = at(pos, w);
    pos += w;
    return v;
  }
};

// ---- forest encode: R trees of K leaves, level-order active set -----------

void encode_forest(const u8* bits, i64 R, i64 K, BitWriter& wr,
                   std::vector<int32_t>& cur, std::vector<int32_t>& nxt,
                   std::vector<i64>& active, std::vector<i64>& act2) {
  int levels = 0;
  while ((i64(1) << levels) < K) ++levels;
  int rootw = levels + 1;  // bit_length(K) for power-of-two K
  // pyramid bottom-up into nxt (leaf level handled from bits directly);
  // we need pyramid[l] and pyramid[l+1] per level: recompute top-down is
  // O(n log n); build all levels once instead (sum sizes = 2*R*K).
  // Layout: lvl[l] has R<<l entries; store each level contiguously.
  static thread_local std::vector<std::vector<int32_t>> pyr;
  pyr.resize((size_t)levels + 1);
  pyr[(size_t)levels].resize((size_t)(R * K));
  for (i64 i = 0; i < R * K; ++i) pyr[(size_t)levels][(size_t)i] = bits[i];
  for (int l = levels - 1; l >= 0; --l) {
    i64 n = R << l;
    pyr[(size_t)l].resize((size_t)n);
    const int32_t* ch = pyr[(size_t)l + 1].data();
    int32_t* pa = pyr[(size_t)l].data();
    for (i64 f = 0; f < n; ++f) pa[f] = ch[2 * f] + ch[2 * f + 1];
  }
  active.clear();
  for (i64 r = 0; r < R; ++r) {
    int32_t c = pyr[0][(size_t)r];
    wr.put((u64)c, rootw);
    if (c > 0 && c < K) active.push_back(r);
  }
  for (int l = 0; l < levels; ++l) {
    if (active.empty()) break;
    i64 h = K >> (l + 1);
    const int32_t* pl = pyr[(size_t)l].data();
    const int32_t* ch = pyr[(size_t)l + 1].data();
    // pass 1: prefix fields; remember phase-in state for pass 2
    for (i64 f : active) {
      i64 t = pl[f], left = ch[2 * f];
      i64 lo = t - h > 0 ? t - h : 0;
      i64 m = (t < h ? t : h) - lo + 1;
      i64 v = left - lo;
      int b = blc(m);
      i64 T = (i64(1) << b) - m;
      if (v < T) wr.put((u64)v, b - 1 > 0 ? b - 1 : 0);
      else wr.put((u64)((v + T) >> 1), b - 1 > 0 ? b - 1 : 0);
    }
    // pass 2: extra bits
    for (i64 f : active) {
      i64 t = pl[f], left = ch[2 * f];
      i64 lo = t - h > 0 ? t - h : 0;
      i64 m = (t < h ? t : h) - lo + 1;
      i64 v = left - lo;
      int b = blc(m);
      i64 T = (i64(1) << b) - m;
      if (!(v < T) && b >= 1) wr.put((u64)((v + T) & 1), 1);
    }
    if (l + 1 < levels) {
      act2.clear();
      for (i64 f : active)
        for (i64 kid = 2 * f; kid <= 2 * f + 1; ++kid) {
          int32_t kc = ch[kid];
          if (kc > 0 && kc < h) act2.push_back(kid);
        }
      active.swap(act2);
    }
  }
  (void)cur; (void)nxt;
}

// ---- forest decode --------------------------------------------------------

// Sparse active-set decode (r05 speedup): the dense version propagated
// counts for EVERY node of every level (16n writes per plane) plus a
// final n-byte copy.  Saturated/empty segments code nothing and their
// whole subtree is determined (all-1 / all-0), so only ACTIVE segments
// carry state here; inactive children resolve to direct span fills of
// the output.  Node f at level l covers out[f*w, (f+1)*w), w = K>>l
// (trees are contiguous).  Bitstream-identical to the dense decoder.
bool decode_forest(BitReader& rd, i64 R, i64 K, u8* out,
                   std::vector<int32_t>& cur, std::vector<int32_t>& nxt,
                   std::vector<i64>& active, std::vector<i64>& act2,
                   std::vector<int64_t>& pres) {
  int levels = 0;
  while ((i64(1) << levels) < K) ++levels;
  int rootw = levels + 1;
  std::memset(out, 0, (size_t)(R * K));
  active.clear();            // node ids at the current level
  cur.clear();               // matching counts (parallel array)
  for (i64 r = 0; r < R; ++r) {
    i64 c = (i64)rd.get(rootw);
    if (c < 0 || c > K || rd.bad) return false;
    if (c == K) std::memset(out + r * K, 1, (size_t)K);
    else if (c > 0) { active.push_back(r); cur.push_back((int32_t)c); }
  }
  for (int l = 0; l < levels && !active.empty(); ++l) {
    i64 h = K >> (l + 1);
    size_t na = active.size();
    if (h == 1) {
      // last level: t == 1, m == 2, b == 1, T == 0 - zero prefix bits,
      // exactly one extra bit per active segment.
      i64 p = rd.pos;
      if (p + (i64)na > rd.nbytes * 8 + 64) return false;
      const i64 limit = rd.nbytes * 8;  // reads in the pad window are 0
      for (size_t i = 0; i < na; ++i) {
        i64 f = active[i];
        u8 bit = p < limit
            ? (u8)((rd.buf[(size_t)(p >> 3)] >> (p & 7)) & 1) : (u8)0;
        ++p;
        out[2 * f] = bit;
        out[2 * f + 1] = (u8)(1 - bit);
      }
      rd.pos = p;
      break;
    }
    pres.resize(na);
    // pass 1: all prefix fields of the level.  Widths depend only on
    // the previous level's counts, so field positions are computed
    // up-front and the reads carry no serial cursor dependency.
    i64 p = rd.pos;
    for (size_t i = 0; i < na; ++i) {
      i64 t = cur[i];
      i64 lo = t - h > 0 ? t - h : 0;
      i64 m = (t < h ? t : h) - lo + 1;
      int w = blc(m) - 1;
      if (w < 0) w = 0;
      pres[i] = (i64)rd.at(p, w);
      p += w;
    }
    rd.pos = p;
    // pass 2: extras, resolve, emit children (fill or stay active)
    act2.clear();
    nxt.clear();
    for (size_t i = 0; i < na; ++i) {
      i64 f = active[i];
      i64 t = cur[i];
      i64 lo = t - h > 0 ? t - h : 0;
      i64 m = (t < h ? t : h) - lo + 1;
      int b = blc(m);
      i64 T = (i64(1) << b) - m;
      i64 v = pres[i];
      if (v >= T && b >= 1) v = ((v << 1) | (i64)rd.get(1)) - T;
      if (v < 0 || v >= m || rd.bad) return false;
      i64 left = v + lo, right = t - left;
      if (left == h) std::memset(out + 2 * f * h, 1, (size_t)h);
      else if (left > 0) { act2.push_back(2 * f); nxt.push_back((int32_t)left); }
      if (right == h) std::memset(out + (2 * f + 1) * h, 1, (size_t)h);
      else if (right > 0) { act2.push_back(2 * f + 1); nxt.push_back((int32_t)right); }
    }
    active.swap(act2);
    cur.swap(nxt);
  }
  return !rd.bad;
}

}  // namespace

extern "C" {

// Wavelet-conditioned bec encode of a padded [L, K] byte block.
// Returns total payload BITS (python frames as 8-byte LE total + body of
// ((bits+63)/64 + 1)*8 bytes), or -1 if out_cap is too small.
int64_t trc_becw_enc(const uint8_t* block, int64_t L, int64_t K,
                     uint8_t* out, int64_t out_cap) {
  i64 n = L * K;
  BitWriter wr;
  std::vector<int32_t> cur, nxt;
  std::vector<i64> active, act2;
  std::vector<u8> bits((size_t)n), sorted_bits((size_t)n);
  std::vector<int32_t> off(257);
  for (int b = 0; b < 8; ++b) {
    const int shift = 7 - b;
    if (b == 0) {
      for (i64 i = 0; i < n; ++i) bits[(size_t)i] = (block[i] >> 7) & 1;
      encode_forest(bits.data(), L, K, wr, cur, nxt, active, act2);
    } else {
      const int pshift = 8 - b;  // prefix = byte >> (8-b)
      i64 nb = i64(1) << b;      // bucket count
      for (i64 r = 0; r < L; ++r) {
        const u8* row = block + r * K;
        u8* dst = sorted_bits.data() + r * K;
        std::fill(off.begin(), off.begin() + (size_t)nb + 1, 0);
        for (i64 p = 0; p < K; ++p) off[(size_t)(row[p] >> pshift) + 1]++;
        for (i64 q = 0; q < nb; ++q) off[(size_t)q + 1] += off[(size_t)q];
        for (i64 p = 0; p < K; ++p)
          dst[off[(size_t)(row[p] >> pshift)]++] = (row[p] >> shift) & 1;
      }
      encode_forest(sorted_bits.data(), L, K, wr, cur, nxt, active, act2);
    }
  }
  i64 nb = wr.packed_bytes();
  if (nb > out_cap) return -1;
  wr.pack_to(out);
  return wr.nbits;
}

// Inverse; out_block is the padded [L, K] byte block.  Returns 0, or -1
// on corrupt payload.
int trc_becw_dec(const uint8_t* payload, int64_t payload_bytes,
                 int64_t L, int64_t K, uint8_t* out_block) {
  i64 n = L * K;
  BitReader rd{payload, payload_bytes};
  std::vector<int32_t> cur, nxt;
  std::vector<i64> active, act2;
  std::vector<int64_t> pres;
  std::vector<u8> bits((size_t)n);
  std::vector<int32_t> off(257);
  // carried per-row bucket counts for the NEXT plane (r05): the bucket
  // of position p at plane b+1 is (q << 1) | bit_decoded_at_plane_b, so
  // the scatter pass can accumulate the next plane's histogram for free
  // and the dedicated counting pass (1 of the 3 passes/row/plane) drops.
  std::vector<int32_t> cnts((size_t)L * 256, 0);
  std::memset(out_block, 0, (size_t)n);
  for (int b = 0; b < 8; ++b) {
    if (!decode_forest(rd, L, K, bits.data(), cur, nxt, active, act2, pres))
      return -1;
    const int shift = 7 - b;
    if (b == 0) {
      for (i64 r = 0; r < L; ++r) {
        u8* row = out_block + r * K;
        const u8* src = bits.data() + r * K;
        int32_t* cn = cnts.data() + r * 256;
        cn[0] = cn[1] = 0;
        for (i64 p = 0; p < K; ++p) {
          u8 bit = src[p];
          row[p] = (u8)(bit << 7);
          ++cn[bit];
        }
      }
    } else {
      const int pshift = 8 - b;
      i64 nbuck = i64(1) << b;
      const bool last = b == 7;
      for (i64 r = 0; r < L; ++r) {
        u8* row = out_block + r * K;
        const u8* src = bits.data() + r * K;
        int32_t* cn = cnts.data() + r * 256;
        off[0] = 0;
        for (i64 q = 0; q < nbuck; ++q) off[(size_t)q + 1] = off[(size_t)q] + cn[q];
        if (!last) {
          std::fill(cn, cn + (size_t)(nbuck << 1), 0);
          for (i64 p = 0; p < K; ++p) {
            i64 q = row[p] >> pshift;
            u8 bit = src[off[(size_t)q]++];
            row[p] |= bit << shift;
            ++cn[(size_t)((q << 1) | bit)];
          }
        } else {
          for (i64 p = 0; p < K; ++p)
            row[p] |= src[off[(size_t)(row[p] >> pshift)]++] << shift;
        }
      }
    }
  }
  return 0;
}

}  // extern "C"
