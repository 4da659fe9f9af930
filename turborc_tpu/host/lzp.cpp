// LZP preprocessor (host stage).
//
// Reference counterpart: lzpenc/lzpdec (rcutil.c:119-171): an order-4-hash
// match predictor with escape-coded match lengths, used in front of the
// BWT to collapse long repeats.  Clean-room scheme:
//
//   output = literal bytes; 0xFF is an escape:
//     0xFF <varint 0>        -> literal 0xFF
//     0xFF <varint k>  (k>0) -> match of length (minlen + k - 1) at the
//                               position predicted by the hash table
//   hash = order-4 multiplicative hash over the previous 4 bytes; the
//   table maps hash -> last position, updated at every position on both
//   sides (encoder and decoder stay in sync by construction).
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t HBITS = 16;
constexpr uint8_t ESC = 0xFF;

inline uint32_t hash4(const uint8_t* p) {
  uint32_t v;
  memcpy(&v, p, 4);
  return (v * 2654435761u) >> (32 - HBITS);
}

inline void put_varint(uint8_t*& op, uint64_t v) {
  while (v >= 0x80) { *op++ = uint8_t(v) | 0x80; v >>= 7; }
  *op++ = uint8_t(v);
}

inline uint64_t get_varint(const uint8_t*& ip) {
  uint64_t v = 0;
  int sh = 0;
  for (;;) {
    uint8_t b = *ip++;
    v |= uint64_t(b & 0x7F) << sh;
    if (!(b & 0x80)) return v;
    sh += 7;
  }
}

}  // namespace

extern "C" {

// Returns compressed length, or -1 if it would not fit in `cap`.
int64_t trc_lzp_enc(const uint8_t* in, int64_t n, uint8_t* out, int64_t cap,
                    int64_t minlen) {
  if (minlen < 8) minlen = 8;
  std::vector<int64_t> tab(1 << HBITS, -1);
  uint8_t* op = out;
  uint8_t* oend = out + cap;
  int64_t i = 0;
  while (i < n) {
    if (op + 10 > oend) return -1;
    if (i >= 4 && i + 4 <= n) {
      uint32_t h = hash4(in + i - 4);
      int64_t q = tab[h];
      tab[h] = i;
      if (q >= 0) {
        int64_t m = 0;
        while (i + m < n && in[q + m] == in[i + m]) ++m;
        if (m >= minlen) {
          *op++ = ESC;
          put_varint(op, uint64_t(m - minlen + 1));
          // keep the hash table warm inside the match (decoder mirrors)
          int64_t stop = i + m;
          for (int64_t j = i + 1; j < stop; ++j)
            if (j >= 4) tab[hash4(in + j - 4)] = j;
          i += m;
          continue;
        }
      }
    }
    uint8_t b = in[i++];
    *op++ = b;
    if (b == ESC) put_varint(op, 0);
  }
  return op - out;
}

int64_t trc_lzp_dec(const uint8_t* in, int64_t n, uint8_t* out,
                    int64_t outcap, int64_t minlen) {
  if (minlen < 8) minlen = 8;
  std::vector<int64_t> tab(1 << HBITS, -1);
  const uint8_t* ip = in;
  const uint8_t* iend = in + n;
  int64_t o = 0;
  while (ip < iend) {
    int64_t q = -1;
    if (o >= 4) {
      uint32_t h = hash4(out + o - 4);
      q = tab[h];
      tab[h] = o;
    }
    uint8_t b = *ip++;
    if (b == ESC) {
      uint64_t k = get_varint(ip);
      if (k == 0) {
        if (o >= outcap) return -1;
        out[o++] = ESC;
      } else {
        int64_t m = int64_t(k) + minlen - 1;
        if (q < 0 || o + m > outcap) return -1;
        int64_t stop = o + m;
        for (int64_t j = 0; j < m; ++j) out[o + j] = out[q + j];
        for (int64_t j = o + 1; j < stop; ++j)
          if (j >= 4) tab[hash4(out + j - 4)] = j;
        o = stop;
      }
    } else {
      if (o >= outcap) return -1;
      out[o++] = b;
    }
  }
  return o;
}

}  // extern "C"
