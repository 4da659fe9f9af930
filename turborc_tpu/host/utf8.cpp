// UTF-8 preprocessor (host stage).
//
// Reference counterpart: utf8enc/utf8dec (rcutil.c:223-527): parse the
// input as UTF-8 code points, build a frequency-sorted symbol table, and
// remap each code point to a 1- or 2-byte id so the downstream BWT/entropy
// stage sees a dense small alphabet.  Clean-room scheme:
//
//   ids 0..127          -> the 128 most frequent code points (1 byte)
//   ids (0x80|hi), lo   -> the rest, rank-ordered      (2 bytes)
//   capacity 128 + 128*256 = 32896 distinct code points, else bail
//
//   stream = varint(#symbols) ++ varint(codepoint) per rank ++ mapped ids
//
// Parsing is strict (overlong forms, surrogates, and >0x10FFFF rejected),
// which guarantees decode(encode(x)) reproduces the input bytes exactly.
#include <algorithm>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

constexpr int ONE_BYTE_IDS = 128;
constexpr int64_t MAX_SYMS = ONE_BYTE_IDS + (256 - ONE_BYTE_IDS) * 256;

inline void put_varint(uint8_t*& op, uint64_t v) {
  while (v >= 0x80) { *op++ = uint8_t(v) | 0x80; v >>= 7; }
  *op++ = uint8_t(v);
}

inline bool get_varint(const uint8_t*& ip, const uint8_t* iend,
                       uint64_t& v) {
  v = 0;
  int sh = 0;
  while (ip < iend && sh <= 63) {
    uint8_t b = *ip++;
    v |= uint64_t(b & 0x7F) << sh;
    if (!(b & 0x80)) return true;
    sh += 7;
  }
  return false;
}

// strict UTF-8 scan: returns code point count into `cps`, or -1 on any
// invalid byte sequence.
int64_t parse_utf8(const uint8_t* in, int64_t n, std::vector<uint32_t>& cps) {
  cps.clear();
  cps.reserve(size_t(n));
  int64_t i = 0;
  while (i < n) {
    uint8_t b0 = in[i];
    uint32_t cp;
    int len;
    if (b0 < 0x80) {
      cp = b0;
      len = 1;
    } else if ((b0 & 0xE0) == 0xC0) {
      cp = b0 & 0x1F;
      len = 2;
    } else if ((b0 & 0xF0) == 0xE0) {
      cp = b0 & 0x0F;
      len = 3;
    } else if ((b0 & 0xF8) == 0xF0) {
      cp = b0 & 0x07;
      len = 4;
    } else {
      return -1;
    }
    if (i + len > n) return -1;
    for (int k = 1; k < len; ++k) {
      uint8_t b = in[i + k];
      if ((b & 0xC0) != 0x80) return -1;
      cp = (cp << 6) | (b & 0x3F);
    }
    // overlong / surrogate / out-of-range checks
    if ((len == 2 && cp < 0x80) || (len == 3 && cp < 0x800) ||
        (len == 4 && cp < 0x10000) || cp > 0x10FFFF ||
        (cp >= 0xD800 && cp <= 0xDFFF))
      return -1;
    cps.push_back(cp);
    i += len;
  }
  return int64_t(cps.size());
}

inline int utf8_emit(uint32_t cp, uint8_t* op) {
  if (cp < 0x80) {
    op[0] = uint8_t(cp);
    return 1;
  }
  if (cp < 0x800) {
    op[0] = uint8_t(0xC0 | (cp >> 6));
    op[1] = uint8_t(0x80 | (cp & 0x3F));
    return 2;
  }
  if (cp < 0x10000) {
    op[0] = uint8_t(0xE0 | (cp >> 12));
    op[1] = uint8_t(0x80 | ((cp >> 6) & 0x3F));
    op[2] = uint8_t(0x80 | (cp & 0x3F));
    return 3;
  }
  op[0] = uint8_t(0xF0 | (cp >> 18));
  op[1] = uint8_t(0x80 | ((cp >> 12) & 0x3F));
  op[2] = uint8_t(0x80 | ((cp >> 6) & 0x3F));
  op[3] = uint8_t(0x80 | (cp & 0x3F));
  return 4;
}

}  // namespace

extern "C" {

// Returns remapped length, or -1 if the input is not valid UTF-8, the
// alphabet exceeds capacity, or the output would not fit in `cap`.
int64_t trc_utf8_enc(const uint8_t* in, int64_t n, uint8_t* out,
                     int64_t cap) {
  std::vector<uint32_t> cps;
  if (parse_utf8(in, n, cps) < 0) return -1;
  std::unordered_map<uint32_t, int64_t> freq;
  for (uint32_t cp : cps) ++freq[cp];
  if (int64_t(freq.size()) > MAX_SYMS) return -1;
  std::vector<std::pair<int64_t, uint32_t>> rank;  // (-count, cp)
  rank.reserve(freq.size());
  for (auto& kv : freq) rank.push_back({-kv.second, kv.first});
  std::sort(rank.begin(), rank.end());
  std::unordered_map<uint32_t, uint32_t> id;
  id.reserve(rank.size());
  for (size_t r = 0; r < rank.size(); ++r) id[rank[r].second] = uint32_t(r);

  uint8_t* op = out;
  uint8_t* oend = out + cap;
  if (op + 10 > oend) return -1;
  put_varint(op, rank.size());
  for (auto& rc : rank) {
    if (op + 5 > oend) return -1;
    put_varint(op, rc.second);
  }
  for (uint32_t cp : cps) {
    uint32_t r = id[cp];
    if (op + 2 > oend) return -1;
    if (r < ONE_BYTE_IDS) {
      *op++ = uint8_t(r);
    } else {
      uint32_t x = r - ONE_BYTE_IDS;
      *op++ = uint8_t(ONE_BYTE_IDS + (x >> 8));
      *op++ = uint8_t(x & 0xFF);
    }
  }
  return op - out;
}

// Returns decoded UTF-8 length (must equal the original), or -1 on error.
int64_t trc_utf8_dec(const uint8_t* in, int64_t n, uint8_t* out,
                     int64_t outcap) {
  const uint8_t* ip = in;
  const uint8_t* iend = in + n;
  uint64_t nsym;
  if (!get_varint(ip, iend, nsym) || int64_t(nsym) > MAX_SYMS) return -1;
  std::vector<uint32_t> cps(static_cast<size_t>(nsym));
  for (uint64_t r = 0; r < nsym; ++r) {
    uint64_t cp;
    if (!get_varint(ip, iend, cp) || cp > 0x10FFFF) return -1;
    cps[size_t(r)] = uint32_t(cp);
  }
  int64_t o = 0;
  while (ip < iend) {
    uint8_t b = *ip++;
    uint32_t r;
    if (b < ONE_BYTE_IDS) {
      r = b;
    } else {
      if (ip >= iend) return -1;
      r = ONE_BYTE_IDS + ((uint32_t(b) - ONE_BYTE_IDS) << 8) + *ip++;
    }
    if (r >= nsym) return -1;
    uint8_t tmp[4];
    int len = utf8_emit(cps[r], tmp);
    if (o + len > outcap) return -1;
    memcpy(out + o, tmp, size_t(len));
    o += len;
  }
  return o;
}

// 16-bit-id variant (reference xbwt16 input, rcbwt.c:66-80): every code
// point maps to one u16 rank id - the stream feeds the 16-bit BWT.
// Layout: varint(#syms) ++ varint(cp) per rank ++ u16-LE ids.
int64_t trc_utf8_enc16(const uint8_t* in, int64_t n, uint8_t* out,
                       int64_t cap) {
  std::vector<uint32_t> cps;
  if (parse_utf8(in, n, cps) < 0) return -1;
  std::unordered_map<uint32_t, int64_t> freq;
  for (uint32_t cp : cps) ++freq[cp];
  if (int64_t(freq.size()) > 65536) return -1;
  std::vector<std::pair<int64_t, uint32_t>> rank;
  rank.reserve(freq.size());
  for (auto& kv : freq) rank.push_back({-kv.second, kv.first});
  std::sort(rank.begin(), rank.end());
  std::unordered_map<uint32_t, uint32_t> id;
  id.reserve(rank.size());
  for (size_t r = 0; r < rank.size(); ++r) id[rank[r].second] = uint32_t(r);

  uint8_t* op = out;
  uint8_t* oend = out + cap;
  if (op + 10 > oend) return -1;
  put_varint(op, rank.size());
  for (auto& rc : rank) {
    if (op + 5 > oend) return -1;
    put_varint(op, rc.second);
  }
  for (uint32_t cp : cps) {
    if (op + 2 > oend) return -1;
    uint32_t r = id[cp];
    *op++ = uint8_t(r & 0xFF);
    *op++ = uint8_t(r >> 8);
  }
  return op - out;
}

int64_t trc_utf8_dec16(const uint8_t* in, int64_t n, uint8_t* out,
                       int64_t outcap) {
  const uint8_t* ip = in;
  const uint8_t* iend = in + n;
  uint64_t nsym;
  if (!get_varint(ip, iend, nsym) || nsym > 65536) return -1;
  std::vector<uint32_t> cps(static_cast<size_t>(nsym));
  for (uint64_t r = 0; r < nsym; ++r) {
    uint64_t cp;
    if (!get_varint(ip, iend, cp) || cp > 0x10FFFF) return -1;
    cps[size_t(r)] = uint32_t(cp);
  }
  if ((iend - ip) & 1) return -1;
  int64_t o = 0;
  while (ip < iend) {
    uint32_t r = uint32_t(ip[0]) | (uint32_t(ip[1]) << 8);
    ip += 2;
    if (r >= nsym) return -1;
    uint8_t tmp[4];
    int len = utf8_emit(cps[r], tmp);
    if (o + len > outcap) return -1;
    memcpy(out + o, tmp, size_t(len));
    o += len;
  }
  return o;
}

}  // extern "C"
