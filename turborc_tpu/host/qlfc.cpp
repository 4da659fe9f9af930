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
