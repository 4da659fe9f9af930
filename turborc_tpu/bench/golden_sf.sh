#!/bin/bash
# Pump golden `rcsf` (FSM-predictor) streams from the reference binary's
# own coder (rcsfenc/rcsfdec linked from the same-machine build), for
# the FSM table-parity tests (VERDICT r04 item 8).
#
# Writes tests/golden/rcsf_<name>.stream for each existing
# tests/golden/rcs_<name>.raw, using the reference's shipped FSM1.txt
# (rc_sf.c:40-50 loads "FSM<id>.txt" from the cwd; -psf default id 1).
set -euo pipefail
HERE=$(cd "$(dirname "$0")" && pwd)
REPO=$(cd "$HERE/../.." && pwd)
REF=$("$HERE/build_reference.sh" | tail -1)
OUT=$(dirname "$REF")
GOLD="$REPO/tests/golden"

cat > "$OUT/pump_sf.c" <<'EOF'
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "include/turborc.h"
int verbose = 0;   /* rcutil.o references turborc.c's global */
extern void fsm_init(int id);
extern fsm_t fsm[];
int main(int argc, char **argv) {
  if (argc != 3) { fprintf(stderr, "usage: pump_sf in out\n"); return 2; }
  FILE *fi = fopen(argv[1], "rb");
  if (!fi) { perror(argv[1]); return 2; }
  fseek(fi, 0, SEEK_END); long n = ftell(fi); fseek(fi, 0, SEEK_SET);
  unsigned char *in = malloc(n), *out = malloc(2 * n + 4096),
                *cpy = malloc(n);
  if (fread(in, 1, n, fi) != (size_t)n) { perror("fread"); return 2; }
  fclose(fi);
  fsm_init(1);
  size_t clen = rcsfenc(in, n, out, fsm);
  size_t dlen = rcsfdec(out, n, cpy, fsm);
  (void)dlen;
  if (memcmp(in, cpy, n)) { fprintf(stderr, "roundtrip FAIL\n"); return 1; }
  FILE *fo = fopen(argv[2], "wb");
  fwrite(out, 1, clen, fo); fclose(fo);
  printf("%s: %ld -> %zu\n", argv[1], n, clen);
  return 0;
}
EOF
# link against the build's objects (the makefile already produced them)
cc -O2 -I"$OUT" -I"$OUT/include_" "$OUT/pump_sf.c" \
   "$OUT"/rc_s.o "$OUT"/rc_ss.o "$OUT"/rc_sf.o "$OUT"/rccm_s.o \
   "$OUT"/rccm_ss.o "$OUT"/rccm_sf.o "$OUT"/rcqlfc_s.o "$OUT"/rcqlfc_ss.o \
   "$OUT"/rcqlfc_sf.o "$OUT"/rcutil.o -lm -o "$OUT/pump_sf"
cd "$OUT"   # fsm_init reads FSM1.txt from the cwd
for raw in "$GOLD"/rcs_*.raw; do
  name=$(basename "$raw" .raw); name=${name#rcs_}
  "$OUT/pump_sf" "$raw" "$GOLD/rcsf_${name}.stream"
done
