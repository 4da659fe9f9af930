#!/bin/bash
# Build the reference TurboRC binary (read-only tree at /root/reference) into
# a /tmp scratch dir, for use as the permanent same-data baseline + golden rig.
#
# Recipe (three fixups needed on this snapshot):
#   1. libdivsufsort/unbwt.h must be visible under libdivsufsort/include/
#   2. include_/*.h headers must be visible at the repo root
#   3. rcbwt.c:62 has a mangled "i             f(!sa)" -> "if(!sa)"
#
# Output: /tmp/turborc_ref/turborc (cached; rebuild only if absent).
set -euo pipefail
OUT=/tmp/turborc_ref
BIN=$OUT/turborc
if [ -x "$BIN" ]; then
  echo "$BIN"
  exit 0
fi
rm -rf "$OUT"
cp -r /root/reference "$OUT"
chmod -R u+w "$OUT"
cp "$OUT/libdivsufsort/unbwt.h" "$OUT/libdivsufsort/include/" 2>/dev/null || true
cp "$OUT"/include_/*.h "$OUT/" 2>/dev/null || true
sed -i 's/i             f(!sa)/if(!sa)/' "$OUT/rcbwt.c"
make -C "$OUT" BWTDIV=1 -j"$(nproc)" >"$OUT/build.log" 2>&1 || {
  tail -30 "$OUT/build.log" >&2
  exit 1
}
echo "$BIN"
