"""Build the native host library (C++ BWT / transforms) with g++.

Usage: python -m turborc_tpu.host.build [--force]
The .so is cached next to the sources; `native.load()` triggers a build on
first use if missing.
"""
from __future__ import annotations

import hashlib
import pathlib
import subprocess
import sys

_HOST_DIR = pathlib.Path(__file__).resolve().parent
SOURCES = ["sais.cpp", "qlfc.cpp", "lzp.cpp", "utf8.cpp", "bec.cpp"]
LIB = _HOST_DIR / "libtrchost.so"
STAMP = _HOST_DIR / ".libtrchost.hash"


def _hash_sources() -> str:
    h = hashlib.sha256()
    for s in SOURCES:
        p = _HOST_DIR / s
        if p.exists():
            h.update(p.read_bytes())
    return h.hexdigest()


def build(force: bool = False) -> pathlib.Path:
    want = _hash_sources()
    if not force and LIB.exists() and STAMP.exists() and \
            STAMP.read_text().strip() == want:
        return LIB
    srcs = [str(_HOST_DIR / s) for s in SOURCES if (_HOST_DIR / s).exists()]
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           "-o", str(LIB)] + srcs + ["-lpthread"]
    subprocess.run(cmd, check=True)
    STAMP.write_text(want)
    return LIB


if __name__ == "__main__":
    build(force="--force" in sys.argv)
    print(LIB)
