"""Deterministic benchmark corpora.

No external datasets exist in this environment, so the benchmark corpus is
synthesized deterministically: an order-1 Markov byte source with text-like
statistics, optionally passed through our own BWT to produce an
"enwik8bwt-like" run-structured stream (the reference's headline benchmark
input is the BWT of enwik8, BASELINE.md).  Same seed -> same bytes on any
platform (numpy PCG64 is stable), so ratios/throughputs compare across
rounds.
"""
from __future__ import annotations

import pathlib

import numpy as np

_CACHE = pathlib.Path(__file__).resolve().parent / "_data"


def markov_text(n: int, seed: int = 0xBEEF) -> np.ndarray:
    """Text-like Markov bytes: s_{t+1} = f_{r_t}(s_t) over 8 random jump
    tables with zipf-weighted picks plus a 2% escape to uniform."""
    rng = np.random.default_rng(seed)
    A = 64
    alpha = np.frombuffer(
        b"abcdefghijklmnopqrstuvwxyz ABCDEFGHIJKLMNOPQRSTUVWXYZ.,;:'\"()-?\n",
        np.uint8)
    assert alpha.shape[0] == A
    w = 1.0 / np.arange(1, 9) ** 1.7
    w /= w.sum()
    fns = rng.integers(0, A, size=(8, A)).astype(np.uint8)
    r = rng.choice(8, size=n, p=w).astype(np.uint8)
    esc = rng.random(n) < 0.02
    u = rng.integers(0, A, size=n).astype(np.uint8)
    out = np.empty(n, np.uint8)
    s = 0
    # one-time cached generation; plain loop in chunks keeps memory flat
    fns_flat = fns.reshape(-1)
    sel = (r.astype(np.int32) * A)
    for i in range(n):
        s = u[i] if esc[i] else fns_flat[sel[i] + s]
        out[i] = s
    return alpha[out]


def real_source_text(n: int) -> np.ndarray:
    """Real (non-synthetic) text: concatenated installed-package Python
    sources plus the reference tree's C sources, truncated to n bytes.

    The COMMITTED _data file is the canonical corpus (the set of
    installed sources is machine-dependent); this generator only seeds
    it once.  Addresses the round-1 review's 'synthetic-only corpus'
    weakness: ratio claims get a real-text BWT alongside the Markov one."""
    import sysconfig
    roots = [pathlib.Path(sysconfig.get_paths()["purelib"]),
             pathlib.Path("/root/reference")]
    parts, total = [], 0
    for root in roots:
        if not root.exists():
            continue
        pats = ("*.py",) if "reference" not in str(root) else ("*.c", "*.h")
        for pat in pats:
            for p in sorted(root.rglob(pat)):
                try:
                    b = p.read_bytes()
                except OSError:
                    continue
                parts.append(np.frombuffer(b, np.uint8))
                total += len(b)
                if total >= n:
                    break
            if total >= n:
                break
        if total >= n:
            break
    if total < n:
        raise ValueError(f"only {total} real source bytes available")
    return np.concatenate(parts)[:n]


def get(name: str, n: int) -> np.ndarray:
    """Cached deterministic corpus: 'text'/'textbwt' (synthetic Markov)
    or 'realsrc'/'realsrcbwt' (real source text; committed file is
    canonical)."""
    _CACHE.mkdir(exist_ok=True)
    path = _CACHE / f"{name}_{n}.bin"
    if path.exists():
        return np.fromfile(path, np.uint8)
    if name == "text":
        data = markov_text(n)
    elif name == "realsrc":
        data = real_source_text(n)
    elif name.endswith("bwt"):
        from turborc_tpu.host import native
        text = get(name[:-3], n)
        data, _ = native.bwt(text)
    else:
        raise ValueError(name)
    data.tofile(path)
    return data
