"""ctypes bindings for the native host library."""
from __future__ import annotations

import ctypes
import functools

import numpy as np

from turborc_tpu.host import build as _build


@functools.lru_cache(maxsize=1)
def load() -> ctypes.CDLL:
    lib = ctypes.CDLL(str(_build.build()))
    lib.trc_bwt.restype = ctypes.c_int64
    lib.trc_bwt.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
    lib.trc_unbwt.restype = ctypes.c_int
    lib.trc_unbwt.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                              ctypes.c_int64, ctypes.c_int64]
    lib.trc_sais.restype = ctypes.c_int
    lib.trc_sais.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
    for f in (lib.trc_mtf_enc, lib.trc_mtf_dec):
        f.restype = None
        f.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
    return lib


def bwt(data: np.ndarray):
    """Burrows-Wheeler transform; returns (bwt bytes, primary index)."""
    data = np.ascontiguousarray(data, np.uint8)
    out = np.empty_like(data)
    p = load().trc_bwt(data.ctypes.data, out.ctypes.data, data.shape[0])
    if p < 0:
        raise ValueError("bwt failed (input too large?)")
    return out, int(p)


def unbwt(data: np.ndarray, primary: int) -> np.ndarray:
    data = np.ascontiguousarray(data, np.uint8)
    out = np.empty_like(data)
    rc = load().trc_unbwt(data.ctypes.data, out.ctypes.data, data.shape[0],
                          primary)
    if rc != 0:
        raise ValueError("unbwt failed: corrupt input or bad primary index")
    return out


def suffix_array(data: np.ndarray) -> np.ndarray:
    """SA of data + sentinel; length n+1, sa[0] == n."""
    data = np.ascontiguousarray(data, np.uint8)
    sa = np.empty(data.shape[0] + 1, np.int32)
    if load().trc_sais(data.ctypes.data, sa.ctypes.data, data.shape[0]) != 0:
        raise ValueError("sais failed")
    return sa


def _bwt16_bind():
    lib = load()
    if not hasattr(lib.trc_bwt16, "_bound"):
        lib.trc_bwt16.restype = ctypes.c_int64
        lib.trc_bwt16.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                  ctypes.c_int64]
        lib.trc_unbwt16.restype = ctypes.c_int
        lib.trc_unbwt16.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_int64, ctypes.c_int64]
        lib.trc_bwt16._bound = True
    return lib


def bwt16(elems: np.ndarray):
    """BWT over 16-bit symbols (reference xbwt16 for UTF-8 2-byte ids)."""
    elems = np.ascontiguousarray(elems, np.uint16)
    out = np.empty_like(elems)
    p = _bwt16_bind().trc_bwt16(elems.ctypes.data, out.ctypes.data,
                                elems.shape[0])
    if p < 0:
        raise ValueError("bwt16 failed (input too large?)")
    return out, int(p)


def unbwt16(elems: np.ndarray, primary: int) -> np.ndarray:
    elems = np.ascontiguousarray(elems, np.uint16)
    out = np.empty_like(elems)
    rc = _bwt16_bind().trc_unbwt16(elems.ctypes.data, out.ctypes.data,
                                   elems.shape[0], primary)
    if rc != 0:
        raise ValueError("unbwt16 failed: corrupt input or bad primary")
    return out


def mtf(data: np.ndarray) -> np.ndarray:
    """Move-to-front rank transform (QLFC host stage)."""
    data = np.ascontiguousarray(data, np.uint8)
    out = np.empty_like(data)
    load().trc_mtf_enc(data.ctypes.data, out.ctypes.data, data.shape[0])
    return out


def unmtf(data: np.ndarray) -> np.ndarray:
    data = np.ascontiguousarray(data, np.uint8)
    out = np.empty_like(data)
    load().trc_mtf_dec(data.ctypes.data, out.ctypes.data, data.shape[0])
    return out


def _lzp_bind():
    lib = load()
    if not hasattr(lib.trc_lzp_enc, "_bound"):
        for f in (lib.trc_lzp_enc, lib.trc_lzp_dec):
            f.restype = ctypes.c_int64
            f.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                          ctypes.c_int64, ctypes.c_int64]
            f._bound = True
    return lib


def _utf8_bind():
    lib = load()
    if not hasattr(lib.trc_utf8_enc, "_bound"):
        for f in (lib.trc_utf8_enc, lib.trc_utf8_dec):
            f.restype = ctypes.c_int64
            f.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                          ctypes.c_int64]
            f._bound = True
    return lib


def utf8_remap(data: np.ndarray):
    """UTF-8 preprocess: remap code points to dense 1-2 byte ids.

    Returns the remapped array, or None if the input is not valid UTF-8
    (or the alphabet is too large) - caller falls back to raw bytes.
    """
    data = np.ascontiguousarray(data, np.uint8)
    out = np.empty(2 * data.shape[0] + 64, np.uint8)
    r = _utf8_bind().trc_utf8_enc(data.ctypes.data, data.shape[0],
                                  out.ctypes.data, out.shape[0])
    if r < 0:
        return None
    return out[:r].copy()


def utf8_unmap(data: np.ndarray, orig_len: int) -> np.ndarray:
    data = np.ascontiguousarray(data, np.uint8)
    out = np.empty(orig_len, np.uint8)
    r = _utf8_bind().trc_utf8_dec(data.ctypes.data, data.shape[0],
                                  out.ctypes.data, orig_len)
    if r != orig_len:
        raise ValueError("utf8 decode failed: corrupt stream")
    return out


def _utf816_bind():
    lib = load()
    if not hasattr(lib.trc_utf8_enc16, "_bound"):
        for f in (lib.trc_utf8_enc16, lib.trc_utf8_dec16):
            f.restype = ctypes.c_int64
            f.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                          ctypes.c_int64]
            f._bound = True
    return lib


def _split_varints(buf: np.ndarray):
    """Parse varint(#syms) ++ #syms varints; return offset past them."""
    off = 0

    def rd():
        nonlocal off
        v, sh = 0, 0
        while True:
            b = int(buf[off]); off += 1
            v |= (b & 0x7F) << sh
            if not (b & 0x80):
                return v
            sh += 7

    nsym = rd()
    for _ in range(nsym):
        rd()
    return nsym, off


def utf8_remap16(data: np.ndarray):
    """UTF-8 -> u16 rank ids (reference xbwt16 input).

    Returns (n_syms, table_bytes, ids uint16) or None if not UTF-8."""
    data = np.ascontiguousarray(data, np.uint8)
    out = np.empty(4 * data.shape[0] + 64, np.uint8)
    r = _utf816_bind().trc_utf8_enc16(data.ctypes.data, data.shape[0],
                                      out.ctypes.data, out.shape[0])
    if r < 0:
        return None
    stream = out[:r]
    nsym, off = _split_varints(stream)
    return nsym, stream[:off].copy(), stream[off:].copy().view("<u2")


def utf8_unmap16(table: np.ndarray, ids: np.ndarray, orig_len: int
                 ) -> np.ndarray:
    stream = np.concatenate([table, ids.astype("<u2").view(np.uint8)])
    out = np.empty(orig_len, np.uint8)
    r = _utf816_bind().trc_utf8_dec16(stream.ctypes.data, stream.shape[0],
                                      out.ctypes.data, orig_len)
    if r != orig_len:
        raise ValueError("utf8-16 decode failed: corrupt stream")
    return out


def lzp(data: np.ndarray, minlen: int = 32):
    """LZP preprocess; returns compressed bytes or None if no gain."""
    data = np.ascontiguousarray(data, np.uint8)
    out = np.empty(data.shape[0] + 16, np.uint8)
    r = _lzp_bind().trc_lzp_enc(data.ctypes.data, data.shape[0],
                                out.ctypes.data, out.shape[0], minlen)
    if r < 0 or r >= data.shape[0]:
        return None
    return out[:r].copy()


def unlzp(data: np.ndarray, orig_len: int, minlen: int = 32) -> np.ndarray:
    data = np.ascontiguousarray(data, np.uint8)
    out = np.empty(orig_len, np.uint8)
    r = _lzp_bind().trc_lzp_dec(data.ctypes.data, data.shape[0],
                                out.ctypes.data, orig_len, minlen)
    if r != orig_len:
        raise ValueError("lzp decode failed: corrupt stream")
    return out


def _bec_bind():
    lib = load()
    if not hasattr(lib.trc_becw_enc, "_bound"):
        lib.trc_becw_enc.restype = ctypes.c_int64
        lib.trc_becw_enc.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                     ctypes.c_int64, ctypes.c_void_p,
                                     ctypes.c_int64]
        lib.trc_becw_dec.restype = ctypes.c_int
        lib.trc_becw_dec.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                     ctypes.c_int64, ctypes.c_int64,
                                     ctypes.c_void_p]
        lib.trc_becw_enc._bound = True
    return lib


def becw_enc(block: np.ndarray) -> tuple[int, bytes]:
    """Wavelet-conditioned bec encode of a padded [L, K] block; returns
    (total_bits, packed body) matching codecs/bec.py's _BitWriter."""
    block = np.ascontiguousarray(block, np.uint8)
    L, K = block.shape
    out = np.empty(4 * L * K + 65536, np.uint8)
    nbits = _bec_bind().trc_becw_enc(block.ctypes.data, L, K,
                                     out.ctypes.data, out.shape[0])
    if nbits < 0:
        raise ValueError("bec encode overflow (incompressible beyond cap)")
    nbytes = ((int(nbits) + 63) // 64 + 1) * 8 if nbits else 0
    return int(nbits), out[:nbytes].tobytes()


def becw_dec(payload: bytes, L: int, K: int) -> np.ndarray:
    """Inverse of becw_enc over the framed body; returns [L, K] uint8."""
    buf = np.frombuffer(payload, np.uint8)
    out = np.empty((L, K), np.uint8)
    r = _bec_bind().trc_becw_dec(
        buf.ctypes.data if buf.size else 0, buf.shape[0], L, K,
        out.ctypes.data)
    if r != 0:
        raise ValueError("corrupt payload: bec count out of range")
    return out


def _qlfc2_bind():
    lib = load()
    if not hasattr(lib.trc_qlfc2_ranks, "_bound"):
        lib.trc_qlfc2_ranks.restype = None
        lib.trc_qlfc2_ranks.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                        ctypes.c_void_p, ctypes.c_void_p]
        lib.trc_qlfc2_ctx.restype = None
        lib.trc_qlfc2_ctx.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                      ctypes.c_void_p, ctypes.c_int64,
                                      ctypes.c_void_p, ctypes.c_void_p]
        for f in (lib.trc_qlfc2_merge, lib.trc_qlfc2_rdemux):
            f.restype = ctypes.c_int
            f.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                          ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        lib.trc_qlfc2_ranks._bound = True
    return lib


def qlfc2_ranks(heads: np.ndarray):
    """Backward-MTF (QLFC) rank construction; returns (ranks, init_list).
    Reference analog: rcutil.c:179-220 (ranks emitted right-to-left so
    the decoder's MTF front is the coded symbol, rcqlfc_.c:92)."""
    heads = np.ascontiguousarray(heads, np.uint8)
    ranks = np.empty_like(heads)
    init_list = np.empty(256, np.uint8)
    _qlfc2_bind().trc_qlfc2_ranks(heads.ctypes.data, heads.shape[0],
                                  ranks.ctypes.data, init_list.ctypes.data)
    return ranks, init_list


def qlfc2_ctx(heads: np.ndarray, ranks: np.ndarray, runs: np.ndarray):
    """Per-element (rank_ctx, run_ctx) u16 context ids (u*8 | RICEK(EMA))."""
    heads = np.ascontiguousarray(heads, np.uint8)
    ranks = np.ascontiguousarray(ranks, np.uint8)
    runs = np.ascontiguousarray(runs, np.uint32)
    m = heads.shape[0]
    rctx = np.empty(m, np.uint16)
    rnctx = np.empty(m, np.uint16)
    _qlfc2_bind().trc_qlfc2_ctx(heads.ctypes.data, ranks.ctypes.data,
                                runs.ctypes.data, m, rctx.ctypes.data,
                                rnctx.ctypes.data)
    return rctx, rnctx


def qlfc2_merge(sorted_ranks: np.ndarray, counts: np.ndarray,
                init_list: np.ndarray) -> np.ndarray:
    """Decode rank walk: context-sorted ranks -> run-head symbols."""
    sorted_ranks = np.ascontiguousarray(sorted_ranks, np.uint8)
    counts = np.ascontiguousarray(counts, np.uint64)
    base = np.zeros_like(counts)
    np.cumsum(counts[:-1], out=base[1:])
    init_list = np.ascontiguousarray(init_list, np.uint8)
    m = sorted_ranks.shape[0]
    heads = np.empty(m, np.uint8)
    rc = _qlfc2_bind().trc_qlfc2_merge(
        sorted_ranks.ctypes.data, base.ctypes.data, counts.ctypes.data,
        init_list.ctypes.data, m, heads.ctypes.data)
    if rc != 0:
        raise ValueError("corrupt payload: qlfc2 rank context overrun")
    return heads


def qlfc2_rdemux(heads: np.ndarray, sorted_runs: np.ndarray,
                 counts: np.ndarray) -> np.ndarray:
    """Decode run demux: context-sorted runs -> in-order runs (u32)."""
    heads = np.ascontiguousarray(heads, np.uint8)
    sorted_runs = np.ascontiguousarray(sorted_runs, np.uint32)
    counts = np.ascontiguousarray(counts, np.uint64)
    base = np.zeros_like(counts)
    np.cumsum(counts[:-1], out=base[1:])
    m = heads.shape[0]
    runs = np.empty(m, np.uint32)
    rc = _qlfc2_bind().trc_qlfc2_rdemux(
        heads.ctypes.data, sorted_runs.ctypes.data, base.ctypes.data,
        counts.ctypes.data, m, runs.ctypes.data)
    if rc != 0:
        raise ValueError("corrupt payload: qlfc2 run context overrun")
    return runs


def _aux_bind():
    lib = load()
    if not hasattr(lib.trc_bwt_aux, "_bound"):
        for f in (lib.trc_bwt_aux, lib.trc_bwt16_aux):
            f.restype = ctypes.c_int64
            f.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                          ctypes.c_int64, ctypes.c_void_p]
        for f in (lib.trc_unbwt_aux, lib.trc_unbwt16_aux):
            f.restype = ctypes.c_int
            f.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                          ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
                          ctypes.c_int64]
        lib.trc_bwt_aux._bound = True
    return lib


BWT_CHAINS = 16  # interleaved inverse-BWT chains (reference SR, rcbwt.c:26)


def bwt_mod(n: int, chains: int = BWT_CHAINS) -> int:
    """Aux spacing: ceil(n/chains) keeps straggler steps < chains."""
    return max(-(-n // chains), 1)


def bwt_aux(data: np.ndarray, chains: int = BWT_CHAINS):
    """BWT + aux row indexes for the interleaved inverse (the reference's
    libsais_bwt_aux path, rcbwt.c:66-80).  Returns (bwt, primary, aux)."""
    data = np.ascontiguousarray(data, np.uint8)
    n = data.shape[0]
    mod = bwt_mod(n, chains)
    naux = max(-(-n // mod) - 1, 0)
    aux = np.zeros(naux, np.uint32)
    out = np.empty_like(data)
    p = _aux_bind().trc_bwt_aux(data.ctypes.data, out.ctypes.data, n, mod,
                                aux.ctypes.data)
    if p < 0:
        raise ValueError("bwt failed (input too large?)")
    return out, int(p), aux


def unbwt_aux(data: np.ndarray, primary: int, aux: np.ndarray) -> np.ndarray:
    data = np.ascontiguousarray(data, np.uint8)
    aux = np.ascontiguousarray(aux, np.uint32)
    n = data.shape[0]
    mod = bwt_mod(n, aux.shape[0] + 1) if aux.shape[0] else n
    # chain count is derived from n and mod inside; validate match
    out = np.empty_like(data)
    rc = _aux_bind().trc_unbwt_aux(data.ctypes.data, out.ctypes.data, n,
                                   primary, mod, aux.ctypes.data,
                                   aux.shape[0])
    if rc != 0:
        raise ValueError("unbwt failed: corrupt input, primary, or aux")
    return out


def bwt16_aux(elems: np.ndarray, chains: int = BWT_CHAINS):
    elems = np.ascontiguousarray(elems, np.uint16)
    n = elems.shape[0]
    mod = bwt_mod(n, chains)
    naux = max(-(-n // mod) - 1, 0)
    aux = np.zeros(naux, np.uint32)
    out = np.empty_like(elems)
    p = _aux_bind().trc_bwt16_aux(elems.ctypes.data, out.ctypes.data, n,
                                  mod, aux.ctypes.data)
    if p < 0:
        raise ValueError("bwt16 failed (input too large?)")
    return out, int(p), aux


def unbwt16_aux(elems: np.ndarray, primary: int,
                aux: np.ndarray) -> np.ndarray:
    elems = np.ascontiguousarray(elems, np.uint16)
    aux = np.ascontiguousarray(aux, np.uint32)
    n = elems.shape[0]
    mod = bwt_mod(n, aux.shape[0] + 1) if aux.shape[0] else n
    out = np.empty_like(elems)
    rc = _aux_bind().trc_unbwt16_aux(elems.ctypes.data, out.ctypes.data, n,
                                     primary, mod, aux.ctypes.data,
                                     aux.shape[0])
    if rc != 0:
        raise ValueError("unbwt16 failed: corrupt input, primary, or aux")
    return out
