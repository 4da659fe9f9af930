"""Codec registry: name <-> id <-> implementation.

Mirrors the role of the reference's bench-id table (turborc.c:420-579) and
RCGEN predictor dispatch (turborc.c:314-410), as a plain registry.

Each codec module exposes:
    encode_block(data: np.uint8[n], **params) -> bytes payload
    decode_block(payload: bytes, n: int, **params) -> np.uint8[n]
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np


@dataclasses.dataclass(frozen=True)
class Codec:
    codec_id: int
    name: str
    encode_block: Callable
    decode_block: Callable
    description: str = ""


_BY_NAME: dict[str, Codec] = {}
_BY_ID: dict[int, Codec] = {}


def register(codec_id: int, name: str, encode_block, decode_block,
             description: str = ""):
    c = Codec(codec_id, name, encode_block, decode_block, description)
    if name in _BY_NAME or codec_id in _BY_ID:
        raise ValueError(f"duplicate codec {codec_id}/{name}")
    _BY_NAME[name] = c
    _BY_ID[codec_id] = c
    return c


def get(name_or_id) -> Codec:
    if isinstance(name_or_id, int):
        return _BY_ID[name_or_id]
    return _BY_NAME[name_or_id]


def names() -> list[str]:
    return sorted(_BY_NAME, key=lambda n: _BY_NAME[n].codec_id)


def _lazy_init():
    """Import codec modules (registration side effects)."""
    if _BY_NAME:
        return
    from turborc_tpu.codecs import rans_cdf_o0, rans_static, rc_bit

    register(42, "rans-static", rans_static.encode_block,
             rans_static.decode_block,
             "static-CDF byte rANS, per-block histogram (ref cdfs ids 42-45)")

    register(56, "rans-cdf-o0", rans_cdf_o0.encode_block,
             rans_cdf_o0.decode_block,
             "adaptive CDF16 nibble-pair rANS, order 0 (ref anscdf id 56)")
    import jax
    if jax.default_backend() != "cpu":
        # kernel codec needs the real TPU (Mosaic); keep CPU test runs lean
        from turborc_tpu.codecs import rans_pallas
        register(57, "rans-cdf-o0-p", rans_pallas.encode_block,
                 rans_pallas.decode_block,
                 "flagship on Pallas TPU kernels, group-interleaved streams")
        from turborc_tpu.codecs import rc_tree
        register(8, "rc-p", rc_tree.encode_block, rc_tree.decode_block,
                 "bitwise-tree model on Pallas TPU kernels, nibble-grouped "
                 "coding (fast path of ref rc id 1)")
        from turborc_tpu.codecs import rans_pallas_r1
        register(60, "rans-cdf-r1-p", rans_pallas_r1.encode_block,
                 rans_pallas_r1.decode_block,
                 "order-1 flagship on Pallas TPU kernels: rank-quantized "
                 "contexts, conditional warm tables (ref anscdf1 id 64)")
    from turborc_tpu.codecs import rans_cdf_o1, rans_cdf_s8
    register(58, "rans-cdf-s8", rans_cdf_s8.encode_block,
             rans_cdf_s8.decode_block,
             "adaptive CDF16 rANS with share-8 span models + segment "
             "warm-start (round-2 ratio design; ref ans id 56 class)")
    register(64, "rans-cdf-o1", rans_cdf_o1.encode_block,
             rans_cdf_o1.decode_block,
             "adaptive CDF16 rANS, order 1 (ref anscdf1 id 64)")
    from turborc_tpu.codecs import rans_cdf_r1
    register(59, "rans-cdf-r1", rans_cdf_r1.encode_block,
             rans_cdf_r1.decode_block,
             "order-1 rANS with rank-quantized contexts + conditional "
             "warm tables (XLA twin of rans-cdf-r1-p; ref anscdf1 class)")
    from turborc_tpu.codecs import rans_auto
    register(61, "rans-auto", rans_auto.encode_block,
             rans_auto.decode_block,
             "flagship auto-dispatch: share-span o0 vs contiguous o1 "
             "per block from the mean-run statistic (1-byte payload tag)")
    register(1, "rc-o0", rc_bit.rc_s_encode, rc_bit.rc_s_decode,
             "bitwise order-0, simple predictor (ref rc id 1)")
    register(2, "rcc-o1", rc_bit.rcc_s_encode, rc_bit.rcc_s_decode,
             "bitwise order-1, simple predictor (ref rcc id 2)")
    register(101, "rc-o0-ss", rc_bit.rc_ss_encode, rc_bit.rc_ss_decode,
             "bitwise order-0, dual-speed predictor (ref rc -pss)")
    register(102, "rcc-o1-ss", rc_bit.rcc_ss_encode, rc_bit.rcc_ss_decode,
             "bitwise order-1, dual-speed predictor (ref rcc -pss)")
    register(103, "rc-o0-sf", rc_bit.rc_sf_encode, rc_bit.rc_sf_decode,
             "bitwise order-0, FSM predictor (ref rc -psf; generated table)")
    register(104, "rcc-o1-sf", rc_bit.rcc_sf_encode, rc_bit.rcc_sf_decode,
             "bitwise order-1, FSM predictor (ref rcc -psf; generated table)")

    from turborc_tpu.codecs import intcodecs, rle
    from turborc_tpu.transforms import delta as _tf

    register(13, "rcrle", rle.encode_block, rle.decode_block,
             "RLE + order-0 literals + gamma runs (ref rcrle id 13)")
    register(14, "rcrle1", rle.encode_block_o1, rle.decode_block_o1,
             "RLE + order-1 literals + run-history-context runs "
             "(ref rcrle1 id 14, rc_.c:928-988)")
    register(63, "rcrle-16", rle.encode_block16, rle.decode_block16,
             "16-bit-symbol RLE: hi/lo|hi literal trees + hi-keyed "
             "gamma runs (ref rcrle enc16/dec16, rc_.c:880-920)")
    register(67, "rcrle1-16", rle.encode_block16_o1, rle.decode_block16_o1,
             "16-bit-symbol RLE: order-1 hi tree + run-history-bucket "
             "runs (ref rcrle1 16-bit, rc_.c:966-988)")
    from turborc_tpu.codecs import rans_nibble
    register(41, "rc4", rans_nibble.encode_block, rans_nibble.decode_block,
             "adaptive 4-bit symbol codec, per-lane CDF16 "
             "(ref rc4 id 41, rc_.c:141-163)")
    register(40, "rc4c", rans_nibble.encode_block_static,
             rans_nibble.decode_block_static,
             "static 4-bit symbol codec, shared block CDF16 "
             "(ref rc4c id 40 / ans static nibble id 65)")
    for kind, base_id, name in (("gamma", 26, "rcg"), ("rice", 28, "rcr"),
                                ("vlc", 30, "rcv")):
        for esize, suffix, off in ((1, "-8", 0), (2, "-16", 50),
                                   (4, "-32", 100)):
            enc, dec = intcodecs.make_block_api(kind, esize)
            register(base_id + off, f"{name}{suffix}", enc, dec,
                     f"{kind} coder, {8*esize}-bit elements "
                     f"(ref {name} ids 26-38)")
            zenc, zdec = _tf.wrap_codec(enc, dec, _tf.zigzag_enc,
                                        _tf.zigzag_dec, esize)
            register(base_id + off + 1, f"{name}z{suffix}", zenc, zdec,
                     f"zigzag-delta + {kind}, {8*esize}-bit elements")
    enc, dec = intcodecs.make_block_api("u3", 1)
    register(17, "rcu3", enc, dec,
             "segmented varint 1/3/5/8 bits (ref rcu3 id 17)")

    from turborc_tpu.codecs import rans_vlc
    for esize, base_id in ((1, 48), (2, 50), (4, 52)):
        enc, dec = rans_vlc.make_block_api(esize)
        name = {1: "rans-vn8", 2: "rans-v16", 4: "rans-v32"}[esize]
        register(base_id, name, enc, dec,
                 f"VLC over adaptive CDF16 + rANS direct bits, "
                 f"{8*esize}-bit elements (ref rccdf ids 48-53, "
                 f"anscdf ids 60-63)")
        zenc, zdec = _tf.wrap_codec(enc, dec, _tf.zigzag_enc,
                                    _tf.zigzag_dec, esize)
        register(base_id + 1, f"{name}z", zenc, zdec,
                 f"zigzag-delta + VLC/CDF16, {8*esize}-bit elements")
    for vb, vid in ((1, 54), (5, 55)):
        enc, dec = rans_vlc.make_block_api(2, vb=vb)
        register(vid, f"rans-v16-b{vb}", enc, dec,
                 f"VLC base 2^{vb} over CDF16 (ref vlcbit.h VN base "
                 "sweep, VN6-VN16)")

    register(3, "rcc2", rc_bit.rcc2_encode, rc_bit.rcc2_decode,
             "bitwise order-2, full 2^16 byte-pair contexts, low lane "
             "count (ref rcc2 id 3, rc_.c:344-370)")
    register(4, "rcx", rc_bit.rcx_encode, rc_bit.rcx_decode,
             "sliding-context bitwise codec, ctx in bits (ref rcx ids 4-5)")
    from turborc_tpu.codecs import rc_range
    register(5, "rc-rc", rc_range.encode_block, rc_range.decode_block,
             "order-0 byte tree over the TRUE carry-propagating range "
             "coder core; lanes=1 payload is bit-identical to reference "
             "rcsenc streams (ref turborc_.h:103-159, rc_.c:37-59)")
    from turborc_tpu.codecs import rcv_2end
    register(39, "rcv-2e", rcv_2end.encode_block, rcv_2end.decode_block,
             "Turbo-VLC 16-bit with a TWO-ENDED lane stream: adaptive "
             "CDF16 exponents forward, raw mantissa bits R->L from the "
             "row end, no inner boundary field (ref rcv + bit I/O, "
             "rc_.c:1026, rcutil_.h:166-190)")
    register(6, "rc-16", rc_bit.rc16_encode, rc_bit.rc16_decode,
             "bitwise order-0 over 16-bit symbols, 16-level tree "
             "(ref rc 16-bit, rc_.c:62-79)")
    register(7, "rc-32", rc_bit.rc32_encode, rc_bit.rc32_decode,
             "bitwise order-0 over 32-bit symbols: hi16 tree + lo16 tree "
             "keyed by bitlen(hi) bucket (ref rc 32-bit, rc_.c:98-340)")
    for w in (2, 3, 5, 6, 7, 10, 12):
        enc, dec = rc_bit.make_nbit_block_api(w)
        register(140 + w, f"rc{w}b", enc, dec,
                 f"bitwise {w}-bit symbol tree model (ref mb_o0.h:44-248)")
    def _make_v8_api(esize: int, zz: bool):
        # TurboByte composition (ref rcv8/rcv8z, rc_.c:1456-1564): group
        # varint to a byte stream, then the adaptive byte entropy stage
        from turborc_tpu.transforms import delta as D
        from turborc_tpu.transforms import vbyte

        venc = vbyte.v8enc16 if esize == 2 else vbyte.v8enc32
        vdec = vbyte.v8dec16 if esize == 2 else vbyte.v8dec32

        def encode_v8(data: np.ndarray, **kw) -> bytes:
            data = np.asarray(data, np.uint8)
            if zz:
                data = D.zigzag_enc(D.delta_enc(data, esize), esize)
            buf = data.tobytes() + b"\0" * ((-data.shape[0]) % esize)
            tmp = venc(np.frombuffer(buf, f"<u{esize}"))
            arr = np.frombuffer(tmp, np.uint8)
            return (np.uint32(len(tmp)).tobytes()
                    + rans_cdf_o0.encode_block(arr, **kw))

        def decode_v8(payload: bytes, n: int, **kw) -> np.ndarray:
            if len(payload) < 4:
                raise ValueError("corrupt payload: rcv8 header")
            tlen = int(np.frombuffer(payload[:4], "<u4")[0])
            tmp = rans_cdf_o0.decode_block(payload[4:], tlen, **kw)
            out = np.frombuffer(vdec(tmp.tobytes()).tobytes(),
                                np.uint8)[:n]
            if zz:
                out = D.delta_dec(D.zigzag_dec(out, esize), esize)
            return out

        return encode_v8, decode_v8

    for vid, es, zz, nm in ((37, 2, False, "rcv8-16"),
                            (38, 2, True, "rcv8z-16"),
                            (87, 4, False, "rcv8-32"),
                            (88, 4, True, "rcv8z-32")):
        enc, dec = _make_v8_api(es, zz)
        register(vid, nm, enc, dec,
                 f"TurboByte group varint ({es*8}-bit"
                 f"{', zigzag delta' if zz else ''}) + adaptive byte "
                 "entropy stage (ref rcv8 ids 37/38, rc_.c:1456-1564)")

    register(66, "ansb", rc_bit.ansb_encode, rc_bit.ansb_decode,
             "bitwise ANS at the reference design point: 4 interleaved "
             "binary-rANS states, o0 tree model "
             "(ref ansbc/ansbd id 66, anscdf.c:673-731)")

    from turborc_tpu.codecs import bwt, rc_cm
    register(20, "rcbwt", bwt.encode_block, bwt.decode_block,
             "BWT (clean-room SA-IS) + entropy stage by level (ref id 20)")
    for cid, variant, desc in ((9, "rcm", "o1+o0 mix + SSE (ref id 9)"),
                               (10, "rcm2", "o2+o1+o0 mix + SSE, hashed o2 "
                                "context (ref id 10)"),
                               (11, "rcmr", "run-aware mix + SSE (ref id 11)"),
                               (12, "rcmrr", "run>2-aware mix + SSE (id 12)")):
        enc, dec = rc_cm.make_block_api(variant)
        register(cid, variant, enc, dec, desc)
    from turborc_tpu.codecs import bec
    register(19, "bec", bec.encode_block, bec.decode_block,
             "M99-style hierarchical bit EC, wavelet-conditioned planes, "
             "active-set level-parallel host coder (ref id 19)")
    register(119, "bec-16", bec.encode_block16, bec.decode_block16,
             "bec over 16-bit symbols, independent planes (ref bec16, "
             "bec_b.c:84-88)")
    register(21, "bec-w", bec.encode_block_w, bec.decode_block_w,
             "alias of id 19 (the round-2 bec-w design, promoted)")
    register(22, "bec-i", bec.encode_block_i, bec.decode_block_i,
             "bec with independent bit planes (round-2 id-19 design "
             "point; loses inter-plane mutual information)")
    from turborc_tpu.codecs import qlfc
    register(18, "rcqlfc", qlfc.encode_block, qlfc.decode_block,
             "QLFC: run-split MTF ranks + adaptive CDF16 rank stage + "
             "VLC run lengths (ref rcqlfc_.c id 18)")
    register(15, "rcqlfc-rle", bwt.qlfc_encode, bwt.qlfc_decode,
             "MTF + RLE/gamma entropy stage (round-1 qlfc variant)")


_lazy_init()
