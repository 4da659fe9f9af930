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
    register(1, "rc-o0", rc_bit.rc_s_encode, rc_bit.rc_s_decode,
             "bitwise order-0, simple predictor (ref rc id 1)")
    register(2, "rcc-o1", rc_bit.rcc_s_encode, rc_bit.rcc_s_decode,
             "bitwise order-1, simple predictor (ref rcc id 2)")
    register(101, "rc-o0-ss", rc_bit.rc_ss_encode, rc_bit.rc_ss_decode,
             "bitwise order-0, dual-speed predictor (ref rc -pss)")
    register(102, "rcc-o1-ss", rc_bit.rcc_ss_encode, rc_bit.rcc_ss_decode,
             "bitwise order-1, dual-speed predictor (ref rcc -pss)")


_lazy_init()
