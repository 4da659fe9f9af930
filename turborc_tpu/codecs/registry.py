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
    from turborc_tpu.codecs import rans_cdf_o0

    register(56, "rans-cdf-o0", rans_cdf_o0.encode_block,
             rans_cdf_o0.decode_block,
             "adaptive CDF16 nibble-pair rANS, order 0 (ref anscdf id 56)")


_lazy_init()
