"""Codec configuration.

The reference exposes two config layers - compile-time macros
(RC_SIZE/RC_IO/RC_BITS, turborc_.h:40-82) and getopt CLI flags
(turborc.c:770-872).  Here both collapse into one dataclass that is
serialized into the container header.
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class CodecConfig:
    """Configuration for a lane-interleaved TPU codec.

    Attributes:
      codec:      registered codec name (e.g. "rans-cdf-o0").
      lanes:      number of interleaved coder lanes per block.  Each lane is
                  an independent entropy-coder state + adaptive model; lanes
                  map onto VPU elements.  Power of two.
      block_size: bytes per independently-decodable block (the DP sharding
                  unit; reference analog: ANSBLKSIZE=1<<22, anscdf.c:54).
      step_quant: pad per-lane symbol count K to a multiple of this to bound
                  the number of distinct jit specializations.
      prm0/prm1:  predictor rate parameters (dual-speed rates; reference
                  mbc_ss.h:35 comment "o0:5,8 o1:4,6 o2:2,5 bwt:4,7").
      ctx_bits:   sliding-context size in bits for rcx-family codecs.
      level:      pipeline level (BWT entropy-stage selector, rcbwt.c:83-94).
      geom:       flagship kernel geometry (ops/pallas/geom.Geom); None =
                  the env-default.  Recorded in the v3 container header so
                  payloads decode in any process.
    """

    codec: str = "rans-cdf-o0"
    lanes: int = 512
    block_size: int = 1 << 22
    step_quant: int = 256
    prm0: int = 5
    prm1: int = 8
    ctx_bits: int = 8
    level: int = 8
    geom: object = None

    def __post_init__(self):
        if self.lanes & (self.lanes - 1):
            raise ValueError(f"lanes must be a power of two, got {self.lanes}")
        if self.step_quant & (self.step_quant - 1):
            raise ValueError("step_quant must be a power of two")
        if self.block_size % self.lanes:
            raise ValueError("block_size must be a multiple of lanes")
