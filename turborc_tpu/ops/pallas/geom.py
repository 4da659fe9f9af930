"""Kernel/format geometry for the flagship rANS family.

Every field is FORMAT-RELEVANT: payloads written at one geometry decode
only at the same geometry (group count sets the stream/length-table
layout; share/sync/lsync/arows/srows set the model trajectory; chunk
sets grid-step alignment of the cold-row sync).  Round 2 carried these
as env-var module constants, which meant a container written under
non-default knobs could not decode in a fresh default process (VERDICT
round-2 coverage #58).  Round 3 threads a frozen Geom through the
kernels and codecs as a static argument and records it in the container
header (format v3), so the env vars only pick the DEFAULT geometry.

Reference analog: the reference bakes its knobs at compile time
(RC_BITS/RC_IO etc., turborc_.h:40-82) and records codec/lev/prm in the
file header (turborc.c:666-683); geometry-in-header plays that role.
"""
from __future__ import annotations

import dataclasses
import os

# Grid steps per decode-window slide (implementation knob, not format).
# Measured on v5e at the headline geometry: batching slides is a LOSS
# (wsteps=8: 584 MB/s vs wsteps=1: 878) - the per-step unconditional
# slide DMAs overlap with compute under the compiler's pipelining, and
# a conditional slide breaks that overlap.  Default 1; knob kept for
# future rigs.
_WSTEPS = int(os.environ.get("TRC_WSTEPS", "1"))


@dataclasses.dataclass(frozen=True)
class Geom:
    """Flagship kernel geometry (all format-relevant)."""
    groups: int = 64   # 128-lane sublane rows per tile (stream count)
    chunk: int = 8     # byte steps per grid step (kernel-internal align)
    share: int = 8     # lanes per shared model span (1 = per-lane models)
    sync: int = 4      # bytes between hot-row cross-lane re-joins
    lsync: int = 32    # bytes between cold-row re-joins
    arows: int = 16    # adaptive lo-table rows (>= arows are static)
    srows: int = 4     # lo rows re-joined at the fast cadence
    nstates: int = 1   # rANS states per lane (2 = split hi/lo streams,
    #                    halving the decode chain; reference analog: the
    #                    4-way state interleave, anscdf_.h:97-103)
    rate: int = 7      # CDF16 adaptation rate (cdf_.h CDFRATE).  BWT
    #                    text measures ~0.2pp better at 8 (slower =
    #                    steadier estimates on run-heavy data); 7 is the
    #                    reference constant and the general default.

    def __post_init__(self):
        # The 4-byte container header encodes groups/chunk/share/sync/
        # lsync as log2 exponents and srows in 5 bits; reject anything
        # unrepresentable at parse time rather than writing a header
        # that silently unpacks to a different geometry (ADVICE r03).
        for name, v, cap in (("groups", self.groups, 1 << 15),
                             ("chunk", self.chunk, 1 << 15),
                             ("share", self.share, 128),
                             ("sync", self.sync, 128),
                             ("lsync", self.lsync, 128)):
            if v < 1 or v & (v - 1) or v > cap:
                raise ValueError(
                    f"geometry {name}={v} must be a power of two <= {cap}"
                    " (container header stores log2 exponents)")
        if not 0 <= self.srows < 32:
            raise ValueError("geometry srows must be in [0, 32)")
        if self.chunk % self.sync != 0:
            raise ValueError("sync cadence must divide the grid-step chunk")
        if self.lsync % self.chunk or self.lsync % self.sync:
            raise ValueError(
                "cold-row cadence must be a multiple of the grid-step chunk")
        if not 0 <= self.arows <= 16:
            raise ValueError("geometry arows must be in [0, 16]")
        if self.nstates not in (1, 2):
            raise ValueError("geometry nstates must be 1 or 2")
        if not 7 <= self.rate <= 10:
            # rates < 7 need in-kernel monotone repair after every
            # update (the staircase step can overshoot, cdf16.py
            # update_rate docstring); >= 7 is provably repair-free
            raise ValueError("geometry rate must be in [7, 10]")

    # ---- derived (not independent format knobs)
    @property
    def glanes(self) -> int:
        return 128

    @property
    def lanes(self) -> int:
        return self.groups * 128

    @property
    def rows_per_step(self) -> int:
        """Worst-case stream rows one grid step can consume/emit per
        stream (one word per lane per nibble; x2 splits nibbles over
        two streams)."""
        return 2 * self.chunk if self.nstates == 1 else self.chunk

    @property
    def wsteps(self) -> int:
        """Grid steps per stream-window slide / placement flush (DMA
        batching; NOT format-relevant - windows are padding, the
        payload stores only glens-truncated words)."""
        return _WSTEPS

    @property
    def wrows(self) -> int:
        return self.rows_per_step * self.wsteps + 8  # window rows/group

    @property
    def pwrows(self) -> int:
        """Placement window rows: the encode-side accumulate loop is
        O(pwrows) per slot, so the placement flush is NOT wsteps-batched
        (unlike the decode window slide)."""
        return self.rows_per_step + 4

    # round-2/3 alias (placement rows before the decode-side batching)
    prows = pwrows

    @property
    def hrows(self) -> int:
        return min(self.srows, self.arows)

    @property
    def crows(self) -> int:
        return max(self.arows, 1)   # lo scratch rows (>=1 keeps shapes)

    @property
    def lsync_steps(self) -> int:
        return self.lsync // self.chunk

    @property
    def step_quant(self) -> int:
        """Per-lane symbol count alignment (grid step AND cold sync)."""
        return max(self.chunk, self.lsync)

    @classmethod
    def parse(cls, spec: str) -> "Geom":
        """Parse a compact geometry spec g<groups>c<chunk>s<share>y<sync>
        l<lsync>a<arows>[r<srows>][u<rate>] (the sweep/CLI notation)."""
        import re
        m = re.fullmatch(
            r"g(\d+)c(\d+)s(\d+)y(\d+)l(\d+)a(\d+)(?:r(\d+))?(x2)?"
            r"(?:u(\d+))?", spec)
        if not m:
            raise ValueError(f"bad geometry spec {spec!r}")
        g, c, s, y, l, a = map(int, m.groups()[:6])
        r = int(m.group(7)) if m.group(7) else 4
        u = int(m.group(9)) if m.group(9) else 7
        return cls(groups=g, chunk=c, share=s, sync=y, lsync=l, arows=a,
                   srows=r, nstates=2 if m.group(8) else 1, rate=u)

    @property
    def spec(self) -> str:
        return (f"g{self.groups}c{self.chunk}s{self.share}y{self.sync}"
                f"l{self.lsync}a{self.arows}r{self.srows}"
                + ("x2" if self.nstates == 2 else "")
                + (f"u{self.rate}" if self.rate != 7 else ""))

    # ---- container header wire format (4 bytes; format v3)
    WIRE_LEN = 4

    def pack(self) -> bytes:
        a = ((self.groups.bit_length() - 1)
             | ((self.chunk.bit_length() - 1) << 4))
        b = ((self.share.bit_length() - 1)
             | ((self.sync.bit_length() - 1) << 3)
             | ((self.nstates - 1) << 6))
        c = (self.lsync.bit_length() - 1) | (self.srows << 3)
        d = self.arows | ((self.rate - 7) << 5)   # arows 5 bits, rate 2
        return bytes([a, b, c, d])

    @classmethod
    def unpack(cls, raw: bytes) -> "Geom":
        if len(raw) != cls.WIRE_LEN:
            raise ValueError("corrupt container: bad geometry field")
        a, b, c, d = raw
        return cls(groups=1 << (a & 15), chunk=1 << (a >> 4),
                   share=1 << (b & 7), sync=1 << ((b >> 3) & 7),
                   nstates=1 + ((b >> 6) & 1),
                   lsync=1 << (c & 7), srows=c >> 3, arows=d & 31,
                   rate=7 + (d >> 5))


def from_env() -> Geom:
    """Default geometry from the TRC_* env knobs (round-2 compat)."""
    return Geom(groups=int(os.environ.get("TRC_GROUPS", "64")),
                chunk=int(os.environ.get("TRC_CHUNK", "8")),
                share=int(os.environ.get("TRC_SHARE", "8")),
                sync=int(os.environ.get("TRC_SYNC", "4")),
                lsync=int(os.environ.get("TRC_LSYNC", "32")),
                arows=int(os.environ.get("TRC_AROWS", "16")),
                nstates=int(os.environ.get("TRC_NSTATES", "1")))


DEFAULT = from_env()
