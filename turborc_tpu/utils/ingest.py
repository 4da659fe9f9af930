"""Text / CSV / timestamp ingest -> fixed-width integer arrays.

Reference counterpart: `befgen` (turborc.c:153-286) with `strtots`
(turborc.c:103-142): converts numeric text files into the fixed-width
little-endian integer buffers the integer codecs (rcg/rcr/rcv, ids 26-38)
consume.  Formats:

  "num"  one number per line (first column if separators present)
  "csv"  all numeric fields, any of ",;\\t " as separators
  "ts"   timestamps: unix seconds, or "YYYY-MM-DD[ hh:mm:ss]",
         or "hh:mm:ss[.ms]" -> epoch/day-relative integer units
"""
from __future__ import annotations

import re

import numpy as np

_NUM_RE = re.compile(rb"[-+]?\d+(?:\.\d+)?")
_TS_DATE_RE = re.compile(
    rb"(\d{4})-(\d{2})-(\d{2})(?:[ T](\d{2}):(\d{2}):(\d{2}))?")
_TS_TIME_RE = re.compile(rb"(\d{2}):(\d{2}):(\d{2})(?:\.(\d{1,3}))?")


def _days_from_civil(y, m, d):
    """Gregorian date -> days since 1970-01-01 (vectorized, proleptic)."""
    y = y - (m <= 2)
    era = np.floor_divide(np.where(y >= 0, y, y - 399), 400)
    yoe = y - era * 400
    mp = np.mod(m + 9, 12)
    doy = (153 * mp + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


def _to_int(tok: bytes, scale: float) -> int:
    """Numeric token -> int64.  Integer tokens parse exactly (no float64
    round-trip: nanosecond timestamps exceed 2^53); float64 is used only
    for fractional tokens or a non-unit scale."""
    if scale == 1.0 and b"." not in tok:
        return int(tok)
    return int(round(float(tok) * scale))


def parse_numbers(text: bytes, scale: float = 1.0) -> np.ndarray:
    """All numeric fields in the buffer, scaled and rounded to int64."""
    vals = [_to_int(m, scale) for m in _NUM_RE.findall(text)]
    return np.asarray(vals, np.int64)


def parse_first_column(text: bytes, scale: float = 1.0) -> np.ndarray:
    """First numeric field of every line."""
    vals = []
    for line in text.splitlines():
        m = _NUM_RE.search(line)
        if m:
            vals.append(_to_int(m.group(0), scale))
    return np.asarray(vals, np.int64)


def parse_timestamps(text: bytes) -> np.ndarray:
    """Timestamps -> int64 (epoch seconds for dates, ms-of-day for times,
    raw integer for unix-second columns)."""
    out = []
    for line in text.splitlines():
        m = _TS_DATE_RE.search(line)
        if m:
            y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
            secs = _days_from_civil(np.int64(y), np.int64(mo),
                                    np.int64(d)) * 86400
            if m.group(4) is not None:
                secs += (int(m.group(4)) * 3600 + int(m.group(5)) * 60
                         + int(m.group(6)))
            out.append(int(secs))
            continue
        m = _TS_TIME_RE.search(line)
        if m:
            ms = ((int(m.group(1)) * 3600 + int(m.group(2)) * 60
                   + int(m.group(3))) * 1000
                  + int((m.group(4) or b"0").ljust(3, b"0")))
            out.append(ms)
            continue
        m = _NUM_RE.search(line)
        if m:
            out.append(int(float(m.group(0))))
    return np.asarray(out, np.int64)


def to_fixed_width(vals: np.ndarray, esize: int, zigzag_offset: bool = True
                   ) -> np.ndarray:
    """int64 values -> little-endian u{esize} byte stream (wrapping).

    Negative values wrap modulo 2^(8*esize), matching the zigzag/delta
    codecs' unsigned element view.
    """
    mask = (1 << (8 * esize)) - 1
    u = (vals & mask).astype(f"<u{esize}")
    return u.view(np.uint8).copy()


def ingest(text: bytes, fmt: str = "num", esize: int = 4,
           scale: float = 1.0) -> np.ndarray:
    if fmt == "num":
        vals = parse_first_column(text, scale)
    elif fmt == "csv":
        vals = parse_numbers(text, scale)
    elif fmt == "ts":
        vals = parse_timestamps(text)
    else:
        raise ValueError(f"unknown ingest format {fmt!r}")
    return to_fixed_width(vals, esize)
