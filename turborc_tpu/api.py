"""Public compress/decompress API over the block container."""
from __future__ import annotations

import zlib

import numpy as np

from turborc_tpu.codecs import registry
from turborc_tpu.container import format as fmt
from turborc_tpu.utils.config import CodecConfig


def _as_bytes_array(data) -> np.ndarray:
    if isinstance(data, np.ndarray):
        return data.astype(np.uint8, copy=False).reshape(-1)
    return np.frombuffer(bytes(data), np.uint8)


# Share-span family: payload layout depends on the SHARE/SYNC model
# geometry (TRC_SHARE/TRC_SYNC), so it rides in the header flags byte and
# is validated at decode - containers stay self-describing.
_SPAN_CODECS = ("rans-cdf-s8", "rans-cdf-o0-p", "rans-auto")


def _span_geometry() -> tuple[int, int, int]:
    from turborc_tpu.codecs import rans_cdf_s8 as S8
    return S8.SHARE, S8.SYNC, S8.LSYNC


def _geometry_flags(codec_name: str) -> int:
    """flags u8: bits 0-2 log2(SHARE), 3-5 log2(SYNC), 6-7
    log2(LSYNC)-3 (LSYNC in {8,16,32,64})."""
    if codec_name not in _SPAN_CODECS:
        return 0
    share, sync, lsync = _span_geometry()
    return ((share.bit_length() - 1) | ((sync.bit_length() - 1) << 3)
            | ((lsync.bit_length() - 4) << 6))


def _check_geometry(codec_name: str, flags: int):
    if codec_name not in _SPAN_CODECS:
        return
    share, sync = 1 << (flags & 7), 1 << ((flags >> 3) & 7)
    lsync = 1 << (((flags >> 6) & 3) + 3)
    cur = _span_geometry()
    if cur != (share, sync, lsync):
        raise ValueError(
            f"container was written with share-span geometry SHARE={share} "
            f"SYNC={sync} LSYNC={lsync} but the runtime is configured for "
            f"SHARE={cur[0]} SYNC={cur[1]} LSYNC={cur[2]} (set TRC_SHARE/"
            f"TRC_SYNC/TRC_LSYNC to match)")


def compress(data, cfg: CodecConfig | None = None) -> bytes:
    """Compress a byte buffer into a TRCT container."""
    cfg = cfg or CodecConfig()
    codec = registry.get(cfg.codec)
    arr = _as_bytes_array(data)
    out = [fmt.write_header(codec.codec_id, cfg.lanes, cfg.step_quant,
                            cfg.block_size, arr.shape[0], cfg.prm0,
                            cfg.prm1, cfg.ctx_bits,
                            flags=_geometry_flags(codec.name))]
    for off in range(0, max(arr.shape[0], 1), cfg.block_size):
        blk = arr[off:off + cfg.block_size]
        payload = codec.encode_block(blk, lanes=cfg.lanes,
                                     step_quant=cfg.step_quant,
                                     prm0=cfg.prm0, prm1=cfg.prm1,
                                     level=cfg.level,
                                     ctx_bits=cfg.ctx_bits)
        stored = len(payload) >= blk.shape[0]
        if stored:
            payload = blk.tobytes()
        out.append(fmt.write_block(payload, blk, stored))
    return b"".join(out)


def decompress(buf: bytes) -> bytes:
    """Decompress a TRCT container; verifies per-block crc32."""
    hdr = fmt.read_header(buf)
    codec = registry.get(hdr["codec_id"])
    _check_geometry(codec.name, hdr["flags"])
    step_quant = hdr["step_quant"]
    n_left = hdr["orig_len"]
    out = []
    for payload, stored, crc in fmt.iter_blocks(buf, hdr["data_off"]):
        n = min(hdr["block_size"], n_left)
        if stored:
            blk = np.frombuffer(payload, np.uint8)[:n]
        else:
            blk = codec.decode_block(payload, n, lanes=hdr["lanes"],
                                     step_quant=step_quant,
                                     prm0=hdr["prm0"], prm1=hdr["prm1"],
                                     ctx_bits=hdr["ctx_bits"])
        if zlib.crc32(blk.tobytes()) != crc:
            raise ValueError("block crc mismatch: corrupt stream or decoder bug")
        out.append(blk.tobytes())
        n_left -= n
    return b"".join(out)
