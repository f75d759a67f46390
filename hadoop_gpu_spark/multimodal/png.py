"""Pure-stdlib PNG codec (struct + zlib, no third-party deps).

Covers the baseline subset a training-data pipeline actually meets in a
screenshot/diagram corpus: 8-bit depth, grayscale / RGB / RGBA, no
interlace, all five scanline filters on decode. This makes the multimodal
decode path REAL for PNG bytes — the deterministic fake decoder remains
only for non-PNG media (JPEG/audio/video need codecs this container lacks).

Reference analog: the reference moves opaque binary media through Pipes as
string KV (Pipes.hh:81-92) and leaves decoding to user binaries; here the
engine itself decodes where a dependency-free codec exists.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: IHDR color type → channel count (8-bit, non-palette subset)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload))
    )


def encode_png(arr: np.ndarray, level: int = 6) -> bytes:
    """Encode a uint8 array — (h, w) gray or (h, w, 3|4) color — as a
    baseline PNG (filter 0 scanlines; decoders must handle all filters,
    encoders may emit any)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    channels = 1 if arr.ndim == 2 else arr.shape[2]
    color = {1: 0, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    flat = arr.reshape(h, w * channels)
    raw = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, level))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes → uint8 array, (h, w) for grayscale else
    (h, w, channels). Verifies chunk CRCs. Supports bit depth 8, color
    types 0/2/4/6, interlace 0 — raises ValueError outside that subset."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG (bad magic)")
    pos, ihdr, idat = 8, None, bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if crc != zlib.crc32(tag + payload):
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in _CHANNELS or comp or filt or interlace:
        raise ValueError(
            f"unsupported PNG variant (depth={depth} color={color} interlace={interlace}); "
            "codec covers the 8-bit non-interlaced non-palette subset"
        )
    channels = _CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")

    out = np.empty((h, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        above = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            line = bytearray((np.frombuffer(bytes(line), dtype=np.uint8) + above).astype(np.uint8).tobytes())
        elif ftype == 3:  # Average
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((left + int(above[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                up_left = int(above[x - bpp]) if x >= bpp else 0
                line[x] = (line[x] + _paeth(left, int(above[x]), up_left)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)

    img = out.reshape(h, w, channels)
    return img[:, :, 0] if channels == 1 else img
