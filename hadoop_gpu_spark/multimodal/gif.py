"""Pure-stdlib animated-GIF codec (LZW, no third-party deps).

GIF is the one *video-shaped* container decodable without any codec
library: a frame sequence with per-frame delays. With this module the
``frame_sample`` operator runs on REAL bytes end to end — decode,
timeline reconstruction, frame hashing — leaving only true video
containers (mp4/webm) env-gated, exactly like JPEG/MP3 on the image and
audio paths.

Subset: GIF89a, 8-bit color-index frames, global and local color tables,
full-frame or sub-rectangle frames composited over the previous canvas,
transparency index = keep underlying pixel, 4-pass interlace on decode
(the encoder never emits it). LZW code widths
follow the mainstream convention (width grows when the table reaches the
current code-space size, capped at 12 bits; CLEAR resets).

Reference analog: the reference moves opaque binary media through Pipes
as string KV (Pipes.hh:81-92) and leaves decoding to user binaries; here
the engine itself decodes where a dependency-free codec exists
(SURVEY.md multimodal north-star).
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGIC = b"GIF89a"
_MAX_WIDTH = 12


# --- LZW (GIF variant: variable width, LSB-first bit packing) --------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.cur |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.cur & 0xFF)
            self.cur >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.cur & 0xFF)
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.cur = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise EOFError("LZW stream truncated")
            self.cur |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.cur & ((1 << width) - 1)
        self.cur >>= width
        self.nbits -= width
        return v


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF LZW compression of a color-index stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    w = _BitWriter()
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    w.write(clear, width)
    seq = b""
    for b in indices:
        cand = seq + bytes([b])
        if cand in table:
            seq = cand
            continue
        w.write(table[seq], width)
        if next_code < (1 << _MAX_WIDTH):
            table[cand] = next_code
            next_code += 1
            if next_code > (1 << width) and width < _MAX_WIDTH:
                width += 1
        else:
            w.write(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        seq = bytes([b])
    if seq:
        w.write(table[seq], width)
    w.write(eoi, width)
    return w.finish()


def lzw_decode(data: bytes, min_code_size: int, expected: int | None = None) -> bytes:
    """Inverse of :func:`lzw_encode` (and of any standard GIF encoder).

    ``expected`` = pixel count of the frame: real-world encoders may end
    the stream at the sub-block boundary without an explicit EOI (the
    canonical 1x1 spacer GIF does), so decoding also stops when the
    expected output length is reached or the bitstream runs dry."""
    clear = 1 << min_code_size
    eoi = clear + 1
    r = _BitReader(data)
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    while expected is None or len(out) < expected:
        try:
            code = r.read(width)
        except EOFError:
            if expected is not None and len(out) >= expected:
                break
            if expected is None:
                break
            raise
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError(f"bad LZW code {code}")
        out += entry
        if prev is not None and len(table) < (1 << _MAX_WIDTH):
            table.append(prev + entry[:1])
        if len(table) >= (1 << width) and width < _MAX_WIDTH:
            width += 1
        prev = entry
    return bytes(out)


# --- container -------------------------------------------------------------


def _sub_blocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += data[pos : pos + n]
        pos += n


def encode_gif(
    frames: list[np.ndarray], palette: np.ndarray, delays_ms: list[int]
) -> bytes:
    """Encode index frames (uint8 (h, w), values < len(palette)) with a
    shared global palette ((n, 3) uint8) and per-frame delays."""
    if len(frames) != len(delays_ms):
        raise ValueError("one delay per frame")
    h, w = frames[0].shape
    n = len(palette)
    bits = max(1, (n - 1).bit_length())
    table_size = 1 << bits
    mcs = max(2, bits)
    out = bytearray()
    out += GIF_MAGIC
    out += struct.pack("<HH", w, h)
    out.append(0x80 | ((bits - 1) << 4) | (bits - 1))  # global table, size
    out += b"\x00\x00"  # bg index, aspect
    pal = np.zeros((table_size, 3), dtype=np.uint8)
    pal[:n] = np.asarray(palette, dtype=np.uint8)
    out += pal.tobytes()
    for frame, delay in zip(frames, delays_ms):
        if frame.shape != (h, w):
            raise ValueError("all frames must be full-canvas")
        # graphic control extension: delay in centiseconds
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", max(1, delay // 10)) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out.append(mcs)
        out += _sub_blocks(lzw_encode(np.ascontiguousarray(frame, dtype=np.uint8).tobytes(), mcs))
    out.append(0x3B)
    return bytes(out)


def decode_gif(data: bytes) -> list[tuple[int, np.ndarray]]:
    """Decode to [(delay_ms, rgb_frame (h, w, 3) uint8), ...] — each frame
    is the full composited canvas at that point of the animation.

    Honors the Graphic Control Extension disposal method (GIF89a spec
    §23): 0/1 leave the canvas, 2 restores the frame's region to the
    background color from the logical screen descriptor (no alpha channel
    here, so "background" is that literal color — black when there is no
    global table), 3 restores the pre-frame canvas. Reserved methods 4-7
    are treated as "do not dispose" like mainstream decoders."""
    if data[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF")
    w, h = struct.unpack("<HH", data[6:10])
    packed = data[10]
    bg_index = data[11]
    pos = 13
    global_table = None
    if packed & 0x80:
        size = 2 << (packed & 0x07)
        global_table = np.frombuffer(data[pos : pos + size * 3], dtype=np.uint8).reshape(size, 3)
        pos += size * 3
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    frames: list[tuple[int, np.ndarray]] = []
    delay_ms = 0
    transparent: int | None = None
    disposal = 0
    while True:
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            return frames
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            payload, pos = _read_sub_blocks(data, pos)
            if label == 0xF9 and len(payload) >= 4:
                flags = payload[0]
                disposal = (flags >> 2) & 0x07
                delay_ms = struct.unpack("<H", payload[1:3])[0] * 10
                transparent = payload[3] if flags & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, fw, fh = struct.unpack("<HHHH", data[pos : pos + 8])
        fpacked = data[pos + 8]
        pos += 9
        interlaced = bool(fpacked & 0x40)
        table = global_table
        if fpacked & 0x80:
            size = 2 << (fpacked & 0x07)
            table = np.frombuffer(data[pos : pos + size * 3], dtype=np.uint8).reshape(size, 3)
            pos += size * 3
        if table is None:
            raise ValueError("frame without color table")
        mcs = data[pos]
        pos += 1
        compressed, pos = _read_sub_blocks(data, pos)
        idx = np.frombuffer(
            lzw_decode(compressed, mcs, expected=fw * fh), dtype=np.uint8
        ).reshape(fh, fw)
        if interlaced:
            # GIF 4-pass interlace: stored row order is passes over rows
            # 0::8, 4::8, 2::4, 1::2 — invert to display order
            order = np.concatenate(
                [np.arange(0, fh, 8), np.arange(4, fh, 8),
                 np.arange(2, fh, 4), np.arange(1, fh, 2)]
            )
            de = np.empty_like(idx)
            de[order] = idx
            idx = de
        prev_canvas = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + fh, left : left + fw]
        rgb = table[idx]
        if transparent is not None:
            mask = (idx != transparent)[:, :, None]
            region[:] = np.where(mask, rgb, region)
        else:
            region[:] = rgb
        frames.append((delay_ms, canvas.copy()))
        if disposal == 2:  # restore frame region to the background color
            bg = (
                global_table[bg_index]
                if global_table is not None and bg_index < len(global_table)
                else np.zeros(3, dtype=np.uint8)
            )
            canvas[top : top + fh, left : left + fw] = bg
        elif disposal == 3 and prev_canvas is not None:  # restore previous
            canvas = prev_canvas
        delay_ms = 0
        transparent = None
        disposal = 0
