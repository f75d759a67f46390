"""Container-metadata probing for formats whose CODECS stay env-gated.

Full MP4/H.264 and MP3 audio decode need libraries this container lacks,
but the CONTAINER layers are simple public structures, and a training-data
pipeline's first pass over a media corpus is exactly this: validate bytes,
extract duration/dimensions/rates, route or drop — no pixel/sample decode
at all. These parsers are real (they walk the actual byte structures and
reject malformed input), so the "video/audio metadata" stage of the
pipeline runs on real bytes end-to-end even where decode cannot.

- :func:`parse_mp4_meta` — ISO BMFF (ISO 14496-12) box walk: ftyp major
  brand, mvhd timescale/duration (version 0 and 1), per-trak tkhd
  dimensions (16.16 fixed point), track count.
- :func:`parse_mp3_meta` — MPEG audio frame headers (ISO 11172-3):
  skips an ID3v2 tag, syncs on 0xFFE, reads version/layer/bitrate/
  sample-rate/channel fields, then walks every frame (length =
  144*bitrate/rate + padding for Layer III) for an exact frame count and
  duration.

Builders (:func:`build_mp4`, :func:`build_mp3`) emit minimal valid
streams for tests and SQL-oracle gates — same self-verifying pattern as
the PNG/GIF/JPEG codecs.
"""

from __future__ import annotations

import struct

# MPEG1 Layer III bitrate table (kbps, index 1..14) and sample rates.
_MP3_BITRATES = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_MP3_RATES = [44100, 48000, 32000]
_SAMPLES_PER_FRAME = 1152  # MPEG1 Layer III


# ---------------------------------------------------------------------------
# MP4 (ISO BMFF).
# ---------------------------------------------------------------------------
def parse_mp4_meta(data: bytes) -> dict:
    """Walk top-level and moov boxes; returns {container, major_brand,
    duration_ms, n_tracks, width, height} (dims from the first video-sized
    tkhd, 0 if none)."""
    if len(data) < 8 or data[4:8] != b"ftyp":
        raise ValueError("not an MP4 (no ftyp box first)")
    meta = {
        "container": "mp4",
        "major_brand": data[8:12].decode("latin1"),
        "duration_ms": 0,
        "n_tracks": 0,
        "width": 0,
        "height": 0,
    }

    def walk(buf: bytes, start: int, end: int, depth: int = 0):
        pos = start
        while pos + 8 <= end:
            size = struct.unpack(">I", buf[pos : pos + 4])[0]
            tag = buf[pos + 4 : pos + 8]
            body = pos + 8
            if size == 1:  # 64-bit largesize
                size = struct.unpack(">Q", buf[pos + 8 : pos + 16])[0]
                body = pos + 16
            if size == 0:  # to end of enclosing box
                size = end - pos
            if size < 8 or pos + size > end:
                raise ValueError(f"malformed box {tag!r} at {pos}")
            if tag == b"moov":
                walk(buf, body, pos + size, depth + 1)
            elif tag == b"trak":
                meta["n_tracks"] += 1
                walk(buf, body, pos + size, depth + 1)
            elif tag == b"mvhd":
                ver = buf[body]
                if ver == 1:
                    ts, dur = struct.unpack(">IQ", buf[body + 20 : body + 32])
                else:
                    ts, dur = struct.unpack(">II", buf[body + 12 : body + 20])
                if ts:
                    meta["duration_ms"] = dur * 1000 // ts
            elif tag == b"tkhd":
                ver = buf[body]
                # fields before the matrix: 40 bytes (v0) / 52 (v1:
                # 64-bit creation/modification/duration), then 36-byte
                # matrix, then 16.16 fixed-point width/height
                off = body + (40 if ver == 0 else 52) + 36
                w16, h16 = struct.unpack(">II", buf[off : off + 8])
                w, h = w16 >> 16, h16 >> 16
                if w and h and meta["width"] == 0:
                    meta["width"], meta["height"] = w, h
            pos += size

    walk(data, 0, len(data))
    return meta


def build_mp4(
    major_brand: str = "isom",
    duration_ms: int = 0,
    width: int = 0,
    height: int = 0,
    n_tracks: int = 1,
    timescale: int = 1000,
) -> bytes:
    """Minimal valid ISO BMFF stream: ftyp + moov(mvhd + n tkhd-only traks)."""

    def box(tag: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + tag + payload

    ftyp = box(b"ftyp", major_brand.encode("latin1")[:4].ljust(4) + struct.pack(">I", 0) + b"isom")
    dur = duration_ms * timescale // 1000
    mvhd = box(
        b"mvhd",
        struct.pack(">B3x", 0)
        + struct.pack(">II", 0, 0)  # creation, modification
        + struct.pack(">II", timescale, dur)
        + struct.pack(">IH2x", 0x00010000, 0x0100)  # rate, volume
        + b"\x00" * 8  # reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24  # predefined
        + struct.pack(">I", n_tracks + 1),  # next track id
    )
    traks = b""
    for tid in range(1, n_tracks + 1):
        tkhd = box(
            b"tkhd",
            struct.pack(">B3x", 0)
            + struct.pack(">III", 0, 0, tid)  # times, track id
            + struct.pack(">I", 0)  # reserved
            + struct.pack(">I", dur)
            + b"\x00" * 8
            + struct.pack(">HHHH", 0, 0, 0, 0)  # layer, group, volume, rsvd
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", width << 16, height << 16),
        )
        traks += box(b"trak", tkhd)
    return ftyp + box(b"moov", mvhd + traks)


# ---------------------------------------------------------------------------
# MP3 (MPEG1 Layer III headers).
# ---------------------------------------------------------------------------
def parse_mp3_meta(data: bytes) -> dict:
    """Parse every frame header; returns {container, sample_rate,
    bitrate_kbps (first frame), channels, n_frames, duration_ms}. Raises on
    anything that is not MPEG1 Layer III CBR-shaped frames (VBR streams
    parse too — bitrate is then just the first frame's)."""
    pos = 0
    if data[:3] == b"ID3":  # ID3v2: 10-byte header + syncsafe size
        size = (
            (data[6] & 0x7F) << 21 | (data[7] & 0x7F) << 14 | (data[8] & 0x7F) << 7 | (data[9] & 0x7F)
        )
        pos = 10 + size
    meta = None
    n_frames = 0
    while pos + 4 <= len(data):
        h = struct.unpack(">I", data[pos : pos + 4])[0]
        if (h >> 21) & 0x7FF != 0x7FF:
            raise ValueError(f"lost frame sync at {pos}")
        version = (h >> 19) & 3
        layer = (h >> 17) & 3
        if version != 3 or layer != 1:
            raise NotImplementedError("only MPEG1 Layer III headers supported")
        bidx = (h >> 12) & 0xF
        ridx = (h >> 10) & 3
        if bidx in (0, 15) or ridx == 3:
            raise ValueError("free-format/bad bitrate or reserved sample rate")
        padding = (h >> 9) & 1
        mode = (h >> 6) & 3
        bitrate = _MP3_BITRATES[bidx] * 1000
        rate = _MP3_RATES[ridx]
        if meta is None:
            meta = {
                "container": "mp3",
                "sample_rate": rate,
                "bitrate_kbps": bitrate // 1000,
                "channels": 1 if mode == 3 else 2,
            }
        frame_len = 144 * bitrate // rate + padding
        pos += frame_len
        n_frames += 1
    if meta is None:
        raise ValueError("no MP3 frames")
    meta["n_frames"] = n_frames
    meta["duration_ms"] = n_frames * _SAMPLES_PER_FRAME * 1000 // meta["sample_rate"]
    return meta


def build_mp3(
    n_frames: int = 10,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    channels: int = 2,
    id3: bytes | None = None,
) -> bytes:
    """Minimal valid MPEG1 Layer III CBR stream: correct frame headers,
    zero-filled frame payloads, optional ID3v2 tag in front."""
    bidx = _MP3_BITRATES.index(bitrate_kbps)
    ridx = _MP3_RATES.index(sample_rate)
    mode = 3 if channels == 1 else 0
    header = (
        0x7FF << 21 | 3 << 19 | 1 << 17 | 1 << 16  # sync, MPEG1, Layer III, no CRC
        | bidx << 12 | ridx << 10 | 0 << 9  # bitrate, rate, no padding
        | mode << 6
    )
    frame_len = 144 * bitrate_kbps * 1000 // sample_rate
    frame = struct.pack(">I", header) + b"\x00" * (frame_len - 4)
    out = b""
    if id3 is not None:
        size = len(id3)
        syncsafe = bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
        )
        out += b"ID3\x04\x00\x00" + syncsafe + id3
    return out + frame * n_frames


# ---------------------------------------------------------------------------
# Dispatching probe.
# ---------------------------------------------------------------------------
def probe_bytes(data: bytes) -> dict:
    """Identify and probe a media blob by its real byte structure. Returns
    {container, duration_ms, width, height, sample_rate, n_tracks} with
    zeros for fields the container does not carry."""
    base = {
        "container": "unknown",
        "duration_ms": 0,
        "width": 0,
        "height": 0,
        "sample_rate": 0,
        "n_tracks": 0,
    }
    if len(data) >= 12 and data[4:8] == b"ftyp":
        m = parse_mp4_meta(data)
        base.update(
            container="mp4", duration_ms=m["duration_ms"], width=m["width"],
            height=m["height"], n_tracks=m["n_tracks"],
        )
    elif data[:3] == b"ID3" or (len(data) >= 2 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0):
        m = parse_mp3_meta(data)
        base.update(
            container="mp3", duration_ms=m["duration_ms"],
            sample_rate=m["sample_rate"], n_tracks=1,
        )
    elif data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        import io
        import wave

        with wave.open(io.BytesIO(data)) as wf:
            base.update(
                container="wav",
                duration_ms=wf.getnframes() * 1000 // wf.getframerate(),
                sample_rate=wf.getframerate(),
                n_tracks=1,
            )
    elif data[:2] == b"\xff\xd8" or data[:8] == b"\x89PNG\r\n\x1a\n" or data[:3] == b"GIF":
        base.update(container="image")
    return base
