"""FLAC codec subset — pure stdlib + numpy, no external libraries.

Closes the audio half of the env-gated codec list the same way
:mod:`.jpeg` closed the image half: FLAC bytes decode FOR REAL inside
``decode_audio`` beside WAV PCM.

Declared subset (enforced, not silently mis-decoded):
- 16-bit samples, fixed blocksize streams, 1-2 channels;
- subframes: CONSTANT, VERBATIM, FIXED (orders 0-4), LPC (any order);
- all four channel assignments (independent, left/side, right/side,
  mid/side);
- partitioned rice residuals (4- and 5-bit parameter variants, escape
  partitions), CRC-8 frame headers and CRC-16 frame footers verified,
  STREAMINFO md5 of the decoded PCM verified when present.

Everything from the public FLAC format spec (xiph.org). The encoder
emits the same subset (choose subframe type per call), so round trips
are self-verifying the way the GIF/JPEG codecs are: encode → decode must
be bit-exact for this LOSSLESS format, across every subframe type and
stereo mode.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

FLAC_MAGIC = b"fLaC"

_FIXED_COEF = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def w(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        if self.n:
            self.w(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.out)


class _BR:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # byte position
        self.bit = 0

    def r(self, bits: int) -> int:
        v = 0
        for _ in range(bits):
            byte = self.data[self.pos]
            v = (v << 1) | ((byte >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v

    def r_signed(self, bits: int) -> int:
        v = self.r(bits)
        return v - (1 << bits) if v >= (1 << (bits - 1)) else v

    def unary(self) -> int:
        n = 0
        while self.r(1) == 0:
            n += 1
        return n

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _utf8_frame_number(n: int) -> bytes:
    """FLAC's extended-UTF-8 coding of the frame number."""
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    nbytes = 2
    while bits > (7 - nbytes) + 6 * (nbytes - 1):
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_frame_number(br: _BR) -> int:
    first = br.r(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    v = first & (mask - 1)
    for _ in range(nbytes - 1):
        cont = br.r(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("bad UTF-8 frame number")
        v = (v << 6) | (cont & 0x3F)
    return v


def _zigzag(v: np.ndarray) -> np.ndarray:
    return np.where(v >= 0, v.astype(np.int64) << 1, ((-v.astype(np.int64)) << 1) - 1)


def _rice_encode(bw: _BW, res: np.ndarray, bits_fallback: int) -> None:
    """One rice partition (partition order 0), parameter chosen from the
    mean magnitude; escapes to raw when unary would blow up."""
    u = _zigzag(res)
    mean = float(u.mean()) if len(u) else 0.0
    k = 0
    while (1 << (k + 1)) < mean + 1 and k < 14:
        k += 1
    # escape if the worst quotient is huge (pathological residuals)
    if len(u) and int(u.max()) >> k > 64:
        bw.w(0xF, 4)  # escape code for 4-bit rice
        bw.w(bits_fallback, 5)
        for v in res:
            bw.w(int(v) & ((1 << bits_fallback) - 1), bits_fallback)
        return
    bw.w(k, 4)
    for val in u:
        q = int(val) >> k
        for _ in range(q):
            bw.w(0, 1)
        bw.w(1, 1)
        if k:
            bw.w(int(val) & ((1 << k) - 1), k)


def _rice_decode(br: _BR, n: int, method: int) -> np.ndarray:
    param_bits, escape = (4, 0xF) if method == 0 else (5, 0x1F)
    k = br.r(param_bits)
    out = np.empty(n, dtype=np.int64)
    if k == escape:
        raw = br.r(5)
        for i in range(n):
            out[i] = br.r_signed(raw) if raw else 0
        return out
    for i in range(n):
        q = br.unary()
        u = (q << k) | (br.r(k) if k else 0)
        out[i] = (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)
    return out


def _residual_decode(br: _BR, blocksize: int, order: int) -> np.ndarray:
    method = br.r(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    po = br.r(4)
    nparts = 1 << po
    if blocksize % nparts:
        raise ValueError("partition order does not divide blocksize")
    out = []
    for p in range(nparts):
        n = blocksize // nparts - (order if p == 0 else 0)
        out.append(_rice_decode(br, n, method))
    return np.concatenate(out) if out else np.empty(0, dtype=np.int64)


def _subframe_decode(br: _BR, blocksize: int, bits: int) -> np.ndarray:
    if br.r(1) != 0:
        raise ValueError("subframe padding bit set")
    t = br.r(6)
    wasted = 0
    if br.r(1):  # wasted-bits flag: unary count follows
        wasted = br.unary() + 1
        bits -= wasted
    if t == 0:  # CONSTANT
        out = np.full(blocksize, br.r_signed(bits), dtype=np.int64)
    elif t == 1:  # VERBATIM
        out = np.array([br.r_signed(bits) for _ in range(blocksize)], dtype=np.int64)
    elif 8 <= t <= 12:  # FIXED
        order = t - 8
        warm = [br.r_signed(bits) for _ in range(order)]
        res = _residual_decode(br, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        coef = _FIXED_COEF[order]
        for i in range(order, blocksize):
            pred = sum(c * out[i - 1 - j] for j, c in enumerate(coef))
            out[i] = pred + res[i - order]
    elif t >= 32:  # LPC
        order = (t & 0x1F) + 1
        warm = [br.r_signed(bits) for _ in range(order)]
        precision = br.r(4) + 1
        if precision == 16:
            raise ValueError("invalid qlp precision")
        shift = br.r_signed(5)
        coefs = [br.r_signed(precision) for _ in range(order)]
        res = _residual_decode(br, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        for i in range(order, blocksize):
            acc = sum(c * out[i - 1 - j] for j, c in enumerate(coefs))
            out[i] = (acc >> shift) + res[i - order]
    else:
        raise NotImplementedError(f"reserved subframe type {t}")
    return out << wasted


def decode_flac(data: bytes) -> tuple[int, np.ndarray]:
    """Decode to (sample_rate, samples int16 (n, channels)). Verifies frame
    CRCs and (when nonzero) the STREAMINFO md5 of the decoded PCM."""
    if data[:4] != FLAC_MAGIC:
        raise ValueError("not a FLAC stream")
    pos = 4
    streaminfo = None
    while True:
        header = data[pos : pos + 4]
        last = header[0] >> 7
        btype = header[0] & 0x7F
        blen = int.from_bytes(header[1:4], "big")
        body = data[pos + 4 : pos + 4 + blen]
        if btype == 0:
            streaminfo = body
        pos += 4 + blen
        if last:
            break
    if streaminfo is None:
        raise ValueError("missing STREAMINFO")
    br = _BR(streaminfo)
    br.r(16)  # min blocksize
    br.r(16)  # max blocksize
    br.r(24)
    br.r(24)
    sample_rate = br.r(20)
    channels = br.r(3) + 1
    bits = br.r(5) + 1
    total = br.r(36)
    md5 = streaminfo[18:34]
    if bits != 16:
        raise NotImplementedError(f"{bits}-bit samples (subset is 16)")
    if channels > 2:
        raise NotImplementedError(f"{channels} channels (subset is 1-2)")

    if total == 0:
        return sample_rate, np.empty((0, channels), dtype=np.int16)
    chans: list[list[np.ndarray]] = [[] for _ in range(channels)]
    got = 0
    while got < total and pos < len(data):
        frame_start = pos
        br = _BR(data, pos)
        sync = br.r(14)
        if sync != 0x3FFE:
            raise ValueError(f"lost frame sync at byte {pos}")
        br.r(1)  # reserved
        br.r(1)  # blocking strategy (0 = fixed)
        bs_code = br.r(4)
        sr_code = br.r(4)
        chan_asgn = br.r(4)
        ss_code = br.r(3)
        br.r(1)  # reserved
        _read_utf8_frame_number(br)
        if bs_code == 6:
            blocksize = br.r(8) + 1
        elif bs_code == 7:
            blocksize = br.r(16) + 1
        elif bs_code == 1:
            blocksize = 192
        elif 2 <= bs_code <= 5:
            blocksize = 576 << (bs_code - 2)
        elif 8 <= bs_code <= 15:
            blocksize = 256 << (bs_code - 8)
        else:
            raise ValueError("reserved blocksize code")
        if sr_code in (12, 13, 14):
            br.r(8 if sr_code == 12 else 16)
        if ss_code == 0b100:
            fbits = 16
        elif ss_code == 0:
            fbits = bits
        else:
            raise NotImplementedError("non-16-bit frame sample size")
        br.align()
        crc8_stored = data[br.pos]
        if _crc8(data[frame_start : br.pos]) != crc8_stored:
            raise ValueError("frame header CRC-8 mismatch")
        br.pos += 1

        if chan_asgn < 8:
            n_sub = chan_asgn + 1
            extra = [0] * n_sub
        elif chan_asgn in (8, 9, 10):
            n_sub = 2
            # the SIDE channel carries one extra bit
            extra = [0, 1] if chan_asgn in (8, 10) else [1, 0]
        else:
            raise ValueError("reserved channel assignment")
        if n_sub != channels:
            raise ValueError("frame channel count != STREAMINFO")
        try:
            subs = [
                _subframe_decode(br, blocksize, fbits + extra[c]) for c in range(n_sub)
            ]
        except IndexError:
            # corrupted/truncated frames must surface as a decode error,
            # not a raw out-of-range read
            raise ValueError("truncated or corrupt FLAC frame") from None
        br.align()
        crc16_stored = struct.unpack(">H", data[br.pos : br.pos + 2])[0]
        if _crc16(data[frame_start : br.pos]) != crc16_stored:
            raise ValueError("frame CRC-16 mismatch")
        br.pos += 2
        pos = br.pos

        if chan_asgn == 8:  # left/side: right = left - side
            left, side = subs
            subs = [left, left - side]
        elif chan_asgn == 9:  # right/side: left = right + side
            side, right = subs
            subs = [right + side, right]
        elif chan_asgn == 10:  # mid/side: (mid<<1)|side_lsb restores l+r
            mid, side = subs
            m2 = (mid << 1) | (side & 1)
            subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        for c in range(channels):
            chans[c].append(subs[c])
        got += blocksize

    pcm = np.stack([np.concatenate(c)[:total] for c in chans], axis=-1).astype(np.int16)
    if md5 != b"\x00" * 16:
        inter = pcm.astype("<i2").tobytes()
        if hashlib.md5(inter).digest() != md5:
            raise ValueError("STREAMINFO md5 mismatch (decoded PCM differs)")
    return sample_rate, pcm


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 44100,
    subframe: str = "fixed",
    stereo: str = "independent",
    blocksize: int = 4096,
) -> bytes:
    """Encode int16 samples ((n,) mono or (n, 2) stereo) as a FLAC stream.

    ``subframe``: 'constant'-eligible runs are always detected; otherwise
    'verbatim', 'fixed' (best order 0-2 per block), or 'lpc' (order-2
    fixed predictor expressed as an LPC subframe — exercises the LPC
    decode path). ``stereo``: 'independent', 'left_side', 'right_side',
    or 'mid_side'.
    """
    samples = np.asarray(samples, dtype=np.int64)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    if channels > 2:
        raise NotImplementedError("subset is 1-2 channels")
    if stereo != "independent" and channels != 2:
        raise ValueError("stereo coding needs 2 channels")

    def encode_sub(bw: _BW, x: np.ndarray, bits: int) -> None:
        if len(np.unique(x)) == 1:
            bw.w(0, 1)
            bw.w(0, 6)  # CONSTANT
            bw.w(0, 1)
            bw.w(int(x[0]) & ((1 << bits) - 1), bits)
            return
        if subframe == "verbatim":
            bw.w(0, 1)
            bw.w(1, 6)
            bw.w(0, 1)
            for v in x:
                bw.w(int(v) & ((1 << bits) - 1), bits)
            return
        # best fixed order 0-2 by residual magnitude
        best_o, best_res, best_cost = 0, x.copy(), None
        for o in range(0, 3):
            if len(x) <= o:
                break
            res = x.copy()
            for _ in range(o):
                res = np.diff(res)
            res = res[: len(x) - o]
            cost = np.abs(res).sum()
            if best_cost is None or cost < best_cost:
                best_o, best_res, best_cost = o, res, cost
        o = best_o
        if subframe == "lpc":
            o = min(2, len(x) - 1)
            res = x.copy()
            for _ in range(o):
                res = np.diff(res)
            bw.w(0, 1)
            bw.w(0x20 | (o - 1), 6)  # LPC order o
            bw.w(0, 1)
            for v in x[:o]:
                bw.w(int(v) & ((1 << bits) - 1), bits)
            bw.w(14, 4)  # precision 15
            bw.w(0, 5)  # shift 0
            for c in _FIXED_COEF[o]:
                bw.w(int(c) & 0x7FFF, 15)
            bw.w(0, 2)  # rice method 0
            bw.w(0, 4)  # partition order 0
            _rice_encode(bw, res, bits + 4)
            return
        bw.w(0, 1)
        bw.w(8 | o, 6)  # FIXED order o
        bw.w(0, 1)
        for v in x[:o]:
            bw.w(int(v) & ((1 << bits) - 1), bits)
        bw.w(0, 2)
        bw.w(0, 4)
        _rice_encode(bw, best_res if o else x, bits + 4)

    frames = bytearray()
    idx = 0
    fnum = 0
    while idx < n:
        block = samples[idx : idx + blocksize]
        bs = len(block)
        if channels == 1 or stereo == "independent":
            chan_asgn = channels - 1
            subs = [(block[:, c], 16) for c in range(channels)]
        else:
            left, right = block[:, 0], block[:, 1]
            side = left - right
            if stereo == "left_side":
                chan_asgn, subs = 8, [(left, 16), (side, 17)]
            elif stereo == "right_side":
                chan_asgn, subs = 9, [(side, 17), (right, 16)]
            else:  # mid_side
                mid = (left + right) >> 1
                chan_asgn, subs = 10, [(mid, 16), (side, 17)]
        bw = _BW()
        bw.w(0x3FFE, 14)
        bw.w(0, 1)
        bw.w(0, 1)  # fixed blocksize stream
        bw.w(7, 4)  # blocksize: 16-bit value follows
        bw.w(0, 4)  # sample rate: from STREAMINFO
        bw.w(chan_asgn, 4)
        bw.w(0b100, 3)  # 16 bits/sample
        bw.w(0, 1)
        for b in _utf8_frame_number(fnum):
            bw.w(b, 8)
        bw.w(bs - 1, 16)
        bw.align()
        header = bw.bytes()
        header += bytes([_crc8(header)])
        bw = _BW()
        for x, bits in subs:
            encode_sub(bw, x, bits)
        bw.align()
        body = bw.bytes()
        frame = header + body
        frame += struct.pack(">H", _crc16(frame))
        frames += frame
        idx += bs
        fnum += 1

    si = _BW()
    si.w(blocksize, 16)
    si.w(blocksize, 16)
    si.w(0, 24)
    si.w(0, 24)
    si.w(sample_rate, 20)
    si.w(channels - 1, 3)
    si.w(15, 5)  # 16 bits - 1
    si.w(n, 36)
    streaminfo = si.bytes() + hashlib.md5(samples.astype("<i2").tobytes()).digest()
    out = bytearray(FLAC_MAGIC)
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    out += frames
    return bytes(out)
