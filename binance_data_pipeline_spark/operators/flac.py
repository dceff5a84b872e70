"""Dependency-free FLAC codec — extends the multimodal AUDIO tier
(operators/multimodal.py) beyond PCM WAV with the lossless-audio
staple: STREAMINFO metadata, frame sync with UTF-8 frame numbers and
CRC-8/CRC-16 verification, all four subframe types (constant,
verbatim, fixed orders 0-4, LPC up to order 32), Rice/Rice2 partitioned
residuals with escape partitions, wasted bits, and the three stereo
decorrelation modes (left/side, right/side, mid/side).

The encoder writes fixed-blocksize frames choosing per-subframe between
constant / verbatim / fixed-predictor Rice coding, so
decode(encode(x)) == x EXACTLY at any bit depth 8/16/24 — the roundtrip
oracle the tests pin (the format is lossless end to end).

Reference scope note: the binance reference pipeline has no media
handling (698 LoC of pandas/Kafka/dbt); this module extends the
multimodal-column surface the build brief requires.
"""

from __future__ import annotations

import struct

__all__ = ["decode_flac", "encode_flac"]

FLAC_SIG = b"fLaC"

_FIXED_COEF = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}

_BLOCKSIZE_CODE = {
    192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
    256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12, 8192: 13, 16384: 14,
    32768: 15,
}

_SAMPLE_RATE_CODE = {
    88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5, 22050: 6,
    24000: 7, 32000: 8, 44100: 9, 48000: 10, 96000: 11,
}

_BPS_CODE = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}


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


class _BitReader:
    """MSB-first bit reader with a byte-position view (frame headers
    and footers are CRC'd over whole bytes)."""

    def __init__(self, data: bytes, pos_bits: int = 0) -> None:
        self.d = data
        self.pos = pos_bits

    def bit(self) -> int:
        i = self.pos
        if (i >> 3) >= len(self.d):
            raise ValueError("corrupt FLAC: bitstream overrun")
        self.pos = i + 1
        return (self.d[i >> 3] >> (7 - (i & 7))) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def sbits(self, n: int) -> int:
        v = self.bits(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        n = 0
        while self.bit() == 0:
            n += 1
            if n > 1 << 24:
                raise ValueError("corrupt FLAC: unary runaway")
        return n

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def bits(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.out.append(self._acc)
                self._acc, self._n = 0, 0

    def sbits(self, value: int, n: int) -> None:
        self.bits(value & ((1 << n) - 1), n)

    def unary(self, q: int) -> None:
        for _ in range(q):
            self.bits(0, 1)
        self.bits(1, 1)

    def align(self) -> None:
        while self._n:
            self.bits(0, 1)


def _utf8_number(n: int) -> bytes:
    """FLAC's extended UTF-8 coding for frame numbers (up to 36 bits)."""
    if n < 0x80:
        return bytes([n])
    # (continuation count, lead byte, payload bits in the lead)
    for count, lead, head_bits in (
        (1, 0xC0, 5), (2, 0xE0, 4), (3, 0xF0, 3), (4, 0xF8, 2),
        (5, 0xFC, 1), (6, 0xFE, 0),
    ):
        if n < 1 << (head_bits + 6 * count):
            head = lead | (n >> (6 * count))
            body = [
                0x80 | ((n >> (6 * (count - 1 - i))) & 0x3F)
                for i in range(count)
            ]
            return bytes([head] + body)
    raise ValueError("frame number out of range")


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.bits(8)
    if b0 < 0x80:
        return b0
    n_cont = 0
    mask = 0x40
    while b0 & mask:
        n_cont += 1
        mask >>= 1
    if n_cont == 0 or n_cont > 6:
        raise ValueError("corrupt FLAC: bad UTF-8 frame number")
    v = b0 & (mask - 1)
    for _ in range(n_cont):
        c = br.bits(8)
        if c & 0xC0 != 0x80:
            raise ValueError("corrupt FLAC: bad UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _decode_residuals(br: _BitReader, n: int, order: int) -> list[int]:
    method = br.bits(2)
    if method > 1:
        raise ValueError(f"corrupt FLAC: residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.bits(4)
    nparts = 1 << porder
    if n % nparts:
        raise ValueError("corrupt FLAC: partition size")
    out: list[int] = []
    for p in range(nparts):
        cnt = n // nparts - (order if p == 0 else 0)
        if cnt < 0:
            raise ValueError("corrupt FLAC: partition underflow")
        param = br.bits(pbits)
        if param == escape:
            raw = br.bits(5)
            for _ in range(cnt):
                out.append(br.sbits(raw) if raw else 0)
        else:
            for _ in range(cnt):
                q = br.unary()
                v = (q << param) | br.bits(param)
                out.append((v >> 1) ^ -(v & 1))  # un-zigzag
    return out


def _decode_subframe(br: _BitReader, n: int, bps: int) -> list[int]:
    if br.bit():
        raise ValueError("corrupt FLAC: subframe padding bit")
    stype = br.bits(6)
    wasted = 0
    if br.bit():
        wasted = 1 + br.unary()
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("corrupt FLAC: wasted bits exceed sample size")
    if stype == 0:  # constant
        v = br.sbits(eff)
        out = [v] * n
    elif stype == 1:  # verbatim
        out = [br.sbits(eff) for _ in range(n)]
    elif 8 <= stype <= 12:  # fixed
        order = stype - 8
        out = [br.sbits(eff) for _ in range(order)]
        res = _decode_residuals(br, n, order)
        coef = _FIXED_COEF[order]
        for i in range(order, n):
            pred = sum(c * out[i - 1 - j] for j, c in enumerate(coef))
            out.append(res[i - order] + pred)
    elif stype >= 32:  # LPC
        order = stype - 31
        out = [br.sbits(eff) for _ in range(order)]
        prec = br.bits(4) + 1
        if prec == 16:
            raise ValueError("corrupt FLAC: invalid LPC precision")
        shift = br.sbits(5)
        if shift < 0:
            raise ValueError("corrupt FLAC: negative LPC shift")
        coef = [br.sbits(prec) for _ in range(order)]
        res = _decode_residuals(br, n, order)
        for i in range(order, n):
            pred = sum(c * out[i - 1 - j] for j, c in enumerate(coef)) >> shift
            out.append(res[i - order] + pred)
    else:
        raise ValueError(f"corrupt FLAC: reserved subframe type {stype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(payload: bytes):
    """Decode a FLAC stream. Returns (rate, channels, float samples in
    [-1, 1], interleaved) — the decode_wav contract — plus exactness:
    the underlying ints are reconstructed losslessly (the tests compare
    them via the encoder's scale)."""
    import numpy as np

    if payload[:4] != FLAC_SIG:
        raise ValueError("not a FLAC payload")
    pos = 4
    info = None
    while pos + 4 <= len(payload):
        hdr = payload[pos]
        last, btype = hdr >> 7, hdr & 0x7F
        (ln,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        body = payload[pos + 4 : pos + 4 + ln]
        if len(body) < ln:
            raise ValueError("corrupt FLAC: truncated metadata block")
        if btype == 0:  # STREAMINFO
            br = _BitReader(body)
            br.bits(16)  # min block size
            br.bits(16)  # max block size
            br.bits(24)
            br.bits(24)
            rate = br.bits(20)
            channels = br.bits(3) + 1
            bps = br.bits(5) + 1
            total = br.bits(36)
            info = (rate, channels, bps, total)
        pos += 4 + ln
        if last:
            break
    if info is None:
        raise ValueError("corrupt FLAC: missing STREAMINFO")
    rate, channels, bps, total = info
    if not (1 <= channels <= 8) or not (4 <= bps <= 32) or rate == 0:
        raise ValueError("corrupt FLAC: implausible STREAMINFO")
    if total > 1 << 30:
        raise ValueError("corrupt FLAC: implausible sample count")

    chans: list[list[int]] = [[] for _ in range(channels)]
    got = 0
    while (total == 0 or got < total) and pos + 2 <= len(payload):
        frame_start = pos
        br = _BitReader(payload, pos * 8)
        sync = br.bits(14)
        if sync != 0x3FFE:
            raise ValueError("corrupt FLAC: lost frame sync")
        br.bit()  # reserved
        br.bit()  # blocking strategy
        bs_code = br.bits(4)
        sr_code = br.bits(4)
        ch_code = br.bits(4)
        bps_code = br.bits(3)
        br.bit()  # reserved
        _read_utf8_number(br)
        if bs_code == 0:
            raise ValueError("corrupt FLAC: reserved block size code")
        if bs_code == 6:
            n = br.bits(8) + 1
        elif bs_code == 7:
            n = br.bits(16) + 1
        elif bs_code == 1:
            n = 192
        elif 2 <= bs_code <= 5:
            n = 576 << (bs_code - 2)
        else:
            n = 256 << (bs_code - 8)
        if sr_code == 12:
            br.bits(8)
        elif sr_code in (13, 14):
            br.bits(16)
        elif sr_code == 15:
            raise ValueError("corrupt FLAC: invalid sample rate code")
        hdr_end = (br.pos + 7) >> 3
        if _crc8(payload[frame_start:hdr_end]) != br.bits(8):
            raise ValueError("corrupt FLAC: frame header CRC mismatch")

        if ch_code < 8:
            if ch_code + 1 != channels:
                raise ValueError("corrupt FLAC: channel count mismatch")
            sub = [_decode_subframe(br, n, bps) for _ in range(channels)]
        elif ch_code in (8, 9, 10):
            if channels != 2:
                raise ValueError("corrupt FLAC: stereo decorrelation mono")
            if ch_code == 8:  # left/side
                left = _decode_subframe(br, n, bps)
                side = _decode_subframe(br, n, bps + 1)
                sub = [left, [l_ - s for l_, s in zip(left, side)]]
            elif ch_code == 9:  # right/side
                side = _decode_subframe(br, n, bps + 1)
                right = _decode_subframe(br, n, bps)
                sub = [[r + s for r, s in zip(right, side)], right]
            else:  # mid/side
                mid = _decode_subframe(br, n, bps)
                side = _decode_subframe(br, n, bps + 1)
                sub = [[], []]
                for m, s in zip(mid, side):
                    m = (m << 1) | (s & 1)
                    sub[0].append((m + s) >> 1)
                    sub[1].append((m - s) >> 1)
        else:
            raise ValueError(f"corrupt FLAC: channel assignment {ch_code}")
        br.align()
        body_end = br.pos >> 3
        (crc16,) = struct.unpack(">H", payload[body_end : body_end + 2])
        if _crc16(payload[frame_start:body_end]) != crc16:
            raise ValueError("corrupt FLAC: frame CRC-16 mismatch")
        pos = body_end + 2
        for c in range(channels):
            chans[c].extend(sub[c])
        got += n
    if total and got < total:
        raise ValueError(f"corrupt FLAC: decoded {got}/{total} samples")
    if total:
        chans = [c[:total] for c in chans]

    arr = np.array(chans, np.float64)  # channels x samples
    interleaved = arr.T.reshape(-1)
    scale = float(1 << (bps - 1))
    return rate, channels, interleaved / scale


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _encode_residuals(
    bw: _BitWriter, res: list[int], order: int, n: int, porder: int = 0
) -> None:
    """Partitioned Rice coding with a per-partition swept parameter
    (escape to raw when even the best parameter loses). ``n`` is the
    block size; partition 0 holds n/2^porder - order residuals."""
    nparts = 1 << porder
    if n % nparts or n // nparts <= order:
        porder, nparts = 0, 1  # fall back: requested order doesn't fit
    bw.bits(0, 2)  # rice, 4-bit params
    bw.bits(porder, 4)
    start = 0
    for p in range(nparts):
        cnt = n // nparts - (order if p == 0 else 0)
        part = res[start : start + cnt]
        start += cnt
        zz = [(abs(r) << 1) - (1 if r < 0 else 0) for r in part]
        best_p, best_cost = 0, None
        for prm in range(15):
            c = sum((z >> prm) + 1 + prm for z in zz)
            if best_cost is None or c < best_cost:
                best_p, best_cost = prm, c
            if all(z >> prm == 0 for z in zz):
                break
        maxbits = max((abs(r).bit_length() + 1 for r in part), default=1)
        if best_cost is not None and best_cost > maxbits * len(part) + 5:
            bw.bits(15, 4)  # escape
            bw.bits(maxbits, 5)
            for r in part:
                bw.sbits(r, maxbits)
            continue
        bw.bits(best_p, 4)
        for z in zz:
            bw.unary(z >> best_p)
            bw.bits(z & ((1 << best_p) - 1), best_p)


def _encode_subframe(
    bw: _BitWriter, samples: list[int], bps: int,
    subframe: str = "auto", porder: int = 0,
) -> None:
    n = len(samples)
    bw.bits(0, 1)  # padding
    if subframe == "verbatim":
        bw.bits(1, 6)
        bw.bits(0, 1)
        for s in samples:
            bw.sbits(s, bps)
        return
    if subframe == "auto" and all(s == samples[0] for s in samples):
        bw.bits(0, 6)  # constant
        bw.bits(0, 1)  # no wasted bits
        bw.sbits(samples[0], bps)
        return
    # pick the fixed order (0-2) with the smallest residual magnitude sum
    best_order, best_sum = 0, sum(abs(s) for s in samples)
    prev = samples
    for order in (1, 2):
        if n <= order:
            break
        cur = [prev[i] - prev[i - 1] for i in range(1, len(prev))]
        s = sum(abs(v) for v in cur)
        if s < best_sum:
            best_order, best_sum = order, s
        prev = cur
    order = max(best_order, 1) if subframe == "lpc" else best_order
    if subframe == "lpc" and n <= order:
        order = 0
    res = [
        samples[i]
        - sum(c * samples[i - 1 - j] for j, c in enumerate(_FIXED_COEF[order]))
        for i in range(order, n)
    ] if order else list(samples)
    if subframe == "lpc" and order:
        # the fixed predictor expressed through the LPC code path, with
        # a nonzero shift (coef doubled): exercises the decoder's
        # coefficient/precision/shift machinery with real streams
        coef = [2 * c for c in _FIXED_COEF[order]]
        prec = max(max(abs(c) for c in coef).bit_length() + 1, 2)
        bw.bits(31 + order, 6)
        bw.bits(0, 1)
        for i in range(order):
            bw.sbits(samples[i], bps)
        bw.bits(prec - 1, 4)
        bw.sbits(1, 5)  # shift 1 halves the doubled coefficients
        for c in coef:
            bw.sbits(c, prec)
        _encode_residuals(bw, res, order, n, porder)
        return
    bw.bits(8 + order, 6)  # fixed subframe
    bw.bits(0, 1)  # no wasted bits
    for i in range(order):
        bw.sbits(samples[i], bps)
    _encode_residuals(bw, res, order, n, porder)


def encode_flac(
    samples, rate: int = 44100, channels: int | None = None,
    bps: int = 16, block_size: int = 4096, stereo: str = "independent",
    subframe: str = "auto", partition_order: int = 0,
) -> bytes:
    """Encode integer PCM as FLAC. ``samples``: 1-D interleaved (or
    2-D [n, channels]) int array at ``bps`` (8/16/24) bits. Lossless:
    decode_flac reproduces every sample exactly. ``stereo`` picks the
    decorrelation mode for 2-channel input ("independent",
    "left_side", "right_side", "mid_side"); ``subframe`` forces a
    coding path ("auto", "verbatim", "lpc"); ``partition_order`` sets
    the Rice partition count (2^k) — the non-default values exist to
    exercise every decoder path with real streams."""
    import numpy as np

    s = np.asarray(samples)
    if s.ndim == 1:
        ch = channels or 1
        if len(s) % ch:
            raise ValueError("interleaved length not divisible by channels")
        s = s.reshape(-1, ch)
    elif s.ndim == 2:
        ch = s.shape[1]
        if channels is not None and channels != ch:
            raise ValueError("channels mismatch")
    else:
        raise ValueError("expected 1-D interleaved or [n, channels] samples")
    if bps not in (8, 16, 24):
        raise ValueError(f"unsupported bits per sample: {bps}")
    if not (1 <= ch <= 8):
        raise ValueError(f"channel count out of range: {ch}")
    s = s.astype(np.int64)
    lim = 1 << (bps - 1)
    if s.min(initial=0) < -lim or s.max(initial=0) >= lim:
        raise ValueError(f"samples exceed {bps}-bit range")
    n_total = s.shape[0]
    if block_size not in _BLOCKSIZE_CODE and not (16 <= block_size <= 65536):
        raise ValueError(f"bad block size {block_size}")

    out = bytearray(FLAC_SIG)
    info = _BitWriter()
    info.bits(min(block_size, n_total) if n_total else block_size, 16)
    info.bits(block_size, 16)
    info.bits(0, 24)
    info.bits(0, 24)
    info.bits(rate, 20)
    info.bits(ch - 1, 3)
    info.bits(bps - 1, 5)
    info.bits(n_total, 36)
    info_bytes = bytes(info.out) + b"\x00" * 16  # MD5 unset (zeros)
    out += bytes([0x80]) + struct.pack(">I", len(info_bytes))[1:] + info_bytes

    frame_no = 0
    for start in range(0, max(n_total, 1), block_size):
        block = s[start : start + block_size]
        n = block.shape[0]
        if n == 0:
            break
        bw = _BitWriter()
        bw.bits(0x3FFE, 14)
        bw.bits(0, 1)
        bw.bits(0, 1)  # fixed blocksize strategy
        bs_code = _BLOCKSIZE_CODE.get(n)
        if bs_code is None:
            bs_code = 7 if n > 256 else 6
        bw.bits(bs_code, 4)
        sr_code = _SAMPLE_RATE_CODE.get(rate, 0)
        bw.bits(sr_code, 4)
        mode = stereo if ch == 2 else "independent"
        ch_code = {"independent": ch - 1, "left_side": 8,
                   "right_side": 9, "mid_side": 10}.get(mode)
        if ch_code is None:
            raise ValueError(f"unknown stereo mode {stereo!r}")
        bw.bits(ch_code, 4)
        bw.bits(_BPS_CODE[bps], 3)
        bw.bits(0, 1)
        for b in _utf8_number(frame_no):
            bw.bits(b, 8)
        if bs_code == 6:
            bw.bits(n - 1, 8)
        elif bs_code == 7:
            bw.bits(n - 1, 16)
        bw.align()
        hdr = bytes(bw.out)
        bw.bits(_crc8(hdr), 8)
        if mode == "independent":
            subs = [([int(v) for v in block[:, c]], bps) for c in range(ch)]
        else:
            left = [int(v) for v in block[:, 0]]
            right = [int(v) for v in block[:, 1]]
            side = [l_ - r for l_, r in zip(left, right)]
            if mode == "left_side":
                subs = [(left, bps), (side, bps + 1)]
            elif mode == "right_side":
                subs = [(side, bps + 1), (right, bps)]
            else:  # mid_side
                mid = [(l_ + r) >> 1 for l_, r in zip(left, right)]
                subs = [(mid, bps), (side, bps + 1)]
        for vals, sub_bps in subs:
            _encode_subframe(bw, vals, sub_bps, subframe, partition_order)
        bw.align()
        body = bytes(bw.out)
        bw.bits(_crc16(body), 16)
        bw.align()
        out += bytes(bw.out)
        frame_no += 1
    return bytes(out)
