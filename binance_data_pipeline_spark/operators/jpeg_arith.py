"""Arithmetic-coded JPEG (ITU T.81 SOF9 sequential + SOF10
progressive) — QM-coder entropy layer for operators/jpeg.py, closing
the last JPEG NotImplementedErrors in the dependency-free codec tier
(only the hierarchical processes and arithmetic lossless still route
to an injected decoder; Huffman lossless is jpeg_lossless.py).

What is standard here, and what is self-consistent-by-construction:

  * The QM probability state machine (the 113-entry Qe table with
    NMPS/NLPS/switch transitions, T.81 Table D.3), the conditional
    MPS/LPS interval exchange, and the renormalization discipline are
    implemented per the spec.
  * The statistical models — DC difference conditioning contexts
    (0/4/8/12/16 by previous-diff class with L/U thresholds), the
    per-k AC context triplets (EOB decision, zero/nonzero, low
    magnitude) at 3*(k-1), the magnitude-category ladders (DC X1 at
    bin 20; AC X2+ at bin 189 for k<=Kx else 217), the +14 mantissa
    offset, and the non-adaptive 0x5A1D "fixed" bin for AC signs —
    follow T.81 F.1.4 / F.2.4 exactly (the layout libjpeg's
    jcarith/jdarith also use; bin budgets: 64 DC, 256 AC).
  * The marker layout is standard: SOF9/SOF10, DAC conditioning
    segments (DC Cs=(U<<4)|L, AC Cs=Kx), SOS, DRI/RSTn with full coder
    + stats + prediction reset at restarts. Progressive scans use the
    Annex G.1.3 models: first scans are the sequential models over the
    spectral band at the point transform, DC refinement is one
    fixed-bin bit per block, AC refinement codes correction bits at
    context stp+2 / newly-nonzero decisions at stp+1 with the EOB
    decision only past the previous stage's end of band.
  * The byte-level termination and stuffing convention is implemented
    SELF-CONSISTENTLY and documented rather than claimed standard: the
    encoder resolves carries at the bit level before serialization,
    stuffs a zero bit after every 0xFF output byte, and flushes by
    emitting the in-interval value with >=15 trailing zero bits; the
    decoder mirrors (7-bit read after 0xFF, zero-bit feed past the end
    of a chunk). Streams this module writes decode bit-exactly (the
    tests pin arithmetic decode == Huffman decode of the same
    quantized coefficients); cross-implementation interchange is
    untested in this container (no libjpeg/PIL), so foreign SOF9
    streams decode best-effort and quarantine per the multimodal
    contract (operators/multimodal.py) on any mismatch that raises.

Reference scope note: the binance reference pipeline has no media
handling (698 LoC of pandas/Kafka/dbt); this module extends the
multimodal-column surface the build brief requires.
"""

from __future__ import annotations

import struct

__all__ = [
    "encode_scan_arith",
    "encode_scans_arith_progressive",
    "decode_jpeg_arith",
    "decode_jpeg_arith_progressive",
]

#: T.81 Table D.3: (Qe, NMPS, NLPS, switch). Index 113 is the
#: non-adaptive ~equiprobable bin used for AC coefficient signs.
_QE = [
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1),
    (0x5A1D, 113, 113, 0),  # 113: fixed ~0.5 bin (AC signs), never adapts
]

_DC_BINS = 64
_AC_BINS = 256


class _QMEncoder:
    """QM arithmetic encoder, bottom-interval-MPS convention.

    Interval: [C, C+A) at the current window scale; MPS normally takes
    the bottom (C unchanged, A-=Qe), LPS the top (C+=A-Qe, A=Qe), with
    the conditional exchange when A-Qe < Qe. Carries resolve into the
    already-emitted bit string (provably never past its front: the code
    value stays inside the initial interval), so serialization never
    rewrites committed bytes."""

    def __init__(self) -> None:
        self.a = 0x10000
        self.c = 0
        self.bits = bytearray()

    def _carry1(self) -> None:
        bits = self.bits
        i = len(bits) - 1
        while i >= 0 and bits[i]:
            bits[i] = 0
            i -= 1
        if i < 0:  # value would exceed the initial interval: impossible
            raise AssertionError("carry out of arithmetic code prefix")
        bits[i] = 1

    def _addc(self, x: int) -> None:
        self.c += x
        if self.c & 0x10000:
            self.c &= 0xFFFF
            self._carry1()

    def _renorm(self) -> None:
        while self.a < 0x8000:
            self.a <<= 1
            self.c <<= 1
            if self.c & 0x10000:
                self.c &= 0xFFFF
                self.bits.append(1)
            else:
                self.bits.append(0)

    def encode(self, stats: bytearray, ctx: int, bit: int) -> None:
        sv = stats[ctx]
        mps = sv & 1
        qe, nmps, nlps, sw = _QE[sv >> 1]
        self.a -= qe
        if bit == mps:
            if self.a >= 0x8000:
                return
            if self.a < qe:  # conditional exchange: MPS takes the top
                self._addc(self.a)
                self.a = qe
            stats[ctx] = (nmps << 1) | mps
        else:
            if self.a >= qe:  # no exchange: LPS takes the top
                self._addc(self.a)
                self.a = qe
            if sw:
                mps ^= 1
            stats[ctx] = (nlps << 1) | mps
        self._renorm()

    def flush_bits(self) -> None:
        """Append the final window: the value in [C, C+A) with >=15
        trailing zero bits, so the decoder's zero-bit feed past the end
        reconstructs it exactly."""
        x = (self.c + self.a - 1) & ~0x7FFF
        if x < self.c:
            x += 0x8000
        if x & 0x10000:
            # only reachable after >=1 renorm (c+a<=0x10000 until then),
            # so the carry always has emitted bits to land in
            self._carry1()
            x &= 0xFFFF
        for i in range(15, -1, -1):
            self.bits.append((x >> i) & 1)

    def tobytes(self) -> bytes:
        """Serialize with bit stuffing: after any 0xFF output byte the
        next byte's MSB is a stuffed 0 (so nothing in the entropy data
        ever parses as a marker); a trailing 0xFF gets a 0x00 pad byte
        so chunk boundaries stay unambiguous."""
        out = bytearray()
        cur, n = 0, 0
        stuffed = False
        for b in self.bits:
            if n == 0 and stuffed:
                cur, n = 0, 1  # stuffed zero bit in the MSB
                stuffed = False
            cur = (cur << 1) | b
            n += 1
            if n == 8:
                out.append(cur)
                stuffed = cur == 0xFF
                cur, n = 0, 0
        if n:
            out.append(cur << (8 - n))
        if out and out[-1] == 0xFF:
            out.append(0x00)
        return bytes(out)


class _QMDecoder:
    """Mirror of _QMEncoder over one entropy chunk: v tracks the code
    value minus the subtracted interval bottoms; byte feed skips the
    stuffed MSB after 0xFF and supplies zero bits past the end."""

    def __init__(self, data: bytes) -> None:
        self._gen = self._bitgen(data)
        v = 0
        for _ in range(16):
            v = (v << 1) | next(self._gen)
        self.v = v
        self.a = 0x10000

    @staticmethod
    def _bitgen(data: bytes):
        prev_ff = False
        for by in data:
            for i in range((6 if prev_ff else 7), -1, -1):
                yield (by >> i) & 1
            prev_ff = by == 0xFF
        while True:
            yield 0

    def decode(self, stats: bytearray, ctx: int) -> int:
        sv = stats[ctx]
        mps = sv & 1
        qe, nmps, nlps, sw = _QE[sv >> 1]
        self.a -= qe
        if self.v < self.a:  # bottom interval
            if self.a >= 0x8000:
                return mps
            if self.a < qe:  # exchange: bottom was the LPS
                bit = mps ^ 1
                if sw:
                    mps ^= 1
                stats[ctx] = (nlps << 1) | mps
            else:
                bit = mps
                stats[ctx] = (nmps << 1) | mps
        else:  # top interval (size qe at offset a-qe)
            self.v -= self.a
            if self.a < qe:  # exchange: top was the MPS
                bit = mps
                stats[ctx] = (nmps << 1) | mps
            else:
                bit = mps ^ 1
                if sw:
                    mps ^= 1
                stats[ctx] = (nlps << 1) | mps
            self.a = qe
        g = self._gen
        while self.a < 0x8000:
            self.a <<= 1
            self.v = (self.v << 1) | next(g)
        return bit


# ---------------------------------------------------------------------------
# Statistical models (T.81 F.1.4 encode / F.2.4 decode)
# ---------------------------------------------------------------------------


def _enc_dc(enc, st, dc_ctx, ci, diff, low, up) -> None:
    c0 = dc_ctx[ci]
    if diff == 0:
        enc.encode(st, c0, 0)
        dc_ctx[ci] = 0
        return
    enc.encode(st, c0, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(st, c0 + 1, sign)
    v = (-diff if sign else diff) - 1
    stp = c0 + 2 + sign
    m = 0
    if v:
        enc.encode(st, stp, 1)
        m = 1
        v2 = v
        stp = 20
        while v2 >> 1:
            v2 >>= 1
            enc.encode(st, stp, 1)
            m <<= 1
            stp += 1
        enc.encode(st, stp, 0)
    else:
        enc.encode(st, stp, 0)
    if m < (1 << low) >> 1:
        dc_ctx[ci] = 0
    elif m > (1 << up) >> 1:
        dc_ctx[ci] = 12 + sign * 4
    else:
        dc_ctx[ci] = 4 + sign * 4
    stp += 14
    while m >> 1:
        m >>= 1
        enc.encode(st, stp, 1 if v & m else 0)


def _dec_dc(dec, st, dc_ctx, ci, low, up) -> int:
    c0 = dc_ctx[ci]
    if not dec.decode(st, c0):
        dc_ctx[ci] = 0
        return 0
    sign = dec.decode(st, c0 + 1)
    stp = c0 + 2 + sign
    m = dec.decode(st, stp)
    if m:
        stp = 20
        while dec.decode(st, stp):
            m <<= 1
            if m > 0x8000:
                raise ValueError("corrupt arithmetic JPEG: DC magnitude")
            stp += 1
    if m < (1 << low) >> 1:
        dc_ctx[ci] = 0
    elif m > (1 << up) >> 1:
        dc_ctx[ci] = 12 + sign * 4
    else:
        dc_ctx[ci] = 4 + sign * 4
    v = m
    stp += 14
    while m >> 1:
        m >>= 1
        if dec.decode(st, stp):
            v |= m
    v += 1
    return -v if sign else v


def _enc_ac(enc, st, fixed, zz, kx, ss=1, se=63, al=0) -> None:
    """AC band encode (T.81 F.1.4.3). Defaults are the sequential full
    band; progressive first scans pass the spectral band (ss..se) and
    point transform (values coded at magnitude >> al)."""
    ke = 0
    for i in range(se, ss - 1, -1):
        if abs(int(zz[i])) >> al:
            ke = i
            break
    k = ss
    while k <= ke:
        stp = 3 * (k - 1)
        enc.encode(st, stp, 0)  # not EOB yet
        while (abs(int(zz[k])) >> al) == 0:
            enc.encode(st, stp + 1, 0)
            k += 1
            stp += 3
        enc.encode(st, stp + 1, 1)
        val = int(zz[k])
        sign = 1 if val < 0 else 0
        enc.encode(fixed, 0, sign)
        v = (abs(val) >> al) - 1
        stp += 2
        m = 0
        if v:
            enc.encode(st, stp, 1)
            m = 1
            v2 = v
            if v2 >> 1:
                v2 >>= 1
                enc.encode(st, stp, 1)
                m <<= 1
                stp = 189 if k <= kx else 217
                while v2 >> 1:
                    v2 >>= 1
                    enc.encode(st, stp, 1)
                    m <<= 1
                    stp += 1
                enc.encode(st, stp, 0)
            else:
                enc.encode(st, stp, 0)
        else:
            enc.encode(st, stp, 0)
        stp += 14
        while m >> 1:
            m >>= 1
            enc.encode(st, stp, 1 if v & m else 0)
        k += 1
    if ke < se:
        enc.encode(st, 3 * (k - 1), 1)  # EOB


def _dec_ac(dec, st, fixed, zz, kx, ss=1, se=63, al=0) -> None:
    k = ss
    while k <= se:
        stp = 3 * (k - 1)
        if dec.decode(st, stp):
            return  # EOB
        while not dec.decode(st, stp + 1):
            k += 1
            stp += 3
            if k > se:
                raise ValueError("corrupt arithmetic JPEG: AC run overflow")
        sign = dec.decode(fixed, 0)
        stp += 2
        m = dec.decode(st, stp)
        if m:
            if dec.decode(st, stp):
                m <<= 1
                stp = 189 if k <= kx else 217
                while dec.decode(st, stp):
                    m <<= 1
                    if m > 0x8000:
                        raise ValueError(
                            "corrupt arithmetic JPEG: AC magnitude"
                        )
                    stp += 1
        v = m
        stp += 14
        while m >> 1:
            m >>= 1
            if dec.decode(st, stp):
                v |= m
        v += 1
        zz[k] = (-(v) if sign else v) << al
        k += 1


def _enc_ac_refine(enc, st, fixed, zz, ss, se, ah, al) -> None:
    """Successive-approximation AC refinement (T.81 G.1.3.3, the
    jcarith shape): coefficients with history (|v| >> ah nonzero) get a
    correction bit at context stp+2; newly nonzero ones a stp+1 decision
    plus a fixed-bin sign; the EOB decision is coded only past EOBx (the
    previous stage's end of band, which the decoder derives from its own
    accumulated coefficients)."""
    ke = 0
    for i in range(se, ss - 1, -1):
        if abs(int(zz[i])) >> al:
            ke = i
            break
    kex = 0
    for i in range(se, ss - 1, -1):
        if abs(int(zz[i])) >> ah:
            kex = i
            break
    k = ss
    while k <= ke:
        stp = 3 * (k - 1)
        if k > kex:
            enc.encode(st, stp, 0)  # not EOB yet
        while True:
            a = abs(int(zz[k]))
            if a >> al:
                if a >> ah:  # history nonzero: one correction bit
                    enc.encode(st, stp + 2, (a >> al) & 1)
                else:  # newly nonzero: decision + sign (magnitude is 1)
                    enc.encode(st, stp + 1, 1)
                    enc.encode(fixed, 0, 1 if int(zz[k]) < 0 else 0)
                break
            enc.encode(st, stp + 1, 0)
            k += 1
            stp += 3
        k += 1
    if ke < se:
        enc.encode(st, 3 * (k - 1), 1)  # EOB


def _dec_ac_refine(dec, st, fixed, zz, ss, se, al) -> None:
    p1 = 1 << al
    kex = 0
    for i in range(se, ss - 1, -1):
        if zz[i]:
            kex = i
            break
    k = ss
    while k <= se:
        stp = 3 * (k - 1)
        if k > kex and dec.decode(st, stp):
            return  # EOB
        while True:
            v = int(zz[k])
            if v:  # history nonzero: correction bit
                if dec.decode(st, stp + 2):
                    zz[k] = v + (p1 if v > 0 else -p1)
                break
            if dec.decode(st, stp + 1):  # newly nonzero
                zz[k] = -p1 if dec.decode(fixed, 0) else p1
                break
            k += 1
            stp += 3
            if k > se:
                raise ValueError("corrupt arithmetic JPEG: AC refine overflow")
        k += 1


# ---------------------------------------------------------------------------
# Scan-level encode (called by jpeg.encode_jpeg(arithmetic=True))
# ---------------------------------------------------------------------------


def encode_scan_arith(
    comp_zz, samp, mcx, mcy, restart_interval: int | None,
    low: int = 0, up: int = 1, kx: int = 5,
) -> bytes:
    """Arithmetic-encode an interleaved sequential scan over the same
    quantized-zigzag component arrays the Huffman path uses (so the two
    entropy codings of one image decode bit-identically — the test
    oracle). Luma uses stats tables 0, chroma 1, matching the SOS
    Td/Ta ids jpeg.encode_jpeg writes. Restarts flush the coder,
    byte-align with RSTn, and reset stats + DC state per T.81."""
    n_comp = len(comp_zz)
    rst = int(restart_interval) if restart_interval else 0
    out = bytearray()

    def fresh():
        return (
            _QMEncoder(),
            [bytearray([0] * _DC_BINS) for _ in range(2)],
            [bytearray([0] * _AC_BINS) for _ in range(2)],
            bytearray([113 << 1]),
            [0] * n_comp,
            [0] * n_comp,
        )

    enc, dc_st, ac_st, fixed, dc_ctx, pred = fresh()
    n_emitted = 0
    for mcu in range(mcx * mcy):
        if rst and mcu and mcu % rst == 0:
            enc.flush_bits()
            out += enc.tobytes()
            out += struct.pack(">H", 0xFFD0 + ((mcu // rst - 1) % 8))
            enc, dc_st, ac_st, fixed, dc_ctx, pred = fresh()
            n_emitted += 1
        my, mx = divmod(mcu, mcx)
        for ci in range(n_comp):
            hi, vi = samp[ci]
            t = 0 if ci == 0 else 1
            for v in range(vi):
                for hh in range(hi):
                    zz = comp_zz[ci][my * vi + v, mx * hi + hh]
                    dc = int(zz[0])
                    _enc_dc(enc, dc_st[t], dc_ctx, ci, dc - pred[ci], low, up)
                    pred[ci] = dc
                    _enc_ac(enc, ac_st[t], fixed, zz, kx)
    enc.flush_bits()
    out += enc.tobytes()
    return bytes(out)


def encode_scans_arith_progressive(
    comp_zz, samp, w, h, mcx, mcy, restart_interval: int | None = None,
    dc_noninterleaved: bool = False, low: int = 0, up: int = 1, kx: int = 5,
) -> list[tuple[list[int], int, int, int, int, bytes]]:
    """Arithmetic progressive (SOF10) scan script — mirrors the Huffman
    progressive encoder's 8-scan successive-approximation plan over the
    SAME quantized coefficients (jpeg.py encode_jpeg progressive=True),
    so all four entropy/scan-shape combinations of one image decode
    bit-identically: DC first at Al=1 (interleaved, or per-component
    when ``dc_noninterleaved``), AC first per component (band 1-63,
    Al=1), DC refinement, AC refinement per component. Returns
    (component_ids, Ss, Se, Ah, Al, entropy_bytes) per scan; restarts
    chunk every scan with full coder/stats/prediction reset."""
    n_comp = len(comp_zz)
    rst = int(restart_interval) if restart_interval else 0
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    def grid(ci: int) -> tuple[int, int]:
        hi, vi = samp[ci]
        cw = -(-w * hi // hmax)
        ch = -(-h * vi // vmax)
        return -(-ch // 8), -(-cw // 8)  # (cbh, cbw)

    scans: list[tuple[list[int], int, int, int, int, bytes]] = []

    def run_scan(comp_ids, ss, se, ah, al, n_units, code_unit) -> None:
        """Drive one scan: fresh coder + stats, restart chunking, then
        code_unit(state, unit) for each MCU/block index."""

        def fresh():
            return {
                "enc": _QMEncoder(),
                "dc": [bytearray(_DC_BINS) for _ in range(2)],
                "ac": [bytearray(_AC_BINS) for _ in range(2)],
                "fixed": bytearray([113 << 1]),
                "ctx": [0] * n_comp,
                "pred": [0] * n_comp,
            }

        st = fresh()
        out = bytearray()
        for unit in range(n_units):
            if rst and unit and unit % rst == 0:
                st["enc"].flush_bits()
                out += st["enc"].tobytes()
                out += struct.pack(">H", 0xFFD0 + ((unit // rst - 1) % 8))
                st = fresh()
            code_unit(st, unit)
        st["enc"].flush_bits()
        out += st["enc"].tobytes()
        scans.append((comp_ids, ss, se, ah, al, bytes(out)))

    # scan 1: DC first at Al=1
    def dc_first_blocks(st, ci, blocks):
        t = 0 if ci == 0 else 1
        for zz in blocks:
            dc = int(zz[0]) >> 1
            _enc_dc(st["enc"], st["dc"][t], st["ctx"], ci, dc - st["pred"][ci],
                    low, up)
            st["pred"][ci] = dc

    def mcu_blocks(ci, unit):
        hi, vi = samp[ci]
        my, mx = divmod(unit, mcx)
        for v in range(vi):
            for hh in range(hi):
                yield comp_zz[ci][my * vi + v, mx * hi + hh]

    if dc_noninterleaved:
        for ci in range(n_comp):
            cbh, cbw = grid(ci)

            def unit_fn(st, unit, ci=ci, cbw=cbw):
                by, bx = divmod(unit, cbw)
                dc_first_blocks(st, ci, [comp_zz[ci][by, bx]])

            run_scan([ci + 1], 0, 0, 0, 1, cbh * cbw, unit_fn)
    else:
        def unit_fn(st, unit):
            for ci in range(n_comp):
                dc_first_blocks(st, ci, mcu_blocks(ci, unit))

        run_scan(list(range(1, n_comp + 1)), 0, 0, 0, 1, mcx * mcy, unit_fn)

    # scans 2-4: AC first per component, band 1-63, Al=1
    for ci in range(n_comp):
        cbh, cbw = grid(ci)
        t = 0 if ci == 0 else 1

        def unit_fn(st, unit, ci=ci, cbw=cbw, t=t):
            by, bx = divmod(unit, cbw)
            _enc_ac(st["enc"], st["ac"][t], st["fixed"], comp_zz[ci][by, bx],
                    kx, 1, 63, 1)

        run_scan([ci + 1], 1, 63, 0, 1, cbh * cbw, unit_fn)

    # scan 5: DC refinement (Ah=1, Al=0) — one fixed-bin bit per block
    def dc_refine_blocks(st, ci, blocks):
        for zz in blocks:
            st["enc"].encode(st["fixed"], 0, int(zz[0]) & 1)

    if dc_noninterleaved:
        for ci in range(n_comp):
            cbh, cbw = grid(ci)

            def unit_fn(st, unit, ci=ci, cbw=cbw):
                by, bx = divmod(unit, cbw)
                dc_refine_blocks(st, ci, [comp_zz[ci][by, bx]])

            run_scan([ci + 1], 0, 0, 1, 0, cbh * cbw, unit_fn)
    else:
        def unit_fn(st, unit):
            for ci in range(n_comp):
                dc_refine_blocks(st, ci, mcu_blocks(ci, unit))

        run_scan(list(range(1, n_comp + 1)), 0, 0, 1, 0, mcx * mcy, unit_fn)

    # scans 6-8: AC refinement per component (Ah=1, Al=0)
    for ci in range(n_comp):
        cbh, cbw = grid(ci)
        t = 0 if ci == 0 else 1

        def unit_fn(st, unit, ci=ci, cbw=cbw, t=t):
            by, bx = divmod(unit, cbw)
            _enc_ac_refine(st["enc"], st["ac"][t], st["fixed"],
                           comp_zz[ci][by, bx], 1, 63, 1, 0)

        run_scan([ci + 1], 1, 63, 1, 0, cbh * cbw, unit_fn)

    return scans


# ---------------------------------------------------------------------------
# Full-stream decode (routed from jpeg.decode_jpeg on SOF9)
# ---------------------------------------------------------------------------


def _split_entropy(payload: bytes, start: int) -> tuple[list[bytes], int]:
    """Split entropy data at restart markers; 0xFF followed by <=0x8F is
    arithmetic DATA (bit-stuffed byte), NOT Huffman 0xFF00 destuffing.
    Returns the chunks and the offset of the terminating marker (EOI or
    the next segment's 0xFF)."""
    chunks: list[bytes] = []
    cur = bytearray()
    i = start
    while i < len(payload):
        bsrc = payload[i]
        if bsrc != 0xFF:
            cur.append(bsrc)
            i += 1
            continue
        nxt = payload[i + 1] if i + 1 < len(payload) else 0xD9
        if nxt <= 0x8F:  # stuffed data byte: keep both
            cur.append(0xFF)
            cur.append(nxt)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:
            chunks.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # EOI or next marker
            break
    chunks.append(bytes(cur))
    return chunks, i


def decode_jpeg_arith(payload: bytes):
    """Decode a sequential arithmetic-coded JPEG (SOF9). Marker walk,
    dimension gates and reconstruction mirror jpeg.decode_jpeg's
    baseline path; only the entropy layer differs (QM coder + DAC
    conditioning instead of DHT Huffman tables)."""
    import numpy as np

    from .jpeg import JPEG_SIG, _parse_dqt, _reconstruct

    if not payload.startswith(JPEG_SIG):
        raise ValueError("not a JPEG payload")

    qtabs: dict[int, np.ndarray] = {}
    cond_dc: dict[int, tuple[int, int]] = {}  # table id -> (L, U)
    cond_ac: dict[int, int] = {}  # table id -> Kx
    comps: list[dict] = []
    scan: list[tuple[int, int, int]] = []
    h = w = 0
    restart_interval = 0
    pos = 2
    data_start = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        (ln,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:
            _parse_dqt(body, qtabs)
        elif marker == 0xCC:  # DAC: arithmetic conditioning
            i = 0
            while i + 1 < len(body):
                tc, tb = body[i] >> 4, body[i] & 0xF
                cs = body[i + 1]
                if tc == 0:
                    low, up = cs & 0xF, cs >> 4
                    if not (0 <= low <= up <= 15):
                        raise ValueError("corrupt DAC: DC conditioning")
                    cond_dc[tb] = (low, up)
                else:
                    if not (1 <= cs <= 63):
                        raise ValueError("corrupt DAC: AC Kx")
                    cond_ac[tb] = cs
                i += 2
        elif marker == 0xC9:  # SOF9: extended sequential, arithmetic
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG precision")
            if not (0 < w and 0 < h and w * h <= 1 << 28):
                raise ValueError(f"implausible JPEG dimensions {w}x{h}")
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG")
            for i in range(nc):
                cid, sampb, tq = body[6 + 3 * i : 9 + 3 * i]
                hi, vi = sampb >> 4, sampb & 0xF
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    raise NotImplementedError(f"sampling factors {hi}x{vi}")
                comps.append({"id": cid, "h": hi, "v": vi, "tq": tq})
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            ns = body[0]
            for i in range(ns):
                cid, tabs = body[1 + 2 * i], body[2 + 2 * i]
                scan.append((cid, tabs >> 4, tabs & 0xF))
            data_start = pos
            break
        # APPn/COM/others: skipped
    if data_start is None or not comps:
        raise ValueError("corrupt JPEG: missing SOF9/SOS")

    chunks, _ = _split_entropy(payload, data_start)

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcx = -(-w // (8 * hmax))
    mcy = -(-h // (8 * vmax))
    n_mcus = mcx * mcy
    by_id = {c["id"]: c for c in comps}
    order = []
    for cid, tdc, tac in scan:
        c = by_id[cid]
        c["low"], c["up"] = cond_dc.get(tdc, (0, 1))
        c["kx"] = cond_ac.get(tac, 5)
        c["tdc"], c["tac"] = tdc, tac
        c["bw"] = mcx * c["h"]
        c["coefs"] = np.zeros((mcy * c["v"] * c["bw"], 64), np.int32)
        order.append(c)
    n_comp = len(order)

    mcu = 0
    for chunk in chunks:
        if mcu >= n_mcus:
            break
        dec = _QMDecoder(chunk)
        dc_st = {t: bytearray([0] * _DC_BINS) for t in {c["tdc"] for c in order}}
        ac_st = {t: bytearray([0] * _AC_BINS) for t in {c["tac"] for c in order}}
        fixed = bytearray([113 << 1])
        dc_ctx = [0] * n_comp
        pred = [0] * n_comp
        limit = min(n_mcus, mcu + restart_interval) if restart_interval else n_mcus
        while mcu < limit:
            my, mx = divmod(mcu, mcx)
            for ci, c in enumerate(order):
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        zz = np.zeros(64, np.int32)
                        diff = _dec_dc(
                            dec, dc_st[c["tdc"]], dc_ctx, ci, c["low"], c["up"]
                        )
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        _dec_ac(dec, ac_st[c["tac"]], fixed, zz, c["kx"])
                        bi = (my * c["v"] + v) * c["bw"] + mx * c["h"] + hh
                        c["coefs"][bi] = zz
            mcu += 1
    if mcu < n_mcus:
        raise ValueError(f"corrupt JPEG: decoded {mcu}/{n_mcus} MCUs")

    return _reconstruct(order, qtabs, mcy, hmax, vmax, w, h)


# ---------------------------------------------------------------------------
# Progressive arithmetic decode (routed from jpeg.decode_jpeg on SOF10)
# ---------------------------------------------------------------------------


def decode_jpeg_arith_progressive(payload: bytes):
    """Decode a progressive arithmetic-coded JPEG (SOF10, T.81 Annex
    G.1.3). Scan script handling mirrors jpeg._decode_progressive
    (accumulating per-component zigzag coefficient arrays through DC/AC
    first + refinement scans, component-grid block order for Ns=1
    scans); the entropy layer is the QM coder with the Annex G
    statistical models instead of Huffman run/size symbols — notably
    there are no cross-block EOB runs, the EOB decision is adaptively
    coded per block."""
    import numpy as np

    from .jpeg import JPEG_SIG, _parse_dqt, _reconstruct

    if not payload.startswith(JPEG_SIG):
        raise ValueError("not a JPEG payload")

    qtabs: dict[int, np.ndarray] = {}
    cond_dc: dict[int, tuple[int, int]] = {}
    cond_ac: dict[int, int] = {}
    comps: list[dict] = []
    scans: list[dict] = []
    h = w = 0
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        (ln,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:
            _parse_dqt(body, qtabs)
        elif marker == 0xCC:  # DAC
            i = 0
            while i + 1 < len(body):
                tc, tb = body[i] >> 4, body[i] & 0xF
                cs = body[i + 1]
                if tc == 0:
                    low, up = cs & 0xF, cs >> 4
                    if not (0 <= low <= up <= 15):
                        raise ValueError("corrupt DAC: DC conditioning")
                    cond_dc[tb] = (low, up)
                else:
                    if not (1 <= cs <= 63):
                        raise ValueError("corrupt DAC: AC Kx")
                    cond_ac[tb] = cs
                i += 2
        elif marker == 0xCA:  # SOF10: progressive, arithmetic
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG precision")
            if not (0 < w and 0 < h and w * h <= 1 << 28):
                raise ValueError(f"implausible JPEG dimensions {w}x{h}")
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG")
            for i in range(nc):
                cid, sampb, tq = body[6 + 3 * i : 9 + 3 * i]
                hi, vi = sampb >> 4, sampb & 0xF
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    raise NotImplementedError(f"sampling factors {hi}x{vi}")
                comps.append({"id": cid, "h": hi, "v": vi, "tq": tq})
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            ns = body[0]
            scomps = []
            for i in range(ns):
                cid, tabs = body[1 + 2 * i], body[2 + 2 * i]
                scomps.append((cid, tabs >> 4, tabs & 0xF))
            ss, se, a = body[1 + 2 * ns : 4 + 2 * ns]
            chunks, pos = _split_entropy(payload, pos)
            scans.append({
                "comps": scomps, "ss": ss, "se": se,
                "ah": a >> 4, "al": a & 0xF,
                "chunks": chunks, "ri": restart_interval,
            })
        # APPn/COM: skipped
    if not comps or not scans:
        raise ValueError("corrupt JPEG: missing SOF10/SOS")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcx = -(-w // (8 * hmax))
    mcy = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    for c in comps:
        c["bw"] = mcx * c["h"]
        c["coefs"] = np.zeros((mcy * c["v"] * c["bw"], 64), np.int32)
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        c["cbw"] = -(-cw // 8)
        c["cbh"] = -(-ch // 8)

    for sc in scans:
        _arith_progressive_scan(sc, by_id, mcx, mcy, cond_dc, cond_ac)

    return _reconstruct(comps, qtabs, mcy, hmax, vmax, w, h)


def _arith_progressive_scan(sc, by_id, mcx, mcy, cond_dc, cond_ac) -> None:
    """Apply one arithmetic scan's entropy data to the coefficient
    arrays (the four scan kinds of jpeg._progressive_scan, QM models)."""
    ss, se, ah, al = sc["ss"], sc["se"], sc["ah"], sc["al"]
    scomps = [(by_id[cid], tdc, tac) for cid, tdc, tac in sc["comps"]]
    if ss == 0 and se != 0:
        raise ValueError(
            "corrupt progressive JPEG: DC scan (Ss=0) must have Se=0"
        )
    if ss > 0 and len(scomps) != 1:
        raise ValueError(
            "corrupt progressive JPEG: AC scans must be single-component"
        )

    interleaved = len(scomps) > 1
    if interleaved:
        units = mcx * mcy
    else:
        c0 = scomps[0][0]
        units = c0["cbw"] * c0["cbh"]

    def block_indexes(unit: int):
        if interleaved:
            my, mx = divmod(unit, mcx)
            for idx, (c, tdc, tac) in enumerate(scomps):
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        yield idx, c, tdc, tac, (
                            (my * c["v"] + v) * c["bw"] + mx * c["h"] + hh
                        )
        else:
            c, tdc, tac = scomps[0]
            by, bx = divmod(unit, c["cbw"])
            yield 0, c, tdc, tac, by * c["bw"] + bx

    ri = sc["ri"]
    unit = 0
    for chunk in sc["chunks"]:
        if unit >= units:
            break
        dec = _QMDecoder(chunk)
        dc_st = {t: bytearray(_DC_BINS) for _, t, _ in scomps}
        ac_st = {t: bytearray(_AC_BINS) for _, _, t in scomps}
        fixed = bytearray([113 << 1])
        dc_ctx = [0] * len(scomps)
        pred = [0] * len(scomps)
        limit = min(units, unit + ri) if ri else units
        while unit < limit:
            for idx, c, tdc, tac, bi in block_indexes(unit):
                zz = c["coefs"][bi]
                if ss == 0 and ah == 0:  # DC first
                    low, up = cond_dc.get(tdc, (0, 1))
                    diff = _dec_dc(dec, dc_st[tdc], dc_ctx, idx, low, up)
                    pred[idx] += diff
                    zz[0] = pred[idx] << al
                elif ss == 0:  # DC refinement: one fixed-bin bit
                    if dec.decode(fixed, 0):
                        zz[0] |= 1 << al
                elif ah == 0:  # AC first (band, point transform)
                    _dec_ac(dec, ac_st[tac], fixed, zz,
                            cond_ac.get(tac, 5), ss, se, al)
                else:  # AC refinement
                    _dec_ac_refine(dec, ac_st[tac], fixed, zz, ss, se, al)
            unit += 1
    if unit < units:
        raise ValueError(f"corrupt JPEG: decoded {unit}/{units} scan units")
