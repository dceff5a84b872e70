"""Dependency-free JPEG codec (ITU-T T.81, JFIF container) — closes
the compressed-image stub family in operators/multimodal.py: with this
module, PPM, PNG, WAV, baseline JPEG and (since r12) PROGRESSIVE and
ARITHMETIC-CODED JPEG all decode/encode with numpy + stdlib only; PIL
remains an optional upgrade for WebP only.

Scope (the overwhelmingly common interchange case):
  decode: baseline sequential (SOF0), progressive (SOF2 — full
          spectral selection + successive approximation + EOB runs,
          r12) AND both arithmetic processes (SOF9 sequential + SOF10
          progressive — QM coder, r12; see operators/jpeg_arith.py),
          8-bit, 1 or 3 components, sampling factors 1-2 (4:4:4 /
          4:2:2 / 4:2:0), restart markers honored; plus LOSSLESS (SOF3,
          2-16 bit — operators/jpeg_lossless.py). Hierarchical and
          arithmetic-lossless raise NotImplementedError → the
          multimodal default_decoder falls through to PIL when
          importable, same contract the WebP path uses too.
  encode: baseline sequential 4:4:4 with the Annex K quantization +
          Huffman tables (quality-scaled, libjpeg formula), or
          progressive (an 8-scan SA script exercising every decode
          path; quantized coefficients identical to baseline, so both
          forms decode bit-identically), optionally with restart
          markers in every scan (per-scan RST chunking: DC prediction
          and EOB runs never cross a restart) — tables are embedded in
          the stream, so any standards-compliant decoder (including
          this module's) reads the output.

Throughput posture: the DCT/IDCT and color transforms are vectorized
numpy over all 8×8 blocks at once; only the Huffman bit stream walks a
per-symbol Python loop — the same thumbnail posture as decode_png's
unfilter loop, and both run inside the Arrow-batched mapInPandas
plumbing (operators/multimodal.py) where a batch amortizes the Python
overhead.

Reference scope note: the binance reference pipeline has no media
handling at all (698 LoC of pandas/Kafka/dbt); this module is part of
the multimodal-column extension surface the build brief requires.
"""

from __future__ import annotations

import struct

__all__ = ["encode_jpeg", "decode_jpeg", "JPEG_SIG"]

JPEG_SIG = b"\xff\xd8"

#: zig-zag scan order: index i of the stream maps to flat position _ZZ[i]
_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

#: Annex K.1/K.2 quantization tables (natural order)
_LUM_Q = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_CHR_Q = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

#: Annex K.3 Huffman table specs: (bits[16], values)
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix():
    """Orthonormal 8-point DCT-II matrix C: forward F = C X Cᵀ, inverse
    X = Cᵀ F C."""
    import numpy as np

    k = np.arange(8)[:, None].astype(np.float64)
    n = np.arange(8)[None, :].astype(np.float64)
    c = np.cos((2 * n + 1) * k * np.pi / 16) * 0.5
    c[0] /= np.sqrt(2.0)
    return c


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code length, code), canonical assignment (T.81 C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (ln, code)
            code += 1
            k += 1
        code <<= 1
    return out


def _scaled_q(base: list[int], quality: int):
    import numpy as np

    q = max(1, min(100, int(quality)))
    s = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((np.asarray(base, np.int64) * s + 50) // 100, 1, 255)


class _BitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, n_bits: int) -> None:
        for i in range(n_bits - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.out.append(self._acc)
                if self._acc == 0xFF:
                    self.out.append(0x00)
                self._acc, self._n = 0, 0

    def flush(self) -> None:
        while self._n:
            self.write(1, 1)  # pad with 1-bits per spec


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length() if v < 0 else 0


def encode_jpeg(
    pixels,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int | None = None,
    progressive: bool = False,
    dc_noninterleaved: bool = False,
    arithmetic: bool = False,
) -> bytes:
    """Encode an HxWx3 uint8 RGB array as baseline JFIF (Annex K tables
    quality-scaled). Any compliant decoder reads the output; the lossy
    roundtrip error at quality ≥ 85 is a few intensity levels on natural
    gradients.

    ``subsample=True`` emits 4:2:0 (2×2 average-pooled chroma, the
    camera/web default — ~2× smaller, chroma detail halved);
    ``restart_interval=N`` emits DRI + RSTn markers every N MCUs (the
    error-resilience feature streaming producers set). Both exercise the
    decoder paths real-world JPEGs use.

    ``progressive=True`` (r12) emits SOF2 with an 8-scan script that
    exercises every progressive decode path — DC first at Al=1
    (interleaved), per-component AC first 1..63 at Al=1 (EOB + ZRL),
    DC refinement, per-component AC refinement (newly-nonzero sign
    bits, correction bits, EOB-carried corrections). The QUANTIZED
    COEFFICIENTS are identical to the baseline encoding, so decode
    output is bit-identical to the baseline file's — the differential
    oracle the tests pin. ``dc_noninterleaved=True`` swaps the
    interleaved DC scans for per-component Ns=1 scans (component-grid
    block order, spec A.2.2) so the decoder's non-interleaved DC path is
    also pinned by real bytes. Combines with ``restart_interval`` (r12):
    every scan chunks at RST boundaries, resetting DC prediction and
    flushing EOB runs — the decoder's per-scan restart path is thereby
    exercised by real bytes.

    ``arithmetic=True`` (r12) swaps the Huffman entropy layer for the
    T.81 QM arithmetic coder (SOF9 + DAC conditioning segments instead
    of SOF0 + DHT; see operators/jpeg_arith.py, including its honest
    interchange caveat). The quantized coefficients are identical to
    the baseline encoding, so both forms decode bit-identically — the
    differential oracle the tests pin. Combines with every other
    option: with ``progressive`` it emits SOF10 (the same 8-scan SA
    script, QM-coded per Annex G.1.3), with ``restart_interval`` every
    scan chunks at RSTn with full coder/stats reset."""
    import numpy as np

    px = np.asarray(pixels, np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_jpeg expects an HxWx3 RGB array")
    h, w = px.shape[:2]
    if not (0 < h < 65536 and 0 < w < 65536):
        raise ValueError(f"dimensions out of JPEG range: {w}x{h}")

    r = px[:, :, 0].astype(np.float64)
    g = px[:, :, 1].astype(np.float64)
    b = px[:, :, 2].astype(np.float64)
    planes = [
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
    ]

    qtabs = [_scaled_q(_LUM_Q, quality), _scaled_q(_CHR_Q, quality)]
    dc_codes = [_canonical_codes(*_DC_LUM), _canonical_codes(*_DC_CHR)]
    ac_codes = [_canonical_codes(*_AC_LUM), _canonical_codes(*_AC_CHR)]
    cmat = _dct_matrix()

    samp = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1), (1, 1), (1, 1)]
    hmax, vmax = max(s[0] for s in samp), max(s[1] for s in samp)
    mcw, mch = 8 * hmax, 8 * vmax
    mcx, mcy = -(-w // mcw), -(-h // mch)

    # quantized zigzag coefficients per component, vectorized over blocks;
    # chroma planes average-pool down to their sampling resolution
    comp_zz = []
    for ci, plane in enumerate(planes):
        hi, vi = samp[ci]
        pad = np.pad(
            plane - 128.0, ((0, mcy * mch - h), (0, mcx * mcw - w)), mode="edge"
        )
        fy, fx = vmax // vi, hmax // hi
        if fy > 1 or fx > 1:
            pad = pad.reshape(
                pad.shape[0] // fy, fy, pad.shape[1] // fx, fx
            ).mean(axis=(1, 3))
        rows, cols = mcy * vi, mcx * hi
        blocks = pad.reshape(rows, 8, cols, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        coef = np.einsum("ij,njk,lk->nil", cmat, blocks, cmat)
        qt = qtabs[0 if ci == 0 else 1].reshape(8, 8).astype(np.float64)
        quant = np.round(coef / qt).astype(np.int32).reshape(-1, 64)
        comp_zz.append(quant[:, _ZZ].reshape(rows, cols, 64))

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    if arithmetic:
        out = bytearray(JPEG_SIG)
        out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        for tid, qt in enumerate(qtabs):
            out += seg(0xFFDB, bytes([tid]) + bytes(int(qt[z]) for z in _ZZ))
        sof = struct.pack(">BHHB", 8, h, w, 3)
        for i, (hi, vi) in enumerate(samp):
            sof += bytes([i + 1, (hi << 4) | vi, 0 if i == 0 else 1])
        # SOF9 = extended sequential; SOF10 = progressive (both QM-coded)
        out += seg(0xFFCA if progressive else 0xFFC9, sof)
        # DAC: default conditioning, stated explicitly in the stream
        # (DC tables 0/1: L=0,U=1 -> Cs=0x10; AC tables 0/1: Kx=5)
        out += seg(
            0xFFCC,
            bytes([0x00, 0x10, 0x01, 0x10, 0x10, 0x05, 0x11, 0x05]),
        )
        if restart_interval:
            out += seg(0xFFDD, struct.pack(">H", int(restart_interval)))
        if progressive:
            from .jpeg_arith import encode_scans_arith_progressive

            for comp_ids, ss, se, ah, al, data in encode_scans_arith_progressive(
                comp_zz, samp, w, h, mcx, mcy, restart_interval,
                dc_noninterleaved,
            ):
                body = bytes([len(comp_ids)])
                for cid in comp_ids:
                    t = 0 if cid == 1 else 1
                    body += bytes([cid, (t << 4) | t])
                out += seg(0xFFDA, body + bytes([ss, se, (ah << 4) | al]))
                out += data
        else:
            from .jpeg_arith import encode_scan_arith

            out += seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
            out += encode_scan_arith(comp_zz, samp, mcx, mcy, restart_interval)
        out += struct.pack(">H", 0xFFD9)
        return bytes(out)

    if progressive:
        rst_i = int(restart_interval) if restart_interval else 0
        out = bytearray(JPEG_SIG)
        out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        for tid, qt in enumerate(qtabs):
            out += seg(0xFFDB, bytes([tid]) + bytes(int(qt[z]) for z in _ZZ))
        sof = struct.pack(">BHHB", 8, h, w, 3)
        for i, (hi, vi) in enumerate(samp):
            sof += bytes([i + 1, (hi << 4) | vi, 0 if i == 0 else 1])
        out += seg(0xFFC2, sof)  # SOF2: progressive DCT
        # Progressive AC scans emit EOBn symbols ((r<<4)|0, r=1..14) for
        # multi-block EOB runs — absent from the Annex K tables, so use a
        # flat custom AC table (every symbol at code length 8; canonical
        # order). Valid JPEG: any decoder reads the DHT from the stream.
        ac_syms = sorted(
            {0x00, 0xF0}
            | {(r << 4) for r in range(1, 15)}
            | {(r << 4) | s for r in range(16) for s in range(1, 11)}
        )
        ac_bits = [0] * 16
        ac_bits[7] = len(ac_syms)  # all codes 8 bits long
        prog_ac = _canonical_codes(ac_bits, ac_syms)
        ac_codes = [prog_ac, prog_ac]
        for cls, tid, (bits, vals) in (
            (0, 0, _DC_LUM), (1, 0, ([0] * 16, [])), (0, 1, _DC_CHR),
        ):
            if cls == 1:
                bits, vals = ac_bits, ac_syms
            out += seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
        out += seg(0xFFC4, bytes([(1 << 4) | 1]) + bytes(ac_bits) + bytes(ac_syms))

        if rst_i:
            out += seg(0xFFDD, struct.pack(">H", rst_i))

        def rst_marker(bwr, n_emitted: int) -> None:
            # byte-align and insert RSTn (cycling 0-7) mid-scan
            bwr.flush()
            bwr.out += struct.pack(">H", 0xFFD0 + ((n_emitted - 1) % 8))

        def sos_hdr(comp_ids: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
            body = bytes([len(comp_ids)])
            for cid in comp_ids:
                t = 0 if cid == 1 else 1
                body += bytes([cid, (t << 4) | t])
            return seg(0xFFDA, body + bytes([ss, se, (ah << 4) | al]))

        def grid(ci: int) -> tuple[int, int]:
            hi, vi = samp[ci]
            cw = -(-w * hi // hmax)
            ch_ = -(-h * vi // vmax)
            return -(-ch_ // 8), -(-cw // 8)  # (cbh, cbw)

        # scan 1: DC first at Al=1 (arithmetic shift per spec) —
        # interleaved MCU order, or per-component Ns=1 scans on request
        def emit_dc_diff(bwr, t, dc, pred, ci):
            diff = dc - pred[ci]
            pred[ci] = dc
            s = _category(diff)
            ln, code = dc_codes[t][s]
            bwr.write(code, ln)
            if s:
                bwr.write(diff if diff > 0 else diff + (1 << s) - 1, s)

        if dc_noninterleaved:
            for ci in range(3):
                t = 0 if ci == 0 else 1
                cbh, cbw_ = grid(ci)
                bwr = _BitWriter()
                pred = [0, 0, 0]
                blk = 0
                for by in range(cbh):
                    for bx in range(cbw_):
                        if rst_i and blk and blk % rst_i == 0:
                            rst_marker(bwr, blk // rst_i)
                            pred = [0, 0, 0]
                        blk += 1
                        dc = int(comp_zz[ci][by, bx, 0]) >> 1
                        emit_dc_diff(bwr, t, dc, pred, ci)
                bwr.flush()
                out += sos_hdr([ci + 1], 0, 0, 0, 1) + bwr.out
        else:
            bwr = _BitWriter()
            pred = [0, 0, 0]
            for mcu in range(mcx * mcy):
                if rst_i and mcu and mcu % rst_i == 0:
                    rst_marker(bwr, mcu // rst_i)
                    pred = [0, 0, 0]
                my, mx = divmod(mcu, mcx)
                for ci in range(3):
                    hi, vi = samp[ci]
                    t = 0 if ci == 0 else 1
                    for v in range(vi):
                        for hh in range(hi):
                            dc = int(comp_zz[ci][my * vi + v, mx * hi + hh, 0]) >> 1
                            emit_dc_diff(bwr, t, dc, pred, ci)
            bwr.flush()
            out += sos_hdr([1, 2, 3], 0, 0, 0, 1) + bwr.out

        # scans 2-4: AC first per component, band 1..63, Al=1, with
        # true multi-block EOB runs (EOBn symbols from the custom table)
        for ci in range(3):
            t = 0 if ci == 0 else 1
            cbh, cbw_ = grid(ci)
            bwr = _BitWriter()
            eobrun = 0

            def flush_eobrun():
                nonlocal eobrun
                if not eobrun:
                    return
                r = eobrun.bit_length() - 1
                ln, code = ac_codes[t][r << 4]
                bwr.write(code, ln)
                if r:
                    bwr.write(eobrun - (1 << r), r)
                eobrun = 0

            blk = 0
            for by in range(cbh):
                for bx in range(cbw_):
                    if rst_i and blk and blk % rst_i == 0:
                        flush_eobrun()  # a run never crosses a restart
                        rst_marker(bwr, blk // rst_i)
                    blk += 1
                    zz = comp_zz[ci][by, bx]
                    vals = [
                        (1 if int(v) > 0 else -1) * (abs(int(v)) >> 1)
                        for v in zz[1:64]
                    ]
                    last = max(
                        (i for i, v in enumerate(vals) if v), default=-1
                    )
                    if last < 0:
                        eobrun += 1  # whole band empty: extend the run
                        if eobrun == 0x7FFF:
                            flush_eobrun()
                        continue
                    flush_eobrun()
                    run = 0
                    for i, v in enumerate(vals):
                        if i > last:
                            eobrun = 1  # block ends early: run starts
                            break
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            ln, code = ac_codes[t][0xF0]  # ZRL
                            bwr.write(code, ln)
                            run -= 16
                        s = _category(v)
                        ln, code = ac_codes[t][(run << 4) | s]
                        bwr.write(code, ln)
                        bwr.write(v if v > 0 else v + (1 << s) - 1, s)
                        run = 0
            flush_eobrun()
            bwr.flush()
            out += sos_hdr([ci + 1], 1, 63, 0, 1) + bwr.out

        # scan 5: DC refinement (one raw bit per block), same ordering
        # choice as the DC-first scan
        if dc_noninterleaved:
            for ci in range(3):
                cbh, cbw_ = grid(ci)
                bwr = _BitWriter()
                blk = 0
                for by in range(cbh):
                    for bx in range(cbw_):
                        if rst_i and blk and blk % rst_i == 0:
                            rst_marker(bwr, blk // rst_i)
                        blk += 1
                        bwr.write(int(comp_zz[ci][by, bx, 0]) & 1, 1)
                bwr.flush()
                out += sos_hdr([ci + 1], 0, 0, 1, 0) + bwr.out
        else:
            bwr = _BitWriter()
            for mcu in range(mcx * mcy):
                if rst_i and mcu and mcu % rst_i == 0:
                    rst_marker(bwr, mcu // rst_i)
                my, mx = divmod(mcu, mcx)
                for ci in range(3):
                    hi, vi = samp[ci]
                    for v in range(vi):
                        for hh in range(hi):
                            bwr.write(int(comp_zz[ci][my * vi + v, mx * hi + hh, 0]) & 1, 1)
            bwr.flush()
            out += sos_hdr([1, 2, 3], 0, 0, 1, 0) + bwr.out

        # scans 6-8: AC refinement per component (G.1.2.3 encode,
        # WINDOW-ACCURATE: each ZRL / (r<<4|1) symbol is followed by the
        # correction bits of exactly the history-nonzero coefficients the
        # decoder passes inside that symbol's zero-run window — flushing
        # bits across a window boundary desyncs the decoder's walk)
        for ci in range(3):
            t = 0 if ci == 0 else 1
            cbh, cbw_ = grid(ci)
            bwr = _BitWriter()
            eobrun = 0
            pend: list[int] = []  # correction bits buffered across the run

            def flush_eobrun():
                nonlocal eobrun
                if not eobrun:
                    return
                r = eobrun.bit_length() - 1
                ln, code = ac_codes[t][r << 4]
                bwr.write(code, ln)
                if r:
                    bwr.write(eobrun - (1 << r), r)
                for bit in pend:
                    bwr.write(bit, 1)
                pend.clear()
                eobrun = 0

            blk = 0
            for by in range(cbh):
                for bx in range(cbw_):
                    if rst_i and blk and blk % rst_i == 0:
                        flush_eobrun()  # run + its buffered bits end here
                        rst_marker(bwr, blk // rst_i)
                    blk += 1
                    zz = comp_zz[ci][by, bx]
                    absv = [abs(int(v)) for v in zz[1:64]]
                    n = len(absv)
                    pos = 0
                    has_new = any(a == 1 for a in absv)
                    if not has_new:
                        # no newly-nonzero anywhere: whole block joins the
                        # EOB run (correction bits for history-nonzero)
                        eobrun += 1
                        pend.extend(a & 1 for a in absv if a > 1)
                        if eobrun == 0x7FFF:
                            flush_eobrun()
                        continue
                    flush_eobrun()  # a content block ends any pending run
                    while True:
                        nxt = next(
                            (j for j in range(pos, n) if absv[j] == 1), None
                        )
                        if nxt is None:
                            break
                        # ZRL windows: 16 zero-history each, with the
                        # correction bits of nonzero-history inside them
                        while True:
                            zeros = [
                                p for p in range(pos, nxt) if absv[p] == 0
                            ]
                            if len(zeros) <= 15:
                                break
                            w_end = zeros[15]  # 16th zero: window boundary
                            ln, code = ac_codes[t][0xF0]
                            bwr.write(code, ln)
                            for p in range(pos, w_end + 1):
                                if absv[p] > 1:
                                    bwr.write(absv[p] & 1, 1)
                            pos = w_end + 1
                        r = sum(1 for p in range(pos, nxt) if absv[p] == 0)
                        ln, code = ac_codes[t][(r << 4) | 1]
                        bwr.write(code, ln)
                        bwr.write(1 if int(zz[1 + nxt]) > 0 else 0, 1)
                        for p in range(pos, nxt):
                            if absv[p] > 1:
                                bwr.write(absv[p] & 1, 1)
                        pos = nxt + 1
                    if pos < n:
                        # trailing band content joins the EOB run; its
                        # correction bits ride the run's buffer (in block
                        # order) and flush with the EOBn symbol
                        eobrun += 1
                        pend.extend(
                            absv[p] & 1 for p in range(pos, n) if absv[p] > 1
                        )
                        if eobrun == 0x7FFF:
                            flush_eobrun()
            flush_eobrun()
            bwr.flush()
            out += sos_hdr([ci + 1], 1, 63, 1, 0) + bwr.out

        out += struct.pack(">H", 0xFFD9)
        return bytes(out)

    bw = _BitWriter()
    pred = [0, 0, 0]

    def emit_block(zz, ci: int) -> None:
        t = 0 if ci == 0 else 1
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        s = _category(diff)
        ln, code = dc_codes[t][s]
        bw.write(code, ln)
        if s:
            bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        run = 0
        last_nz = max(np.nonzero(zz)[0], default=0)
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                if k > last_nz:
                    ln, code = ac_codes[t][0x00]  # EOB
                    bw.write(code, ln)
                    break
                run += 1
                continue
            while run > 15:
                ln, code = ac_codes[t][0xF0]  # ZRL
                bw.write(code, ln)
                run -= 16
            s = _category(v)
            ln, code = ac_codes[t][(run << 4) | s]
            bw.write(code, ln)
            bw.write(v if v > 0 else v + (1 << s) - 1, s)
            run = 0

    rst = int(restart_interval) if restart_interval else 0
    for mcu in range(mcx * mcy):
        if rst and mcu and mcu % rst == 0:
            # byte-align, emit RSTn (cycling 0-7), reset DC prediction
            bw.flush()
            bw.out += struct.pack(">H", 0xFFD0 + ((mcu // rst - 1) % 8))
            pred[:] = [0, 0, 0]
        my, mx = divmod(mcu, mcx)
        for ci in range(3):
            hi, vi = samp[ci]
            for v in range(vi):
                for hh in range(hi):
                    emit_block(comp_zz[ci][my * vi + v, mx * hi + hh], ci)
    bw.flush()

    out = bytearray(JPEG_SIG)
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, qt in enumerate(qtabs):
        out += seg(0xFFDB, bytes([tid]) + bytes(int(qt[z]) for z in _ZZ))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for i, (hi, vi) in enumerate(samp):
        sof += bytes([i + 1, (hi << 4) | vi, 0 if i == 0 else 1])
    out += seg(0xFFC0, sof)
    for cls, tid, (bits, vals) in (
        (0, 0, _DC_LUM), (1, 0, _AC_LUM), (0, 1, _DC_CHR), (1, 1, _AC_CHR)
    ):
        out += seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    if rst:
        out += seg(0xFFDD, struct.pack(">H", rst))
    out += seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += bw.out
    out += struct.pack(">H", 0xFFD9)
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.d = data
        self.pos = 0

    def bit(self) -> int:
        byte = self.d[self.pos >> 3]
        v = (byte >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return v

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _parse_dqt(body: bytes, qtabs: dict) -> None:
    """Parse one DQT segment (possibly several tables) into ``qtabs``,
    natural order. Pq=0 (8-bit) and Pq=1 (16-bit big-endian, r12 — T.81
    pairs it with 12-bit precision but real encoders emit it with 8-bit
    streams too) both decode; dequantization is int32 throughout so the
    wider values flow through unchanged."""
    import numpy as np

    i = 0
    while i < len(body):
        pq, tq = body[i] >> 4, body[i] & 0xF
        if pq > 1:
            raise ValueError(f"corrupt DQT: precision flag {pq}")
        n = 128 if pq else 64
        raw = body[i + 1 : i + 1 + n]
        if len(raw) < n:
            raise ValueError("corrupt DQT: truncated table")
        tab = np.zeros(64, np.int32)
        tab[_ZZ] = np.frombuffer(raw, ">u2" if pq else np.uint8)
        qtabs[tq] = tab
        i += 1 + n


def _decode_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | br.bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("corrupt JPEG: no Huffman code matched in 16 bits")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def decode_jpeg(payload: bytes):
    """Parse a JFIF/JPEG: returns (width, height, HxWx3 uint8 RGB).
    Grayscale decodes with the luma plane replicated to RGB. Progressive
    (SOF2) streams route to _decode_progressive (r12: native support).
    Arithmetic coding, 12-bit precision and sampling factors > 2 raise
    NotImplementedError (inject a PIL-backed decoder for those —
    operators/multimodal.default_decoder does)."""
    import numpy as np

    if not payload.startswith(JPEG_SIG):
        raise ValueError("not a JPEG payload")

    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
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
        if marker == 0xD9:  # EOI before SOS
            break
        (ln,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:  # DQT (8- or 16-bit tables, several per segment)
            _parse_dqt(body, qtabs)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                huff[(cls, tid)] = {
                    (ln_, code): sym
                    for sym, (ln_, code) in _canonical_codes(bits, vals).items()
                }
                i += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # baseline / ext sequential
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG precision")
            if not (0 < w and 0 < h and w * h <= 1 << 28):
                raise ValueError(f"implausible JPEG dimensions {w}x{h}")
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG")
            for i in range(nc):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                hi, vi = samp >> 4, samp & 0xF
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    raise NotImplementedError(f"sampling factors {hi}x{vi}")
                comps.append({"id": cid, "h": hi, "v": vi, "tq": tq})
        elif marker == 0xC2:  # progressive DCT (r12: native decode)
            return _decode_progressive(payload)
        elif marker == 0xC9:  # sequential arithmetic (r12: native decode)
            from .jpeg_arith import decode_jpeg_arith

            return decode_jpeg_arith(payload)
        elif marker == 0xCA:  # progressive arithmetic (r12: native decode)
            from .jpeg_arith import decode_jpeg_arith_progressive

            return decode_jpeg_arith_progressive(payload)
        elif marker == 0xC3:  # lossless sequential (r12: native decode)
            from .jpeg_lossless import decode_jpeg_lossless

            return decode_jpeg_lossless(payload)
        elif marker in (0xC5, 0xC6, 0xC7, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "hierarchical/arithmetic-lossless JPEG — inject a "
                "PIL-backed decoder"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            for i in range(ns):
                cid, tabs = body[1 + 2 * i], body[2 + 2 * i]
                scan.append((cid, tabs >> 4, tabs & 0xF))
            data_start = pos
            break
        # APPn/COM/others: skipped
    if data_start is None or not comps:
        raise ValueError("corrupt JPEG: missing SOF/SOS")

    # split the entropy-coded data at restart markers, destuffing 0xFF00
    chunks: list[bytearray] = [bytearray()]
    i = data_start
    while i < len(payload):
        bsrc = payload[i]
        if bsrc != 0xFF:
            chunks[-1].append(bsrc)
            i += 1
            continue
        nxt = payload[i + 1] if i + 1 < len(payload) else 0xD9
        if nxt == 0x00:
            chunks[-1].append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:  # RSTn
            chunks.append(bytearray())
            i += 2
        else:  # EOI or next marker: end of scan
            break

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcx = -(-w // (8 * hmax))
    mcy = -(-h // (8 * vmax))
    n_mcus = mcx * mcy
    by_id = {c["id"]: c for c in comps}
    order = []  # per-MCU block emission order: (comp, block-row, block-col)
    for cid, dct, act in scan:
        c = by_id[cid]
        c["dc"], c["ac"] = huff[(0, dct)], huff[(1, act)]
        c["bw"] = mcx * c["h"]  # blocks per row
        c["coefs"] = np.zeros((mcy * c["v"] * c["bw"], 64), np.int32)
        order.append(c)

    mcu = 0
    for chunk in chunks:
        if mcu >= n_mcus:
            break
        br = _BitReader(bytes(chunk))
        pred = {c["id"]: 0 for c in comps}
        limit = min(n_mcus, mcu + restart_interval) if restart_interval else n_mcus
        while mcu < limit:
            my, mx = divmod(mcu, mcx)
            for c in order:
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        s = _decode_symbol(br, c["dc"])
                        diff = _extend(br.bits(s), s) if s else 0
                        pred[c["id"]] += diff
                        zz = np.zeros(64, np.int32)
                        zz[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            sym = _decode_symbol(br, c["ac"])
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0xF
                            if size == 0:
                                if run != 15:
                                    raise ValueError("corrupt JPEG: bad AC symbol")
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("corrupt JPEG: AC run overflow")
                            zz[k] = _extend(br.bits(size), size)
                            k += 1
                        bi = (my * c["v"] + v) * c["bw"] + mx * c["h"] + hh
                        c["coefs"][bi] = zz
            mcu += 1
    if mcu < n_mcus:
        raise ValueError(f"corrupt JPEG: decoded {mcu}/{n_mcus} MCUs")

    return _reconstruct(order, qtabs, mcy, hmax, vmax, w, h)


def _decode_progressive(payload: bytes):
    """Progressive (SOF2) JPEG decode — full spectral-selection +
    successive-approximation support (ITU T.81 Annex G.2, the jdphuff
    shape): every scan accumulates into per-component zigzag coefficient
    arrays; reconstruction is the same dequant/IDCT tail as baseline, so
    a progressive file decodes BIT-IDENTICALLY to the baseline encoding
    of the same quantized coefficients (pinned in tests).

    Scan kinds (Ss==0 is DC, else AC; Ah==0 is first, else refinement):
      - DC first      : Huffman diff coding of coef>>Al, interleaved or
                        not (Ns decides), restart-aware prediction.
      - DC refinement : one raw bit per block -> coef |= bit<<Al.
      - AC first      : run/size symbols with EOBRUN (EOBn carries a
                        block-run), values scaled <<Al. Always Ns==1;
                        block order is the COMPONENT's own grid (spec
                        A.2.2), not the padded MCU grid.
      - AC refinement : correction bits for history-nonzero coefs, sign
                        bits for newly-nonzero ones, EOB runs carrying
                        correction bits to the band end (G.1.2.3).
    """
    import numpy as np

    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    scans: list[dict] = []
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
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                huff[(cls, tid)] = {
                    (ln_, code): sym
                    for sym, (ln_, code) in _canonical_codes(bits, vals).items()
                }
                i += 17 + nv
        elif marker == 0xC2:
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG precision")
            if not (0 < w and 0 < h and w * h <= 1 << 28):
                raise ValueError(f"implausible JPEG dimensions {w}x{h}")
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG")
            for i in range(nc):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                hi, vi = samp >> 4, samp & 0xF
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
            ah, al = a >> 4, a & 0xF
            # entropy data: destuff, split at restarts, stop at a marker
            chunks: list[bytes] = []
            cur = bytearray()
            i = pos
            while i < len(payload):
                bsrc = payload[i]
                if bsrc != 0xFF:
                    cur.append(bsrc)
                    i += 1
                    continue
                nxt = payload[i + 1] if i + 1 < len(payload) else 0xD9
                if nxt == 0x00:
                    cur.append(0xFF)
                    i += 2
                elif 0xD0 <= nxt <= 0xD7:
                    chunks.append(bytes(cur))
                    cur = bytearray()
                    i += 2
                else:
                    break
            chunks.append(bytes(cur))
            pos = i  # resume the marker walk at the terminating marker
            scans.append({
                "comps": scomps, "ss": ss, "se": se, "ah": ah, "al": al,
                "chunks": chunks, "ri": restart_interval,
                # table snapshot: redefinition between scans replaces the
                # dict object, so capturing references here is correct
                "huff": dict(huff),
            })
        # APPn/COM: skipped
    if not comps or not scans:
        raise ValueError("corrupt JPEG: missing SOF2/SOS")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcx = -(-w // (8 * hmax))
    mcy = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    for c in comps:
        c["bw"] = mcx * c["h"]
        c["coefs"] = np.zeros((mcy * c["v"] * c["bw"], 64), np.int32)
        # non-interleaved (Ns==1) geometry: the component's OWN grid
        cw = -(-w * c["h"] // hmax)   # component width in samples
        ch = -(-h * c["v"] // vmax)
        c["cbw"] = -(-cw // 8)
        c["cbh"] = -(-ch // 8)

    for sc in scans:
        _progressive_scan(sc, by_id, mcx, mcy)

    return _reconstruct(comps, qtabs, mcy, hmax, vmax, w, h)


def _progressive_scan(sc, by_id, mcx, mcy) -> None:
    """Apply one scan's entropy data to the coefficient arrays."""
    ss, se, ah, al = sc["ss"], sc["se"], sc["ah"], sc["al"]
    scomps = [(by_id[cid], dct, act) for cid, dct, act in sc["comps"]]
    if ss == 0 and se != 0:
        raise ValueError(
            "corrupt progressive JPEG: DC scan (Ss=0) must have Se=0"
        )
    if ss > 0 and len(scomps) != 1:
        raise ValueError(
            "corrupt progressive JPEG: AC scans must be single-component"
        )
    if ss == 0:
        dc_tabs = {c["id"]: sc["huff"].get((0, dct)) for c, dct, _ in scomps}
        if ah == 0 and any(t is None for t in dc_tabs.values()):
            raise ValueError("corrupt JPEG: missing DC Huffman table")

    interleaved = len(scomps) > 1
    if interleaved:
        units = mcx * mcy  # MCUs
    else:
        c0 = scomps[0][0]
        units = c0["cbw"] * c0["cbh"]  # blocks in the component grid

    def block_indexes(unit: int):
        if interleaved:
            my, mx = divmod(unit, mcx)
            for c, dct, act in scomps:
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        yield c, dct, act, (my * c["v"] + v) * c["bw"] + mx * c["h"] + hh
        else:
            c, dct, act = scomps[0]
            by, bx = divmod(unit, c["cbw"])
            yield c, dct, act, by * c["bw"] + bx

    ri = sc["ri"]
    unit = 0
    for chunk in sc["chunks"]:
        if unit >= units:
            break
        br = _BitReader(chunk)
        pred = {c["id"]: 0 for c, _, _ in scomps}
        eobrun = 0
        limit = min(units, unit + ri) if ri else units
        while unit < limit:
            for c, dct, act, bi in block_indexes(unit):
                zz = c["coefs"][bi]
                if ss == 0 and ah == 0:  # DC first
                    tab = sc["huff"][(0, dct)]
                    s = _decode_symbol(br, tab)
                    diff = _extend(br.bits(s), s) if s else 0
                    pred[c["id"]] += diff
                    zz[0] = pred[c["id"]] << al
                elif ss == 0:  # DC refinement
                    if br.bit():
                        zz[0] |= 1 << al
                elif ah == 0:  # AC first
                    if eobrun > 0:
                        eobrun -= 1
                        continue
                    tab = sc["huff"][(1, act)]
                    k = ss
                    while k <= se:
                        sym = _decode_symbol(br, tab)
                        r, s = sym >> 4, sym & 0xF
                        if s == 0:
                            if r == 15:
                                k += 16  # ZRL
                                continue
                            eobrun = (1 << r) - 1 + (br.bits(r) if r else 0)
                            break
                        k += r
                        if k > se:
                            raise ValueError("corrupt JPEG: AC run overflow")
                        zz[k] = _extend(br.bits(s), s) << al
                        k += 1
                else:  # AC refinement (G.1.2.3)
                    eobrun = _ac_refine_block(
                        br, sc["huff"][(1, act)], zz, ss, se, al, eobrun
                    )
            unit += 1


def _ac_refine_block(br, tab, zz, ss, se, al, eobrun) -> int:
    """Refine one block's AC band; returns the updated EOB run."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _decode_symbol(br, tab)
            r, s = sym >> 4, sym & 0xF
            if s == 0:
                if r < 15:
                    # refine EOBn counts the CURRENT block too (jdphuff):
                    # the post-loop correction pass below finishes it and
                    # decrements — unlike the first-scan form's (1<<r)-1
                    eobrun = (1 << r) + (br.bits(r) if r else 0)
                    break
                val = 0  # ZRL in a refinement scan: skip 16 zero-history
            else:
                if s != 1:
                    raise ValueError("corrupt JPEG: refinement size != 1")
                val = p1 if br.bit() else -p1
            # advance past r zero-HISTORY coefficients, emitting
            # correction bits for the nonzero ones passed over
            while k <= se:
                if zz[k] != 0:
                    if br.bit() and (abs(int(zz[k])) & p1) == 0:
                        zz[k] += p1 if zz[k] > 0 else -p1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    if eobrun > 0:
        # EOB run covers the rest of this band: correction bits only
        while k <= se:
            if zz[k] != 0 and br.bit() and (abs(int(zz[k])) & p1) == 0:
                zz[k] += p1 if zz[k] > 0 else -p1
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct(comps, qtabs, mcy, hmax, vmax, w, h):
    """Shared decode tail: dequantize zigzag coefficients, inverse DCT,
    upsample subsampled planes, convert to RGB. ``comps`` entries carry
    coefs (blocks x 64, zigzag order), tq, h, v, bw."""
    import numpy as np

    cmat = _dct_matrix()
    planes = []
    for c in comps:
        qt = qtabs[c["tq"]].astype(np.float64)
        deq = np.zeros((len(c["coefs"]), 64), np.float64)
        deq[:, _ZZ] = c["coefs"] * qt[_ZZ]
        blocks = deq.reshape(-1, 8, 8)
        spat = np.einsum("ji,njk,kl->nil", cmat, blocks, cmat) + 128.0
        rows, cols = mcy * c["v"], c["bw"]
        plane = (
            spat.reshape(rows, cols, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(rows * 8, cols * 8)
        )
        plane = np.repeat(np.repeat(plane, vmax // c["v"], 0), hmax // c["h"], 1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        y = np.clip(planes[0], 0, 255)
        rgb = np.stack([y, y, y], axis=2).astype(np.uint8)
        return w, h, rgb
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=2,
    )
    return w, h, np.clip(np.round(rgb), 0, 255).astype(np.uint8)
