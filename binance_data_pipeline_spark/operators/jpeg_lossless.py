"""Lossless JPEG (ITU T.81 Annex H, SOF3) — the predictive process
used by DICOM / medical imaging and some camera RAW containers. Closes
the "lossless" entry in the dependency-free codec tier's JPEG
NotImplementedError list (operators/jpeg.py routes SOF3 here; only the
hierarchical processes and arithmetic lossless still go to an injected
decoder).

Semantics implemented per spec:
  * Predictors 1-7 (Ra / Rb / Rc / Ra+Rb-Rc / Ra+((Rb-Rc)>>1) /
    Rb+((Ra-Rc)>>1) / (Ra+Rb)>>2... see _predict), selected by the SOS
    Ss field; positional fallbacks (first sample -> 1<<(P-Pt-1), rest
    of first line -> Ra, line starts -> Rb).
  * Modulo-2^16 difference arithmetic; SSSS category coding with the
    DC-style Huffman layer (SSSS=16 is the no-extra-bits 32768 case).
  * Sample precision 2-16 bits (8-bit streams reconstruct uint8,
    wider ones uint16), point transform Al (=Pt) honored.
  * Restart markers: prediction state resets — the next sample of each
    component is predicted with the start-of-scan default, then normal
    positional rules resume (the libjpeg-compatible reading of H.2.2).
  * Color: 3-component scans are RGB when an Adobe APP14 transform=0
    segment says so (what this encoder writes — giving pixel-exact
    RGB roundtrips, the test oracle), YCbCr (BT.601) otherwise;
    1-component scans replicate to the HxWx3 contract.

Scope bounds: sampling factors must be 1x1 (subsampled lossless is
unheard of in the wild); interleaved and single-scan only.

Reference scope note: the binance reference pipeline has no media
handling (698 LoC of pandas/Kafka/dbt); this module extends the
multimodal-column surface the build brief requires.
"""

from __future__ import annotations

import struct

__all__ = ["encode_jpeg_lossless", "decode_jpeg_lossless"]


def _predict(sel: int, ra: int, rb: int, rc: int) -> int:
    if sel == 1:
        return ra
    if sel == 2:
        return rb
    if sel == 3:
        return rc
    if sel == 4:
        return ra + rb - rc
    if sel == 5:
        return ra + ((rb - rc) >> 1)
    if sel == 6:
        return rb + ((ra - rc) >> 1)
    if sel == 7:
        return (ra + rb) >> 1
    raise ValueError(f"invalid lossless predictor {sel}")


def encode_jpeg_lossless(pixels, predictor: int = 4, precision: int | None = None) -> bytes:
    """Encode an HxW (grayscale) or HxWx3 (RGB) array as lossless JPEG
    (SOF3). uint8 input defaults to 8-bit precision, uint16 to 16-bit;
    pass ``precision`` (2-16) explicitly for e.g. 12-bit medical data
    carried in uint16. Decoding the result reproduces the input
    EXACTLY — the roundtrip oracle the tests pin. RGB is coded without
    a color transform and tagged with Adobe APP14 transform=0."""
    import numpy as np

    from .jpeg import JPEG_SIG, _BitWriter, _canonical_codes, _category

    px = np.asarray(pixels)
    if px.ndim == 2:
        px = px[:, :, None]
    if px.ndim != 3 or px.shape[2] not in (1, 3):
        raise ValueError("expected HxW or HxWx{1,3} array")
    if not (1 <= predictor <= 7):
        raise ValueError(f"invalid lossless predictor {predictor}")
    if precision is None:
        precision = 16 if px.dtype == np.uint16 else 8
    if not (2 <= precision <= 16):
        raise ValueError(f"precision out of range: {precision}")
    smp = px.astype(np.int64)
    if smp.min() < 0 or smp.max() >= (1 << precision):
        raise ValueError(f"samples exceed {precision}-bit range")
    h, w, nc = smp.shape
    if not (0 < h < 65536 and 0 < w < 65536):
        raise ValueError(f"dimensions out of JPEG range: {w}x{h}")

    # flat Huffman table: SSSS 0-16, five bits each (canonical, valid
    # anywhere; simplicity over the last few percent of entropy)
    syms = list(range(17))
    bits = [0] * 16
    bits[4] = 17
    codes = _canonical_codes(bits, syms)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(JPEG_SIG)
    out += seg(0xFFEE, b"Adobe" + struct.pack(">HHHB", 100, 0, 0, 0))
    out += seg(0xFFC4, bytes([0x00]) + bytes(bits) + bytes(syms))
    sof = struct.pack(">BHHB", precision, h, w, nc)
    for i in range(nc):
        sof += bytes([i + 1, 0x11, 0])
    out += seg(0xFFC3, sof)
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00])
    out += seg(0xFFDA, sos + bytes([predictor, 0, 0]))

    default = 1 << (precision - 1)
    bwr = _BitWriter()
    for y in range(h):
        for x in range(w):
            for c in range(nc):
                if y == 0 and x == 0:
                    pred = default
                elif y == 0:
                    pred = int(smp[0, x - 1, c])
                elif x == 0:
                    pred = int(smp[y - 1, 0, c])
                else:
                    pred = _predict(
                        predictor,
                        int(smp[y, x - 1, c]),
                        int(smp[y - 1, x, c]),
                        int(smp[y - 1, x - 1, c]),
                    )
                diff = (int(smp[y, x, c]) - pred) & 0xFFFF
                if diff >= 0x8000:
                    diff -= 0x10000
                if diff == -0x8000:
                    s = 16  # SSSS=16: difference 32768, no extra bits
                else:
                    s = _category(diff)
                ln, code = codes[s]
                bwr.write(code, ln)
                if 0 < s < 16:
                    bwr.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    bwr.flush()
    out += bwr.out
    out += struct.pack(">H", 0xFFD9)
    return bytes(out)


def decode_jpeg_lossless(payload: bytes):
    """Decode a lossless (SOF3) JPEG. Returns (w, h, pixels) like
    jpeg.decode_jpeg — HxWx3 uint8 for precision <= 8, uint16 above
    (12/16-bit medical data keeps its dynamic range)."""
    import numpy as np

    from .jpeg import (
        JPEG_SIG,
        _BitReader,
        _canonical_codes,
        _decode_symbol,
        _extend,
    )

    if not payload.startswith(JPEG_SIG):
        raise ValueError("not a JPEG payload")

    huff: dict[int, dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    scan: list[tuple[int, int]] = []
    h = w = prec = 0
    sel = pt = 0
    restart_interval = 0
    adobe_transform: int | None = None
    chunks: list[bytes] = []
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
        if marker == 0xC4:
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                tbits = list(body[i + 1 : i + 17])
                nv = sum(tbits)
                vals = list(body[i + 17 : i + 17 + nv])
                if cls == 0:
                    huff[tid] = {
                        (l_, code): sym
                        for sym, (l_, code) in _canonical_codes(tbits, vals).items()
                    }
                i += 17 + nv
        elif marker == 0xC3:
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if not (2 <= prec <= 16):
                raise ValueError(f"invalid lossless precision {prec}")
            if not (0 < w and 0 < h and w * h <= 1 << 28):
                raise ValueError(f"implausible JPEG dimensions {w}x{h}")
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component lossless JPEG")
            for i in range(nc):
                cid, sampb, _tq = body[6 + 3 * i : 9 + 3 * i]
                if sampb != 0x11:
                    raise NotImplementedError(
                        "subsampled lossless JPEG (non-1x1 factors)"
                    )
                comps.append({"id": cid})
        elif marker == 0xEE and body[:5] == b"Adobe" and len(body) >= 12:
            adobe_transform = body[11]
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            ns = body[0]
            for i in range(ns):
                cid, tabs = body[1 + 2 * i], body[2 + 2 * i]
                scan.append((cid, tabs >> 4))
            sel, _se, a = body[1 + 2 * ns : 4 + 2 * ns]
            pt = a & 0xF
            if not (1 <= sel <= 7):
                raise ValueError(f"invalid lossless predictor {sel}")
            # entropy data: 0xFF00 destuffing, split at restart markers
            cur = bytearray()
            i = pos
            while i < len(payload):
                b = payload[i]
                if b != 0xFF:
                    cur.append(b)
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
            break
        # APPn/COM: skipped
    if not comps or not scan or not chunks:
        raise ValueError("corrupt JPEG: missing SOF3/SOS")
    if len(scan) != len(comps):
        raise ValueError("corrupt JPEG: scan/frame component mismatch")

    nc = len(comps)
    tabs = []
    for _cid, td in scan:
        t = huff.get(td)
        if t is None:
            raise ValueError("corrupt JPEG: missing lossless Huffman table")
        tabs.append(t)

    default = 1 << (prec - pt - 1)
    smp = np.zeros((h, w, nc), np.int64)
    n_units = h * w
    unit = 0
    ci = 0  # chunk index
    for chunk in chunks:
        if unit >= n_units:
            break
        br = _BitReader(chunk)
        fresh = True  # next sample per component: start-of-scan default
        limit = min(n_units, unit + restart_interval) if restart_interval else n_units
        while unit < limit:
            y, x = divmod(unit, w)
            for c in range(nc):
                if fresh or (y == 0 and x == 0):
                    pred = default
                elif y == 0:
                    pred = int(smp[0, x - 1, c])
                elif x == 0:
                    pred = int(smp[y - 1, 0, c])
                else:
                    pred = _predict(
                        sel,
                        int(smp[y, x - 1, c]),
                        int(smp[y - 1, x, c]),
                        int(smp[y - 1, x - 1, c]),
                    )
                s = _decode_symbol(br, tabs[c])
                if s == 16:
                    diff = 0x8000
                elif s > 16:
                    raise ValueError("corrupt JPEG: lossless SSSS > 16")
                else:
                    diff = _extend(br.bits(s), s) if s else 0
                smp[y, x, c] = (pred + diff) & 0xFFFF
            fresh = False
            unit += 1
        ci += 1
    if unit < n_units:
        raise ValueError(f"corrupt JPEG: decoded {unit}/{n_units} samples")

    smp = np.minimum(smp << pt, (1 << prec) - 1)
    if nc == 3 and adobe_transform not in (None, 0):
        # YCbCr (BT.601) at the stream's full scale
        half = 1 << (prec - 1)
        yy = smp[:, :, 0].astype(np.float64)
        cb = smp[:, :, 1].astype(np.float64) - half
        cr = smp[:, :, 2].astype(np.float64) - half
        rgb = np.stack(
            [yy + 1.402 * cr, yy - 0.344136 * cb - 0.714136 * cr,
             yy + 1.772 * cb],
            axis=2,
        )
        smp = np.clip(np.round(rgb), 0, (1 << prec) - 1).astype(np.int64)
    if nc == 1:
        smp = np.repeat(smp, 3, axis=2)
    dtype = np.uint8 if prec <= 8 else np.uint16
    return w, h, smp.astype(dtype)
