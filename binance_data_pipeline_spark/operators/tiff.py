"""Dependency-free baseline TIFF codec — extends the multimodal codec
tier (operators/multimodal.py) with the scanned-document / scientific
staple: both byte orders, strip organization, uncompressed + PackBits
+ LZW (TIFF's MSB-first, early-change variant) compression, the
horizontal-differencing predictor, and the baseline photometrics
(bilevel/gray both polarities, RGB, palette) at 1/4/8/16 bits per
sample. First IFD (page) is decoded; tiled and CCITT/JPEG-in-TIFF
files raise NotImplementedError toward the injected-decoder escape
hatch.

The encoder writes 8-bit chunky RGB (uncompressed or PackBits,
multi-strip), so decode(encode(x)) == x EXACTLY — the roundtrip oracle
the tests pin.

Reference scope note: the binance reference pipeline has no media
handling (698 LoC of pandas/Kafka/dbt); this module extends the
multimodal-column surface the build brief requires.
"""

from __future__ import annotations

import struct

__all__ = ["decode_tiff", "encode_tiff"]

TIFF_SIGS = (b"II*\x00", b"MM\x00*")

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def _read_values(payload: bytes, bo: str, typ: int, count: int, raw: bytes):
    """IFD entry values: inline when they fit the 4-byte field, at the
    offset otherwise."""
    size = _TYPE_SIZE.get(typ)
    if size is None:
        raise ValueError(f"corrupt TIFF: field type {typ}")
    total = size * count
    if total > 4:
        (off,) = struct.unpack(bo + "I", raw)
        data = payload[off : off + total]
        if len(data) < total:
            raise ValueError("corrupt TIFF: value offset out of range")
    else:
        data = raw[:total]
    if typ in (1, 6, 7):
        return list(data)
    if typ == 3:
        return list(struct.unpack(bo + "H" * count, data))
    if typ == 4:
        return list(struct.unpack(bo + "I" * count, data))
    if typ == 5:
        parts = struct.unpack(bo + "I" * (2 * count), data)
        return [parts[i] / (parts[i + 1] or 1) for i in range(0, len(parts), 2)]
    return list(data)


def _lzw_decode_tiff(data: bytes, max_out: int) -> bytearray:
    """TIFF-variant LZW: MSB-first code packing, Clear=256, EOI=257,
    EARLY code-width change (widen when the next free code is
    (1<<width)-1, one step sooner than GIF)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def reset() -> int:
        table.clear()
        table.extend(bytes([i]) for i in range(256))
        table.append(b"")  # clear
        table.append(b"")  # EOI
        return 9

    width = reset()
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == CLEAR:
                width = reset()
                prev = None
                continue
            if code == EOI:
                return out
            if code < len(table):
                entry = table[code]
                if not entry:
                    raise ValueError("corrupt TIFF: reserved LZW code")
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
            else:
                raise ValueError("corrupt TIFF: LZW code out of range")
            out += entry
            if len(out) > max_out:
                raise ValueError("corrupt TIFF: LZW output overrun")
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1  # early change
            prev = entry
    return out


def _lzw_encode_tiff(data: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(CLEAR, width)
    run = b""
    for b in data:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = next_code
        next_code += 1
        # width sync against the early-change decoder: its table lags
        # this counter by one (no append on the first post-clear code)
        # and it widens at size (1<<w)-1, so widen here at next_code
        # == 1<<w — the same stream position
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code == 4094:  # near-full: clear (room for 2 more codes)
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        run = bytes([b])
    if run:
        emit(table[run], width)
    emit(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytearray:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1
            chunk = data[i : i + n + 1]
            if len(chunk) < n + 1:
                raise ValueError("corrupt TIFF: truncated PackBits literal")
            out += chunk
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if i >= len(data):
                raise ValueError("corrupt TIFF: truncated PackBits run")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expected:
        raise ValueError("corrupt TIFF: PackBits underrun")
    return out[:expected]


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        j = i
        while j + 1 < n and data[j + 1] == data[j] and j - i < 127:
            j += 1
        if j > i:  # run of j-i+1 identical bytes
            out += bytes([257 - (j - i + 1), data[i]])
            i = j + 1
            continue
        j = i
        while (
            j + 1 < n
            and (j + 2 >= n or data[j + 1] != data[j + 2])
            and j - i < 127
        ):
            j += 1
        out += bytes([j - i]) + data[i : j + 1]
        i = j + 1
    return bytes(out)


def decode_tiff(payload: bytes):
    """Decode the first page of a TIFF to (w, h, HxWx3 uint8) — the
    decode_jpeg/decode_png contract (16-bit samples scale down to
    8-bit; features and resize are RGB-defined)."""
    import numpy as np

    if payload[:4] not in TIFF_SIGS:
        raise ValueError("not a TIFF payload")
    bo = "<" if payload[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack(bo + "I", payload[4:8])
    if ifd_off + 2 > len(payload):
        raise ValueError("corrupt TIFF: IFD offset out of range")
    (n_entries,) = struct.unpack(bo + "H", payload[ifd_off : ifd_off + 2])
    tags: dict[int, list] = {}
    for i in range(n_entries):
        eoff = ifd_off + 2 + 12 * i
        ent = payload[eoff : eoff + 12]
        if len(ent) < 12:
            raise ValueError("corrupt TIFF: truncated IFD")
        tag, typ, count = struct.unpack(bo + "HHI", ent[:8])
        tags[tag] = _read_values(payload, bo, typ, count, ent[8:12])

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"corrupt TIFF: missing tag {tag}")
            return default
        return v[0]

    if 322 in tags or 323 in tags:
        raise NotImplementedError("tiled TIFF")
    w = int(one(256))
    h = int(one(257))
    if not (0 < w and 0 < h and w * h <= 1 << 28):
        raise ValueError(f"implausible TIFF dimensions {w}x{h}")
    comp = int(one(259, 1))
    photo = int(one(262))
    spp = int(one(277, 1))
    bps_list = tags.get(258, [1])
    if len(set(bps_list)) != 1:
        raise NotImplementedError("mixed bits-per-sample")
    bps = int(bps_list[0])
    if len(bps_list) not in (1, spp):
        raise ValueError("corrupt TIFF: BitsPerSample count")
    planar = int(one(284, 1))
    predictor = int(one(317, 1))
    rps = int(one(278, h))
    offsets = tags.get(273)
    counts = tags.get(279)
    if offsets is None or counts is None or len(offsets) != len(counts):
        raise ValueError("corrupt TIFF: missing strip layout")
    if planar != 1:
        raise NotImplementedError("planar TIFF")
    if comp not in (1, 5, 32773):
        raise NotImplementedError(f"TIFF compression {comp} (CCITT/JPEG)")
    if photo not in (0, 1, 2, 3):
        raise NotImplementedError(f"TIFF photometric {photo}")
    if bps not in (1, 4, 8, 16):
        raise NotImplementedError(f"{bps}-bit TIFF samples")
    if photo == 2 and spp < 3:
        raise ValueError("corrupt TIFF: RGB needs 3 samples")
    if photo in (0, 1, 3) and spp not in (1, 2):
        raise NotImplementedError("multi-channel grayscale TIFF")
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor}")
    if predictor == 2 and bps not in (8, 16):
        raise ValueError("corrupt TIFF: predictor on sub-byte samples")

    row_bytes = (w * spp * bps + 7) // 8
    rows = []
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        nrows = min(rps, h - si * rps)
        if nrows <= 0:
            break
        raw = payload[off : off + cnt]
        if len(raw) < cnt:
            raise ValueError("corrupt TIFF: strip out of range")
        expected = row_bytes * nrows
        if comp == 1:
            if len(raw) < expected:
                raise ValueError("corrupt TIFF: short strip")
            strip = raw[:expected]
        elif comp == 32773:
            strip = bytes(_packbits_decode(raw, expected))
        else:
            strip = bytes(_lzw_decode_tiff(raw, expected))
            if len(strip) < expected:
                raise ValueError("corrupt TIFF: LZW strip underrun")
            strip = strip[:expected]
        rows.append(np.frombuffer(strip, np.uint8).reshape(nrows, row_bytes))
    if not rows:
        raise ValueError("corrupt TIFF: no strips")
    grid = np.concatenate(rows, axis=0)
    if grid.shape[0] < h:
        raise ValueError("corrupt TIFF: strips cover too few rows")

    if bps == 16:
        vals = (
            np.ascontiguousarray(grid[:, : 2 * w * spp])
            .view(np.dtype(bo + "u2")).reshape(h, w, spp).astype(np.uint32)
        )
        if predictor == 2:
            vals = np.cumsum(vals, axis=1, dtype=np.uint32) & 0xFFFF
        sample = (vals >> 8).astype(np.uint8)
    elif bps == 8:
        sample = grid[:, : w * spp].reshape(h, w, spp)
        if predictor == 2:
            sample = (
                np.cumsum(sample.astype(np.uint32), axis=1) & 0xFF
            ).astype(np.uint8)
    else:
        bits = np.unpackbits(grid, axis=1)
        if bps == 1:
            sample = bits[:, : w * spp].reshape(h, w, spp)
        else:
            sample = (
                bits.reshape(h, -1, 4) * np.array([8, 4, 2, 1], np.uint8)
            ).sum(axis=2)[:, : w * spp].reshape(h, w, spp).astype(np.uint8)

    if photo == 2:
        px = sample[:, :, :3]
    elif photo == 3:
        pal = tags.get(320)
        if pal is None or len(pal) < 3 * (1 << bps):
            raise ValueError("corrupt TIFF: missing palette")
        n = 1 << bps
        lut = (np.array(pal[: 3 * n], np.uint32).reshape(3, n).T >> 8).astype(
            np.uint8
        )
        idx = sample[:, :, 0]
        if int(idx.max(initial=0)) >= n:
            raise ValueError("corrupt TIFF: palette index out of range")
        px = lut[idx]
    else:  # gray, either polarity
        g = sample[:, :, 0]
        full = (1 << bps) - 1
        if bps < 8:
            g = (g.astype(np.uint32) * 255 // full).astype(np.uint8)
        if photo == 0:  # MinIsWhite
            g = 255 - g
        px = np.repeat(g[:, :, None], 3, axis=2)
    return w, h, np.ascontiguousarray(px)


def encode_tiff(pixels, compression: str = "none", rows_per_strip: int = 64) -> bytes:
    """Encode an HxWx3 uint8 RGB array as chunky baseline TIFF
    (little-endian, multi-strip). ``compression``: "none", "packbits"
    or "lzw". Decodes back pixel-exactly."""
    import numpy as np

    px = np.asarray(pixels, np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_tiff expects an HxWx3 RGB array")
    comp_id = {"none": 1, "packbits": 32773, "lzw": 5}.get(compression)
    if comp_id is None:
        raise ValueError(f"unknown TIFF compression {compression!r}")
    h, w, _ = px.shape
    rps = max(1, min(rows_per_strip, h))
    strips = []
    for y0 in range(0, h, rps):
        raw = px[y0 : y0 + rps].tobytes()
        if comp_id == 32773:
            raw = _packbits_encode(raw)
        elif comp_id == 5:
            raw = _lzw_encode_tiff(raw)
        strips.append(raw)
    n = len(strips)

    entries = []  # (tag, type, count, packed-or-values)

    def ent(tag, typ, values):
        entries.append((tag, typ, values))

    ent(256, 4, [w])
    ent(257, 4, [h])
    ent(258, 3, [8, 8, 8])
    ent(259, 3, [comp_id])
    ent(262, 3, [2])  # RGB
    ent(273, 4, [0] * n)  # patched below
    ent(277, 3, [3])
    ent(278, 4, [rps])
    ent(279, 4, [len(s) for s in strips])

    header = struct.pack("<2sHI", b"II", 42, 8)
    ifd_size = 2 + 12 * len(entries) + 4
    # layout: header | IFD | overflow values | strip data
    overflow = bytearray()
    fields = bytearray()
    overflow_base = 8 + ifd_size

    def pack_values(typ, values):
        fmt = {3: "H", 4: "I"}[typ]
        return b"".join(struct.pack("<" + fmt, v) for v in values)

    data_base = None  # computed after overflow is known: two passes
    for patch_pass in (0, 1):
        overflow = bytearray()
        fields = bytearray()
        for tag, typ, values in entries:
            if tag == 273 and patch_pass == 1:
                pos = data_base
                values = []
                for s in strips:
                    values.append(pos)
                    pos += len(s)
            raw = pack_values(typ, values)
            if len(raw) <= 4:
                field = raw + b"\x00" * (4 - len(raw))
            else:
                field = struct.pack("<I", overflow_base + len(overflow))
                overflow += raw
            fields += struct.pack("<HHI", tag, typ, len(values)) + field
        if patch_pass == 0:
            data_base = overflow_base + len(overflow)

    out = bytearray(header)
    out += struct.pack("<H", len(entries)) + fields + struct.pack("<I", 0)
    out += overflow
    for s in strips:
        out += s
    return bytes(out)
