"""Dependency-free GIF codec (GIF87a/89a) — extends the multimodal
codec tier (operators/multimodal.py) with the web's most common
animated format: LZW decode with variable code widths and deferred
clear, interlacing, global/local color tables, transparency, and
frame compositing per the 89a disposal methods. `decode_gif_frames`
returns real timestamped frames, giving the frame-sampling path
(multimodal.sample_frames) an actual decodable format instead of the
video stub.

The encoder writes full-frame images with exact palettes (per-frame
local color tables built from the unique colors, <=256 per frame), so
decode(encode(frames)) == frames EXACTLY — the roundtrip oracle the
tests pin. Arbitrary-color inputs must be quantized by the caller
(raising beats silently lossy re-palettization in a data pipeline).

Reference scope note: the binance reference pipeline has no media
handling (698 LoC of pandas/Kafka/dbt); this module extends the
multimodal-column surface the build brief requires.
"""

from __future__ import annotations

import struct

__all__ = ["decode_gif", "decode_gif_frames", "encode_gif"]

GIF_SIGS = (b"GIF87a", b"GIF89a")

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytearray:
    """GIF-variant LZW: LSB-first codes, widths (min+1)..12, clear/EOI
    codes, deferred-clear tolerated (dict pinned at 4096 until a clear
    arrives). Stops after ``expected`` pixels — trailing junk in the
    sub-blocks is ignored, truncation raises."""
    if not (2 <= min_code_size <= 11):
        raise ValueError(f"corrupt GIF: LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    table: list[bytes] = []

    def reset() -> int:
        table.clear()
        table.extend(bytes([i]) for i in range(clear))
        table.append(b"")  # clear
        table.append(b"")  # EOI
        return min_code_size + 1

    width = reset()
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                width = reset()
                prev = None
                continue
            if code == eoi:
                if len(out) < expected:
                    raise ValueError("corrupt GIF: early EOI in LZW stream")
                return out
            if code < len(table):
                entry = table[code]
                if not entry:
                    raise ValueError("corrupt GIF: reserved LZW code")
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
            else:
                raise ValueError("corrupt GIF: LZW code out of range")
            out += entry
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
            prev = entry
            if len(out) >= expected:
                return out
    if len(out) < expected:
        raise ValueError(
            f"corrupt GIF: LZW gave {len(out)}/{expected} pixels"
        )
    return out


def _lzw_encode(indices, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    run = b""
    for px in indices:
        cand = run + bytes([px])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # width sync: the decoder's table lags this counter by one
            # (its first post-clear code appends nothing), so its size
            # at the next read is next_code-1 — widen exactly when IT
            # does ("late change", per the GIF89a LZW convention)
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:  # table full: clear and start over
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        run = bytes([px])
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------


def decode_gif_frames(payload: bytes, max_frames: int | None = None):
    """Decode a GIF into composited frames. Returns
    (w, h, [(timestamp_ms, HxWx3 uint8 array), ...]) — timestamps
    accumulate the per-frame delays (first frame at 0). Disposal
    methods 0/1 (leave), 2 (restore background), 3 (restore previous)
    and transparency are honored; interlaced images are de-interlaced."""
    import numpy as np

    if payload[:6] not in GIF_SIGS:
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("corrupt GIF: truncated header")
    w, h = struct.unpack("<HH", payload[6:10])
    packed, bg_idx, _aspect = payload[10], payload[11], payload[12]
    if not (0 < w and 0 < h and w * h <= 1 << 28):
        raise ValueError(f"implausible GIF dimensions {w}x{h}")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], np.uint8)
        if gct.size < 3 * n:
            raise ValueError("corrupt GIF: truncated global color table")
        gct = gct.reshape(-1, 3)
        pos += 3 * n

    # canvas starts at the background color (or black without a GCT)
    if gct is not None and bg_idx < len(gct):
        canvas = np.tile(gct[bg_idx], (h, w, 1)).astype(np.uint8)
    else:
        canvas = np.zeros((h, w, 3), np.uint8)

    frames: list[tuple[int, object]] = []
    ts_ms = 0
    delay_ms = 0
    transparent: int | None = None
    disposal = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(payload):
                raise ValueError("corrupt GIF: truncated extension")
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                sz = payload[pos]
                if sz >= 4:
                    gpk = payload[pos + 1]
                    (delay_cs,) = struct.unpack(
                        "<H", payload[pos + 2 : pos + 4]
                    )
                    delay_ms = delay_cs * 10
                    disposal = (gpk >> 2) & 0x7
                    transparent = payload[pos + 4] if gpk & 1 else None
            # skip sub-blocks (any extension)
            while pos < len(payload) and payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"corrupt GIF: unknown block 0x{block:02x}")

        # image descriptor
        left, top, iw, ih = struct.unpack("<HHHH", payload[pos : pos + 8])
        ipk = payload[pos + 8]
        pos += 9
        if iw == 0 or ih == 0 or left + iw > w or top + ih > h:
            raise ValueError("corrupt GIF: image rect outside canvas")
        ct = gct
        if ipk & 0x80:
            n = 2 << (ipk & 0x07)
            ct = np.frombuffer(payload[pos : pos + 3 * n], np.uint8)
            if ct.size < 3 * n:
                raise ValueError("corrupt GIF: truncated local color table")
            ct = ct.reshape(-1, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("corrupt GIF: no color table for image")
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        while pos < len(payload) and payload[pos]:
            sz = payload[pos]
            data += payload[pos + 1 : pos + 1 + sz]
            pos += 1 + sz
        pos += 1

        idx = np.frombuffer(
            bytes(_lzw_decode(bytes(data), min_code, iw * ih)), np.uint8
        )[: iw * ih].reshape(ih, iw)
        if ipk & 0x40:  # interlaced: reorder rows
            de = np.empty_like(idx)
            src = 0
            for start, step in _INTERLACE_PASSES:
                rows = range(start, ih, step)
                de[list(rows)] = idx[src : src + len(rows)]
                src += len(rows)
            idx = de
        if int(idx.max(initial=0)) >= len(ct):
            raise ValueError("corrupt GIF: pixel index outside color table")

        before = canvas.copy() if disposal == 3 else None
        rect = canvas[top : top + ih, left : left + iw]
        painted = ct[idx]
        if transparent is not None:
            mask = idx != transparent
            rect[mask] = painted[mask]
        else:
            rect[:] = painted
        frames.append((ts_ms, canvas.copy()))
        ts_ms += max(delay_ms, 10)  # zero-delay frames still advance

        if disposal == 2:  # restore rect to background
            if gct is not None and bg_idx < len(gct):
                canvas[top : top + ih, left : left + iw] = gct[bg_idx]
            else:
                canvas[top : top + ih, left : left + iw] = 0
        elif disposal == 3 and before is not None:
            canvas = before
        delay_ms = 0
        transparent = None
        disposal = 0
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        raise ValueError("corrupt GIF: no image data")
    return w, h, frames


def decode_gif(payload: bytes):
    """First composited frame as (w, h, HxWx3 uint8) — the
    decode_jpeg/decode_png contract, for the feature path."""
    w, h, frames = decode_gif_frames(payload, max_frames=1)
    return w, h, frames[0][1]


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------


def encode_gif(
    frames, delays_ms=None, transparent_color=None, interlace: bool = False,
    loop: bool = True,
) -> bytes:
    """Encode one HxWx3 uint8 array or a list of same-shaped arrays as
    GIF89a. Every frame is written full-size with its own exact local
    color table (<=256 unique colors per frame — more raises; quantize
    upstream), so the decode roundtrip is pixel-exact.
    ``transparent_color`` (an (r, g, b) tuple) marks that color
    transparent in every frame it appears in."""
    import numpy as np

    if hasattr(frames, "ndim"):
        frames = [frames]
    frames = [np.asarray(f, np.uint8) for f in frames]
    if not frames or any(f.ndim != 3 or f.shape[2] != 3 for f in frames):
        raise ValueError("encode_gif expects HxWx3 uint8 frames")
    h, w, _ = frames[0].shape
    if any(f.shape != (h, w, 3) for f in frames):
        raise ValueError("all frames must share one size")
    if not (0 < h < 65536 and 0 < w < 65536):
        raise ValueError(f"dimensions out of GIF range: {w}x{h}")
    if delays_ms is None:
        delays_ms = [100] * len(frames)
    if len(delays_ms) != len(frames):
        raise ValueError("delays_ms must match frames")

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x00, 0, 0])  # no GCT; background index 0
    if loop and len(frames) > 1:  # NETSCAPE2.0 infinite loop
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"

    for frame, delay in zip(frames, delays_ms):
        colors, inverse = np.unique(
            frame.reshape(-1, 3), axis=0, return_inverse=True
        )
        if len(colors) > 256:
            raise ValueError(
                f"frame has {len(colors)} colors; GIF allows 256 — "
                "quantize upstream"
            )
        tbits = max(int(len(colors) - 1).bit_length(), 1)
        tsize = 1 << tbits
        palette = np.zeros((tsize, 3), np.uint8)
        palette[: len(colors)] = colors
        indices = inverse.astype(np.uint8).reshape(h, w)

        tr_idx = None
        if transparent_color is not None:
            hit = np.where(
                (colors == np.asarray(transparent_color, np.uint8)).all(axis=1)
            )[0]
            if hit.size:
                tr_idx = int(hit[0])
        gpk = 0x01 if tr_idx is not None else 0x00
        out += b"\x21\xf9\x04" + bytes([gpk])
        out += struct.pack("<H", max(delay, 0) // 10)
        out += bytes([tr_idx or 0, 0])

        ipk = 0x80 | (tbits - 1) | (0x40 if interlace else 0)
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([ipk])
        out += palette.tobytes()
        if interlace:
            rows = []
            for start, step in _INTERLACE_PASSES:
                rows.extend(range(start, h, step))
            indices = indices[rows]
        min_code = max(tbits, 2)
        out += bytes([min_code])
        data = _lzw_encode(indices.reshape(-1), min_code)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
