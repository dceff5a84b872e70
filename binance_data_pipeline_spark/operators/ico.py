"""Dependency-free ICO (favicon) codec — web crawls are full of these.
Members are either embedded PNG streams (modern icons — routed to the
native PNG decoder) or headerless BMP DIBs with the doubled-height
XOR+AND mask layout (classic icons — the XOR image decodes through
operators/bmp.py after synthesizing the missing file header and
un-doubling the height; the 1-bit AND mask, or the 32-bpp alpha
channel, then composites transparent pixels to black, matching the
RGB-over-black convention of the rest of the tier).

decode_ico picks the LARGEST member (the training-data-relevant one).
The encoder wraps PNG members — and optionally a classic 24-bpp DIB
member — so both decode paths are pinned by real streams.

Reference scope note: the binance reference pipeline has no media
handling (698 LoC of pandas/Kafka/dbt); this module extends the
multimodal-column surface the build brief requires.
"""

from __future__ import annotations

import struct

__all__ = ["decode_ico", "encode_ico"]


def decode_ico(payload: bytes):
    """Decode the largest member of an ICO to (w, h, HxWx3 uint8)."""
    import numpy as np

    if len(payload) < 6 or payload[:4] not in (b"\x00\x00\x01\x00", b"\x00\x00\x02\x00"):
        raise ValueError("not an ICO payload")
    (count,) = struct.unpack("<H", payload[4:6])
    if count == 0:
        raise ValueError("corrupt ICO: no members")
    best = None
    for i in range(count):
        e = payload[6 + 16 * i : 22 + 16 * i]
        if len(e) < 16:
            raise ValueError("corrupt ICO: truncated directory")
        w = e[0] or 256
        h = e[1] or 256
        size, off = struct.unpack("<II", e[8:16])
        if best is None or w * h > best[0] * best[1]:
            best = (w, h, off, size)
    w, h, off, size = best
    body = payload[off : off + size]
    if len(body) < size:
        raise ValueError("corrupt ICO: member out of range")

    if body[:8] == b"\x89PNG\r\n\x1a\n":
        from .multimodal import decode_png

        return decode_png(body)

    # classic DIB member: BITMAPINFOHEADER with doubled height
    if len(body) < 40:
        raise ValueError("corrupt ICO: truncated DIB member")
    (hdr_size,) = struct.unpack("<I", body[:4])
    bw, bh2 = struct.unpack("<ii", body[4:12])
    planes, bpp = struct.unpack("<HH", body[12:16])
    (clr_used,) = struct.unpack("<I", body[32:36])
    if hdr_size < 40 or bh2 % 2 or bh2 <= 0:
        raise ValueError("corrupt ICO: bad DIB header")
    bh = bh2 // 2
    if not (0 < bw and 0 < bh and bw * bh <= 1 << 26):
        raise ValueError(f"implausible ICO dimensions {bw}x{bh}")

    # synthesize a standalone BMP over the XOR image: un-double the
    # height; the data offset skips header + palette
    pal_n = clr_used or ((1 << bpp) if bpp <= 8 else 0)
    data_off = 14 + hdr_size + 4 * pal_n
    fixed = bytearray(body)
    fixed[8:12] = struct.pack("<i", bh)
    bmp = b"BM" + struct.pack("<IHHI", 14 + len(fixed), 0, 0, data_off) + bytes(fixed)
    from .bmp import decode_bmp

    _, _, px = decode_bmp(bmp)
    px = np.array(px, np.uint8, copy=True)

    if bpp == 32:
        # alpha channel replaces the AND mask: composite over black
        xor_off = hdr_size + 4 * pal_n
        stride = bw * 4
        raw = np.frombuffer(
            body, np.uint8, count=stride * bh, offset=xor_off
        ).reshape(bh, stride)
        alpha = raw[::-1, 3::4].astype(np.float64) / 255.0  # bottom-up
        px = (px.astype(np.float64) * alpha[:, :, None]).round().astype(np.uint8)
        return bw, bh, px

    # 1-bit AND mask follows the XOR image (bottom-up, 4-byte stride)
    xor_stride = (bw * bpp + 31) // 32 * 4
    and_off = hdr_size + 4 * pal_n + xor_stride * bh
    and_stride = (bw + 31) // 32 * 4
    raw = body[and_off : and_off + and_stride * bh]
    if len(raw) == and_stride * bh:  # absent/truncated mask -> opaque
        rows = np.frombuffer(raw, np.uint8).reshape(bh, and_stride)
        mask = np.unpackbits(rows, axis=1)[:, :bw][::-1]  # 1 = transparent
        px[mask == 1] = 0
    return bw, bh, px


def encode_ico(images, classic_bmp: bool = False) -> bytes:
    """Encode HxWx3 uint8 arrays (each <= 256x256) as a multi-member
    ICO. Members are PNG by default (the modern form every browser
    writes); ``classic_bmp`` writes 24-bpp DIB members with an all-
    opaque AND mask instead — exercising the classic decode path."""
    import numpy as np

    from .multimodal import encode_png

    if hasattr(images, "ndim"):
        images = [images]
    members = []
    dims = []
    for img in images:
        img = np.asarray(img, np.uint8)
        h, w, _ = img.shape
        if w > 256 or h > 256:
            raise ValueError(f"ICO members are <=256x256, got {w}x{h}")
        dims.append((w, h))
        if classic_bmp:
            stride = (w * 3 + 3) // 4 * 4
            rows = np.zeros((h, stride), np.uint8)
            rows[:, : 3 * w] = img[::-1, :, ::-1].reshape(h, 3 * w)
            and_stride = (w + 31) // 32 * 4
            dib = struct.pack(
                "<IiiHHIIiiII", 40, w, 2 * h, 1, 24, 0,
                stride * h + and_stride * h, 0, 0, 0, 0,
            ) + rows.tobytes() + b"\x00" * (and_stride * h)
            members.append(dib)
        else:
            members.append(encode_png(img))
    out = bytearray(struct.pack("<HHH", 0, 1, len(members)))
    off = 6 + 16 * len(members)
    for (w, h), m in zip(dims, members):
        out += bytes([w % 256, h % 256, 0, 0])
        out += struct.pack("<HHII", 1, 32, len(m), off)
        off += len(m)
    for m in members:
        out += m
    return bytes(out)
