"""BMP codec (operators/bmp.py) — Windows bitmaps across the real
variant matrix: 24-bit roundtrip (the encoder's form), 1/4/8-bit
palette, 16-bit BITFIELDS (5-6-5), 32-bit BGRX, top-down rows, RLE8
runs/literals/EOL/delta, plus the corruption-fuzz contract.

Extension surface: the binance reference has no media handling; this
backs the multimodal column plumbing (operators/multimodal.py)."""

from __future__ import annotations

import struct
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import pytest

from binance_data_pipeline_spark.operators.bmp import decode_bmp, encode_bmp


def _hdr(w, h, bpp, comp, data_len, palette_entries=0, extra=b""):
    off = 14 + 40 + 4 * palette_entries + len(extra)
    head = b"BM" + struct.pack("<IHHI", off + data_len, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, comp, data_len,
                       0, 0, palette_entries, 0)
    return head + info + extra


def test_bmp_24bit_roundtrip_exact():
    """encode_bmp → decode_bmp pixel-exact, including odd widths whose
    rows need stride padding and the 1x1 edge."""
    rng = np.random.default_rng(5)
    for shape in ((16, 16, 3), (13, 17, 3), (1, 1, 3), (7, 31, 3)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        w, h, out = decode_bmp(encode_bmp(img))
        assert (w, h) == (shape[1], shape[0])
        assert np.array_equal(out, img), shape


def test_bmp_palette_depths():
    """1/4/8-bit palette images, bottom-up: indices map through the
    BGRA color table exactly."""
    rng = np.random.default_rng(6)
    for bpp, k in ((8, 256), (4, 16), (1, 2)):
        pal = rng.integers(0, 256, (k, 3), dtype=np.uint8)
        idx = rng.integers(0, k, (10, 13)).astype(np.uint8)
        w = 13
        if bpp == 8:
            packed = idx
        else:
            bits = np.unpackbits(idx[:, :, None], axis=2, count=8)[:, :, 8 - bpp :]
            flat = bits.reshape(10, -1)
            pad = (-flat.shape[1]) % 8
            flat = np.pad(flat, ((0, 0), (0, pad)))
            packed = np.packbits(flat, axis=1)
        stride = (w * bpp + 31) // 32 * 4
        rows = np.zeros((10, stride), np.uint8)
        rows[:, : packed.shape[1]] = packed[::-1]
        palq = np.zeros((k, 4), np.uint8)
        palq[:, :3] = pal[:, ::-1]
        data = rows.tobytes()
        # palette sits between header and data
        payload = _hdr(w, 10, bpp, 0, len(data), k) + palq.tobytes() + data
        w2, h2, out = decode_bmp(payload)
        assert (w2, h2) == (13, 10)
        assert np.array_equal(out, pal[idx]), bpp


def test_bmp_direct_color_variants():
    """32-bit BGRX decodes exactly; 16-bit 5-6-5 via BITFIELDS with
    top-down rows scales each channel to the full 8-bit range."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (9, 7, 3), dtype=np.uint8)
    rows = np.zeros((9, 7 * 4), np.uint8)
    rows[:, 0::4] = img[::-1, :, 2]
    rows[:, 1::4] = img[::-1, :, 1]
    rows[:, 2::4] = img[::-1, :, 0]
    data = rows.tobytes()
    _, _, out = decode_bmp(_hdr(7, 9, 32, 0, len(data)) + data)
    assert np.array_equal(out, img)

    r = rng.integers(0, 32, (5, 6)).astype(np.uint32)
    g = rng.integers(0, 64, (5, 6)).astype(np.uint32)
    b = rng.integers(0, 32, (5, 6)).astype(np.uint32)
    vals = (r << 11) | (g << 5) | b
    le = vals.astype("<u2").view(np.uint8).reshape(5, -1)
    stride = (6 * 16 + 31) // 32 * 4
    rows = np.zeros((5, stride), np.uint8)
    rows[:, : le.shape[1]] = le
    data = rows.tobytes()
    masks = struct.pack("<III", 0xF800, 0x07E0, 0x001F)
    payload = _hdr(6, -5, 16, 3, len(data), 0, masks) + data  # top-down
    _, _, out = decode_bmp(payload)
    assert np.array_equal(out[:, :, 0], (r * 255 // 31).astype(np.uint8))
    assert np.array_equal(out[:, :, 1], (g * 255 // 63).astype(np.uint8))
    assert np.array_equal(out[:, :, 2], (b * 255 // 31).astype(np.uint8))


def test_bmp_rle8():
    """RLE8: runs, end-of-line, absolute literals and end-of-bitmap."""
    rng = np.random.default_rng(8)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = np.zeros((4, 8), np.uint8)
    idx[1, :] = 3
    idx[2, 2:5] = 7
    idx[3, :4] = [9, 4, 9, 2]  # forces an absolute-mode block
    rle = bytearray()
    for row in idx[::-1]:  # bottom-up
        vals = list(row)
        if len(set(vals[:4])) > 2:  # absolute-mode block (count 4, even)
            rle += bytes([0, 4] + vals[:4])
            vals = vals[4:]
        i = 0
        while i < len(vals):
            j = i
            while j < len(vals) and vals[j] == vals[i]:
                j += 1
            rle += bytes([j - i, vals[i]])
            i = j
        rle += b"\x00\x00"
    data = bytes(rle[:-2] + b"\x00\x01")
    palq = np.zeros((256, 4), np.uint8)
    palq[:, :3] = pal[:, ::-1]
    payload = _hdr(8, 4, 8, 1, len(data), 256)[: 14 + 40] + palq.tobytes() + data
    _, _, out = decode_bmp(payload)
    assert np.array_equal(out, pal[idx])


def test_bmp_corruption_fuzz_never_hangs_or_garbles_silently():
    rng = np.random.default_rng(1234)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    payload = encode_bmp(img)
    for _ in range(200):
        data = bytearray(payload)
        i = int(rng.integers(0, len(data)))
        data[i] ^= int(rng.integers(1, 256))
        try:
            decode_bmp(bytes(data))
        except Exception as e:  # noqa: BLE001 — the contract IS "raises cleanly"
            assert isinstance(
                e, (ValueError, NotImplementedError, IndexError,
                    KeyError, OverflowError, ZeroDivisionError)
            ) or type(e).__module__ in ("zlib", "struct", "builtins"), (
                type(e), e)


def test_bmp_flows_through_multimodal_features_and_resize(spark):
    """image/bmp routes natively (no PIL, no quarantine); identical
    pixels to a PNG give the identical feature vector; the baseline
    resizer round-trips BMP→BMP."""
    from binance_data_pipeline_spark.operators.multimodal import (
        BMP_MIME,
        MEDIA_SCHEMA,
        PNG_MIME,
        baseline_resizer,
        default_decoder,
        encode_png,
        extract_features,
    )

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    rows = [
        (1, "image", PNG_MIME, encode_png(img), 16, 16, None),
        (2, "image", BMP_MIME, encode_bmp(img), 16, 16, None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = extract_features(df, default_decoder(), on_error="quarantine")
    by_id = {r["media_id"]: r for r in out.collect()}
    assert by_id[1]["quarantine_reason"] is None
    assert by_id[2]["quarantine_reason"] is None
    assert by_id[1]["feature"] == by_id[2]["feature"]

    small = baseline_resizer(encode_bmp(img), BMP_MIME, 8, 8)
    w, h, px = decode_bmp(small)
    assert (w, h) == (8, 8) and np.array_equal(px, img[::2, ::2])
