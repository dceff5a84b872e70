"""ICO/favicon codec (operators/ico.py) — PNG members, classic
doubled-height DIB members with AND-mask / 32-bpp-alpha compositing,
largest-member selection, and the multimodal routing.

Extension surface: the binance reference has no media handling; this
backs the multimodal column plumbing (operators/multimodal.py)."""

from __future__ import annotations

import struct
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import pytest

from binance_data_pipeline_spark.operators.ico import decode_ico, encode_ico


def test_ico_png_members_largest_selected():
    rng = np.random.default_rng(5)
    small = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    big = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
    w, h, out = decode_ico(encode_ico([small, big]))
    assert (w, h) == (48, 48) and np.array_equal(out, big)

    full = rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)
    w, h, out = decode_ico(encode_ico([full]))  # 256 encodes as 0
    assert (w, h) == (256, 256) and np.array_equal(out, full)


def test_ico_classic_dib_member_and_mask():
    """24-bpp DIB member roundtrips; a hand-set AND mask bit turns its
    pixel black (transparent-over-black convention)."""
    rng = np.random.default_rng(6)
    img = rng.integers(1, 256, (8, 8, 3), dtype=np.uint8)  # nonzero pixels
    ico = bytearray(encode_ico([img], classic_bmp=True))
    w, h, out = decode_ico(bytes(ico))
    assert np.array_equal(out, img)

    # set the AND-mask bit for pixel (0, 0): mask rows are bottom-up
    # after the XOR rows, 4-byte stride
    (off,) = struct.unpack("<I", ico[18:22])
    and_off = off + 40 + ((8 * 24 + 31) // 32 * 4) * 8 + 4 * 7  # last row
    ico[and_off] |= 0x80
    out = decode_ico(bytes(ico))[2]
    assert tuple(out[0, 0]) == (0, 0, 0)
    assert np.array_equal(out[1:], img[1:])


def test_ico_32bpp_alpha_composites():
    """A hand-built 32-bpp member: alpha scales RGB toward black."""
    w = h = 4
    rgb = np.full((h, w, 3), 200, np.uint8)
    alpha = np.zeros((h, w), np.uint8)
    alpha[0, :] = 255
    alpha[1, :] = 128
    rows = np.zeros((h, w * 4), np.uint8)
    rows[:, 0::4] = rgb[::-1, :, 2]
    rows[:, 1::4] = rgb[::-1, :, 1]
    rows[:, 2::4] = rgb[::-1, :, 0]
    rows[:, 3::4] = alpha[::-1]
    and_stride = (w + 31) // 32 * 4
    dib = struct.pack("<IiiHHIIiiII", 40, w, 2 * h, 1, 32, 0, 0, 0, 0, 0, 0)
    dib += rows.tobytes() + b"\x00" * (and_stride * h)
    ico = struct.pack("<HHH", 0, 1, 1)
    ico += bytes([w, h, 0, 0]) + struct.pack("<HHII", 1, 32, len(dib), 22)
    ico += dib
    out = decode_ico(ico)[2]
    assert tuple(out[0, 0]) == (200, 200, 200)
    assert tuple(out[1, 0]) == (100, 100, 100)  # 200 * 128/255 rounded
    assert tuple(out[2, 0]) == (0, 0, 0)


def test_ico_corruption_fuzz_never_hangs_or_garbles_silently():
    rng = np.random.default_rng(1234)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    for payload in (encode_ico([img]), encode_ico([img], classic_bmp=True)):
        for _ in range(150):
            data = bytearray(payload)
            i = int(rng.integers(0, len(data)))
            data[i] ^= int(rng.integers(1, 256))
            try:
                decode_ico(bytes(data))
            except Exception as e:  # noqa: BLE001 — the contract IS "raises cleanly"
                assert isinstance(
                    e, (ValueError, NotImplementedError, IndexError,
                        KeyError, OverflowError, ZeroDivisionError,
                        MemoryError)
                ) or type(e).__module__ in ("zlib", "struct", "builtins"), (
                    type(e), e)


def test_ico_flows_through_multimodal_features(spark):
    from binance_data_pipeline_spark.operators.multimodal import (
        ICO_MIME,
        ICO_MIME_ALT,
        MEDIA_SCHEMA,
        PNG_MIME,
        default_decoder,
        encode_png,
        extract_features,
    )

    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    rows = [
        (1, "image", PNG_MIME, encode_png(img), 32, 32, None),
        (2, "image", ICO_MIME, encode_ico([img]), 32, 32, None),
        (3, "image", ICO_MIME_ALT, encode_ico([img], classic_bmp=True),
         32, 32, None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = extract_features(df, default_decoder(), on_error="quarantine")
    by_id = {r["media_id"]: r for r in out.collect()}
    assert all(by_id[i]["quarantine_reason"] is None for i in (1, 2, 3))
    assert by_id[1]["feature"] == by_id[2]["feature"] == by_id[3]["feature"]
