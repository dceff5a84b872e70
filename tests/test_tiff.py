"""Baseline TIFF codec (operators/tiff.py) — strip organization, both
byte orders, none/PackBits/LZW compression (TIFF's MSB-first
early-change LZW), horizontal predictor, and the baseline photometrics
(bilevel/gray both polarities, RGB, palette) at 1/4/8/16 bits.
Oracle: encode_tiff roundtrips pixel-exactly; foreign variants are
hand-built byte streams.

Extension surface: the binance reference has no media handling; this
backs the multimodal column plumbing (operators/multimodal.py)."""

from __future__ import annotations

import struct
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import pytest

from binance_data_pipeline_spark.operators.tiff import (
    _lzw_encode_tiff,
    _packbits_encode,
    decode_tiff,
    encode_tiff,
)


def _build(bo, tag_rows, data):
    """Minimal single-strip TIFF builder: tag_rows are (tag, type,
    values) with the strip-offset row using the sentinel value -1."""
    n = len(tag_rows)
    base = 8 + 2 + 12 * n + 4
    data_off = 0  # first pass: placeholder; second pass: real offset
    for _pass in range(2):
        overflow = bytearray()
        fields = []
        for tag, typ, values in tag_rows:
            vals = [data_off if v == -1 else v for v in values]
            fmt = {3: "H", 4: "I"}[typ]
            raw = b"".join(struct.pack(bo + fmt, v) for v in vals)
            if len(raw) <= 4:
                field = raw + b"\x00" * (4 - len(raw))
            else:
                field = struct.pack(bo + "I", base + len(overflow))
                overflow += raw
            fields.append(struct.pack(bo + "HHI", tag, typ, len(vals)) + field)
        data_off = base + len(overflow)
    out = struct.pack(bo + "2sHI", b"II" if bo == "<" else b"MM", 42, 8)
    out += struct.pack(bo + "H", n) + b"".join(fields) + struct.pack(bo + "I", 0)
    return out + overflow + data


def test_tiff_roundtrip_exact_all_compressions_and_strips():
    rng = np.random.default_rng(5)
    for shape in ((16, 16, 3), (13, 17, 3), (1, 1, 3), (120, 90, 3)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        for comp in ("none", "packbits", "lzw"):
            for rps in (1, 7, 10000):
                w, h, out = decode_tiff(
                    encode_tiff(img, compression=comp, rows_per_strip=rps)
                )
                assert (w, h) == (shape[1], shape[0])
                assert np.array_equal(out, img), (shape, comp, rps)


def test_tiff_compression_actually_compresses():
    """PackBits and LZW both beat uncompressed on low-entropy content —
    and LZW's variable-width growth (table past 511/1023 codes) is
    exercised by a large noise image roundtrip above."""
    rng = np.random.default_rng(6)
    smooth = np.repeat(np.repeat(rng.integers(0, 4, (30, 40), dtype=np.uint8) * 60, 5, 0), 5, 1)
    img = np.stack([smooth] * 3, -1)
    sizes = {c: len(encode_tiff(img, compression=c))
             for c in ("none", "packbits", "lzw")}
    assert sizes["lzw"] < sizes["packbits"] < sizes["none"]


def test_tiff_gray_polarities_and_bilevel():
    """Hand-built foreign streams: 8-bit gray in both photometric
    polarities, and 1-bit bilevel under PackBits."""
    rng = np.random.default_rng(7)
    g = rng.integers(0, 256, (9, 11), dtype=np.uint8)
    for photo, expect in ((1, g), (0, 255 - g)):
        data = g.tobytes()
        t = _build("<", [
            (256, 4, [11]), (257, 4, [9]), (258, 3, [8]), (259, 3, [1]),
            (262, 3, [photo]), (273, 4, [-1]), (277, 3, [1]),
            (278, 4, [9]), (279, 4, [len(data)]),
        ], data)
        out = decode_tiff(t)[2]
        assert np.array_equal(out[:, :, 0], expect), photo
        assert np.array_equal(out[:, :, 1], expect), photo

    bw = rng.integers(0, 2, (10, 20), dtype=np.uint8)
    data = _packbits_encode(np.packbits(bw, axis=1).tobytes())
    t = _build("<", [
        (256, 4, [20]), (257, 4, [10]), (258, 3, [1]), (259, 3, [32773]),
        (262, 3, [1]), (273, 4, [-1]), (277, 3, [1]),
        (278, 4, [10]), (279, 4, [len(data)]),
    ], data)
    assert np.array_equal(decode_tiff(t)[2][:, :, 0], bw * 255)


def test_tiff_palette_and_16bit_bigendian_predictor_lzw():
    """4-bit palette (16-bit color map scaled to 8), and 16-bit RGB in
    BIG-endian order under LZW with the horizontal predictor."""
    rng = np.random.default_rng(8)
    pal16 = rng.integers(0, 65536, (16, 3), dtype=np.uint16)
    idx = rng.integers(0, 16, (6, 9)).astype(np.uint8)
    packed = np.zeros((6, (9 * 4 + 7) // 8), np.uint8)
    for y in range(6):
        for x in range(9):
            packed[y, x // 2] |= idx[y, x] << (4 if x % 2 == 0 else 0)
    data = packed.tobytes()
    palvals = ([int(v) for v in pal16[:, 0]] + [int(v) for v in pal16[:, 1]]
               + [int(v) for v in pal16[:, 2]])
    t = _build("<", [
        (256, 4, [9]), (257, 4, [6]), (258, 3, [4]), (259, 3, [1]),
        (262, 3, [3]), (273, 4, [-1]), (277, 3, [1]),
        (278, 4, [6]), (279, 4, [len(data)]), (320, 3, palvals),
    ], data)
    assert np.array_equal(decode_tiff(t)[2], (pal16[idx] >> 8).astype(np.uint8))

    img16 = rng.integers(0, 65536, (5, 7, 3), dtype=np.uint16)
    diff = img16.astype(np.int64).copy()
    diff[:, 1:, :] = (
        img16[:, 1:, :].astype(np.int64) - img16[:, :-1, :].astype(np.int64)
    ) & 0xFFFF
    data = _lzw_encode_tiff(diff.astype(">u2").tobytes())
    t = _build(">", [
        (256, 4, [7]), (257, 4, [5]), (258, 3, [16, 16, 16]), (259, 3, [5]),
        (262, 3, [2]), (273, 4, [-1]), (277, 3, [3]),
        (278, 4, [5]), (279, 4, [len(data)]), (317, 3, [2]),
    ], data)
    assert np.array_equal(decode_tiff(t)[2], (img16 >> 8).astype(np.uint8))


def test_tiff_unsupported_routes_to_escape_hatch():
    """Tiled layout raises NotImplementedError (PIL fallthrough path),
    unknown compression too; both are clean raises, not garbles."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    t = bytearray(encode_tiff(img))
    # patch the compression tag (259) value to CCITT G4 (4)
    n = struct.unpack("<H", t[8:10])[0]
    for i in range(n):
        off = 10 + 12 * i
        if struct.unpack("<H", t[off : off + 2])[0] == 259:
            t[off + 8 : off + 10] = struct.pack("<H", 4)
    with pytest.raises(NotImplementedError, match="compression"):
        decode_tiff(bytes(t))


def test_tiff_corruption_fuzz_never_hangs_or_garbles_silently():
    rng = np.random.default_rng(1234)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    for payload in (encode_tiff(img), encode_tiff(img, compression="lzw"),
                    encode_tiff(img, compression="packbits")):
        for _ in range(120):
            data = bytearray(payload)
            i = int(rng.integers(0, len(data)))
            data[i] ^= int(rng.integers(1, 256))
            try:
                decode_tiff(bytes(data))
            except Exception as e:  # noqa: BLE001 — the contract IS "raises cleanly"
                assert isinstance(
                    e, (ValueError, NotImplementedError, IndexError,
                        KeyError, OverflowError, ZeroDivisionError,
                        MemoryError)
                ) or type(e).__module__ in ("zlib", "struct", "builtins"), (
                    type(e), e)


def test_tiff_flows_through_multimodal_features_and_resize(spark):
    """image/tiff routes natively (no PIL, no quarantine); identical
    pixels to a PNG give the identical feature vector; the baseline
    resizer round-trips TIFF→TIFF (PackBits)."""
    from binance_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        PNG_MIME,
        TIFF_MIME,
        baseline_resizer,
        default_decoder,
        encode_png,
        extract_features,
    )

    rng = np.random.default_rng(10)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    rows = [
        (1, "image", PNG_MIME, encode_png(img), 16, 16, None),
        (2, "image", TIFF_MIME, encode_tiff(img, compression="lzw"),
         16, 16, None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = extract_features(df, default_decoder(), on_error="quarantine")
    by_id = {r["media_id"]: r for r in out.collect()}
    assert by_id[1]["quarantine_reason"] is None
    assert by_id[2]["quarantine_reason"] is None
    assert by_id[1]["feature"] == by_id[2]["feature"]

    small = baseline_resizer(encode_tiff(img), TIFF_MIME, 8, 8)
    w, h, px = decode_tiff(small)
    assert (w, h) == (8, 8) and np.array_equal(px, img[::2, ::2])
