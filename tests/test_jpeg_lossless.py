"""Lossless JPEG (operators/jpeg_lossless.py, SOF3 / T.81 Annex H) —
the predictive process of DICOM-style corpora, with the strongest
oracle in the codec tier: decode(encode(x)) == x EXACTLY, for every
predictor and precision.

Extension surface: the binance reference has no media handling; this
backs the multimodal column plumbing (operators/multimodal.py)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import pytest

from binance_data_pipeline_spark.operators.jpeg import JPEG_SIG, decode_jpeg
from binance_data_pipeline_spark.operators.jpeg_lossless import (
    encode_jpeg_lossless,
)


def test_lossless_roundtrip_exact_all_predictors():
    """Every predictor (1-7), structured and noise RGB, decoded through
    the public decode_jpeg router: pixel-exact."""
    rng = np.random.default_rng(5)
    y, x = np.mgrid[0:19, 0:23]
    grad = np.stack([x * 255 // 22, y * 255 // 18, (x + y) * 3 % 256],
                    axis=2).astype(np.uint8)
    noise = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    for p in range(1, 8):
        for img in (grad, noise):
            w, h, out = decode_jpeg(encode_jpeg_lossless(img, predictor=p))
            assert (w, h) == (img.shape[1], img.shape[0])
            assert out.dtype == np.uint8 and np.array_equal(out, img), p


def test_lossless_grayscale_and_wide_precision():
    """1-component streams replicate to the HxWx3 contract; 12-bit
    (medical) and full 16-bit data keep their dynamic range as uint16 —
    exact, including 0/65535 extremes (the modulo-2^16 SSSS=16 path)."""
    rng = np.random.default_rng(6)
    g = rng.integers(0, 256, (13, 17), dtype=np.uint8)
    _, _, out = decode_jpeg(encode_jpeg_lossless(g, predictor=2))
    assert out.dtype == np.uint8
    assert all(np.array_equal(out[:, :, c], g) for c in range(3))

    m12 = rng.integers(0, 4096, (21, 15)).astype(np.uint16)
    _, _, out = decode_jpeg(encode_jpeg_lossless(m12, predictor=4, precision=12))
    assert out.dtype == np.uint16 and np.array_equal(out[:, :, 0], m12)

    m16 = rng.integers(0, 65536, (9, 11)).astype(np.uint16)
    m16[0, :2] = (0, 65535)
    m16[1, :2] = (65535, 0)
    _, _, out = decode_jpeg(encode_jpeg_lossless(m16, predictor=7))
    assert out.dtype == np.uint16 and np.array_equal(out[:, :, 0], m16)

    one = np.array([[[7, 200, 33]]], np.uint8)  # 1x1 edge
    assert np.array_equal(decode_jpeg(encode_jpeg_lossless(one))[2], one)


def test_lossless_container_and_color_convention():
    """SOF3 + Adobe APP14 transform=0 (RGB, what the encoder writes);
    patching the transform byte flips decode onto the YCbCr branch —
    still decodes, different pixels. Bad predictor / out-of-range
    samples are loud errors."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    data = encode_jpeg_lossless(img, predictor=4)
    assert data.startswith(JPEG_SIG) and data.endswith(b"\xff\xd9")
    assert b"\xff\xc3" in data and b"\xff\xc0" not in data
    assert b"Adobe" in data

    patched = bytearray(data)
    patched[bytes(patched).find(b"Adobe") + 11] = 1  # transform -> YCbCr
    _, _, out = decode_jpeg(bytes(patched))
    assert out.shape == img.shape and not np.array_equal(out, img)

    with pytest.raises(ValueError, match="predictor"):
        encode_jpeg_lossless(img, predictor=8)
    with pytest.raises(ValueError, match="range"):
        encode_jpeg_lossless(img.astype(np.uint16) + 300, precision=8)


def test_lossless_corruption_fuzz_never_hangs_or_garbles_silently():
    """Same robustness pin as the other codec tiers: any byte flip
    either decodes to something or raises a catchable error."""
    rng = np.random.default_rng(1234)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    payload = encode_jpeg_lossless(img, predictor=4)
    for _ in range(120):
        data = bytearray(payload)
        i = int(rng.integers(0, len(data)))
        data[i] ^= int(rng.integers(1, 256))
        try:
            decode_jpeg(bytes(data))
        except Exception as e:  # noqa: BLE001 — the contract IS "raises cleanly"
            assert isinstance(
                e, (ValueError, NotImplementedError, IndexError,
                    KeyError, OverflowError, ZeroDivisionError)
            ) or type(e).__module__ in ("zlib", "struct", "builtins"), (
                type(e), e)


def test_lossless_flows_through_multimodal_features(spark):
    """A lossless payload decodes natively through default_decoder /
    extract_features (no PIL, no quarantine); identical pixels to a PNG
    encoding give the identical feature vector."""
    from binance_data_pipeline_spark.operators.multimodal import (
        JPEG_MIME,
        MEDIA_SCHEMA,
        PNG_MIME,
        default_decoder,
        encode_png,
        extract_features,
    )

    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    rows = [
        (1, "image", PNG_MIME, encode_png(img), 16, 16, None),
        (2, "image", JPEG_MIME, encode_jpeg_lossless(img), 16, 16, None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = extract_features(df, default_decoder(), on_error="quarantine")
    by_id = {r["media_id"]: r for r in out.collect()}
    assert by_id[1]["quarantine_reason"] is None
    assert by_id[2]["quarantine_reason"] is None
    assert by_id[1]["feature"] == by_id[2]["feature"]  # identical pixels
