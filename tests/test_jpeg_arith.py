"""Arithmetic-coded JPEG (operators/jpeg_arith.py, SOF9 QM coder) —
the r12 closure of the last JPEG NotImplementedError in the
dependency-free codec tier. Oracle: the arithmetic encoder writes the
SAME quantized coefficients as the Huffman path, so decode output must
be BIT-IDENTICAL between the two entropy codings of one image.

Extension surface: the binance reference has no media handling; this
backs the multimodal column plumbing (operators/multimodal.py)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import pytest

from binance_data_pipeline_spark.operators.jpeg import (
    JPEG_SIG,
    decode_jpeg,
    encode_jpeg,
)


def _gradient(h=24, w=32):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [x * 255 // max(w - 1, 1), y * 255 // max(h - 1, 1), (x + y) * 3 % 256],
        axis=2,
    ).astype(np.uint8)


def test_arith_decodes_bit_identical_to_huffman():
    """The differential oracle: same quantized coefficients, two entropy
    layers — across subsampling, odd dimensions, flat images (all-EOB),
    noise (dense magnitude ladders) and quality extremes."""
    rng = np.random.default_rng(3)
    cases = [
        (_gradient(), 85, False),
        (_gradient(19, 21), 90, True),  # odd dims + 4:2:0
        (np.full((16, 16, 3), 77, np.uint8), 85, False),  # DC-only
        (rng.integers(0, 256, (24, 40, 3)).astype(np.uint8), 95, False),
        (rng.integers(0, 256, (33, 26, 3)).astype(np.uint8), 10, True),
        # checkerboard: maximum-frequency AC at near-lossless quality
        ((np.indices((32, 32)).sum(0) % 2 * 255).astype(np.uint8)[..., None]
         .repeat(3, axis=2), 98, False),
    ]
    for px, q, sub in cases:
        base = decode_jpeg(encode_jpeg(px, q, subsample=sub))
        arith = decode_jpeg(encode_jpeg(px, q, subsample=sub, arithmetic=True))
        assert base[:2] == arith[:2], (px.shape, q, sub)
        assert np.array_equal(base[2], arith[2]), (px.shape, q, sub)


def test_arith_with_restart_markers_identical():
    """RSTn in an arithmetic scan: coder flush + byte-align + stats and
    DC-prediction reset per T.81 — bit-identical down to the most
    hostile interval (restart after every MCU)."""
    for ri in (1, 2, 7):
        for sub in (False, True):
            px = _gradient(33, 26)
            base = decode_jpeg(encode_jpeg(px, 85, subsample=sub))[2]
            arith = decode_jpeg(
                encode_jpeg(px, 85, subsample=sub, arithmetic=True,
                            restart_interval=ri)
            )[2]
            assert np.array_equal(base, arith), (ri, sub)


def test_arith_stream_is_standard_sof9_container():
    """Marker layout any compliant reader expects: SOI + JFIF APP0, two
    DQTs, SOF9 (no SOF0), DAC conditioning (no DHT), SOS, EOI; DRI
    present exactly when restarts are requested. The entropy coding is
    also denser than Huffman on structured content — the reason the
    format exists."""
    px = _gradient(32, 32)
    data = encode_jpeg(px, 85, arithmetic=True)
    assert data.startswith(JPEG_SIG) and data.endswith(b"\xff\xd9")
    assert data[2:4] == b"\xff\xe0" and data[6:11] == b"JFIF\x00"
    assert data.count(b"\xff\xdb") >= 2
    assert b"\xff\xc9" in data and b"\xff\xc0" not in data  # SOF9, no SOF0
    assert b"\xff\xcc" in data and b"\xff\xc4" not in data  # DAC, no DHT
    assert b"\xff\xda" in data and b"\xff\xdd" not in data
    with_rst = encode_jpeg(px, 85, arithmetic=True, restart_interval=2)
    assert b"\xff\xdd" in with_rst and b"\xff\xd0" in with_rst
    assert len(data) < len(encode_jpeg(px, 85))  # QM beats Huffman here


def test_arith_progressive_bit_identical_to_baseline():
    """r12: SOF10 (progressive + arithmetic, T.81 Annex G.1.3). The
    encoder runs the same 8-scan successive-approximation script as the
    Huffman progressive path with QM-coded models, over the same
    quantized coefficients — so decode must be BIT-IDENTICAL to the
    baseline encoding, across subsampling, odd dimensions, restarts,
    non-interleaved DC scans, flat images and noise."""
    rng = np.random.default_rng(3)
    cases = [
        (_gradient(), 85, False, None, False),
        (_gradient(19, 21), 90, True, 2, False),  # odd dims, 4:2:0, RST
        (_gradient(33, 26), 85, True, 1, True),   # hostile RST + Ns=1 DC
        (np.full((16, 16, 3), 77, np.uint8), 85, False, None, False),
        (rng.integers(0, 256, (24, 40, 3)).astype(np.uint8), 95, False,
         None, True),
        (rng.integers(0, 256, (33, 26, 3)).astype(np.uint8), 10, True,
         7, False),
    ]
    for px, q, sub, ri, dcn in cases:
        base = decode_jpeg(encode_jpeg(px, q, subsample=sub))
        prog = decode_jpeg(
            encode_jpeg(px, q, subsample=sub, arithmetic=True,
                        progressive=True, restart_interval=ri,
                        dc_noninterleaved=dcn)
        )
        assert base[:2] == prog[:2], (px.shape, q, sub, ri, dcn)
        assert np.array_equal(base[2], prog[2]), (px.shape, q, sub, ri, dcn)


def test_arith_progressive_container_and_compactness():
    """SOF10 layout: DAC not DHT, one SOS per scan of the 8-scan
    script; denser than the Huffman progressive form of the same image.
    Hierarchical (SOF11-family patch) still routes to the PIL escape
    hatch, not a garble."""
    px = _gradient(32, 32)
    data = encode_jpeg(px, 80, arithmetic=True, progressive=True)
    assert data.startswith(JPEG_SIG) and data.endswith(b"\xff\xd9")
    assert b"\xff\xca" in data and b"\xff\xc2" not in data  # SOF10, no SOF2
    assert b"\xff\xcc" in data and b"\xff\xc4" not in data  # DAC, no DHT
    assert data.count(b"\xff\xda") == 8  # DC + 3xAC + DCref + 3xACref
    assert len(data) < len(encode_jpeg(px, 80, progressive=True))

    patched = bytearray(data)
    i = bytes(patched).find(b"\xff\xca")
    patched[i + 1] = 0xCB  # SOF10 -> SOF11 (lossless arithmetic)
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(patched))


def test_arith_corruption_fuzz_never_hangs_or_garbles_silently():
    """Same robustness pin as the Huffman/PNG fuzz: flipping any byte
    of a valid SOF9 stream must either still decode or raise a
    catchable error — never hang (the QM decoder's zero-bit feed past
    chunk end and the MCU-count gate bound every loop)."""
    rng = np.random.default_rng(1234)
    px = _gradient(16, 16)
    for payload in (
        encode_jpeg(px, 85, arithmetic=True),
        encode_jpeg(px, 85, arithmetic=True, restart_interval=2),
        encode_jpeg(px, 85, arithmetic=True, progressive=True),
    ):
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


def test_arith_jpeg_flows_through_multimodal_features(spark):
    """Integration with the multimodal column surface: a SOF9 payload
    decodes natively through default_decoder/extract_features (no PIL,
    no quarantine) and yields the same feature vector as the Huffman
    encoding of the same pixels."""
    from binance_data_pipeline_spark.operators.multimodal import (
        JPEG_MIME,
        MEDIA_SCHEMA,
        default_decoder,
        extract_features,
    )

    px = _gradient(16, 16)
    rows = [
        (1, "image", JPEG_MIME, encode_jpeg(px, 90), 16, 16, None),
        (2, "image", JPEG_MIME, encode_jpeg(px, 90, arithmetic=True),
         16, 16, None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = extract_features(df, default_decoder(), on_error="quarantine")
    by_id = {r["media_id"]: r for r in out.collect()}
    assert by_id[1]["quarantine_reason"] is None
    assert by_id[2]["quarantine_reason"] is None
    assert by_id[1]["feature"] == by_id[2]["feature"]  # identical pixels
