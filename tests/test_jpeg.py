"""Baseline JPEG codec (operators/jpeg.py) — dependency-free encode +
decode closing the compressed-image stub family. Extension surface: the
reference has no media handling; this backs the multimodal column
plumbing (operators/multimodal.py) without PIL."""

from __future__ import annotations

import struct
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


def test_roundtrip_accuracy_by_quality():
    """Lossy but tight: error shrinks with quality; q95 within 2 levels
    on a smooth gradient, q60 still within 10."""
    px = _gradient()
    for q, bound in ((95, 2), (85, 5), (60, 10)):
        w, h, out = decode_jpeg(encode_jpeg(px, quality=q))
        assert (w, h) == (32, 24)
        assert np.abs(out.astype(int) - px.astype(int)).max() <= bound


def test_flat_color_exact_and_odd_dimensions():
    flat = np.full((16, 16, 3), 77, np.uint8)
    _, _, out = decode_jpeg(encode_jpeg(flat, 85))
    assert np.array_equal(out, flat)  # DC-only block: lossless

    odd = _gradient(19, 21)  # non-multiple-of-8: edge padding must crop away
    w, h, out = decode_jpeg(encode_jpeg(odd, 90))
    assert (w, h) == (21, 19) and out.shape == (19, 21, 3)
    assert np.abs(out.astype(int) - odd.astype(int)).max() <= 6


def test_noise_roundtrip_bounded():
    """Worst case for DCT compaction (no structure): mean error stays in
    the few-levels band at high quality."""
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    _, _, out = decode_jpeg(encode_jpeg(px, 95))
    assert np.abs(out.astype(int) - px.astype(int)).mean() < 6


def test_stream_is_standard_jfif():
    """Container structure any compliant reader expects: SOI + JFIF APP0,
    two DQTs, SOF0, four DHTs, SOS, EOI — tables embedded in-stream."""
    data = encode_jpeg(_gradient(8, 8), 85)
    assert data.startswith(JPEG_SIG) and data.endswith(b"\xff\xd9")
    assert data[2:4] == b"\xff\xe0" and data[6:11] == b"JFIF\x00"
    assert data.count(b"\xff\xdb") >= 2 and data.count(b"\xff\xc4") >= 4
    assert b"\xff\xc0" in data and b"\xff\xda" in data


def test_progressive_decodes_bit_identical_to_baseline():
    """r12: progressive (SOF2) decodes natively. The progressive encoder
    emits an 8-scan successive-approximation script over the SAME
    quantized coefficients as baseline, so decode output must be
    BIT-IDENTICAL — across subsampling, odd dimensions, flat images
    (long EOB runs) and noise (dense ZRL windows)."""
    import numpy as np

    rng = np.random.default_rng(3)
    cases = [
        (_gradient(16, 16), False), (_gradient(17, 23), False),
        (_gradient(24, 24), True), (_gradient(13, 7), True),
        (np.full((32, 24, 3), 99, np.uint8), False),   # flat: EOB runs
        (np.full((24, 40, 3), 200, np.uint8), True),
        (rng.integers(0, 256, (24, 24, 3), dtype=np.uint8), False),  # noise
        (rng.integers(0, 256, (17, 31, 3), dtype=np.uint8), True),
    ]
    for px, sub in cases:
        base = decode_jpeg(encode_jpeg(px, 85, subsample=sub))[2]
        prog = decode_jpeg(encode_jpeg(px, 85, subsample=sub, progressive=True))[2]
        assert np.array_equal(base, prog), (px.shape, sub)


def test_progressive_stream_is_standard_sof2():
    """The progressive stream is standards-shaped: SOF2 marker, multiple
    SOS segments, custom AC DHT embedded, EOI-terminated."""
    data = encode_jpeg(_gradient(16, 16), 85, progressive=True)
    assert b"\xff\xc2" in data          # SOF2
    assert data.count(b"\xff\xda") >= 8  # 8-scan script
    assert data.endswith(b"\xff\xd9")


def test_corrupt_progressive_scan_script_raises():
    """A baseline stream with its SOF0 patched to SOF2 is CORRUPT (the
    single scan claims Ss=0..Se=63, illegal for progressive): ValueError,
    not a wrong image — the quarantine path for mislabeled files."""
    data = bytearray(encode_jpeg(_gradient(8, 8), 85))
    i = bytes(data).find(b"\xff\xc0")
    data[i + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(data))


def test_corrupt_payloads_raise_value_error():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"definitely not a jpeg")
    truncated = encode_jpeg(_gradient(16, 16), 85)[:40]  # header only
    with pytest.raises((ValueError, struct.error, IndexError)):
        decode_jpeg(truncated)


def test_encoder_input_validation():
    with pytest.raises(ValueError, match="HxWx3"):
        encode_jpeg(np.zeros((4, 4), np.uint8))


def test_feature_parity_with_ppm_container():
    """Same pixels through PPM (lossless) and JPEG (q95) containers give
    matching features within the lossy tolerance — the multimodal
    format-independence contract."""
    from binance_data_pipeline_spark.operators.multimodal import (
        JPEG_MIME,
        PPM_MIME,
        baseline_decoder,
        decode_ppm,
        synthetic_ppm,
    )

    ppm = synthetic_ppm(20, 14, seed=5)
    _, _, px = decode_ppm(ppm)
    want = baseline_decoder(ppm, PPM_MIME)
    got = baseline_decoder(encode_jpeg(px, 95), JPEG_MIME)
    assert got[0] == want[0] and got[1] == want[1] and got[7] == want[7]
    assert all(abs(got[i] - want[i]) < 1.5 for i in (2, 3, 4, 5))


def test_jpeg_flows_through_spark_pipeline(spark):
    """JPEG payloads run the Arrow-batched feature + resize passes with
    the dependency-free default decoder/resizer — no PIL, no stub."""
    from binance_data_pipeline_spark.operators.multimodal import (
        JPEG_MIME,
        MEDIA_SCHEMA,
        default_decoder,
        default_resizer,
        extract_features,
        resize_images,
    )

    rows = [
        (i, "image", JPEG_MIME, encode_jpeg(_gradient(24, 32), 90), 32, 24, None)
        for i in range(3)
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = extract_features(media, default_decoder()).collect()
    assert len(feats) == 3
    assert all(r["feature"][0] == 32.0 and r["feature"][1] == 24.0 for r in feats)
    out = resize_images(media, 8, 6, default_resizer()).collect()
    for r in out:
        w, h, px = decode_jpeg(bytes(r["payload"]))
        assert (w, h) == (8, 6) and px.shape == (6, 8, 3)


def test_restart_markers_roundtrip():
    """DRI + RSTn emission exercises the decoder's chunked entropy path:
    byte-aligned restarts with DC-prediction resets decode to EXACTLY
    the same pixels as the unmarked stream (same coefficients)."""
    px = _gradient()
    plain = decode_jpeg(encode_jpeg(px, 95))[2]
    data = encode_jpeg(px, 95, restart_interval=2)
    assert b"\xff\xdd" in data  # DRI segment
    assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))
    w, h, out = decode_jpeg(data)
    assert (w, h) == (32, 24) and np.array_equal(out, plain)


def test_chroma_subsampling_roundtrip():
    """4:2:0 exercises the decoder's sampling-factor/upsample path: SOF
    declares 2x2 luma sampling, luma survives at full fidelity, chroma
    averages over 2x2 — bounded overall error, exact dimensions, and it
    composes with restart markers and odd dimensions."""
    px = _gradient()
    data = encode_jpeg(px, 95, subsample=True)
    i = data.find(b"\xff\xc0")
    assert data[i + 11] == 0x22  # component 1 sampling = 2x2
    w, h, out = decode_jpeg(data)
    assert (w, h) == (32, 24)
    err = np.abs(out.astype(int) - px.astype(int))
    # luma ≈ untouched: grayscale projection error stays tiny
    lum = lambda a: 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    assert np.abs(lum(out.astype(float)) - lum(px.astype(float))).mean() < 2.0
    assert err.mean() < 6.0  # chroma pooling bounded

    odd = _gradient(19, 21)
    w, h, out = decode_jpeg(encode_jpeg(odd, 90, subsample=True, restart_interval=2))
    assert (w, h) == (21, 19)
    assert np.abs(out.astype(int) - odd.astype(int)).mean() < 6.0


def test_progressive_with_restart_markers_identical():
    """r12: progressive + restart_interval — every scan chunks at RSTn
    (DC prediction and EOB runs reset per chunk; a run never crosses a
    restart). Decode must stay bit-identical to baseline, down to the
    most hostile interval (restart after every unit)."""
    import numpy as np

    for ri in (1, 2, 7):
        for sub in (False, True):
            px = _gradient(33, 26)
            base = decode_jpeg(encode_jpeg(px, 85, subsample=sub))[2]
            prog = decode_jpeg(
                encode_jpeg(px, 85, subsample=sub, progressive=True,
                            restart_interval=ri)
            )[2]
            assert np.array_equal(base, prog), (ri, sub)


def test_16bit_quantization_tables_decode_identically():
    """r12: DQT Pq=1 (16-bit big-endian tables). T.81 pairs it with
    12-bit sample precision but real encoders emit it with 8-bit streams
    too — closing the last DQT NotImplementedError. Oracle: rewrite a
    valid stream's 8-bit tables in wide form (same values) — decode must
    be bit-identical on every entropy path (baseline / progressive /
    arithmetic). A truncated wide table is a ValueError, not a garble."""
    import numpy as np

    def widen_dqt(data: bytes) -> bytes:
        out = bytearray()
        pos = 0
        while pos < len(data):
            if data[pos] == 0xFF and pos + 1 < len(data) and data[pos + 1] == 0xDB:
                (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
                body = data[pos + 4 : pos + 2 + ln]
                new = bytearray()
                i = 0
                while i < len(body):
                    new.append(0x10 | (body[i] & 0xF))  # Pq=1, same Tq
                    for v in body[i + 1 : i + 65]:
                        new += struct.pack(">H", v)
                    i += 65
                out += struct.pack(">HH", 0xFFDB, len(new) + 2) + new
                pos += 2 + ln
            else:
                out.append(data[pos])
                pos += 1
        return bytes(out)

    px = _gradient()
    for kind in ({}, {"progressive": True}, {"arithmetic": True}):
        narrow = encode_jpeg(px, 85, **kind)
        wide = widen_dqt(narrow)
        assert len(wide) == len(narrow) + 128  # two tables, 64B wider each
        a, b = decode_jpeg(narrow), decode_jpeg(wide)
        assert a[:2] == b[:2] and np.array_equal(a[2], b[2]), kind

    wide = bytearray(widen_dqt(encode_jpeg(px, 85)))
    i = wide.find(b"\xff\xdb")
    trunc = wide[:i] + struct.pack(">HH", 0xFFDB, 60) + wide[i + 4 : i + 62] + wide[i + 133 :]
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(bytes(trunc))


def test_codec_corruption_fuzz_never_hangs_or_garbles_silently():
    """Robustness pin for the quarantine story: flipping any byte of a
    valid stream (JPEG baseline/progressive, PNG plain/Adam7/16-bit)
    must either still decode to SOMETHING or raise a catchable error —
    never hang, never crash the interpreter. Seeded, 120 mutations per
    container."""
    import numpy as np

    from binance_data_pipeline_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(1234)
    px = _gradient(16, 16)
    streams = [
        ("jpeg-base", encode_jpeg(px, 85), decode_jpeg),
        ("jpeg-prog", encode_jpeg(px, 85, progressive=True), decode_jpeg),
        ("png", encode_png(px), decode_png),
        ("png-adam7", encode_png(px, interlace=True), decode_png),
        ("png-16", encode_png(px, bit_depth=16), decode_png),
    ]
    for name, payload, dec in streams:
        for _ in range(120):
            data = bytearray(payload)
            i = int(rng.integers(0, len(data)))
            data[i] ^= int(rng.integers(1, 256))
            try:
                dec(bytes(data))
            except Exception as e:  # noqa: BLE001 — the contract IS "raises cleanly"
                assert isinstance(
                    e, (ValueError, NotImplementedError, IndexError,
                        KeyError, OverflowError, ZeroDivisionError)
                ) or type(e).__module__ in ("zlib", "struct", "builtins"), (
                    name, type(e), e)


def test_progressive_noninterleaved_dc_scans_identical():
    """r12: Ns=1 DC scans (component-grid block order, spec A.2.2) —
    the decoder's non-interleaved DC first + refinement paths, pinned
    bit-identical to baseline, with and without restarts."""
    import numpy as np

    for sub in (False, True):
        for ri in (None, 2):
            px = _gradient(33, 26)
            base = decode_jpeg(encode_jpeg(px, 85, subsample=sub))[2]
            prog = decode_jpeg(
                encode_jpeg(px, 85, subsample=sub, progressive=True,
                            dc_noninterleaved=True, restart_interval=ri)
            )[2]
            assert np.array_equal(base, prog), (sub, ri)
