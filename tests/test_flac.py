"""FLAC codec (operators/flac.py) — frame sync + CRC-8/16, Rice
partitioned residuals with escapes, constant/verbatim/fixed/LPC
subframes, stereo decorrelation (left/side, right/side, mid/side),
8/16/24-bit depths. Oracle: the format is lossless, so every roundtrip
must reproduce the input samples EXACTLY.

Extension surface: the binance reference has no media handling; this
backs the multimodal column plumbing (operators/multimodal.py)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import pytest

from binance_data_pipeline_spark.operators.flac import decode_flac, encode_flac


def _ints(decoded, bps, ch):
    rate, channels, s = decoded
    assert channels == ch
    return np.round(s * (1 << (bps - 1))).astype(np.int64).reshape(-1, ch)


def test_flac_roundtrip_exact_core_shapes():
    """Sine (fixed predictors win), noise (escape/verbatim pressure),
    constant, odd tail frame, tiny input, 8/16/24-bit."""
    rng = np.random.default_rng(5)
    t = np.arange(20000)
    sine = (np.sin(t / 30.0) * 20000).astype(np.int64)
    cases = [
        (sine.reshape(-1, 1), 44100, 16, 4096),
        (rng.integers(-32768, 32768, (5000, 1)), 48000, 16, 1024),
        (np.full((3000, 1), -123), 8000, 16, 4096),
        (rng.integers(-128, 128, (2000, 2)), 22050, 8, 512),
        (rng.integers(-(1 << 23), 1 << 23, (1500, 1)), 96000, 24, 576),
        (sine[:5003].reshape(-1, 1), 44100, 16, 4096),  # odd last frame
        (np.array([[5], [9], [-3]]), 44100, 16, 4096),
    ]
    for s, rate, bps, bsz in cases:
        out = decode_flac(encode_flac(s, rate=rate, bps=bps, block_size=bsz))
        assert out[0] == rate
        assert np.array_equal(_ints(out, bps, s.shape[1]), s), (s.shape, bps)


def test_flac_stereo_decorrelation_modes_exact():
    """left/side, right/side and mid/side all reconstruct both channels
    exactly (the side channel runs at bps+1)."""
    t = np.arange(8000)
    stereo = np.stack(
        [(np.sin(t / 30.0) * 20000).astype(np.int64),
         (np.cos(t / 25.0) * 15000).astype(np.int64)],
        axis=1,
    )
    for mode in ("independent", "left_side", "right_side", "mid_side"):
        out = decode_flac(encode_flac(stereo, stereo=mode))
        assert np.array_equal(_ints(out, 16, 2), stereo), mode


def test_flac_lpc_and_partitioned_residuals_exact():
    """The LPC code path (coefficients + precision + shift) and
    multi-partition Rice coding decode exactly — including combined
    with mid/side at 24-bit."""
    rng = np.random.default_rng(6)
    t = np.arange(12000)
    sine = (np.sin(t / 30.0) * 20000).astype(np.int64).reshape(-1, 1)
    for kw in (
        dict(subframe="lpc"),
        dict(subframe="verbatim"),
        dict(partition_order=3),
        dict(subframe="lpc", partition_order=2),
    ):
        out = decode_flac(encode_flac(sine, **kw))
        assert np.array_equal(_ints(out, 16, 1), sine), kw
    st = rng.integers(-(1 << 23), 1 << 23, (3000, 2))
    out = decode_flac(encode_flac(st, bps=24, stereo="mid_side",
                                  subframe="lpc", partition_order=2))
    assert np.array_equal(_ints(out, 24, 2), st)


def test_flac_compresses_and_validates_crcs():
    """Smooth content compresses well below raw PCM; flipping a byte in
    the entropy data is caught by the frame CRCs (loud, not a garble)."""
    t = np.arange(20000)
    sine = (np.sin(t / 30.0) * 20000).astype(np.int64).reshape(-1, 1)
    data = encode_flac(sine)
    assert data[:4] == b"fLaC"
    assert len(data) < sine.size * 2 * 0.6  # < 60% of raw 16-bit PCM

    corrupt = bytearray(data)
    corrupt[len(corrupt) // 2] ^= 0x01
    with pytest.raises(ValueError, match="CRC|corrupt|sync|overrun"):
        decode_flac(bytes(corrupt))


def test_flac_corruption_fuzz_never_hangs_or_garbles_silently():
    rng = np.random.default_rng(1234)
    t = np.arange(3000)
    sine = (np.sin(t / 20.0) * 10000).astype(np.int64).reshape(-1, 1)
    for payload in (encode_flac(sine, block_size=1024),
                    encode_flac(np.repeat(sine, 2, 1), stereo="mid_side")):
        for _ in range(150):
            data = bytearray(payload)
            i = int(rng.integers(0, len(data)))
            data[i] ^= int(rng.integers(1, 256))
            try:
                decode_flac(bytes(data))
            except Exception as e:  # noqa: BLE001 — the contract IS "raises cleanly"
                assert isinstance(
                    e, (ValueError, NotImplementedError, IndexError,
                        KeyError, OverflowError, ZeroDivisionError,
                        MemoryError)
                ) or type(e).__module__ in ("zlib", "struct", "builtins"), (
                    type(e), e)


def test_flac_flows_through_multimodal_features(spark):
    """audio/flac routes natively through default_decoder; the SAME
    samples as a WAV produce the SAME feature vector (duration, RMS,
    zero-crossings, peak computed from identical floats)."""
    from binance_data_pipeline_spark.operators.multimodal import (
        FLAC_MIME,
        MEDIA_SCHEMA,
        WAV_MIME,
        default_decoder,
        extract_features,
        synthetic_wav,
    )

    wav = synthetic_wav(duration_ms=250, rate=16000, freq_hz=440.0)
    from binance_data_pipeline_spark.operators.multimodal import decode_wav

    rate, ch, s = decode_wav(wav)
    ints = np.round(np.asarray(s) * 32768.0).astype(np.int64).clip(-32768, 32767)
    flac = encode_flac(ints.reshape(-1, ch), rate=rate, channels=ch)
    rows = [
        (1, "audio", WAV_MIME, wav, None, None, 250),
        (2, "audio", FLAC_MIME, flac, None, None, 250),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = extract_features(df, default_decoder(), on_error="quarantine")
    by_id = {r["media_id"]: r for r in out.collect()}
    assert by_id[1]["quarantine_reason"] is None
    assert by_id[2]["quarantine_reason"] is None
    f1, f2 = by_id[1]["feature"], by_id[2]["feature"]
    assert f1 is not None and f2 is not None
    assert np.allclose(f1, f2, atol=1e-9)
