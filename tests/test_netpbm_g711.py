"""Late-r12 decode breadth in multimodal itself: the full binary
Netpbm family (P4 bitmap / P5 graymap incl. 16-bit maxval / P6 pixmap)
and G.711 companded WAV (mu-law and A-law, the telephony formats the
stdlib `wave` module refuses).

Extension surface: the binance reference has no media handling; this
backs the multimodal column plumbing (operators/multimodal.py)."""

from __future__ import annotations

import struct
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import pytest

from binance_data_pipeline_spark.operators.multimodal import (
    _g711_alaw_table,
    _g711_ulaw_table,
    decode_ppm,
    decode_wav,
    encode_ppm,
)


def test_netpbm_family_decodes():
    """P6 roundtrip unchanged; P5 gray replicates to RGB (8- and 16-bit
    maxval, comments honored); P4 decodes with 1 = black."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img))[2], img)

    g = rng.integers(0, 256, (7, 13), dtype=np.uint8)
    w, h, out = decode_ppm(b"P5\n13 7\n255\n" + g.tobytes())
    assert (w, h) == (13, 7)
    assert all(np.array_equal(out[:, :, c], g) for c in range(3))

    g16 = rng.integers(0, 65536, (5, 6), dtype=np.uint16)
    out = decode_ppm(
        b"P5\n# a comment\n6 5\n65535\n" + g16.astype(">u2").tobytes()
    )[2]
    expect = (g16.astype(np.uint32) * 255 // 65535).astype(np.uint8)
    assert np.array_equal(out[:, :, 0], expect)

    bits = rng.integers(0, 2, (6, 10), dtype=np.uint8)
    out = decode_ppm(b"P4\n10 6\n" + np.packbits(bits, axis=1).tobytes())[2]
    assert np.array_equal(out[:, :, 0], (1 - bits) * 255)

    with pytest.raises(ValueError, match="Netpbm"):
        decode_ppm(b"P7\n1 1\n255\n\x00")


def _g711_wav(tag: int, body: bytes, rate: int = 8000) -> bytes:
    fmt = struct.pack("<HHIIHH", tag, 1, rate, rate, 1, 8)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
    out += b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(body)) + body
    return out


def test_g711_tables_match_canonical_anchors():
    """mu-law: zero codes 0xFF/0x7F, full-scale +/-32124, exact sign
    antisymmetry under bit-7 flip; A-law: 0x55-inverted coding with
    int16-scale magnitudes to +/-32256."""
    ut = _g711_ulaw_table()
    assert ut[0xFF] == 0 and ut[0x7F] == 0
    assert ut[0x80] == 32124 and ut[0x00] == -32124
    at = _g711_alaw_table()
    assert max(at) == 32256 and min(at) == -32256
    for b in range(128):
        assert ut[b] == -ut[b ^ 0x80]
        assert at[b ^ 0x80] == -at[b]
    # segment monotonicity: positive mu-law codes decode decreasingly
    # from 0x80 (max) to 0xFF (zero)
    pos = [ut[b] for b in range(0x80, 0x100)]
    assert all(a >= b for a, b in zip(pos, pos[1:]))


def test_g711_wav_decode_both_laws():
    """A WAV carrying every byte value decodes through the table at
    int16 scale; linear PCM stays on the stdlib path; unknown format
    tags raise."""
    body = bytes(range(256))
    for tag, table in ((7, _g711_ulaw_table()), (6, _g711_alaw_table())):
        rate, ch, s = decode_wav(_g711_wav(tag, body))
        assert (rate, ch, len(s)) == (8000, 1, 256)
        assert np.allclose(s, np.array(table) / 32768.0)
        assert np.abs(s).max() <= 1.0
    with pytest.raises(ValueError, match="format tag"):
        decode_wav(_g711_wav(2, body))  # ADPCM: not supported
