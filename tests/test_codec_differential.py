"""Cross-codec differential invariants over the whole r12 format tier:
the SAME pixels carried in ANY lossless container must produce the
IDENTICAL feature vector through the multimodal path, and randomized
images must roundtrip pixel-exactly through every lossless image codec
(+ random PCM through FLAC). Seeded, pure-decode — complements each
codec's own structural tests with a breadth sweep no single module
gives."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import pytest

from binance_data_pipeline_spark.operators import multimodal as M
from binance_data_pipeline_spark.operators.bmp import decode_bmp, encode_bmp
from binance_data_pipeline_spark.operators.flac import decode_flac, encode_flac
from binance_data_pipeline_spark.operators.gif import decode_gif, encode_gif
from binance_data_pipeline_spark.operators.jpeg_lossless import (
    encode_jpeg_lossless,
)
from binance_data_pipeline_spark.operators.jpeg import decode_jpeg
from binance_data_pipeline_spark.operators.tiff import decode_tiff, encode_tiff
from binance_data_pipeline_spark.operators.webp import decode_webp, encode_webp


def _lossless_containers(img):
    """(mime, payload) for every lossless container of these pixels.
    GIF only when the palette fits."""
    out = [
        (M.PPM_MIME, M.encode_ppm(img)),
        (M.PNG_MIME, M.encode_png(img)),
        (M.JPEG_MIME, encode_jpeg_lossless(img)),
        (M.BMP_MIME, encode_bmp(img)),
        (M.TIFF_MIME, encode_tiff(img, compression="lzw")),
        (M.WEBP_MIME, encode_webp(img)),
    ]
    if len(np.unique(img.reshape(-1, 3), axis=0)) <= 256:
        out.append((M.GIF_MIME, encode_gif(img)))
    return out


def test_same_pixels_same_features_across_every_container():
    """Seven containers, one feature vector — the invariant the whole
    tier is built around (identical pixels => identical vectors,
    whatever the bytes look like on disk)."""
    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, (64, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 64, (19, 23))]  # palette-able: GIF included
    dec = M.default_decoder()
    vectors = {
        mime: dec(payload, mime) for mime, payload in _lossless_containers(img)
    }
    assert len(vectors) == 7
    want = vectors[M.PPM_MIME]
    for mime, got in vectors.items():
        assert got == want, mime


def test_randomized_lossless_roundtrips_all_codecs():
    """20 random shapes x 5 codecs: decode(encode(x)) == x exactly."""
    rng = np.random.default_rng(6)
    codecs = [
        (lambda im: M.encode_png(im), lambda b: M.decode_png(b)[2]),
        (lambda im: encode_jpeg_lossless(im), lambda b: decode_jpeg(b)[2]),
        (lambda im: encode_bmp(im), lambda b: decode_bmp(b)[2]),
        (lambda im: encode_tiff(im, compression="packbits"),
         lambda b: decode_tiff(b)[2]),
        (lambda im: encode_webp(im), lambda b: decode_webp(b)[2]),
    ]
    for _ in range(20):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for i, (enc, dec) in enumerate(codecs):
            assert np.array_equal(dec(enc(img)), img), (h, w, i)


def test_randomized_gif_palette_roundtrips():
    """GIF needs palettes: random palette sizes 2-256, exact decode."""
    rng = np.random.default_rng(7)
    for _ in range(10):
        k = int(rng.integers(2, 257))
        pal = rng.integers(0, 256, (k, 3), dtype=np.uint8)
        img = pal[rng.integers(0, k, (int(rng.integers(1, 30)),
                                      int(rng.integers(1, 30))))]
        assert np.array_equal(decode_gif(encode_gif(img))[2], img), k


def test_randomized_flac_roundtrips():
    """Random PCM at random depths/channels/block sizes: exact."""
    rng = np.random.default_rng(8)
    for _ in range(10):
        bps = int(rng.choice([8, 16, 24]))
        ch = int(rng.integers(1, 3))
        n = int(rng.integers(1, 4000))
        lim = 1 << (bps - 1)
        s = rng.integers(-lim, lim, (n, ch)).astype(np.int64)
        bsz = int(rng.choice([192, 576, 1024, 4096]))
        stereo = str(rng.choice(
            ["independent", "left_side", "right_side", "mid_side"]
        )) if ch == 2 else "independent"
        _, ch2, out = decode_flac(
            encode_flac(s, bps=bps, block_size=bsz, stereo=stereo)
        )
        ints = np.round(out * (1 << (bps - 1))).astype(np.int64).reshape(-1, ch2)
        assert np.array_equal(ints, s), (bps, ch, n, bsz, stereo)
