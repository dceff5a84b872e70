"""GIF codec (operators/gif.py, GIF87a/89a) — LZW with variable code
widths and deferred clear, interlacing, local color tables,
transparency and disposal compositing, timestamped animation frames.
Oracle: the encoder writes exact per-frame palettes, so
decode(encode(frames)) == frames pixel-exactly.

Extension surface: the binance reference has no media handling; this
backs the multimodal column plumbing (operators/multimodal.py) and
gives the frame-sampling path a real decodable animated format."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import pytest

from binance_data_pipeline_spark.operators.gif import (
    decode_gif,
    decode_gif_frames,
    encode_gif,
)


def _palette_image(rng, k, h, w):
    pal = rng.integers(0, 256, (k, 3), dtype=np.uint8)
    return pal[rng.integers(0, k, (h, w))]


def test_gif_roundtrip_exact_across_palettes_and_interlace():
    """2/4/17/256-color palettes, sequential and interlaced, including
    an image large enough to fill the LZW table (4096 entries + clear)
    and a low-entropy one (deep LZW strings): pixel-exact."""
    rng = np.random.default_rng(5)
    cb = (np.indices((24, 31)).sum(0) % 2 * 255).astype(np.uint8)
    cases = [np.stack([cb, cb, 255 - cb], axis=-1)]
    for k in (4, 17, 256):
        cases.append(_palette_image(rng, k, 37, 29))
    cases.append(_palette_image(rng, 256, 200, 300))  # table-full path
    smooth = np.repeat(np.repeat(rng.integers(0, 8, (20, 30)), 10, 0), 10, 1)
    pal8 = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    cases.append(pal8[smooth])
    for img in cases:
        for inter in (False, True):
            w, h, out = decode_gif(encode_gif(img, interlace=inter))
            assert (w, h) == (img.shape[1], img.shape[0])
            assert np.array_equal(out, img), (img.shape, inter)


def test_gif_animation_frames_and_timestamps():
    """Multi-frame GIFs composite per frame and carry real timestamps
    (cumulative delays, first frame at 0) — the real decode step for
    multimodal.sample_frames' grid."""
    rng = np.random.default_rng(6)
    f1 = _palette_image(rng, 16, 21, 18)
    f2 = np.roll(f1, 5, axis=1)
    f3 = np.roll(f1, 9, axis=0)
    data = encode_gif([f1, f2, f3], delays_ms=[50, 120, 80])
    w, h, frames = decode_gif_frames(data)
    assert (w, h) == (18, 21) and len(frames) == 3
    assert [t for t, _ in frames] == [0, 50, 170]
    for (_, got), want in zip(frames, (f1, f2, f3)):
        assert np.array_equal(got, want)
    # max_frames stops early (first frame only — the feature path)
    _, _, first = decode_gif_frames(data, max_frames=1)
    assert len(first) == 1 and np.array_equal(first[0][1], f1)


def test_gif_transparency_composites_over_canvas():
    """Transparent pixels keep what is underneath: the initial canvas
    (black without a global table) for frame 1, the composited previous
    frame afterwards."""
    pal = np.array([[255, 0, 0], [0, 255, 0]], np.uint8)
    f_red = pal[np.zeros((8, 8), int)]
    f_mix = pal[np.ones((8, 8), int)].copy()
    f_mix[2:4, 2:4] = [255, 0, 0]
    data = encode_gif([f_red, f_mix], transparent_color=(255, 0, 0))
    _, _, frames = decode_gif_frames(data)
    assert (frames[0][1] == 0).all()  # all-transparent frame: canvas
    expect = f_mix.copy()
    expect[2:4, 2:4] = 0
    assert np.array_equal(frames[1][1], expect)


def test_gif_container_and_limits():
    """GIF89a signature + NETSCAPE loop for animations; >256 colors is
    a loud error (quantize upstream, never silently lossy)."""
    rng = np.random.default_rng(7)
    img = _palette_image(rng, 5, 10, 10)
    data = encode_gif([img, img], delays_ms=[40, 40])
    assert data.startswith(b"GIF89a") and data.endswith(b"\x3b")
    assert b"NETSCAPE2.0" in data
    assert b"NETSCAPE2.0" not in encode_gif(img)  # single frame: no loop

    y, x = np.mgrid[0:24, 0:24]
    truecolor = np.stack([y * 11 % 256, x * 7 % 256, (x * y) % 256],
                         axis=2).astype(np.uint8)
    with pytest.raises(ValueError, match="quantize"):
        encode_gif(truecolor)


def test_gif_corruption_fuzz_never_hangs_or_garbles_silently():
    """Any byte flip either decodes to something or raises a catchable
    error — never hangs (the LZW expected-pixel bound and table checks
    bound every loop)."""
    rng = np.random.default_rng(1234)
    img = _palette_image(rng, 16, 24, 24)
    for payload in (
        encode_gif(img),
        encode_gif([img, np.roll(img, 3, 0)], delays_ms=[40, 40]),
    ):
        for _ in range(150):
            data = bytearray(payload)
            i = int(rng.integers(0, len(data)))
            data[i] ^= int(rng.integers(1, 256))
            try:
                decode_gif(bytes(data))
            except Exception as e:  # noqa: BLE001 — the contract IS "raises cleanly"
                assert isinstance(
                    e, (ValueError, NotImplementedError, IndexError,
                        KeyError, OverflowError, ZeroDivisionError)
                ) or type(e).__module__ in ("zlib", "struct", "builtins"), (
                    type(e), e)


def test_gif_flows_through_multimodal_features_and_resize(spark):
    """image/gif routes natively through default_decoder (no PIL, no
    quarantine); identical pixels to a PNG give the identical feature
    vector, and the baseline resizer round-trips GIF→GIF."""
    from binance_data_pipeline_spark.operators.multimodal import (
        GIF_MIME,
        MEDIA_SCHEMA,
        PNG_MIME,
        baseline_resizer,
        default_decoder,
        encode_png,
        extract_features,
    )

    rng = np.random.default_rng(8)
    img = _palette_image(rng, 32, 16, 16)
    rows = [
        (1, "image", PNG_MIME, encode_png(img), 16, 16, None),
        (2, "image", GIF_MIME, encode_gif(img), 16, 16, None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = extract_features(df, default_decoder(), on_error="quarantine")
    by_id = {r["media_id"]: r for r in out.collect()}
    assert by_id[1]["quarantine_reason"] is None
    assert by_id[2]["quarantine_reason"] is None
    assert by_id[1]["feature"] == by_id[2]["feature"]  # identical pixels

    small = baseline_resizer(encode_gif(img), GIF_MIME, 8, 8)
    w, h, px = decode_gif(small)
    assert (w, h) == (8, 8) and np.array_equal(px, img[::2, ::2])
