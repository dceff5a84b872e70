"""MJPEG-AVI container codec (operators/avi.py) + the r12 REAL video
frame-sampling path (multimodal.extract_video_frames): an AVI of JPEG
frames — and an animated GIF — decode to timestamped frames that flow
through feature extraction end-to-end, un-stubbed.

Extension surface: the binance reference has no media handling; this
backs the multimodal column plumbing (operators/multimodal.py)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import pytest

from binance_data_pipeline_spark.operators.avi import (
    decode_avi,
    decode_avi_frames,
    encode_avi_mjpeg,
)
from binance_data_pipeline_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _frames(n=5, h=24, w=32, seed=5):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    out = []
    for i in range(n):
        base = (128 + 50 * np.sin(x / 4.0 + i))[..., None]
        out.append(
            np.clip(base + rng.integers(-20, 20, (h, w, 3)), 0, 255).astype(
                np.uint8
            )
        )
    return out


def test_avi_container_roundtrip_exact_frames():
    """Frame bytes survive the container bit-exactly; timestamps come
    from the stream rate; the first frame decodes via the JPEG tier."""
    jpegs = [encode_jpeg(im, 85) for im in _frames()]
    avi = encode_avi_mjpeg(jpegs, 32, 24, fps=10)
    w, h, fps, fourcc, frames = decode_avi_frames(avi)
    assert (w, h, fps, fourcc) == (32, 24, 10.0, b"MJPG")
    assert [t for t, _ in frames] == [0, 100, 200, 300, 400]
    assert all(f == j for (_, f), j in zip(frames, jpegs))

    w2, h2, px = decode_avi(avi)
    assert (w2, h2) == (32, 24)
    assert np.array_equal(px, decode_jpeg(jpegs[0])[2])


def test_avi_non_mjpeg_routes_to_escape_hatch():
    """Frames that are not JPEG under a foreign FourCC raise
    NotImplementedError (the libav escape hatch), not a garble."""
    avi = encode_avi_mjpeg([b"\x00\x01notjpeg" * 4], 8, 8, fps=5)
    avi = avi.replace(b"MJPG", b"H264")
    with pytest.raises(NotImplementedError, match="H264"):
        decode_avi(avi)


def test_avi_corruption_fuzz_never_hangs_or_garbles_silently():
    rng = np.random.default_rng(1234)
    payload = encode_avi_mjpeg(
        [encode_jpeg(im, 85) for im in _frames(3, 16, 16)], 16, 16, fps=5
    )
    for _ in range(300):
        data = bytearray(payload)
        i = int(rng.integers(0, len(data)))
        data[i] ^= int(rng.integers(1, 256))
        try:
            decode_avi(bytes(data))
        except Exception as e:  # noqa: BLE001 — the contract IS "raises cleanly"
            assert isinstance(
                e, (ValueError, NotImplementedError, IndexError,
                    KeyError, OverflowError, ZeroDivisionError, MemoryError)
            ) or type(e).__module__ in ("zlib", "struct", "builtins"), (
                type(e), e)


def test_extract_video_frames_end_to_end(spark):
    """The real frame-sampling path: an MJPEG AVI and an animated GIF
    decode to ticked frames (last-frame-at-or-before semantics), whose
    bytes then flow through extract_features as images — the video stub
    is no longer on this path."""
    from pyspark.sql import functions as F

    from binance_data_pipeline_spark.operators.gif import encode_gif
    from binance_data_pipeline_spark.operators.multimodal import (
        AVI_MIME,
        GIF_MIME,
        MEDIA_SCHEMA,
        default_decoder,
        extract_features,
        extract_video_frames,
    )

    imgs = _frames(5)
    avi = encode_avi_mjpeg([encode_jpeg(im, 85) for im in imgs], 32, 24, fps=10)
    rng = np.random.default_rng(7)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    gif_frames = [pal[rng.integers(0, 8, (10, 10))] for _ in range(3)]
    gif = encode_gif(gif_frames, delays_ms=[200, 200, 200])

    media = spark.createDataFrame(
        [
            (1, "video", AVI_MIME, avi, 32, 24, 500),
            (2, "video", GIF_MIME, gif, 10, 10, 600),
            (3, "image", GIF_MIME, gif, 10, 10, None),  # ignored: not video
        ],
        MEDIA_SCHEMA,
    )
    frames = extract_video_frames(media, every_ms=200)
    rows = frames.collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    assert set(by_media) == {1, 2}
    # AVI at 10 fps sampled every 200 ms: frames 0, 2, 4 (ts 0/200/400)
    a = sorted(by_media[1], key=lambda r: r["frame_idx"])
    assert [r["frame_ts_ms"] for r in a] == [0, 200, 400]
    assert all(r["mime"] == "image/jpeg" for r in a)
    # GIF at 200 ms delays sampled every 200 ms: all three frames
    g = sorted(by_media[2], key=lambda r: r["frame_idx"])
    assert [r["frame_ts_ms"] for r in g] == [0, 200, 400]
    assert all(r["mime"] == "image/png" for r in g)

    # the sampled frames ARE decodable images: features end to end
    as_media = frames.select(
        (F.col("media_id") * 100 + F.col("frame_idx")).alias("media_id"),
        F.lit("image").alias("kind"),
        F.col("mime"),
        F.col("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    feats = extract_features(
        as_media, default_decoder(), on_error="quarantine"
    ).collect()
    assert len(feats) == 6
    assert all(r["quarantine_reason"] is None for r in feats)
    assert all(r["feature"] is not None for r in feats)
