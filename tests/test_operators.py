"""Operator-level tests: as-of join vs pandas merge_asof, REST backfill
grid/fetch, multimodal plumbing, LSH recall vs exact baselines."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import pandas as pd
import pytest
from pyspark.sql import functions as F

from binance_data_pipeline_spark.catalog import load_table
from binance_data_pipeline_spark.operators.asof import asof_join
from binance_data_pipeline_spark.operators import dedup as D
from binance_data_pipeline_spark.operators import similarity as S
from binance_data_pipeline_spark.operators.multimodal import (
    decode_stub,
    deterministic_fake_decoder,
    extract_features,
    media_stats,
    MEDIA_SCHEMA,
)
from binance_data_pipeline_spark.sources.rest_backfill import (
    fake_fetcher_from_events,
    fetch_grid,
    fetch_trades,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- as-of join

def test_asof_join_matches_pandas_merge_asof(spark):
    import random

    rng = random.Random(3)
    trades = [("S%d" % (i % 3), 1000 + rng.randrange(10_000), float(i)) for i in range(300)]
    quotes = [("S%d" % (i % 3), 1000 + rng.randrange(10_000), 100.0 + i) for i in range(200)]
    tdf = spark.createDataFrame(trades, "sym string, ts long, tval double")
    qdf = spark.createDataFrame(quotes, "sym string, ts long, quote double")

    got = (
        asof_join(tdf, qdf, on="sym", ts_col="ts", value_cols=["quote"])
        .orderBy("sym", "ts", "tval")
        .toPandas()
    )

    tp = pd.DataFrame(trades, columns=["sym", "ts", "tval"]).sort_values("ts", kind="stable")
    qp = (
        pd.DataFrame(quotes, columns=["sym", "ts", "quote"])
        .sort_values(["ts", "quote"], kind="stable")
        # pandas merge_asof takes the LAST on ties; our window picks the
        # last right row by (ts, insertion) too via last() over ordered rows
    )
    exp = (
        pd.merge_asof(tp, qp, on="ts", by="sym", direction="backward")
        .sort_values(["sym", "ts", "tval"], kind="stable", ignore_index=True)
    )
    assert len(got) == len(exp)
    merged = got.reset_index(drop=True)
    mism = (merged["quote_asof"].fillna(-1) != exp["quote"].fillna(-1)).sum()
    assert mism == 0, f"{mism} as-of mismatches"


def test_asof_join_bucketed_matches_single_phase(spark):
    """The bucketed two-phase form must be semantically identical to the
    single-window form — including carry across empty buckets and
    no-prior-quote nulls — while partitioning its big window on
    (key, bucket) so a hot key never lands in one task."""
    import random

    rng = random.Random(7)
    # one deliberately hot key with a long history + sparse quote buckets
    trades = [("HOT", 1000 + rng.randrange(100_000), float(i)) for i in range(400)]
    trades += [("S2", 1000 + rng.randrange(100_000), float(i)) for i in range(50)]
    quotes = [("HOT", 1000 + rng.randrange(20_000), 100.0 + i) for i in range(60)]
    quotes += [("S2", 90_000 + rng.randrange(5_000), 500.0 + i) for i in range(10)]
    tdf = spark.createDataFrame(trades, "sym string, ts long, tval double")
    qdf = spark.createDataFrame(quotes, "sym string, ts long, quote double")

    plain = asof_join(tdf, qdf, on="sym", ts_col="ts", value_cols=["quote"])
    bucketed = asof_join(
        tdf, qdf, on="sym", ts_col="ts", value_cols=["quote"], bucket_seconds=5_000
    )
    key = lambda r: (r["sym"], r["ts"], r["tval"], r["quote_asof"])
    assert sorted(map(key, plain.collect())) == sorted(map(key, bucketed.collect()))

    # the heavy phase-1 window partitions on (key, bucket), not key alone
    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    exchanges = [l for l in plan.splitlines() if "hashpartitioning" in l]
    assert any("__asof_bucket" in l and "sym" in l for l in exchanges), plan


def test_asof_join_bucketed_null_value_columns(spark):
    """Per-column carry semantics: a right row NULL in one value column
    must not mask an earlier non-null value of that column across a
    bucket boundary — both forms carry each column independently with
    last-non-null (the single-window form via last(ignorenulls), the
    bucketed form via per-column NULL-filtered max_by in phase 2)."""
    quotes = [
        # bucket 0 (ts<5000): bid set, ask set
        ("HOT", 1_000, 10.0, 11.0),
        # bucket 0 later row: bid updated, ask NULL → ask must still carry 11.0
        ("HOT", 2_000, 12.0, None),
        # bucket 1: ask only → bid carries 12.0 from bucket 0
        ("HOT", 6_000, None, 15.0),
    ]
    trades = [
        ("HOT", 4_000, 1.0),   # within bucket 0, after the NULL-ask row
        ("HOT", 11_000, 2.0),  # bucket 2: both columns come from carry-in
        ("HOT", 500, 3.0),     # before any quote → nulls
    ]
    qdf = spark.createDataFrame(quotes, "sym string, ts long, bid double, ask double")
    tdf = spark.createDataFrame(trades, "sym string, ts long, tval double")

    plain = asof_join(tdf, qdf, on="sym", ts_col="ts", value_cols=["bid", "ask"])
    bucketed = asof_join(
        tdf, qdf, on="sym", ts_col="ts", value_cols=["bid", "ask"], bucket_seconds=5_000
    )
    key = lambda r: (r["sym"], r["ts"], r["tval"], r["bid_asof"], r["ask_asof"])
    got_plain = sorted(map(key, plain.collect()))
    got_bucketed = sorted(map(key, bucketed.collect()))
    expected = sorted(
        [
            ("HOT", 500, 3.0, None, None),
            ("HOT", 4_000, 1.0, 12.0, 11.0),   # ask survives the NULL row
            ("HOT", 11_000, 2.0, 12.0, 15.0),  # per-column cross-bucket carry
        ]
    )
    assert got_plain == expected
    assert got_bucketed == expected


def test_asof_bucketed_carry_join_is_size_guarded(spark):
    """Phase 3 must not broadcast carry_in unconditionally: keys × buckets
    rows OOM the driver at scale. With AQE's measured-size conversion a
    small carry_in becomes a broadcast join at runtime; with the broadcast
    budget disabled the same plan degrades gracefully to a shuffle join
    instead of a forced broadcast."""
    rows = [("S%d" % (i % 5), 1_000 * i, float(i)) for i in range(200)]
    tdf = spark.createDataFrame(rows, "sym string, ts long, tval double")
    qdf = spark.createDataFrame(
        [("S%d" % (i % 5), 500 * i, 100.0 + i) for i in range(100)],
        "sym string, ts long, quote double",
    )

    def final_plan(df):
        df.collect()  # AQE finalizes join strategy at runtime
        return df._jdf.queryExecution().executedPlan().toString()

    out = asof_join(tdf, qdf, on="sym", ts_col="ts", value_cols=["quote"], bucket_seconds=10_000)
    assert "BroadcastHashJoin" in final_plan(out), "small carry_in should broadcast via AQE"

    conf = spark.conf
    prev_static = conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        out2 = asof_join(
            tdf, qdf, on="sym", ts_col="ts", value_cols=["quote"], bucket_seconds=10_000
        )
        plan2 = final_plan(out2)
        assert "BroadcastHashJoin" not in plan2, plan2
        assert "SortMergeJoin" in plan2 or "ShuffledHashJoin" in plan2, plan2
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", prev_static)
        if prev_aqe is None:
            conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        else:
            conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prev_aqe)


# ----------------------------------------------------------- REST backfill

def test_fetch_grid_shape(spark):
    from datetime import date

    grid = fetch_grid(spark, date(2024, 6, 10), ["BTCUSDT", "ETHUSDT"])
    rows = grid.collect()
    # 3 days × 1 hour × 2 symbols (reference scope)
    assert len(rows) == 6
    assert all(r["hour"] == 12 for r in rows)


def test_fetch_trades_distributed(spark):
    from datetime import date

    grid = fetch_grid(spark, date(2024, 6, 10), ["BTCUSDT", "ETHUSDT"])
    raw = fetch_trades(grid, fake_fetcher_from_events(rows_per_cell=25))
    assert raw.count() == 6 * 25
    assert dict(raw.dtypes)["price"] == "string"  # wire strings preserved

    # error swallowing: a fetcher that always raises → empty result, no job failure
    def boom(*a):
        raise RuntimeError("offline")

    assert fetch_trades(grid, boom).count() == 0


# ------------------------------------------------------------- multimodal

@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (i, "image", "image/png", bytes([i % 256] * (100 + i)), 64, 64, None)
        for i in range(20)
    ] + [(100 + i, "audio", "audio/wav", bytes([7, i % 256] * 500), None, None, 1000 + i) for i in range(5)]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_fake_decoder(media_df):
    feats = extract_features(media_df, deterministic_fake_decoder(dim=8))
    rows = feats.collect()
    assert len(rows) == 25
    assert all(len(r["feature"]) == 8 for r in rows)
    # deterministic: same payload → same hash/feature
    again = extract_features(media_df, deterministic_fake_decoder(dim=8)).collect()
    assert {r["media_id"]: r["payload_hash"] for r in rows} == {
        r["media_id"]: r["payload_hash"] for r in again
    }


@pytest.fixture(scope="module")
def real_media_df(spark):
    """Media table whose payloads are REAL decodable formats: P6 PPM images
    and 16-bit PCM WAVs built by the module's own synthetic fixtures."""
    from binance_data_pipeline_spark.operators.multimodal import (
        PPM_MIME,
        WAV_MIME,
        synthetic_ppm,
        synthetic_wav,
    )

    rows = [
        (i, "image", PPM_MIME, synthetic_ppm(32, 24, seed=i), 32, 24, None)
        for i in range(6)
    ] + [
        (100 + i, "audio", WAV_MIME, synthetic_wav(250, 440.0 * (i + 1), seed=i), None, None, 250)
        for i in range(3)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_real_codecs_end_to_end(real_media_df):
    """The un-stubbed path: PPM + WAV payloads decode inside mapInPandas
    with the dependency-free baseline_decoder — real pixels/samples, real
    features, no injected fakes."""
    from binance_data_pipeline_spark.operators.multimodal import baseline_decoder

    rows = {r["media_id"]: r for r in extract_features(real_media_df, baseline_decoder).collect()}
    assert len(rows) == 9
    img = rows[0]
    # width/height recovered from the actual PPM header
    assert img["feature"][0] == 32.0 and img["feature"][1] == 24.0
    # gradient image: mean red ≈ mid-scale, edge energy > 0
    assert 0.0 < img["feature"][2] < 255.0 and img["feature"][6] > 0.0
    wav = rows[100]
    dur, rms, zcr, peak = wav["feature"][:4]
    assert abs(dur - 0.25) < 1e-6          # 250 ms decoded from frames/rate
    assert abs(rms - 0.7) < 0.05           # sine RMS ≈ amplitude/√2 ≈ 0.69
    assert abs(peak - 32000 / 32768) < 0.01
    # 440 Hz at 8 kHz → ~880 crossings/s → zcr ≈ 0.11
    assert 0.08 < zcr < 0.14
    # distinct payloads → distinct features
    assert rows[100]["feature"] != rows[101]["feature"]


def test_resize_real_ppm_roundtrip(real_media_df):
    """Resize runs the real nearest-neighbor kernel and emits VALID PPM
    bytes: decodable, right dimensions, colors preserved from the source
    gradient."""
    from binance_data_pipeline_spark.operators.multimodal import (
        baseline_resizer,
        decode_ppm,
        resize_images,
    )

    out = {r["media_id"]: r for r in
           resize_images(real_media_df, 8, 6, baseline_resizer).collect()}
    assert len(out) == 6  # only image rows enter the resize pass
    for r in out.values():
        w, h, px = decode_ppm(bytes(r["payload"]))
        assert (w, h) == (8, 6) and px.shape == (6, 8, 3)
    # nearest-neighbor of the x-gradient keeps monotone red channel
    _, _, px = decode_ppm(bytes(out[0]["payload"]))
    reds = px[0, :, 0].astype(int)
    assert all(reds[i] <= reds[i + 1] for i in range(len(reds) - 1))


def test_baseline_decoder_rejects_undecodable_mime():
    from binance_data_pipeline_spark.operators.multimodal import baseline_decoder

    # formats beyond the native codec tier stay stubbed
    with pytest.raises(NotImplementedError):
        baseline_decoder(b"????ftypheic", "image/heic")
    # malformed payloads for SUPPORTED formats are data errors, not stubs
    with pytest.raises(ValueError):
        baseline_decoder(b"\xff\xd8\xff\xe0jfif-but-garbage", "image/jpeg")
    with pytest.raises(ValueError):
        baseline_decoder(b"RIFF....WEBP", "image/webp")  # native since r12


# ------------------------------------------------------------- PNG codec

def _reference_png(px, color_type, filters, palette=None):
    """Hand-rolled PNG writer used ONLY as test input: encodes with a
    CHOSEN filter type per scanline (the module encoder always uses 0), so
    decode_png's unfilter paths are each exercised against independently
    computed filtered bytes."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(px, dtype=np.uint8)
    h = px.shape[0]
    flat = px.reshape(h, -1).astype(np.int32)
    stride = flat.shape[1]
    c = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    raw = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        row = flat[y]
        f = filters[y % len(filters)]
        out = np.zeros(stride, np.int32)
        for x in range(stride):
            left = row[x - c] if x >= c else 0
            up = prev[x]
            ul = prev[x - c] if x >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) >> 1
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            out[x] = (row[x] - pred) & 0xFF
        raw += bytes([f]) + bytes(out.astype(np.uint8))
        prev = row
    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
    w = px.shape[1]
    body = chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
    if palette is not None:
        body += chunk(b"PLTE", bytes(np.asarray(palette, np.uint8).ravel()))
    body += chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    return b"\x89PNG\r\n\x1a\n" + body


def test_png_roundtrip_bit_exact():
    import numpy as np

    from binance_data_pipeline_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(13, 9, 3), dtype=np.uint8)
    w, h, back = decode_png(encode_png(px))
    assert (w, h) == (9, 13)
    assert (back == px).all()


def test_png_unfilter_all_five_filter_types():
    """Every PNG filter type (None/Sub/Up/Average/Paeth) decoded against a
    reference filtering implemented independently in the test."""
    import numpy as np

    from binance_data_pipeline_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        _, _, got = decode_png(_reference_png(px, 2, filters))
        assert (got == px).all(), f"filter set {filters} mismatched"


def test_png_color_types_normalize_to_rgb():
    import numpy as np

    from binance_data_pipeline_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(3)
    # grayscale → replicated channels
    g = rng.integers(0, 256, size=(5, 4, 1), dtype=np.uint8)
    _, _, px = decode_png(_reference_png(g, 0, [0, 2]))
    assert px.shape == (5, 4, 3) and (px[:, :, 0] == g[:, :, 0]).all() and (px[:, :, 1] == g[:, :, 0]).all()
    # RGBA → alpha dropped
    rgba = rng.integers(0, 256, size=(5, 4, 4), dtype=np.uint8)
    _, _, px = decode_png(_reference_png(rgba, 6, [4]))
    assert px.shape == (5, 4, 3) and (px == rgba[:, :, :3]).all()
    # palette → expanded through PLTE
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(6, 5, 1), dtype=np.uint8)
    _, _, px = decode_png(_reference_png(idx, 3, [1], palette=pal))
    assert (px == pal[idx[:, :, 0]]).all()
    # gray+alpha → gray replicated, alpha dropped
    ga = rng.integers(0, 256, size=(5, 4, 2), dtype=np.uint8)
    _, _, px = decode_png(_reference_png(ga, 4, [3]))
    assert (px[:, :, 0] == ga[:, :, 0]).all() and (px[:, :, 2] == ga[:, :, 0]).all()


def test_png_feature_parity_with_ppm():
    """Same pixels, different container → identical feature vector (the
    format-independence contract _rgb_features promises)."""
    import numpy as np

    from binance_data_pipeline_spark.operators.multimodal import (
        baseline_decoder,
        decode_ppm,
        encode_png,
        synthetic_ppm,
        PNG_MIME,
        PPM_MIME,
    )

    ppm = synthetic_ppm(20, 14, seed=5)
    _, _, px = decode_ppm(ppm)
    assert baseline_decoder(ppm, PPM_MIME) == baseline_decoder(encode_png(px), PNG_MIME)


def test_png_resize_and_extract_in_pipeline(spark):
    """PNG payloads flow through the Arrow-batched resize + feature passes
    with the dependency-free default decoder — no PIL in this container."""
    import numpy as np

    from binance_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        PNG_MIME,
        baseline_resizer,
        decode_png,
        default_decoder,
        encode_png,
        extract_features,
        resize_images,
    )

    rng = np.random.default_rng(9)
    rows = [
        (i, "image", PNG_MIME, encode_png(rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)), 32, 24, None)
        for i in range(4)
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = extract_features(media, default_decoder()).collect()
    assert len(feats) == 4
    assert all(r["feature"][0] == 32.0 and r["feature"][1] == 24.0 for r in feats)
    out = resize_images(media, 8, 6, baseline_resizer).collect()
    for r in out:
        w, h, px = decode_png(bytes(r["payload"]))
        assert (w, h) == (8, 6) and px.shape == (6, 8, 3)


def test_png_unsupported_shapes_raise():
    import struct
    import zlib

    import numpy as np

    from binance_data_pipeline_spark.operators.multimodal import decode_png

    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    # every real depth decodes since r12; what REMAINS invalid is a
    # spec violation — sub-byte depth on an RGB color type
    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
    sig = b"\x89PNG\r\n\x1a\n"
    bad = sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 4, 2, 0, 0, 0)) + chunk(
        b"IDAT", zlib.compress(b"\x00" * 26)) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="gray/palette"):
        decode_png(bad)
    bad3 = sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 3, 0, 0, 0, 0)) + chunk(
        b"IDAT", zlib.compress(b"\x00" * 4)) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bad3)


def test_png_adam7_and_16bit_roundtrip():
    """r12: the dependency-free decoder covers Adam7 interlacing and
    16-bit depth natively — encode/decode round-trips bit-exactly for
    every (interlace, depth) combination, including image sizes where
    some Adam7 passes are EMPTY (w or h below the pass offsets)."""
    import numpy as np

    from binance_data_pipeline_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(42)
    for (h, w) in [(16, 16), (13, 7), (8, 9), (3, 2), (2, 2), (1, 1)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        plain = decode_png(encode_png(px))[2]
        for interlace in (False, True):
            for depth in (8, 16):
                got_w, got_h, out = decode_png(
                    encode_png(px, interlace=interlace, bit_depth=depth)
                )
                assert (got_w, got_h) == (w, h)
                # bit-exact with the source AND with the plain decode —
                # identical pixels give identical features downstream
                assert np.array_equal(out, px), (h, w, interlace, depth)
                assert np.array_equal(out, plain)


def test_decode_stub_raises(media_df):
    with pytest.raises(Exception) as exc_info:
        extract_features(media_df, decode_stub).collect()
    assert "NotImplementedError" in str(exc_info.value) or "media decoding" in str(exc_info.value)


def test_default_decoder_autodetect(spark, monkeypatch):
    """default_decoder routes by capability: dependency-free formats always
    decode; compressed images use PIL WHEN importable and fall back to the
    documented NotImplementedError stub otherwise. Runs the genuinely
    available branch for this environment, then injects a fake PIL module
    to exercise the real PIL glue (open → convert("RGB") → _rgb_features)
    and pin feature parity: same pixels, same vector, either container."""
    import importlib.util
    import sys
    import types

    import numpy as np

    from binance_data_pipeline_spark.operators import multimodal as M

    ppm = M.synthetic_ppm(16, 12, seed=3)
    wav = M.synthetic_wav(100, 330.0)

    dec = M.default_decoder()
    want_img = M.baseline_decoder(ppm, M.PPM_MIME)
    assert dec(ppm, M.PPM_MIME) == want_img
    assert dec(wav, M.WAV_MIME) == M.baseline_decoder(wav, M.WAV_MIME)
    # PNG is dependency-free now: decodes through the baseline in ANY env
    png = M.encode_png(M.decode_ppm(ppm)[2])
    assert dec(png, M.PNG_MIME) == want_img

    # baseline JPEG is dependency-free now too: decodes in ANY env
    from binance_data_pipeline_spark.operators.jpeg import encode_jpeg

    jpg = encode_jpeg(M.decode_ppm(ppm)[2], quality=95)
    got = dec(jpg, M.JPEG_MIME)
    assert got[0] == want_img[0] and got[1] == want_img[1]  # exact dims
    assert all(abs(got[i] - want_img[i]) < 1.5 for i in (2, 3, 4))  # lossy means

    if importlib.util.find_spec("PIL") is None:
        # this container: formats beyond the native codec tier hit the
        # stub (WebP decodes natively since r12 — use HEIC)
        with pytest.raises(NotImplementedError):
            dec(ppm, "image/heic")
        with pytest.raises(NotImplementedError):
            M.default_resizer()(b"x", "image/heic", 4, 4)
    else:  # environment with a real PIL: the real decode path runs
        import io

        from PIL import Image

        buf = io.BytesIO()
        _, _, px = M.decode_ppm(ppm)
        Image.fromarray(px).save(buf, format="JPEG", quality=100, subsampling=0)
        got = dec(buf.getvalue(), "image/jpeg")
        assert got[0] == want_img[0] and got[1] == want_img[1]

    # fake-PIL injection: prove the PIL glue itself (any environment)
    class _FakeImg:
        format = "PNG"

        def __init__(self, px):
            self._px = px

        def convert(self, mode):
            assert mode == "RGB"
            return self

        def __array__(self, dtype=None, copy=None):
            return self._px.astype(dtype) if dtype is not None else self._px

        def resize(self, wh):
            w, h = wh
            src_h, src_w, _ = self._px.shape
            ys = (np.arange(h) * src_h // h).clip(0, src_h - 1)
            xs = (np.arange(w) * src_w // w).clip(0, src_w - 1)
            return _FakeImg(self._px[ys][:, xs])

        def save(self, out, format=None):
            out.write(M.encode_ppm(self._px))

    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = types.SimpleNamespace(
        open=lambda fh: _FakeImg(M.decode_ppm(fh.read())[2])
    )
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)

    dec_pil = M.default_decoder()
    # jpeg-mime payload routed through "PIL": same pixels → same features
    assert dec_pil(ppm, "image/jpeg") == want_img
    resized = M.default_resizer()(ppm, "image/jpeg", 8, 6)
    assert M.decode_ppm(resized)[:2] == (8, 6)


def test_png_sub_byte_depths_roundtrip():
    """r12: depths 1/2/4 (gray and palette), sequential AND Adam7 —
    exact round-trips through the module's own fixture encoders; gray
    samples scale to the full 8-bit range, palette indexes resolve
    through PLTE. With 8/16-bit this completes the PNG depth matrix."""
    import numpy as np

    from binance_data_pipeline_spark.operators.multimodal import (
        decode_png,
        encode_png_gray,
        encode_png_palette,
    )

    rng = np.random.default_rng(11)
    for (h, w) in [(16, 16), (13, 7), (3, 2), (1, 1), (9, 17)]:
        for d in (1, 2, 4):
            for il in (False, True):
                g = rng.integers(0, 1 << d, (h, w), dtype=np.uint8)
                ww, hh, out = decode_png(encode_png_gray(g, d, interlace=il))
                want = (g.astype(np.int32) * 255 // ((1 << d) - 1)).astype(np.uint8)
                assert (ww, hh) == (w, h)
                assert np.array_equal(out, np.repeat(want[:, :, None], 3, 2)), (h, w, d, il)
        for d in (1, 2, 4, 8):
            for il in (False, True):
                n = 1 << d
                pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
                idx = rng.integers(0, n, (h, w), dtype=np.uint8)
                _, _, out = decode_png(encode_png_palette(idx, pal, d, interlace=il))
                assert np.array_equal(out, pal[idx]), (h, w, d, il)


def test_png_fully_native_and_lossy_webp_falls_back_to_pil(monkeypatch):
    """Since r12 the stdlib PNG decoder covers the COMPLETE depth/
    interlace matrix (1/2/4/8/16-bit x sequential/Adam7 x gray/palette/
    RGB/alpha forms) — every PNG decodes natively with zero PIL calls.
    The PIL fallback contract survives for the residual variants —
    lossy (VP8) WebP: routed through PIL when importable, the native
    NotImplementedError without it."""
    import importlib.util
    import struct
    import sys
    import types

    import numpy as np

    from binance_data_pipeline_spark.operators import multimodal as M

    # a well-formed container whose codec chunk is lossy VP8
    vp8 = b"VP8 " + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    webp = b"RIFF" + struct.pack("<I", 4 + len(vp8)) + b"WEBP" + vp8

    if importlib.util.find_spec("PIL") is None:
        with pytest.raises(NotImplementedError):
            M.default_decoder()(webp, "image/webp")
        with pytest.raises(NotImplementedError):
            M.default_resizer()(webp, "image/webp", 4, 4)

    px = (np.arange(3 * 4 * 3, dtype=np.uint8) * 7 % 256).reshape(3, 4, 3)
    pil_calls = []

    class _FakeImg:
        format = "WEBP"

        def __init__(self, arr):
            self._px = arr

        def convert(self, mode):
            return self

        def __array__(self, dtype=None, copy=None):
            return self._px.astype(dtype) if dtype is not None else self._px

        def resize(self, wh):
            w, h = wh
            ys = (np.arange(h) * self._px.shape[0] // h).clip(0, self._px.shape[0] - 1)
            xs = (np.arange(w) * self._px.shape[1] // w).clip(0, self._px.shape[1] - 1)
            return _FakeImg(self._px[ys][:, xs])

        def save(self, out, format=None):
            out.write(M.encode_ppm(self._px))

    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = types.SimpleNamespace(
        open=lambda fh: (pil_calls.append(1), _FakeImg(px))[1]
    )
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)

    dec, rsz = M.default_decoder(), M.default_resizer()
    # the full PNG matrix: always the stdlib path, PIL untouched
    ppm = M.synthetic_ppm(6, 5, seed=1)
    rgb = M.decode_ppm(ppm)[2]
    forms = [M.encode_png(rgb), M.encode_png(rgb, interlace=True),
             M.encode_png(rgb, bit_depth=16),
             M.encode_png_gray((rgb[:, :, 0] >> 6), 2),
             M.encode_png_palette(
                 np.zeros(rgb.shape[:2], np.uint8), [[1, 2, 3]], 1)]
    for f in forms:
        dec(f, M.PNG_MIME)
        rsz(f, M.PNG_MIME, 3, 3)
    assert not pil_calls
    # WebP: falls through to the PIL-backed decode/resize
    assert dec(webp, "image/webp") == M._rgb_features(px)
    assert pil_calls
    resized = rsz(webp, "image/webp", 2, 2)
    assert M.decode_ppm(resized)[:2] == (2, 2)


def test_media_stats_prunes_payload(media_df, spark, tmp_path):
    # pruning is a property of the scan: write to parquet, read back, and
    # assert the physical scan's ReadSchema excludes the binary payload
    path = str(tmp_path / "media")
    media_df.write.parquet(path)
    on_disk = spark.read.parquet(path)
    stats = media_stats(on_disk)
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan, f"payload column must be pruned from the scan:\n{plan}"
    rows = {r["kind"]: r for r in stats.collect()}
    assert rows["image"]["n"] == 20 and rows["audio"]["n"] == 5


# ------------------------------------------------------- LSH recall checks

def test_minhash_recall_vs_exact(spark):
    d = load_table(spark, SF, "documents")
    sh = D.shingle_table(d)
    l = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    r = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    exact = (
        l.join(r, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "j",
            F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b")),
        )
        .where(F.col("j") >= 0.8)
        .select("id_a", "id_b")
        .collect()
    )
    truth = {(r["id_a"], r["id_b"]) for r in exact}
    got = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_near_dups(d, threshold=0.8).collect()
    }
    assert truth, "fixture should contain high-jaccard near-dup pairs"
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"minhash recall {recall} too low ({len(got)} got, {len(truth)} truth)"
    # verify step guarantees precision = 1.0 vs the same threshold
    assert got <= truth | got  # all returned pairs passed exact-jaccard verify


def test_minhash_short_docs_no_ansi_fault(spark):
    """Docs with fewer than n tokens must flow through the whole MinHash
    pipeline without INVALID_ARRAY_INDEX_IN_ELEMENT_AT (Spark 4 ANSI
    default): they have no full n-gram, so they yield an empty shingle set
    and are excluded from candidates — while real dups are still found."""
    rows = [
        (1, "ab"),                     # 1 token  < n
        (2, "one two"),                # 2 tokens < n
        (3, ""),                       # empty text
        (4, "the quick brown fox jumps over the lazy dog"),
        (5, "the quick brown fox jumps over the lazy dog"),  # exact dup of 4
    ]
    d = spark.createDataFrame(rows, "doc_id INT, text STRING")
    sh = {r["id"]: r["sh"] for r in D.shingle_table(d).collect()}
    assert set(sh) == {4, 5}, "short docs must be excluded from the shingle table"
    pairs = D.minhash_near_dups(d, threshold=0.6).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(4, 5)}
    assert all(r["jaccard"] == 1.0 for r in pairs)


def test_minhash_table_parity(spark):
    """The fused Arrow minhash kernel (r12 optimization) must reproduce
    the legacy two-stage JVM pipeline bit-for-bit: murmur3 shingle-hash
    SETS (order-free) and every permutation minimum."""
    import numpy as np

    # element-wise murmur3 parity against the JVM on adversarial longs
    rng = np.random.default_rng(11)
    a = rng.integers(-(2**63), 2**63 - 1, 500, dtype=np.int64)
    b = rng.integers(-(2**63), 2**63 - 1, 500, dtype=np.int64)
    c = rng.integers(-(2**63), 2**63 - 1, 500, dtype=np.int64)
    for arr in (a, b, c):
        arr[:4] = [0, -1, 2**63 - 1, -(2**63)]
    h = np.full(len(a), 42, dtype=np.uint32)
    for col in (a, b, c):
        h = D._mm3_mix_long(col, h)
    mine = h.view(np.int32).astype(np.int64)
    jdf = spark.createDataFrame(
        pd.DataFrame({"a": a, "b": b, "c": c})
    ).select(F.hash("a", "b", "c").cast("long").alias("h"))
    jvm = np.array([r["h"] for r in jdf.collect()])
    assert (jvm == mine).all()

    # full-table parity on the fixture corpus (plus short/empty docs)
    d = load_table(spark, SF, "documents").select("doc_id", "text").union(
        spark.createDataFrame(
            [(100001, ""), (100002, "one"), (100003, "two tokens")],
            "doc_id LONG, text STRING",
        )
    )
    fused = {r["id"]: (frozenset(r["sh"]), tuple(r["sig"]))
             for r in D.minhash_table(d).collect()}
    sh = D.shingle_table(d)
    legacy = {
        r["id"]: (frozenset(r["sh"]), tuple(r["sig"]))
        for r in sh.select(
            "id", "sh", D._minhash_from_hashes(F.col("sh"), 16).alias("sig")
        ).collect()
    }
    assert fused == legacy


def test_minhash_hot_bucket_cap(spark):
    """The skew guard: a degenerate bucket (many docs sharing boilerplate)
    must not explode candidate generation when capped — while a genuinely
    near-identical pair still surfaces through its other, narrow buckets."""
    boiler = "this page is part of the standard website template with navigation header footer and sidebar everywhere"
    rows = [(i, boiler + f" unique tail {i} alpha beta gamma delta {i*7} epsilon") for i in range(40)]
    twin = boiler + " a very distinctive document body that repeats almost verbatim in its twin somewhere"
    rows += [(98, twin), (99, twin + " extra")]
    d = spark.createDataFrame(rows, "doc_id INT, text STRING")

    uncapped = D.minhash_candidate_pairs(d, bands=8).count()
    capped = D.minhash_candidate_pairs(d, bands=8, max_bucket_size=10).count()
    assert capped < uncapped, (capped, uncapped)

    pairs = {(r["id_a"], r["id_b"])
             for r in D.minhash_near_dups(d, bands=8, threshold=0.7, max_bucket_size=10).collect()}
    assert (98, 99) in pairs  # the real near-dup survives the cap


def test_dedup_corpus_end_to_end(spark):
    """The corpus-materialization job: exact dups collapse by fingerprint,
    near-dups cluster transitively (connected components over verified
    pairs), smallest id per cluster survives, and the mapping is a complete
    audit trail."""
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep dark woods tonight chasing rabbits"
    )
    near1 = base.replace("quick", "swift")          # near-dup of base
    near2 = near1.replace("rabbits", "squirrels")   # near-dup of near1 (chain)
    rows = [
        (1, base),
        (2, base),        # exact dup of 1
        (3, near1),       # near-dup of 1
        (4, near2),       # near-dup of 3 → same cluster as 1 transitively
        (10, "completely different text about databases and distributed query engines running on clusters"),
        (11, "completely different text about databases and distributed query engines running on clusters"),  # exact dup of 10
        (20, "a short unique document with no counterpart anywhere in this corpus at all"),
    ]
    d = spark.createDataFrame(rows, "doc_id INT, text STRING")
    kept, mapping = D.dedup_corpus(d, threshold=0.5)

    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 10, 20]
    m = {r["doc_id"]: (r["kept_doc_id"], r["reason"]) for r in mapping.collect()}
    assert m[1] == (1, "kept") and m[10] == (10, "kept") and m[20] == (20, "kept")
    assert m[2] == (1, "exact_dup") and m[11] == (10, "exact_dup")
    assert m[3] == (1, "near_dup") and m[4] == (1, "near_dup")
    assert len(m) == len(rows)  # every input doc is accounted for


def test_cluster_pairs_transitive_chain(spark):
    """Min-label propagation must close long chains (a-b, b-c, c-d → one
    component) and keep disjoint components apart."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (12, 11)], "id_a INT, id_b INT"
    )
    got = {r["id"]: r["cluster_id"] for r in D.cluster_pairs(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10}


def test_cluster_pairs_long_chain_converges(spark):
    """Pointer jumping must close a 60-node path well inside the default
    iteration budget (plain 1-hop propagation would need 59 rounds)."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "id_a INT, id_b INT"
    )
    got = {r["id"]: r["cluster_id"] for r in D.cluster_pairs(pairs, max_iter=10).collect()}
    assert set(got.values()) == {0} and len(got) == 61


def test_cluster_pairs_chain_of_1000_bounded_rounds(spark):
    """Adversarial worst case: a 1000-dup chain must converge within the
    O(log diameter) round budget pointer jumping guarantees (log2(1000)
    ≈ 10 label rounds + 1 fixpoint-detection round), with NO
    non-convergence warning — plain 1-hop propagation would need 999
    rounds. Measured: 10 rounds for this chain, 13 for a 4096-chain."""
    import warnings

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(999)], "id_a long, id_b long"
    )
    with warnings.catch_warnings(record=True) as wlist:
        warnings.simplefilter("always")
        got = {
            r["id"]: r["cluster_id"]
            for r in D.cluster_pairs(pairs, max_iter=11).collect()
        }
    assert not [w for w in wlist if "converge" in str(w.message)]
    assert len(got) == 1000 and set(got.values()) == {0}


def test_materialize_dedup_corpus_job(spark, tmp_path):
    """The corpus DAG on the real documents table: writes corpus + mapping
    parquet, counts reconcile, mapping covers every input doc."""
    from binance_data_pipeline_spark.jobs import materialize_dedup_corpus

    out = str(tmp_path / "dedup_out")
    kept_n, in_n = materialize_dedup_corpus(
        spark, f"{SF}/documents.parquet", out, threshold=0.5
    )
    assert 0 < kept_n <= in_n == 500
    mapping = spark.read.parquet(f"{out}/mapping.parquet")
    assert mapping.count() == in_n
    kept_ids = {r["doc_id"] for r in spark.read.parquet(f"{out}/corpus.parquet").select("doc_id").collect()}
    mapped_keepers = {r["kept_doc_id"] for r in mapping.select("kept_doc_id").collect()}
    assert mapped_keepers == kept_ids  # keepers in mapping ≡ docs in corpus
    assert {r["reason"] for r in mapping.select("reason").distinct().collect()} <= {
        "kept", "exact_dup", "near_dup"
    }


def test_cosine_kernels_match_hof_reference(spark):
    """The r12 Arrow cosine kernels (localized matmul scan, pair UDF)
    must reproduce the Catalyst HOF plans bit-for-bit — fast path and
    join fallback alike, across all three exact-cosine operators."""
    from pyspark.sql import Window

    e = load_table(spark, SF, "embeddings")

    def hof_brute(df, threshold):
        a = S._spread(df).select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
        b = df.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
        return (
            a.join(b, F.col("id_a") < F.col("id_b"))
            .withColumn("sim", F.round(S.cosine(F.col("va"), F.col("vb")), 4))
            .where(F.col("sim") >= threshold)
            .select("id_a", "id_b", "sim")
        )

    def hof_topk(q, c, k):
        qq = q.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
        cc = S._spread(c).select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))
        scored = (
            F.broadcast(qq)
            .crossJoin(cc)
            .where(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("sim", F.round(S.cosine(F.col("qv"), F.col("cv")), 4))
        )
        w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
        return (
            scored.withColumn("rk", F.row_number().over(w).cast("long"))
            .where(F.col("rk") <= k)
            .select("query_id", "neighbor_id", "sim", "rk")
        )

    want = sorted(map(tuple, hof_brute(e, 0.3).collect()))
    got_fast = sorted(map(tuple, S.cosine_near_dup_pairs_brute(e, threshold=0.3).collect()))
    got_join = sorted(
        map(tuple, S.cosine_near_dup_pairs_brute(e, threshold=0.3, max_local_corpus=0).collect())
    )
    assert got_fast == want and got_join == want

    q = e.where(F.col("vec_id") < 7)
    want_tk = sorted(map(tuple, hof_topk(q, e, 3).collect()))
    # default path (small corpus → HOF plan) and the forced Arrow kernel
    # (the big-corpus path) must both reproduce the reference
    got_tk = sorted(map(tuple, S.cosine_topk_brute(q, e, k=3).collect()))
    assert got_tk == want_tk
    prev = S.MIN_KERNEL_CORPUS_BYTES
    S.MIN_KERNEL_CORPUS_BYTES = 0
    try:
        got_kernel = sorted(map(tuple, S.cosine_topk_brute(q, e, k=3).collect()))
    finally:
        S.MIN_KERNEL_CORPUS_BYTES = prev
    assert got_kernel == want_tk

    # verify_pairs_cosine: foreign / null candidate ids drop like the
    # inner-join fallback does
    cands = spark.createDataFrame(
        [(0, 1), (1, 2), (999999, 1), (None, 2)], "id_a long, id_b long"
    )
    fast = sorted(
        map(tuple, S.verify_pairs_cosine(e, cands, threshold=-1.0).collect())
    )
    join = sorted(
        map(
            tuple,
            S.verify_pairs_cosine(e, cands, threshold=-1.0, max_local_corpus=0).collect(),
        )
    )
    assert fast == join and len(fast) == 2


def test_ann_recall_vs_brute(spark):
    e = load_table(spark, SF, "embeddings")
    queries = e.where(F.col("vec_id") < 20)
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in S.cosine_topk_brute(queries, e, k=3).collect()
    }
    ann = {
        (r["query_id"], r["neighbor_id"])
        for r in S.ann_lsh_topk(queries, e, k=3).collect()
    }
    recall = len(ann & brute) / len(brute)
    assert recall >= 0.5, f"ANN recall {recall} too low"
    # shared-signature path (queries ⊆ corpus): identical results — one
    # signature table must change cost, never candidates
    shared = {
        (r["query_id"], r["neighbor_id"])
        for r in S.ann_lsh_topk(queries, e, k=3, queries_within_corpus=True).collect()
    }
    assert shared == ann


# ------------------------------------------------------ schema evolution

def test_append_with_schema_evolution(spark, tmp_path):
    from binance_data_pipeline_spark.catalog import append_with_schema_evolution

    path = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a")], "id long, name string")
    append_with_schema_evolution(v1, path)
    # second batch adds a column (ALLOW_FIELD_ADDITION parity)
    v2 = spark.createDataFrame([(2, "b", 9.5)], "id long, name string, score double")
    merged = append_with_schema_evolution(v2, path)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["score"] is None and rows[2]["score"] == 9.5


# --------------------------------------------------------------- IVF ANN

def test_ivf_recall_vs_brute(spark):
    from binance_data_pipeline_spark.operators.ivf import ivf_topk

    e = load_table(spark, SF, "embeddings")
    queries = e.where(F.col("vec_id") < 20)
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in S.cosine_topk_brute(queries, e, k=3).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(queries, e, k=3, n_centroids=16, nprobe=6).collect()
    }
    recall = len(ivf & brute) / len(brute)
    assert recall >= 0.4, f"IVF recall {recall} too low"
    # every query produced k results (cells were non-empty)
    from collections import Counter
    per_q = Counter(q for q, _ in ivf)
    assert all(v == 3 for v in per_q.values())


def test_ivf_persisted_index_no_retrain(spark, tmp_path):
    """Build-once/query-many: first call materializes the index (centroids +
    cell-partitioned corpus), later calls serve from it — same results, and
    the query path runs zero train/assign jobs over the corpus."""
    from binance_data_pipeline_spark.operators.ivf import build_ivf_index, ivf_query, ivf_topk

    e = load_table(spark, SF, "embeddings")
    queries = e.where(F.col("vec_id") < 10)
    idx = str(tmp_path / "ivf_index")

    first = {(r["query_id"], r["neighbor_id"], r["rk"])
             for r in ivf_topk(queries, e, k=3, nprobe=6, index_path=idx).collect()}
    import os as _os
    assert _os.path.exists(_os.path.join(idx, "cells.parquet", "_SUCCESS"))
    # cell-partitioned layout → probe join prunes unprobed cells
    assert any(p.startswith("cell_id=") for p in _os.listdir(_os.path.join(idx, "cells.parquet")))

    # corrupt-proof the no-retrain claim: delete the corpus-scan ability by
    # querying the index directly — results identical to the build call
    again = {(r["query_id"], r["neighbor_id"], r["rk"])
             for r in ivf_query(spark, idx, queries, k=3, nprobe=6).collect()}
    assert first == again

    # rebuild into the same path is idempotent (overwrite semantics)
    build_ivf_index(e, idx, n_centroids=16)
    third = {(r["query_id"], r["neighbor_id"], r["rk"])
             for r in ivf_query(spark, idx, queries, k=3, nprobe=6).collect()}
    assert first == third


def test_ivf_index_rebuilds_on_data_change(spark, tmp_path):
    """Staleness contract: the persisted index fingerprints its corpus
    input files, so (a) repeat calls over unchanged data serve the index
    without rebuilding, and (b) regenerating the corpus parquet AT THE
    SAME PATH forces a rebuild — the old path-keyed _SUCCESS check would
    silently serve neighbors from the dead data."""
    import os as _os

    from binance_data_pipeline_spark.operators.ivf import ivf_topk

    data = str(tmp_path / "emb.parquet")
    # v1: distinct vectors → no perfect-similarity neighbors
    v1 = [(i, [float(i + 1), float((i * 7) % 5 + 1), 1.0, 0.5]) for i in range(20)]
    spark.createDataFrame(v1, "vec_id long, embedding array<double>").write.mode(
        "overwrite"
    ).parquet(data)
    corpus = spark.read.parquet(data)
    queries = corpus.where(F.col("vec_id") < 2)
    idx = str(tmp_path / "idx")

    r1 = ivf_topk(queries, corpus, k=2, n_centroids=2, nprobe=2, index_path=idx).collect()
    assert r1 and all(r["sim"] < 1.0 for r in r1)
    meta_marker = _os.path.join(idx, "meta.parquet", "_SUCCESS")
    built_at = _os.path.getmtime(meta_marker)

    # unchanged data → second call must NOT rebuild
    r2 = ivf_topk(queries, corpus, k=2, n_centroids=2, nprobe=2, index_path=idx).collect()
    assert _os.path.getmtime(meta_marker) == built_at
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))

    # regenerate IN PLACE: all vectors identical → every true neighbor has
    # sim == 1.0, impossible under v1 — proves results come from new data
    v2 = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(20)]
    spark.createDataFrame(v2, "vec_id long, embedding array<double>").write.mode(
        "overwrite"
    ).parquet(data)
    corpus2 = spark.read.parquet(data)
    queries2 = corpus2.where(F.col("vec_id") < 2)
    r3 = ivf_topk(queries2, corpus2, k=2, n_centroids=2, nprobe=2, index_path=idx).collect()
    assert r3 and all(r["sim"] == 1.0 for r in r3), r3
    assert _os.path.getmtime(meta_marker) > built_at  # rebuilt


def test_resize_and_frame_sample(media_df, spark):
    from binance_data_pipeline_spark.operators.multimodal import (
        fake_resizer,
        resize_images,
        resize_stub,
        sample_frames,
    )
    import pytest as _pytest

    resized = resize_images(media_df, 8, 8, fake_resizer).collect()
    assert len(resized) == 20  # only image rows enter the UDF
    assert all(len(r["payload"]) == 64 for r in resized)

    with _pytest.raises(Exception):
        resize_images(media_df, 8, 8, resize_stub).collect()

    video = spark.createDataFrame(
        [(500, "video", "video/mp4", b"\x00\x01", None, None, 3500)],
        "media_id long, kind string, mime string, payload binary, width int, height int, duration_ms long",
    )
    frames = sample_frames(video, every_ms=1000).collect()
    assert [f["frame_ts_ms"] for f in frames] == [0, 1000, 2000]


def test_simhash_near_dups_equals_all_pairs_hamming(spark):
    """Exact recall contract of the distinct-signature formulation
    (Manku WWW'07: dedup identical fingerprints first): pairs == the
    naive all-pairs hamming<=k set, with no duplicates, including
    identical-signature classes (hamming 0) and near pairs discovered
    through banding over DISTINCT signatures."""
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = []
    # dup class: 4 byte-identical docs (one signature, 6 pairs)
    rows += [(i, base) for i in range(4)]
    # near dups: one-token drifts of the base (small hamming to each other)
    rows += [(10 + j, base + f" tail{j}") for j in range(3)]
    # unrelated
    rows += [(20, "completely different content about spark manifests and kafka wire protocols etc"),
             (21, "another unrelated document mentioning embeddings retrieval and tokenizers")]
    d = spark.createDataFrame(rows, "doc_id INT, text STRING")

    sig = {r["id"]: r["simhash"] for r in D._materialize(D.with_simhash(d)).collect()}
    truth = set()
    ids = sorted(sig)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin(sig[a] ^ sig[b]).count("1") <= 3:
                truth.add((a, b))
    got = [(r["id_a"], r["id_b"], r["hamming"])
           for r in D.simhash_near_dups(d).collect()]
    assert len(got) == len(set((a, b) for a, b, _h in got)), "duplicate pairs"
    assert {(a, b) for a, b, _h in got} == truth
    # hamming values are exact
    for a, b, h in got:
        assert h == bin(sig[a] ^ sig[b]).count("1")
    # the 4-doc identical class contributes its 6 hamming-0 pairs
    assert sum(1 for _a, _b, h in got if h == 0) >= 6


def test_simhash_gate_paths_agree(spark):
    """The duplication-ratio gate picks between two formulations of the
    same pair set — forcing each path (gate=0 -> distinct-signature,
    gate=inf -> per-doc direct) must give identical (id_a, id_b,
    hamming) rows on a corpus with dup classes, near pairs, and
    singletons."""
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [(i, base) for i in range(4)]
    rows += [(10 + j, base + f" tail{j}") for j in range(3)]
    rows += [(20, "completely different content about spark manifests and kafka wire protocols etc")]
    d = spark.createDataFrame(rows, "doc_id INT, text STRING")
    via_distinct = {(r["id_a"], r["id_b"], r["hamming"])
                    for r in D.simhash_near_dups(d, dup_ratio_gate=0.0).collect()}
    via_perdoc = {(r["id_a"], r["id_b"], r["hamming"])
                  for r in D.simhash_near_dups(d, dup_ratio_gate=float("inf")).collect()}
    assert via_distinct == via_perdoc and via_distinct


def test_simhash_gate_boundary_corpus(spark):
    """VERDICT r10 task 7: the gate decision rests on approx_count_distinct,
    whose ~2% estimation error could flip the branch on a corpus whose
    true duplication ratio sits AT the 1.25 gate. Engineer exactly that
    corpus (200 docs / 160 distinct texts = ratio 1.25) and pin that the
    estimator's error is harmless by construction: both forced paths AND
    the real gated call produce the identical pair set, whichever branch
    the estimate lands on."""
    import random as _rnd

    rng = _rnd.Random(711)
    words = ("alpha beta gamma delta market order trade fee spark shuffle "
             "manifest parquet stream window corpus token shard batch").split()

    def _text(i: int) -> str:
        return " ".join(rng.choice(words) for _ in range(18)) + f" u{i}"

    distinct = [_text(i) for i in range(160)]
    rows = [(i, distinct[i]) for i in range(160)]
    # 40 byte-identical extras spread over the first 20 texts -> some dup
    # classes of 3, keeping the corpus realistic (mixed class sizes)
    rows += [(1000 + j, distinct[j % 20]) for j in range(40)]
    d = spark.createDataFrame(rows, "doc_id INT, text STRING")

    # the corpus really sits at the gate: exact ratio 1.25, estimate near
    sig = D._materialize(D.with_simhash(d))
    n_docs, n_est = sig.agg(
        F.count(F.lit(1)), F.approx_count_distinct("simhash")
    ).first()
    n_true = sig.select("simhash").distinct().count()
    assert n_docs / n_true == pytest.approx(1.25, abs=0.01)
    assert 1.15 <= n_docs / n_est <= 1.35, "estimate strayed off the boundary"

    def pairs(**kw):
        return {(r["id_a"], r["id_b"], r["hamming"])
                for r in D.simhash_near_dups(d, **kw).collect()}

    via_distinct = pairs(dup_ratio_gate=0.0)
    via_perdoc = pairs(dup_ratio_gate=float("inf"))
    via_gated = pairs()  # whatever branch the estimator picks
    assert via_distinct == via_perdoc == via_gated
    # the 20 three-member classes alone contribute 3 pairs each
    assert len(via_gated) >= 60


def test_simhash_block_cap_keeps_identical_pairs(spark):
    """max_block_size weights blocks by DOC count (sum of members), so
    the skew guard means what it did; identical-signature pairs are
    emitted regardless of the cap (they need no banding)."""
    boiler = "standard website template navigation header footer sidebar " * 3
    rows = [(i, boiler) for i in range(30)]  # one signature, 30 members
    rows += [(100, "a distinctive body of text that stands alone quietly"),]
    d = spark.createDataFrame(rows, "doc_id INT, text STRING")
    capped = D.simhash_near_dups(d, max_block_size=10).collect()
    got = {(r["id_a"], r["id_b"]) for r in capped}
    # every block holding the 30-doc class is over-cap, yet the class's
    # 435 identical pairs still surface
    assert len(got) == 30 * 29 // 2
    assert all(h["hamming"] == 0 for h in capped)


def test_asof_join_union_single_scan_matches_two_frame_entry(spark):
    """Round 13: the caller-built tagged-union entry (asof_join_union —
    the single-scan form when both sides come from the same table) must
    be row-identical to asof_join over the two filtered frames, bucketed
    and unbucketed, and its plan must scan the union only through the
    shared (key, bucket) repartition (no per-phase re-derivation of a
    spine)."""
    import random

    from binance_data_pipeline_spark.operators.asof import asof_join_union

    rng = random.Random(13)
    rows = []
    for i in range(300):
        side = rng.random() < 0.5
        rows.append((
            "S%d" % (i % 3),
            1000 + rng.randrange(30_000),
            "purchase" if side else "click",
            float(i),
        ))
    e = spark.createDataFrame(rows, "sym string, ts long, etype string, value double")
    left = e.where(F.col("etype") == "purchase").select(
        "sym", "ts", F.col("value").alias("pval")
    )
    right = e.where(F.col("etype") == "click").select(
        "sym", "ts", F.col("value").alias("cval")
    )
    is_l = F.col("etype") == "purchase"
    unioned = e.select(
        "sym",
        "ts",
        F.when(is_l, F.col("value")).alias("pval"),
        F.when(is_l, F.lit(1)).otherwise(F.lit(0)).alias("__side"),
        F.when(~is_l, F.col("value")).alias("__r_cval"),
    )

    for bucket in (None, 5_000):
        two_frame = asof_join(
            left, right, on="sym", ts_col="ts", value_cols=["cval"],
            bucket_seconds=bucket,
        )
        one_scan = asof_join_union(
            unioned, ["sym", "ts", "pval"], on="sym", ts_col="ts",
            value_cols=["cval"], bucket_seconds=bucket,
        )
        key = lambda r: (r["sym"], r["ts"], r["pval"], r["cval_asof"])
        assert sorted(map(key, two_frame.collect())) == sorted(
            map(key, one_scan.collect())
        ), f"bucket={bucket}"

    # bucketed plan shape: exactly one (sym, bucket) exchange expression
    # feeds BOTH the phase-1 window and the phase-2 aggregate (the old
    # form also shuffled a distinct spine — three (sym, bucket)-keyed
    # exchanges in total)
    plan = asof_join_union(
        unioned, ["sym", "ts", "pval"], on="sym", ts_col="ts",
        value_cols=["cval"], bucket_seconds=5_000,
    )._jdf.queryExecution().executedPlan().toString()
    kb = [
        l for l in plan.splitlines()
        if "hashpartitioning" in l and "__asof_bucket" in l
        and "REPARTITION_BY_COL" in l
    ]
    # window branch + pruned aggregate branch only (the stitch join may
    # add its own ENSURE_REQUIREMENTS exchange when AQE can't broadcast
    # the tiny carry_in, as with these in-memory frames)
    assert len(kb) == 2, plan
