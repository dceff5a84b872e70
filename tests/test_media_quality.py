"""Image quality gate (operators/media_quality.py) — the visual
counterpart of the Gopher/C4 text rules: JVM-side flags over the
extract_features vector, per-source thresholds via broadcast dim, and
the audit report. Includes an end-to-end leg on real encoded images
and a plan pin (no Python, no non-broadcast join on the gate path)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import pytest
from pyspark.sql import functions as F

from binance_data_pipeline_spark.operators.media_quality import (
    DEFAULT_THRESHOLDS,
    filter_by_source,
    image_flags,
    image_quality_report,
)

# [w, h, meanR, meanG, meanB, lum_std, edge, tag]
GOOD = [512.0, 384.0, 120.0, 110.0, 100.0, 40.0, 8.0, 1.0]
TINY = [16.0, 16.0, 120.0, 110.0, 100.0, 40.0, 8.0, 1.0]
BANNER = [1200.0, 90.0, 120.0, 110.0, 100.0, 40.0, 8.0, 1.0]
SOLID = [512.0, 384.0, 200.0, 10.0, 10.0, 0.0, 0.0, 1.0]
DARK = [512.0, 384.0, 2.0, 2.0, 2.0, 5.0, 1.0, 1.0]


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "media_id long, source string, feature array<double>"
    )


def test_image_flags_rule_by_rule(spark):
    df = _df(spark, [
        (1, "web", GOOD), (2, "web", TINY), (3, "web", BANNER),
        (4, "web", SOLID), (5, "web", DARK), (6, "web", None),
    ])
    out = {r["media_id"]: r["q"] for r in
           df.withColumn("q", image_flags("feature")).collect()}
    assert out[1]["pass"] and all(out[1][k] for k in out[1].asDict())
    assert not out[2]["min_dims"] and not out[2]["pass"]
    assert not out[3]["aspect"] and not out[3]["pass"]
    assert not out[4]["not_solid"] and not out[4]["has_detail"]
    assert not out[5]["brightness"] and not out[5]["pass"]
    # NULL feature (quarantined upstream): fails CLOSED on every rule
    assert not out[6]["decoded"] and not out[6]["pass"]
    assert out[6]["min_dims"] is False  # not NULL


def test_filter_by_source_thresholds_and_fallback(spark):
    """Screenshots tolerate extreme aspect; unmatched sources use the
    (possibly '*'-adjusted) default."""
    df = _df(spark, [
        (1, "web", BANNER),          # default aspect 3.0: fails
        (2, "screens", BANNER),      # per-source aspect 20: passes
        (3, None, GOOD),             # no source: default path
        (4, "web", GOOD),
    ])
    kept = filter_by_source(
        df, {"screens": {"max_aspect": 20.0}}
    )
    assert sorted(r["media_id"] for r in kept.collect()) == [2, 3, 4]
    # '*' override tightens the default for everyone unmatched
    kept = filter_by_source(df, {"*": {"max_aspect": 50.0}})
    assert sorted(r["media_id"] for r in kept.collect()) == [1, 2, 3, 4]
    # keep_flags exposes the struct for downstream audit
    flagged = filter_by_source(df, keep_flags=True)
    assert "quality" in flagged.columns


def test_gate_plan_is_jvm_only_with_broadcast_dim(spark):
    df = _df(spark, [(1, "web", GOOD), (2, "s", TINY)])
    plan = filter_by_source(
        df, {"s": {"min_width": 8.0, "min_height": 8.0}}
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    assert "SortMergeJoin" not in plan


def test_image_quality_report_counts(spark):
    df = _df(spark, [
        (1, "web", GOOD), (2, "web", TINY), (3, "web", None),
        (4, "scan", SOLID),
    ])
    rep = {r["source"]: r for r in image_quality_report(df).collect()}
    assert rep["web"]["n"] == 3 and rep["web"]["n_pass"] == 1
    assert rep["web"]["fail_min_dims"] == 2  # TINY + the NULL row
    assert rep["web"]["fail_decoded"] == 1
    assert rep["scan"]["fail_not_solid"] == 1
    assert abs(rep["web"]["pass_rate"] - 1 / 3) < 1e-9


def test_audio_flags_on_real_wav_features(spark):
    """Audio gate over the real WAV feature vector: a healthy sine
    passes; digital silence fails not_silent; a NULL feature fails
    closed; duration band honored."""
    from binance_data_pipeline_spark.operators.media_quality import audio_flags
    from binance_data_pipeline_spark.operators.multimodal import (
        WAV_MIME,
        baseline_decoder,
        synthetic_wav,
    )

    good = baseline_decoder(synthetic_wav(1000, 440.0, rate=16000), WAV_MIME)
    silent = list(good)
    silent[1] = 0.0  # RMS
    short = list(good)
    short[0] = 0.1  # duration s
    df = spark.createDataFrame(
        [(1, good), (2, silent), (3, short), (4, None)],
        "media_id long, feature array<double>",
    )
    out = {r["media_id"]: r["q"] for r in
           df.withColumn("q", audio_flags("feature")).collect()}
    assert out[1]["pass"]
    assert not out[2]["not_silent"] and not out[2]["pass"]
    assert not out[3]["duration"] and not out[3]["pass"]
    assert not out[4]["decoded"] and not out[4]["pass"]


def test_end_to_end_on_real_encoded_images(spark):
    """Real payloads through extract_features then the gate: a detailed
    large image passes; a solid color and a sliver banner fail; a
    corrupt payload quarantines and fails `decoded`."""
    from binance_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        PNG_MIME,
        default_decoder,
        encode_png,
        extract_features,
    )

    rng = np.random.default_rng(5)
    good = rng.integers(0, 256, (96, 128, 3), dtype=np.uint8)
    solid = np.full((96, 128, 3), 77, np.uint8)
    sliver = rng.integers(0, 256, (10, 600, 3), dtype=np.uint8)
    rows = [
        (1, "image", PNG_MIME, encode_png(good), None, None, None),
        (2, "image", PNG_MIME, encode_png(solid), None, None, None),
        (3, "image", PNG_MIME, encode_png(sliver), None, None, None),
        (4, "image", PNG_MIME, b"\x89PNG\r\n\x1a\njunk", None, None, None),
    ]
    feats = extract_features(
        spark.createDataFrame(rows, MEDIA_SCHEMA),
        default_decoder(),
        on_error="quarantine",
    ).withColumn("source", F.lit("web"))
    out = {r["media_id"]: r["q"] for r in
           feats.withColumn("q", image_flags("feature")).collect()}
    assert out[1]["pass"]
    assert not out[2]["not_solid"] and not out[2]["pass"]
    assert not out[3]["aspect"] and not out[3]["pass"]
    assert not out[4]["decoded"] and not out[4]["pass"]
    kept = filter_by_source(feats.drop("quarantine_reason"))
    assert [r["media_id"] for r in kept.collect()] == [1]
