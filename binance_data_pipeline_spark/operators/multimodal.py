"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed in Arrow batches via mapInPandas.

The Spark-side shape is real and tested — schema contract, Arrow batch
flow, partition sizing — while the actual media decoding is stubbed
(`decode_image` raises NotImplementedError unless a decoder is injected;
the container has no image/audio libs). Swap `decoder=` with a PIL/ffmpeg
adapter in production.

Scale notes: binary payloads dominate row size → keep
`spark.sql.files.maxPartitionBytes` small enough that an Arrow batch of
rows fits executor memory; metadata-only transforms must select AWAY the
binary column first (column pruning drops the bytes at the scan).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical multimodal table schema: payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),        # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),      # images/video
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),   # audio/video
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, payload_hash string, feature array<float>"
)

#: decoder(payload bytes, mime) -> feature list[float]
Decoder = Callable[[bytes, str], list[float]]


def decode_stub(payload: bytes, mime: str) -> list[float]:
    """Placeholder decoder: the real one needs PIL/libav, absent here."""
    raise NotImplementedError(
        "media decoding requires an image/audio library not present in this "
        "environment; inject a real Decoder"
    )


def deterministic_fake_decoder(dim: int = 8) -> Decoder:
    """Offline stand-in: derives a deterministic feature vector from the
    payload bytes (keeps the full pipeline testable without media libs)."""

    def decode(payload: bytes, mime: str) -> list[float]:
        h = 1469598103934665603
        for b in payload[:4096]:
            h = ((h ^ b) * 1099511628211) % (1 << 64)
        return [((h >> (8 * i)) & 0xFF) / 255.0 for i in range(dim)]

    return decode


def extract_features(
    media: DataFrame, decoder: Decoder = decode_stub, batch_hint: int = 64
) -> DataFrame:
    """payload → feature vector via Arrow-batched mapInPandas.

    The UDF boundary transfers (media_id, kind, mime, payload) only —
    project before calling if the table carries more columns.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            feats, hashes, sizes = [], [], []
            for payload, mime in zip(pdf["payload"], pdf["mime"]):
                raw = bytes(payload) if payload is not None else b""
                sizes.append(len(raw))
                hashes.append(hashlib.md5(raw).hexdigest())
                feats.append(decoder(raw, mime))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": sizes,
                    "payload_hash": hashes,
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "mime", "payload").mapInPandas(
        run, FEATURE_SCHEMA
    )


#: resizer(payload, mime, w, h) -> bytes of the resized image
Resizer = Callable[[bytes, str, int, int], bytes]

RESIZED_SCHEMA = "media_id long, mime string, width int, height int, payload binary"
FRAMES_SCHEMA = "media_id long, frame_idx int, frame_ts_ms long, frame binary"


def resize_stub(payload: bytes, mime: str, w: int, h: int) -> bytes:
    raise NotImplementedError(
        "image resize requires an imaging library not present in this "
        "environment; inject a real Resizer"
    )


def fake_resizer(payload: bytes, mime: str, w: int, h: int) -> bytes:
    """Offline stand-in: deterministic truncation/padding to w*h bytes —
    keeps the shape contract testable without PIL."""
    target = max(w * h, 1)
    return (payload * (target // max(len(payload), 1) + 1))[:target]


def resize_images(
    media: DataFrame, width: int, height: int, resizer: Resizer = resize_stub
) -> DataFrame:
    """Resize pass over image rows: Arrow-batched, only image-kind rows
    enter the UDF (the filter prunes before the Python boundary)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                raw = bytes(row.payload) if row.payload is not None else b""
                out.append(
                    {
                        "media_id": row.media_id,
                        "mime": row.mime,
                        "width": width,
                        "height": height,
                        "payload": resizer(raw, row.mime, width, height),
                    }
                )
            yield pd.DataFrame(out, columns=["media_id", "mime", "width", "height", "payload"])

    return (
        media.where(F.col("kind") == "image")
        .select("media_id", "mime", "payload")
        .mapInPandas(run, RESIZED_SCHEMA)
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling for video rows: emits one row per sampled timestamp.

    The timestamp grid is computed JVM-side (sequence over duration);
    actual frame extraction is the stubbed decode step — here each frame
    row carries the source payload reference; a real decoder would replace
    it with the decoded frame bytes in the downstream extract_features
    pass. The Spark-side shape (explode to frame rows, frame_idx/ts
    schema) is the real contract."""
    grid = media.where(F.col("kind") == "video").select(
        "media_id",
        "payload",
        F.posexplode(
            F.sequence(F.lit(0), F.greatest((F.col("duration_ms") / every_ms).cast("long") - 1, F.lit(0)))
        ).alias("frame_idx", "tick"),
    )
    return grid.select(
        "media_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        (F.col("tick") * every_ms).cast("long").alias("frame_ts_ms"),
        F.col("payload").alias("frame"),
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Shape/duration rollup from the typed metadata columns only — the
    projection excludes `payload`, so column pruning keeps the bytes out of
    the scan entirely (verify via ReadSchema in explain)."""
    return (
        media.select("kind", "mime", "width", "height", "duration_ms")
        .groupBy("kind", "mime")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("width").alias("max_width"),
            F.max("height").alias("max_height"),
            F.sum("duration_ms").alias("total_duration_ms"),
        )
    )
