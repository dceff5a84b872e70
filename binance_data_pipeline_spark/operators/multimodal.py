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
