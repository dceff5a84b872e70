"""In-process memo for small serve-path index metadata.

Every query against a persisted index pays a handful of driver-side
reads before any real work starts — the retrieval manifest, BM25 corpus
stats, IVF centroids. Each is a tiny parquet, but each read is a full
Spark job (~100 ms of scheduling for KBs of data), and a serving tier
issues them PER QUERY CALL. A deployed search layer loads index
metadata once and reuses it; this module is that layer's cache, scoped
to the driver process (the northstar recall-evidence memo precedent).

Invalidation is by the metadata DIRECTORY LISTING — (name, length,
mtime) of every file under the path, one FileSystem RPC. Keying on the
listing rather than the directory's own mtime matters on object stores:
S3A directories are synthetic (mtime 0 forever), but the files inside
carry real lengths/mtimes, so an atomic-swap rebuild or an append
always changes the key. A stale hit is therefore impossible as long as
writers follow the repo's swap/append discipline (new or replaced
files, never in-place mutation — which parquet cannot do anyway).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import SparkSession

from .ivf import _hadoop_fs

__all__ = ["cached_meta", "invalidate_meta", "local_relation"]

_CACHE: dict[str, tuple[tuple, Any]] = {}


def _listing_key(spark: SparkSession, path: str) -> tuple:
    fs, p = _hadoop_fs(spark, path)
    return tuple(
        sorted(
            (st.getPath().getName(), st.getLen(), st.getModificationTime())
            for st in fs.listStatus(p)
        )
    )


def cached_meta(
    spark: SparkSession, path: str, loader: Callable[[], Any], ns: str = ""
) -> Any:
    """``loader()``'s result memoized under ``path``'s current listing.
    The loader must return plain driver-side data (rows, dicts, ints) —
    never a DataFrame, whose lineage would outlive the cache entry.
    ``ns`` separates different loaders over the same path (e.g. an
    index's full meta dict vs just its fingerprint)."""
    key = _listing_key(spark, path)
    slot = ns + "\x00" + path
    hit = _CACHE.get(slot)
    if hit is not None and hit[0] == key:
        return hit[1]
    value = loader()
    _CACHE[slot] = (key, value)
    return value


def invalidate_meta(path: str | None = None) -> None:
    """Drop one path's entries (all namespaces) or everything —
    test/maintenance hook."""
    if path is None:
        _CACHE.clear()
    else:
        for slot in [s for s in _CACHE if s.endswith("\x00" + path)]:
            _CACHE.pop(slot, None)


def local_relation(spark: SparkSession, rows: list, schema) -> "Any":
    """Small driver-side row set as a DataFrame the JVM can scan WITHOUT
    Python workers: ``createDataFrame(list)`` parallelizes into pickled
    RDD slices that re-enter Python on EVERY action (measured 0.4-4.5 s
    per action for 16 rows at local[32] — scheduling plus worker spin-up
    for data that is already on the driver); the Arrow path below turns
    the same rows into record batches the JVM reads directly (~10 ms).
    ``rows`` are pyspark Rows or tuples; ``schema`` is a DataFrame
    schema or DDL string. Serve-path use only — callers must bound the
    row count (these rows live on the driver by construction)."""
    import pandas as pd

    from pyspark.sql.types import StructType

    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(schema)
    assert isinstance(schema, StructType)
    names = [f.name for f in schema.fields]
    pdf = pd.DataFrame.from_records(
        [tuple(r) for r in rows], columns=names
    ) if rows else pd.DataFrame({n: [] for n in names})
    return spark.createDataFrame(pdf, schema)
