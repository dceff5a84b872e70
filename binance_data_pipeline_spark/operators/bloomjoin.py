"""Bloom-prefiltered joins — cut the big side's shuffle BEFORE it
happens when a join is selective.

A plain ``fact.join(keys, k)`` shuffles every fact row, even when only
1% of them have a partner. The classic fix (Spark's InjectRuntimeFilter
optimization uses the same idea internally) is a Bloom filter:
aggregate the SMALL side's keys into a bitmap (KBs–MBs regardless of
row count), broadcast it, and drop non-matching fact rows MAP-SIDE —
the shuffle then carries only probable matches plus the false
positives, and the exact join after it stays exact (the filter only
ever passes supersets).

Spark's ``bloom_filter_agg`` expression is not exposed through the
public function registry, so the bitmap is built from first principles
with plain aggregates (the `contamination_report_bloom` recipe,
operators/dedup.py:604, generalized to any key column):

  build : keys → k hash positions each → groupBy(bitmap word) →
          bit_or — a distributed bitmap build collapsed to ONE row
          holding a sparse map<word, bits> (set words only).
  filter: the 1-row map broadcast-crossJoins onto the big side (the
          repo's 1-row pattern); membership = AND over k probes of
          ``element_at(map, word) >> bit & 1`` — pure JVM expressions
          inside codegen, no UDF, no Exchange before the filter.

When to use: the key side fits an aggregate pass but NOT a broadcast
hash join (tens of millions of keys — too big to broadcast raw, tiny
as bits), and selectivity is real. When the small side broadcasts
outright, use a broadcast join; this op is the middle regime.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["build_key_bloom", "bloom_prefilter", "bloom_join"]


def _num_probes(bits_per_item: float) -> int:
    """Optimal k = m/n·ln2, clamped to a practical range."""
    return max(1, min(12, round(bits_per_item * math.log(2))))


def build_key_bloom(
    keys: DataFrame,
    key_col: str,
    expected_items: int | None = None,
    fpp: float = 0.01,
) -> tuple[DataFrame, int, int]:
    """(one-row bitmap frame, m_bits, n_probes) over ``keys``'
    ``key_col``. ``expected_items`` skips the sizing count() when the
    cardinality is already known (from a profile or a sketch)."""
    if not 0 < fpp < 1:
        raise ValueError(f"fpp must be in (0,1), got {fpp}")
    n = expected_items if expected_items is not None else keys.count()
    n = max(1, int(n))
    bits_per_item = -math.log(fpp) / (math.log(2) ** 2)
    m_bits = max(64, int(n * bits_per_item))
    k = _num_probes(bits_per_item)

    hashed = keys.select(F.xxhash64(F.col(key_col)).alias("h"))
    pos_legs = [
        hashed.select(F.pmod(F.xxhash64(F.col("h"), F.lit(i)), F.lit(m_bits)).alias("p"))
        for i in range(k)
    ]
    positions = pos_legs[0]
    for leg in pos_legs[1:]:
        positions = positions.union(leg)
    bloom = (
        positions.select(
            (F.col("p") / 64).cast("long").alias("w"),
            F.expr("shiftleft(1L, int(p % 64))").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("bits"))
        .agg(F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("__bloom"))
    )
    return bloom, m_bits, k


def _membership(key_col: str, m_bits: int, k: int) -> Column:
    h = F.xxhash64(F.col(key_col))
    member = F.lit(True)
    for i in range(k):
        p = F.pmod(F.xxhash64(h, F.lit(i)), F.lit(m_bits))
        word = F.coalesce(F.element_at(F.col("__bloom"), (p / 64).cast("long")), F.lit(0))
        bit = F.expr(f"shiftleft(1L, int(pmod(xxhash64(xxhash64(`{key_col}`), {i}), {m_bits}) % 64))")
        member = member & (word.bitwiseAND(bit) != 0)
    return member


def bloom_prefilter(
    big: DataFrame,
    keys: DataFrame,
    big_key: str,
    keys_key: str | None = None,
    expected_items: int | None = None,
    fpp: float = 0.01,
) -> DataFrame:
    """``big`` reduced to rows whose ``big_key`` PROBABLY appears in
    ``keys`` — a superset of the true matches (≈``fpp`` false-positive
    rate), never a subset, so any exact join downstream stays exact.
    NULL keys never match (SQL join semantics). Map-side only: the
    bitmap rides a 1-row broadcast, the big side sees no Exchange."""
    keys_key = keys_key or big_key
    nonnull_keys = keys.where(F.col(keys_key).isNotNull())
    if expected_items is None and nonnull_keys.isEmpty():
        return big.where(F.lit(False))
    bloom, m_bits, k = build_key_bloom(
        nonnull_keys, keys_key, expected_items=expected_items, fpp=fpp
    )
    return (
        big.crossJoin(F.broadcast(bloom))
        .where(F.col(big_key).isNotNull() & _membership(big_key, m_bits, k))
        .drop("__bloom")
    )


def bloom_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    how: str = "inner",
    expected_items: int | None = None,
    fpp: float = 0.01,
) -> DataFrame:
    """Exact equi-join with the big side Bloom-prefiltered first. Single
    string key (composite keys: concat them into one column first).
    ``how`` supports the join types where pre-dropping non-matching BIG
    rows is semantics-preserving: inner / left_semi / right /
    right_outer (the big side's unmatched rows don't survive those
    joins anyway). A left join would lose the big side's unmatched rows
    — rejected loudly."""
    key = on if isinstance(on, str) else None
    if key is None:
        raise ValueError("bloom_join takes a single key column; concat composites")
    if how not in ("inner", "left_semi", "right", "right_outer"):
        raise ValueError(
            f"how={how!r} would drop big-side rows the join must keep; "
            "use inner/left_semi/right/right_outer or a plain join"
        )
    pre = bloom_prefilter(big, small, key, expected_items=expected_items, fpp=fpp)
    return pre.join(small, key, how)
