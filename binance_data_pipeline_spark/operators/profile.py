"""Table profiling — the data-docs operator: one row of statistics per
column (nulls, distinct estimate, range, moments, quantiles, top
values), the report every warehouse onboarding and every corpus intake
starts with (the reference has only the two dbt tests on one column;
`quality.py` asserts, this DESCRIBES).

Cost model, deliberately two passes regardless of column count:

- **stats pass**: ONE aggregation carrying every column's expressions
  (count/nulls/approx-distinct/min/max plus mean/stddev/percentiles for
  numerics) — a single scan with map-side partial aggregation, one
  1-row result.
- **top-values pass**: the table melted to (column, value) pairs via a
  single ``stack`` projection, one hash aggregate, one per-column
  top-k window over the #columns × #distinct aggregated rows.

Driver state is one wide row plus #columns × k top-value rows —
bounded by the schema, never the data. Output is a DataFrame so the
profile can be written next to the table it describes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["profile_table"]

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)
#: Types whose min/max/top-values are meaningful as strings.
_ORDERABLE = _NUMERIC + (T.StringType, T.DateType, T.TimestampType, T.BooleanType)


def profile_table(
    df: DataFrame,
    top_k: int = 5,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75),
    distinct_rsd: float = 0.02,
) -> DataFrame:
    """Per-column profile: (column, dtype, n_rows, n_nulls, null_frac,
    n_distinct_est, min_value, max_value, mean, stddev, q<..> ...,
    top_values array<struct<value,count>>). Complex-typed columns
    (arrays/structs/maps/binary) get null/count stats only."""
    if top_k < 0:
        raise ValueError("top_k must be >= 0")
    fields = df.schema.fields
    if not fields:
        raise ValueError("cannot profile a zero-column DataFrame")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for f in fields:
        c, safe = F.col(f.name), f.name
        aggs.append(F.sum(c.isNull().cast("long")).alias(f"{safe}__nulls"))
        if isinstance(f.dataType, _ORDERABLE):
            aggs.append(
                F.approx_count_distinct(c, rsd=distinct_rsd).alias(f"{safe}__nd")
            )
            aggs.append(F.min(c).cast("string").alias(f"{safe}__min"))
            aggs.append(F.max(c).cast("string").alias(f"{safe}__max"))
        if isinstance(f.dataType, _NUMERIC):
            aggs.append(F.avg(c).cast("double").alias(f"{safe}__mean"))
            aggs.append(F.stddev_samp(c).cast("double").alias(f"{safe}__std"))
            for q in quantiles:
                aggs.append(
                    F.expr(f"percentile_approx(`{f.name}`, {q})")
                    .cast("double")
                    .alias(f"{safe}__q{int(q * 100)}")
                )
    stats = df.agg(*aggs).first().asDict()
    n_rows = int(stats["__n"])

    top: dict[str, list] = {f.name: [] for f in fields}
    meltable = [f.name for f in fields if isinstance(f.dataType, _ORDERABLE)]
    if top_k > 0 and meltable and n_rows > 0:
        stack_expr = "stack({n}, {args}) as (col, value)".format(
            n=len(meltable),
            args=", ".join(f"'{c}', cast(`{c}` as string)" for c in meltable),
        )
        pairs = df.selectExpr(stack_expr).where(F.col("value").isNotNull())
        w = Window.partitionBy("col").orderBy(F.desc("cnt"), F.asc("value"))
        ranked = (
            pairs.groupBy("col", "value")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= top_k)
        )
        for r in ranked.collect():
            top[r["col"]].append((r["value"], int(r["cnt"]), int(r["rk"])))

    qcols = [f"q{int(q * 100)}" for q in quantiles]
    rows = []
    for f in fields:
        s = f.name
        nulls = int(stats[f"{s}__nulls"] or 0)  # SUM over zero rows is NULL
        row = {
            "column": s,
            "dtype": f.dataType.simpleString(),
            "n_rows": n_rows,
            "n_nulls": nulls,
            "null_frac": (nulls / n_rows) if n_rows else None,
            "n_distinct_est": (
                int(stats[f"{s}__nd"]) if f"{s}__nd" in stats else None
            ),
            "min_value": stats.get(f"{s}__min"),
            "max_value": stats.get(f"{s}__max"),
            "mean": stats.get(f"{s}__mean"),
            "stddev": stats.get(f"{s}__std"),
            **{qc: stats.get(f"{s}__{qc}") for qc in qcols},
            "top_values": [
                {"value": v, "count": c}
                for v, c, _ in sorted(top[s], key=lambda t: t[2])
            ],
        }
        rows.append(row)

    schema = T.StructType(
        [
            T.StructField("column", T.StringType()),
            T.StructField("dtype", T.StringType()),
            T.StructField("n_rows", T.LongType()),
            T.StructField("n_nulls", T.LongType()),
            T.StructField("null_frac", T.DoubleType()),
            T.StructField("n_distinct_est", T.LongType()),
            T.StructField("min_value", T.StringType()),
            T.StructField("max_value", T.StringType()),
            T.StructField("mean", T.DoubleType()),
            T.StructField("stddev", T.DoubleType()),
        ]
        + [T.StructField(qc, T.DoubleType()) for qc in qcols]
        + [
            T.StructField(
                "top_values",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("value", T.StringType()),
                            T.StructField("count", T.LongType()),
                        ]
                    )
                ),
            )
        ]
    )
    spark = df.sparkSession
    return spark.createDataFrame(
        [tuple(r[f.name] for f in schema.fields) for r in rows], schema
    )
