"""Window-function differential bar: every major window shape (ranking,
offsets, running/sliding frames, distribution functions) evaluated by
Spark's Window API and by DuckDB over the same rows, compared value-level.
Windows are the classic cross-engine divergence surface (tie handling,
default frames, null ordering), so each case pins one shape with either a
unique order key (making RANGE≡ROWS and results total-ordered) or a
tie-tolerant function (rank/dense_rank depend only on order VALUES).

l_quantity is integer-valued, so running sums / bounded-frame averages are
IEEE-exact on both engines; no rounding games needed."""

from __future__ import annotations

import os as _os

from conftest import SF_SMALL as _DEFAULT_SF_DIR

# The whole differential bar is scale-parametric: point
# SPARK_FUZZ_SF_DIR at a bigger sf dir to re-run every case there
# (the per-round pin is sf0.001; sf0.01 is exercised by
# scripts/fuzz_at_scale reruns).
SF_SMALL = _os.environ.get("SPARK_FUZZ_SF_DIR", _DEFAULT_SF_DIR)

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from binance_data_pipeline_spark.catalog import load_table
from oracle_harness import compare, duck_connection

# Keep the row set small but non-trivial: one ship-month (~hundreds of rows).
FILTER_SQL = "l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'"


def _base(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1997-03-01")) & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )


def _w_unique(part):
    # (l_orderkey, l_linenumber) alone is NOT unique in the synthetic
    # data at sf0.1 (41 duplicate pairs in the test month) — the
    # value columns join the key so the order is total wherever the
    # measured column is involved, keeping ROWS frames deterministic
    # at every scale factor.
    return Window.partitionBy(part).orderBy(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


ID_COLS = ["l_orderkey", "l_linenumber"]
ID_SQL = "l_orderkey, l_linenumber"


def case_row_number(spark):
    df = _base(spark).select(
        *ID_COLS, F.row_number().over(_w_unique("l_returnflag")).alias("rn")
    )
    sql = f"""SELECT {ID_SQL},
              row_number() OVER (PARTITION BY l_returnflag
                                 ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice) AS rn
              FROM lineitem WHERE {FILTER_SQL}"""
    return df, sql


def case_rank_with_ties(spark):
    w = Window.partitionBy("l_linestatus").orderBy("l_quantity")
    df = _base(spark).select(
        *ID_COLS, F.rank().over(w).alias("rnk"), F.dense_rank().over(w).alias("drnk")
    )
    sql = f"""SELECT {ID_SQL},
              rank() OVER (PARTITION BY l_linestatus ORDER BY l_quantity) AS rnk,
              dense_rank() OVER (PARTITION BY l_linestatus ORDER BY l_quantity) AS drnk
              FROM lineitem WHERE {FILTER_SQL}"""
    return df, sql


def case_lag_lead(spark):
    w = _w_unique("l_returnflag")
    df = _base(spark).select(
        *ID_COLS,
        F.lag("l_quantity", 1).over(w).alias("prev_qty"),
        F.lead("l_quantity", 2, -1.0).over(w).alias("next2_qty"),
    )
    sql = f"""SELECT {ID_SQL},
              lag(l_quantity, 1) OVER (PARTITION BY l_returnflag
                                       ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice) AS prev_qty,
              lead(l_quantity, 2, -1.0) OVER (PARTITION BY l_returnflag
                                              ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice) AS next2_qty
              FROM lineitem WHERE {FILTER_SQL}"""
    return df, sql


def case_running_sum(spark):
    w = _w_unique("l_returnflag").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df = _base(spark).select(*ID_COLS, F.sum("l_quantity").over(w).alias("run_qty"))
    sql = f"""SELECT {ID_SQL},
              sum(l_quantity) OVER (PARTITION BY l_returnflag
                                    ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_qty
              FROM lineitem WHERE {FILTER_SQL}"""
    return df, sql


def case_sliding_avg(spark):
    w = _w_unique("l_linestatus").rowsBetween(-3, Window.currentRow)
    df = _base(spark).select(*ID_COLS, F.avg("l_quantity").over(w).alias("ma4"))
    sql = f"""SELECT {ID_SQL},
              avg(l_quantity) OVER (PARTITION BY l_linestatus
                                    ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice
                                    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS ma4
              FROM lineitem WHERE {FILTER_SQL}"""
    return df, sql


def case_first_last_value(spark):
    w = _w_unique("l_returnflag").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    df = _base(spark).select(
        *ID_COLS,
        F.first("l_quantity").over(w).alias("first_qty"),
        F.last("l_quantity").over(w).alias("last_qty"),
    )
    sql = f"""SELECT {ID_SQL},
              first_value(l_quantity) OVER (PARTITION BY l_returnflag
                  ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_qty,
              last_value(l_quantity) OVER (PARTITION BY l_returnflag
                  ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_qty
              FROM lineitem WHERE {FILTER_SQL}"""
    return df, sql


def case_ntile(spark):
    df = _base(spark).select(
        *ID_COLS, F.ntile(4).over(_w_unique("l_linestatus")).alias("quartile")
    )
    sql = f"""SELECT {ID_SQL},
              ntile(4) OVER (PARTITION BY l_linestatus
                             ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice) AS quartile
              FROM lineitem WHERE {FILTER_SQL}"""
    return df, sql


def case_distribution(spark):
    w = _w_unique("l_returnflag")
    df = _base(spark).select(
        *ID_COLS,
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    sql = f"""SELECT {ID_SQL},
              percent_rank() OVER (PARTITION BY l_returnflag
                                   ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice) AS pr,
              cume_dist() OVER (PARTITION BY l_returnflag
                                ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice) AS cd
              FROM lineitem WHERE {FILTER_SQL}"""
    return df, sql


def case_unpartitioned_global(spark):
    # No PARTITION BY: the single-partition window a naive engine chokes
    # on; row set is one month so the collapse is bounded here.
    w = Window.orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    df = _base(spark).select(*ID_COLS, F.row_number().over(w).alias("rn"))
    sql = f"""SELECT {ID_SQL},
              row_number() OVER (ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice) AS rn
              FROM lineitem WHERE {FILTER_SQL}"""
    return df, sql


def case_range_frames(spark):
    """RANGE frames (value-based, peer-inclusive — the one frame family
    the ROWS cases can't reach): a running sum over a numeric ORDER
    column includes ALL peers of the current value on both engines, and
    a bounded numeric range (5 PRECEDING) windows by VALUE distance.
    Deterministic regardless of tie order, so the order column needs no
    unique tie-break."""
    w_run = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_quantity")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_band = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_quantity")
        .rangeBetween(-5, Window.currentRow)
    )
    df = _base(spark).select(
        *ID_COLS,
        F.round(F.sum("l_extendedprice").over(w_run), 4).alias("run_price"),
        F.count(F.lit(1)).over(w_band).alias("band_n"),
    )
    sql = f"""SELECT {ID_SQL},
              round(sum(l_extendedprice) OVER (PARTITION BY l_returnflag
                  ORDER BY l_quantity
                  RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS run_price,
              count(*) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                  RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS band_n
              FROM lineitem WHERE {FILTER_SQL}"""
    return df, sql




def case_null_order_keys(spark):
    """Null ORDER BY keys with EXPLICIT placement on both engines — the
    engines' DEFAULTS diverge (Spark ascending is NULLS FIRST, DuckDB is
    NULLS LAST), so a lowering that forgets to spell it out silently
    reorders every null-keyed frame. rank() is tie-tolerant (all
    null-key rows tie), making the comparison exact."""
    df = (
        _base(spark)
        .select(
            *ID_COLS, "l_linestatus",
            F.when(F.col("l_orderkey") % 7 == 0, F.lit(None))
            .otherwise(F.col("l_quantity")).alias("q"),
        )
        .select(
            *ID_COLS,
            F.rank().over(
                Window.partitionBy("l_linestatus")
                .orderBy(F.col("q").asc_nulls_last())
            ).alias("rnk_last"),
            F.rank().over(
                Window.partitionBy("l_linestatus")
                .orderBy(F.col("q").desc_nulls_first())
            ).alias("rnk_desc_first"),
        )
    )
    sql = f"""
        SELECT {ID_SQL},
               rank() OVER (PARTITION BY l_linestatus
                            ORDER BY q ASC NULLS LAST) AS rnk_last,
               rank() OVER (PARTITION BY l_linestatus
                            ORDER BY q DESC NULLS FIRST) AS rnk_desc_first
        FROM (SELECT l_orderkey, l_linenumber, l_linestatus,
                     CASE WHEN l_orderkey % 7 = 0 THEN NULL
                          ELSE l_quantity END AS q
              FROM lineitem WHERE {FILTER_SQL})"""
    return df, sql


def case_null_inputs_in_frames(spark):
    """Null AGGREGATE INPUTS inside running frames: sum/avg skip nulls,
    count(q) vs count(*) diverge per-frame, and a frame of only-null
    inputs yields NULL (not 0). Order key stays unique so frames are
    deterministic."""
    w = (
        Window.partitionBy("l_linestatus")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = (
        _base(spark)
        .select(
            *ID_COLS, "l_linestatus", "l_quantity", "l_extendedprice",
            F.when(F.col("l_orderkey") % 7 == 0, F.lit(None))
            .otherwise(F.col("l_quantity")).alias("q"),
        )
        .select(
            *ID_COLS,
            F.sum("q").over(w).alias("run_sum"),
            F.count("q").over(w).alias("n_q"),
            F.count(F.lit(1)).over(w).alias("n_rows"),
        )
    )
    sql = f"""
        SELECT {ID_SQL},
               sum(q) OVER w AS run_sum,
               count(q) OVER w AS n_q,
               count(*) OVER w AS n_rows
        FROM (SELECT l_orderkey, l_linenumber, l_linestatus,
                     l_quantity, l_extendedprice,
                     CASE WHEN l_orderkey % 7 = 0 THEN NULL
                          ELSE l_quantity END AS q
              FROM lineitem WHERE {FILTER_SQL})
        WINDOW w AS (PARTITION BY l_linestatus
                     ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""
    return df, sql


CASES = {
    "row_number": case_row_number,
    "range_frames": case_range_frames,
    "rank_with_ties": case_rank_with_ties,
    "lag_lead": case_lag_lead,
    "running_sum": case_running_sum,
    "sliding_avg": case_sliding_avg,
    "first_last_value": case_first_last_value,
    "ntile": case_ntile,
    "distribution": case_distribution,
    "unpartitioned_global": case_unpartitioned_global,
    "null_order_keys": case_null_order_keys,
    "null_inputs_in_frames": case_null_inputs_in_frames,
}


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMALL)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(CASES))
def test_window_differential(spark, duck, name):
    df, sql = CASES[name](spark)
    oracle = duck.sql(sql).df()
    assert len(oracle) > 0
    errors = compare(df, oracle, name)
    assert not errors, "\n".join(errors)
