"""Advanced relational surface: as-of join, weighted windows/VWAP,
grouping sets, exact percentiles, statistical aggregates, regexp, array
functions, subqueries, conditional (pivot-style) aggregation.

Everything here is oracle-checked against DuckDB. Queries use the same
load-table plumbing as the rest of the catalog; two use ``spark.sql`` over
temp views where the SQL form (GROUPING SETS, IN-subquery) is the idiomatic
surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.asof import asof_join_union


def q_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join on the events stream: for each purchase, the user's most
    recent click at or before it (trade×quote shape). Runs the bucketed
    two-phase form (daily buckets) so a hot key's history is split across
    (key × bucket) tasks — see operators/asof.py.

    Both sides live in the SAME events table, so the tagged union is
    built as ONE filtered scan (guide §6: the r12 plan decoded
    events.parquet four times — two scans per union reference); the
    projected columns are exactly what asof_join's two-frame entry
    would union."""
    e = load_table(spark, sf_dir, "events")
    is_p = F.col("event_type") == "purchase"
    unioned = e.where(F.col("event_type").isin("purchase", "click")).select(
        "user_id",
        F.when(is_p, F.col("event_id")).alias("purchase_id"),
        "ts",
        F.when(is_p, F.col("value")).alias("purchase_value"),
        F.when(is_p, F.lit(1)).otherwise(F.lit(0)).alias("__side"),
        F.when(~is_p, F.col("value")).alias("__r_click_value"),
    )
    out = asof_join_union(
        unioned, ["user_id", "purchase_id", "ts", "purchase_value"],
        on="user_id", ts_col="ts", value_cols=["click_value"],
        bucket_seconds=86_400,
    )
    return out.select(
        "user_id",
        "purchase_id",
        F.round("purchase_value", 4).alias("purchase_value"),
        F.round("click_value_asof", 4).alias("last_click_value"),
    )


def q_vwap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted average (VWAP shape): per (day, event_type), value weighted
    by the JSON prop k — exercises weighted aggregation + JSON extraction in
    one pass."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("double")
    return (
        e.select(F.to_date("ts").alias("day"), "event_type", "value", k.alias("w"))
        .groupBy("day", "event_type")
        .agg(
            F.round(F.sum(F.col("value") * F.col("w")) / F.sum("w"), 4).alias("vwap"),
            F.round(F.sum("w"), 4).alias("total_weight"),
        )
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS ((status, priority), (status), ()) — finer control than
    rollup/cube; one shuffle via Expand."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n, round(sum(o_totalprice), 4) AS sum_price
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        """
    )


def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/vector scalar surface over embeddings: dimension, L2 norm,
    element access, per-label rollup."""
    e = load_table(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    per_vec = e.select(
        "vec_id",
        "label",
        F.size("embedding").cast("long").alias("dim"),
        F.round(norm, 4).alias("l2_norm"),
        F.round(F.element_at("embedding", 1).cast("double"), 4).alias("first_component"),
    )
    return per_vec.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("dim").alias("dim"),
        F.round(F.avg("l2_norm"), 4).alias("avg_norm"),
        F.round(F.avg("first_component"), 4).alias("avg_first_component"),
    )


def q_subquery_shapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated IN-subquery + NOT IN (Catalyst's null-aware anti
    join) + correlated scalar subquery in one tagged result (Catalyst
    decorrelates all three to joins — check the plan, not the syntax).
    Consolidates the round-1 `in_subquery` + `correlated_scalar_subquery`
    entries; the NOT IN 3VL edge cases (empty subquery, inner NULLs) are
    pinned by the subquery-shape differential fuzz.

    Round 10: a fourth leg, `correlated_count`, runs through the
    ``scalar_agg_filter`` HELPER (not SQL text) so the decorrelation
    COUNT rule — an empty correlated group compares as COUNT = 0, not a
    dropped row — is graded against the oracle: customers whose
    high-value-order count is <= c_custkey % 3 include every customer
    with NO such orders (the pre-fix lowering silently dropped them)."""
    from ..operators.subqueries import scalar_agg_filter

    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v2")
    sql_legs = spark.sql(
        """
        SELECT 'in_subquery' AS shape, c_mktsegment, count(*) AS n
        FROM customer_v
        WHERE c_custkey IN (
            SELECT o_custkey FROM orders_v2 WHERE o_totalprice > 300000)
        GROUP BY c_mktsegment
        UNION ALL
        SELECT 'not_in_subquery' AS shape, c_mktsegment, count(*) AS n
        FROM customer_v
        WHERE c_custkey NOT IN (
            SELECT o_custkey FROM orders_v2 WHERE o_totalprice > 300000)
        GROUP BY c_mktsegment
        UNION ALL
        SELECT 'correlated_scalar' AS shape, c_mktsegment, count(*) AS n
        FROM customer_v c1
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer_v c2
                           WHERE c2.c_mktsegment = c1.c_mktsegment)
        GROUP BY c_mktsegment
        """
    )
    c = load_table(spark, sf_dir, "customer")
    hi = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > 150000
    )
    count_leg = (
        scalar_agg_filter(
            c, F.col("c_custkey") % 3, ">=", hi, F.count(F.lit(1)),
            on=[("c_custkey", "o_custkey")],
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("correlated_count").alias("shape"), "c_mktsegment", "n"
        )
    )
    return sql_legs.unionByName(count_leg)


def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg/string_agg) — nation names per
    region, deterministically ordered."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... HAVING — customers whose lifetime order total exceeds a
    threshold (TPC-H Q11 shape)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 4).alias("lifetime_value"), F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("lifetime_value") > 1_000_000)
    )


def q_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: lineitem fact against part + supplier dims (both
    broadcast), rolled up by brand × supplier nation."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("p_brand", F.col("n_name").alias("supplier_nation"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment filter → 3-way join → per-order revenue,
    top-10 by revenue with date tiebreak."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        c.where(F.col("c_mktsegment") == "BUILDING")
        .join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .where(F.col("o_orderdate") < F.lit("1998-01-01"))
        .groupBy("o_orderkey", F.to_date("o_orderdate").alias("order_date"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: customers ranked by revenue lost to returned items
    (returnflag = 'R'), top-20."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li.where(F.col("l_returnflag") == "R"), o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("lost_revenue"))
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q_pivot_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot → unpivot round-trip in one plan: a proper pivot (wide table
    from categorical values, values PINNED so the schema is static — the
    scale-safe form; an unpinned pivot needs a distinct-scan first), then
    stack() melts it back to (priority, status, total) long rows. Exercises
    both reshape directions in one driver slot; consolidates the round-1
    `pivot_status` + `unpivot_stack` entries."""
    o = load_table(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.round(F.sum("o_totalprice"), 4))
    )
    return wide.select(
        "o_orderpriority",
        F.expr("stack(3, 'O', `O`, 'F', `F`, 'P', `P`) AS (status, total)"),
    ).where(F.col("total").isNotNull())


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): bilateral trade volume between two
    nations per ship year. lineitem (largest) drives the shuffle joins to
    orders/customer; supplier and both nation legs are broadcast. The
    two-nation predicate lands on broadcast-side dims, so the big-fact scan
    is pruned to 3 columns and filtered early via the supplier semi-side."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.where((F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1999-01-01")))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit) + a Q8-style per-year share:
    profit per (supplier nation, order year) for one part type, then each
    nation's share of the year's total via a window over the aggregate.
    The corpus has no partsupp table, so supply cost is proxied as
    0.6 × p_retailprice × quantity (the join/agg shape is what's exercised).
    Share math runs on DECIMAL(18,4) so the window sum is order-exact on
    both engines, then divides in double."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.6) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    per = (
        li.join(F.broadcast(p.where(F.col("p_type") == "ECONOMY")), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.round(F.sum(amount), 4).cast("decimal(18,4)").alias("profit_dec"))
    )
    w = Window.partitionBy("o_year")
    return per.select(
        "nation",
        "o_year",
        F.col("profit_dec").cast("double").alias("sum_profit"),
        F.round(
            F.col("profit_dec").cast("double") / F.sum("profit_dec").over(w).cast("double"), 6
        ).alias("year_share"),
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for each small part, the
    EUROPE supplier(s) offering the minimum unit cost — the classic
    correlated scalar subquery (min over the SAME joined relation,
    correlated on p_partkey). Expressed Spark-first as a window min over
    p_partkey + equality filter: the rewrite Catalyst applies to the
    correlated form, costing one exchange on partkey instead of a
    build-the-relation-twice self-join (the DuckDB oracle keeps the
    literal correlated subquery, so the equivalence is what's verified).
    This corpus has no partsupp table; unit cost derives per
    (part, supplier) as min(l_extendedprice / l_quantity) over lineitem
    (reference has no Q2 either — classic-shape coverage per SURVEY §2.3).
    Dims broadcast; min-equality on doubles is safe because the window min
    IS one of the compared values (no re-computation on either engine)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    # Filter BEFORE the aggregation: Catalyst cannot push a join through a
    # groupBy, so without these semi-joins the cost rollup would shuffle
    # (part × supplier) pairs for the WHOLE fact table and the predicates
    # would only drop groups afterwards. Group membership is decided purely
    # by (l_partkey, l_suppkey), so whole groups survive or vanish and the
    # per-group minima are unchanged. At 100 TB this is the difference
    # between aggregating 100% and ~4% of lineitem (p_size ∩ EUROPE).
    small_parts = p.where(F.col("p_size") <= 5)
    eur_supps = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(
            F.broadcast(r.where(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    li_f = li.join(
        F.broadcast(small_parts.select("p_partkey")), li.l_partkey == F.col("p_partkey"), "left_semi"
    ).join(
        F.broadcast(eur_supps.select("s_suppkey")), li.l_suppkey == F.col("s_suppkey"), "left_semi"
    )
    costs = li_f.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    eligible = costs.join(
        F.broadcast(small_parts), costs.l_partkey == p.p_partkey
    ).join(F.broadcast(eur_supps), costs.l_suppkey == F.col("s_suppkey"))
    w = Window.partitionBy("p_partkey")
    return (
        eligible.withColumn("min_cost", F.min("unit_cost").over(w))
        .where(F.col("unit_cost") == F.col("min_cost"))
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            F.col("n_name").alias("nation"),
            "s_acctbal",
            # round as pure double arithmetic, not round(): the min cost
            # is bit-identical on both engines (one division, one min),
            # but engines disagree at decimal-round half boundaries
            # (Spark HALF_UP vs DuckDB's double rounding — 6/1947 rows
            # at sf0.1); floor(x*1e4+0.5)/1e4 is the same IEEE ops on
            # the same double everywhere, so it cannot diverge
            (F.floor(F.col("unit_cost") * 1e4 + 0.5) / 1e4).alias("unit_cost"),
        )
    )


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "pivot_unpivot": q_pivot_unpivot,
    "shipping_priority": q_shipping_priority,
    "returned_items": q_returned_items,
    "q7_volume_shipping": q7_volume_shipping,
    "q9_product_profit": q9_product_profit,
    "string_agg": q_string_agg,
    "having_filter": q_having,
    "subquery_shapes": q_subquery_shapes,
    "star_join": q_star_join,
    "asof_purchase_click": q_asof_purchase_click,
    "vwap_daily": q_vwap_daily,
    "grouping_sets": q_grouping_sets,
    "array_functions": q_array_functions,
}


ORACLE = {
    "q2_min_cost_supplier": """
        WITH costs AS (
            SELECT l_partkey, l_suppkey,
                   min(l_extendedprice / l_quantity) AS unit_cost
            FROM lineitem GROUP BY 1, 2),
        elig AS (
            SELECT p.p_partkey, p.p_brand, s.s_name, n.n_name AS nation,
                   s.s_acctbal, c.unit_cost
            FROM costs c
            JOIN part p ON c.l_partkey = p.p_partkey AND p.p_size <= 5
            JOIN supplier s ON c.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE')
        SELECT p_partkey, p_brand, s_name, nation, s_acctbal,
               floor(unit_cost * 1e4 + 0.5) / 1e4 AS unit_cost
        FROM elig e
        WHERE unit_cost = (SELECT min(e2.unit_cost) FROM elig e2
                           WHERE e2.p_partkey = e.p_partkey)
    """,
    "pivot_unpivot": """
        WITH wide AS (
            SELECT o_orderpriority,
                   round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 4) AS o_total,
                   round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 4) AS f_total,
                   round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 4) AS p_total
            FROM orders GROUP BY o_orderpriority)
        SELECT o_orderpriority, status, total FROM (
            SELECT o_orderpriority, 'O' AS status, o_total AS total FROM wide
            UNION ALL SELECT o_orderpriority, 'F', f_total FROM wide
            UNION ALL SELECT o_orderpriority, 'P', p_total FROM wide)
        WHERE total IS NOT NULL
    """,
    "q7_volume_shipping": """
        SELECT supp_nation, cust_nation, l_year,
               round(sum(volume), 4) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   year(l_shipdate)::BIGINT AS l_year,
                   l_extendedprice * (1 - l_discount) AS volume
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1999-01-01'
              AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
    """,
    "q9_product_profit": """
        WITH per AS (
            SELECT n_name AS nation, year(o_orderdate)::BIGINT AS o_year,
                   round(sum(l_extendedprice * (1 - l_discount)
                             - 0.6 * p_retailprice * l_quantity), 4)::DECIMAL(18,4) AS profit_dec
            FROM lineitem
            JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN orders ON l_orderkey = o_orderkey
            GROUP BY n_name, year(o_orderdate)::BIGINT)
        SELECT nation, o_year,
               profit_dec::DOUBLE AS sum_profit,
               round(profit_dec::DOUBLE
                     / (sum(profit_dec) OVER (PARTITION BY o_year))::DOUBLE, 6) AS year_share
        FROM per
    """,
    "shipping_priority": """
        SELECT o_orderkey, o_orderdate::DATE AS order_date,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY o_orderkey, o_orderdate::DATE
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
    "returned_items": """
        SELECT c_custkey, c_name, n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS lost_revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey AND l_returnflag = 'R'
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY c_custkey, c_name, n_name
        ORDER BY lost_revenue DESC, c_custkey
        LIMIT 20
    """,
    "string_agg": """
        SELECT r_name,
               string_agg(n_name, ',' ORDER BY n_name) AS nations,
               count(*) AS n_nations
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "having_filter": """
        SELECT o_custkey,
               round(sum(o_totalprice), 4) AS lifetime_value,
               count(*) AS n_orders
        FROM orders GROUP BY o_custkey
        HAVING round(sum(o_totalprice), 4) > 1000000
    """,
    "subquery_shapes": """
        SELECT 'in_subquery' AS shape, c_mktsegment, count(*) AS n
        FROM customer
        WHERE c_custkey IN (
            SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        GROUP BY c_mktsegment
        UNION ALL
        SELECT 'not_in_subquery' AS shape, c_mktsegment, count(*) AS n
        FROM customer
        WHERE c_custkey NOT IN (
            SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        GROUP BY c_mktsegment
        UNION ALL
        SELECT 'correlated_scalar' AS shape, c_mktsegment, count(*) AS n
        FROM customer c1
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer c2
                           WHERE c2.c_mktsegment = c1.c_mktsegment)
        GROUP BY c_mktsegment
        UNION ALL
        SELECT 'correlated_count' AS shape, c_mktsegment, count(*) AS n
        FROM customer c1
        WHERE c_custkey % 3 >= (SELECT count(*) FROM orders o
                                WHERE o.o_custkey = c1.c_custkey
                                AND o.o_totalprice > 150000)
        GROUP BY c_mktsegment
    """,
    "star_join": """
        SELECT p_brand, n_name AS supplier_nation,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
               count(*) AS n_lineitems
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY p_brand, n_name
    """,
    "asof_purchase_click": """
        WITH purchases AS (
            SELECT user_id, event_id AS purchase_id, ts,
                   round(value, 4) AS purchase_value
            FROM events WHERE event_type = 'purchase'),
        clicks AS (
            SELECT user_id, ts, value AS click_value
            FROM events WHERE event_type = 'click'),
        matched AS (
            SELECT p.user_id, p.purchase_id, p.purchase_value,
                   (SELECT c.click_value FROM clicks c
                    WHERE c.user_id = p.user_id AND c.ts <= p.ts
                    ORDER BY c.ts DESC LIMIT 1) AS last_click
            FROM purchases p)
        SELECT user_id, purchase_id, purchase_value,
               round(last_click, 4) AS last_click_value
        FROM matched
    """,
    "vwap_daily": """
        SELECT ts::DATE AS day, event_type,
               round(sum(value * json_extract_string(props, '$.k')::DOUBLE)
                     / sum(json_extract_string(props, '$.k')::DOUBLE), 4) AS vwap,
               round(sum(json_extract_string(props, '$.k')::DOUBLE), 4) AS total_weight
        FROM events GROUP BY 1, 2
    """,
    "grouping_sets": """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n, round(sum(o_totalprice), 4) AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
    "array_functions": """
        WITH per_vec AS (
            SELECT vec_id, label,
                   len(embedding)::BIGINT AS dim,
                   round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 4) AS l2_norm,
                   round(embedding[1]::DOUBLE, 4) AS first_component
            FROM embeddings)
        SELECT label, count(*) AS n, max(dim) AS dim,
               round(avg(l2_norm), 4) AS avg_norm,
               round(avg(first_component), 4) AS avg_first_component
        FROM per_vec GROUP BY label
    """,
}
