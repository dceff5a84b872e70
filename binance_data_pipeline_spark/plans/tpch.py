"""TPC-H completion tier: the 13 classic decision-support shapes not already
in the 50-entry driver catalog (Q8, Q11-Q22; Q1-Q5, Q6, Q7, Q9, Q10 live in
``relational``/``advanced`` as ``pricing_summary``, ``q2_min_cost_supplier``,
``shipping_priority``, ``order_priority_exists``, ``revenue_by_nation``,
``forecast_revenue``, ``q7_volume_shipping``, ``q9_product_profit``,
``returned_items``).

The driver's correctness window records exactly 50 catalog rows, so this
module is NOT merged into ``plans.all_queries()``; it is pinned by the same
DuckDB-parity harness locally (``tests/test_tpch_parity.py`` runs every entry
at sf0.001 AND sf0.01 through ``tests/oracle_harness.compare`` — the identical
row-count/schema/value check the driver applies).

Schema adaptations (this corpus is TPC-H-ish, not TPC-H: no partsupp table,
no l_shipmode/l_commitdate/l_receiptdate/p_container/c_phone columns — see
TESTDATA.md). Each query keeps the CLASSIC plan shape (the joins, the
subquery structure, the aggregation pattern) and substitutes the missing
column with a derivable proxy, documented per query. Reference parity: the
reference pipeline (survey §2.3) has no TPC-H surface at all; this tier is
classic-shape coverage for the engine itself.

Float policy matches the catalog (plans/__init__.py): order-sensitive float
aggregates are rounded to 4 decimals on both sides; ratio-of-sums goes
through DECIMAL(18,4) so the division is order-exact (the q9 pattern).
``l_quantity`` is integer-valued (1..50), so sums/avgs of it are exact in
double on any summation order and are compared unrounded.

Scale notes (100 TB): every dim-side join is broadcast; every fact-side
pre-filter is applied before the shuffle (semi-joins where group membership
is decided by the key alone — the q2 pattern); the only full-fact shuffles
are the groupBys the queries semantically require. Global-max/threshold
scalars (Q11, Q15, Q22) aggregate to one row and re-enter the plan via a
broadcast cross-join, never through the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table


def _vol():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _eur_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EUROPE suppliers (supplier ⋈ nation ⋈ region, both dims broadcast) —
    the supplier-side filter several shapes share. Tiny (dim-sized)."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(
            F.broadcast(r.where(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_3 suppliers' share of
    AMERICA customers' STANDARD-part order volume, per order year. The
    share is a ratio of two order-sensitive sums, so both legs round at 4
    then divide through DECIMAL (the q9_product_profit pattern). Part filter
    broadcasts onto lineitem BEFORE the orders shuffle; customer's
    nation→region path is broadcast onto the customer shuffle side."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    n1 = n.select(F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))
    cust_america = (
        c.join(F.broadcast(n.select("n_nationkey", "n_regionkey")), c.c_nationkey == F.col("n_nationkey"))
        .join(
            F.broadcast(r.where(F.col("r_name") == "AMERICA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    joined = (
        li.join(
            F.broadcast(load_table(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD").select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(
            o.where(
                (F.col("o_orderdate") >= F.lit("1995-01-01"))
                & (F.col("o_orderdate") < F.lit("1997-01-01"))
            ),
            li.l_orderkey == o.o_orderkey,
        )
        .join(cust_america, o.o_custkey == F.col("c_custkey"), "left_semi")
    )
    per_year = joined.groupBy(F.year("o_orderdate").cast("long").alias("o_year")).agg(
        F.round(F.sum(F.when(F.col("supp_nation") == "NATION_3", _vol()).otherwise(F.lit(0.0))), 4)
        .cast("decimal(18,4)")
        .alias("nation_vol"),
        F.round(F.sum(_vol()), 4).cast("decimal(18,4)").alias("total_vol"),
    )
    return per_year.select(
        "o_year",
        F.round(F.col("nation_vol").cast("double") / F.col("total_vol").cast("double"), 6).alias(
            "mkt_share"
        ),
    )


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock): parts whose EUROPE-supplied shipped value
    exceeds 0.1% of the total. No partsupp table in this corpus, so
    "stock value" is proxied as sum(l_extendedprice) of lines shipped by
    EUROPE suppliers — the shape (aggregate, then filter against a scalar
    aggregate of the SAME relation) is what's exercised. The scalar total
    re-enters the plan as a broadcast cross-join of a 1-row frame (no
    driver round-trip); the supplier filter is a broadcast semi-join on
    lineitem BEFORE the partkey shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    eur = _eur_suppliers(spark, sf_dir).select("s_suppkey")
    value = (
        li.join(F.broadcast(eur), li.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.round(F.sum("l_extendedprice"), 4).alias("value"))
    )
    total = value.agg(F.sum("value").alias("total"))
    return (
        value.crossJoin(F.broadcast(total))
        .where(F.col("value") > F.lit(0.001) * F.col("total"))
        .select("l_partkey", "value")
    )


def q12_ship_priority_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes / order priority): no l_shipmode or
    commit/receipt dates here, so the mode proxy is the ship DELAY bucket —
    'SLOW' when the line shipped >60 days after the order date, else
    'FAST'. Counts urgent-vs-other orders per bucket for 1997 shipments:
    the classic join + conditional-aggregation shape. Integer counts, no
    float policy needed."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01")) & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .join(o, li.l_orderkey == o.o_orderkey)
        .withColumn(
            "ship_mode",
            F.when(F.datediff("l_shipdate", "o_orderdate") > 60, F.lit("SLOW")).otherwise(
                F.lit("FAST")
            ),
        )
        .groupBy("ship_mode")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order distribution): histogram of customers by
    order count INCLUDING zero-order customers (the left outer join is the
    point of the query). No o_comment column, so the exclusion predicate is
    o_orderpriority <> '5-LOW' instead of the NOT LIKE '%special%requests%'
    comment filter. Two shuffles (custkey, then c_count) — both required by
    the semantics; the second is over a histogram-sized frame."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): PROMO-type share of March-1997 revenue,
    as a percentage. Ratio-of-sums via the decimal pattern; part joins
    broadcast; the month filter prunes the scan before the join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    sums = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-03-01")) & (F.col("l_shipdate") < F.lit("1997-04-01"))
        )
        .join(F.broadcast(p.select("p_partkey", "p_type")), li.l_partkey == p.p_partkey)
        .agg(
            F.round(F.sum(F.when(F.col("p_type") == "PROMO", _vol()).otherwise(F.lit(0.0))), 4)
            .cast("decimal(18,4)")
            .alias("promo_vol"),
            F.round(F.sum(_vol()), 4).cast("decimal(18,4)").alias("total_vol"),
        )
    )
    return sums.select(
        F.round(
            F.lit(100.0) * F.col("promo_vol").cast("double") / F.col("total_vol").cast("double"), 6
        ).alias("promo_revenue_pct")
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): supplier(s) with the maximum Q1-1997
    revenue. The classic view + scalar-max subquery becomes: per-supplier
    revenue aggregate (rounded at 4 so the max-equality compares identical
    values on both engines), 1-row max broadcast back via cross-join.
    The max-equality is safe for the same reason as q2_min_cost_supplier:
    the max IS one of the compared values, not a recomputation."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01")) & (F.col("l_shipdate") < F.lit("1997-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(_vol()), 4).alias("total_revenue"))
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(F.col("s_suppkey"), "s_name", "total_revenue")
    )


def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship): distinct supplier count per
    (brand, type, size) bucket over observed part×supplier pairs, excluding
    one brand, one type, a size set, and "complaint" suppliers. No partsupp:
    the pair relation is distinct (l_partkey, l_suppkey) from lineitem; no
    s_comment: the complaint proxy is s_acctbal < 0. Exclusion is a
    broadcast anti-join (the NOT IN subquery shape); the distinct-pair
    shuffle is the one full-fact exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    keep_parts = p.where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    complaints = s.where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        pairs.join(F.broadcast(keep_parts), pairs.l_partkey == p.p_partkey)
        .join(F.broadcast(complaints), pairs.l_suppkey == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): average yearly revenue lost
    if Brand#13 orders below 20% of the part's average quantity weren't
    filled. The correlated scalar subquery (avg l_quantity per part) becomes
    a window avg over l_partkey — computed AFTER the broadcast semi-filter
    to brand parts, which is equivalent because the correlation key is the
    part itself (whole groups survive the filter; the q2 rewrite argument).
    l_quantity is integer-valued so the avg is order-exact in double on
    both engines — the 0.2×avg comparison needs no rounding guard. No
    p_container column; the brand filter alone selects the part family."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    brand_parts = p.where(F.col("p_brand") == "Brand#13").select("p_partkey")
    li_b = li.join(F.broadcast(brand_parts), li.l_partkey == F.col("p_partkey"), "left_semi")
    w = Window.partitionBy("l_partkey")
    return (
        li_b.withColumn("avg_qty", F.avg("l_quantity").over(w))
        .where(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / F.lit(7.0), 4).alias("avg_yearly"))
    )


def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer): orders whose total quantity
    exceeds 300, with their customer. The IN-(groupBy-HAVING) subquery is a
    self-aggregation then join — expressed directly as aggregate → filter →
    join (Catalyst's own decorrelation target). Quantity sums are exact
    integers in double; o_totalprice is per-row, so nothing needs the float
    policy. The orderkey aggregate and the orders join share the same key,
    so AQE can plan the second join shuffle-free on the aggregate side."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 300)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("order_date"),
            "o_totalprice",
            "total_qty",
        )
    )


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): one revenue figure over a disjunction
    of three (brand × quantity-band × size-band) channels. No p_container
    column, so the bands are brand/quantity/size only (ranges widened to
    keep all three channels populated at sf0.001). The part side pre-filters
    to the union of the three channels and broadcasts; the per-channel
    conjunctions evaluate as a post-join filter — the classic OR-of-ANDs
    shape Catalyst cannot split into separate joins."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    p_pruned = p.where(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34") & (F.col("p_size") <= 30)
    ).select("p_partkey", "p_brand", "p_size")
    channel = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("l_quantity").between(1, 15)
            & F.col("p_size").between(1, 10)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("l_quantity").between(10, 25)
            & F.col("p_size").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("l_quantity").between(20, 35)
            & F.col("p_size").between(1, 30)
        )
    )
    return (
        li.join(F.broadcast(p_pruned), li.l_partkey == F.col("p_partkey"))
        .where(channel)
        .agg(F.round(F.coalesce(F.sum(_vol()), F.lit(0.0)), 4).alias("revenue"))
    )


def q20_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion): EUROPE suppliers who shipped
    more than 200 units of PROMO-type parts during 1997. The classic nested
    IN-subqueries (part keys → lineitem aggregate → supplier keys) become a
    broadcast semi-join chain: promo partkeys semi-filter lineitem, the
    suppkey aggregate HAVING-filters, and the surviving keys semi-filter the
    (already region-filtered, dim-sized) supplier frame. No partsupp
    availqty, so the excess-stock threshold is the fixed 200-unit floor.
    Quantity sums are exact integers — threshold needs no rounding."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    promo_parts = p.where(F.col("p_type") == "PROMO").select("p_partkey")
    shippers = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01")) & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .join(F.broadcast(promo_parts), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("promo_qty"))
        .where(F.col("promo_qty") > 200)
    )
    eur = _eur_suppliers(spark, sf_dir)
    return (
        eur.join(shippers, eur.s_suppkey == shippers.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal", F.col("n_name").alias("nation"))
    )


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting): EUROPE suppliers whose
    line was the ONLY late line of a finished multi-supplier order. No
    commit/receipt dates, so "late" is l_shipdate > o_orderdate + 90 days.

    Scale shape (round 8): the spec's EXISTS(other supplier) / NOT
    EXISTS(other late supplier) pair is equivalent to a PER-ORDER
    aggregate — the order has >= 2 distinct suppliers AND exactly 1
    distinct LATE supplier (which is then necessarily the probe line's
    own). Lowering it that way replaces the naive three-legs-of-lineitem
    plan (fact + full semi leg + full anti leg = three fact exchanges;
    measured 73.5 s / 2.66 GB shuffle at the 100x smoke) with ONE
    lineitem×orders join whose orderkey partitioning is REUSED by the
    groupBy and the late-line self-join — Catalyst plans no extra
    exchange for either. The supplier/nation/region path broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    late = F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)
    eur = _eur_suppliers(spark, sf_dir).select("s_suppkey", "s_name")
    lo = li.select("l_orderkey", "l_suppkey", "l_shipdate").join(
        o.where(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    # two-level aggregate instead of two countDistincts: the per-
    # (order, supplier) collapse happens MAP-SIDE (partial agg), so the
    # shuffle carries ~distinct pairs, not an Expand-doubled fact; the
    # second level re-keys the already-tiny pair set to orderkey AND
    # carries the sole late supplier's identity + late-line count, so
    # the fact is read/joined exactly ONCE (no late-line join-back leg)
    per_supp = lo.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum(late.cast("int")).alias("n_late_lines")
    )
    stats = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum((F.col("n_late_lines") > 0).cast("int")).alias("n_late_supp"),
        # when the order qualifies (exactly one late supplier) this max
        # picks that supplier's struct; otherwise the row is filtered
        F.max(
            F.when(
                F.col("n_late_lines") > 0,
                F.struct(F.col("l_suppkey").alias("sk"),
                         F.col("n_late_lines").alias("nl")),
            )
        ).alias("late_supp"),
    )
    qual = stats.where(
        (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    ).select(F.col("late_supp.sk").alias("sk"), F.col("late_supp.nl").alias("nl"))
    return (
        qual.join(F.broadcast(eur), F.col("sk") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("nl").cast("long").alias("numwait"))
    )


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): positive-balance customers in a
    target country set, richer than average, with no RECENT orders. No
    c_phone column, so "country code" is c_nationkey directly, and since
    every customer in this corpus has at least one order, "inactive" means
    no order since 1999-01-01 (calibrated non-empty at sf0.001). The scalar
    avg re-enters as a broadcast 1-row cross-join (rounded at 4 on both
    engines so the threshold compares identically); the NOT EXISTS is a
    broadcast-pruned anti-join against date-filtered orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    codes = [1, 3, 5, 7, 9, 11, 13]
    in_set = c.where(F.col("c_nationkey").isin(codes))
    avg_bal = in_set.where(F.col("c_acctbal") > 0).agg(
        F.round(F.avg("c_acctbal"), 4).alias("avg_bal")
    )
    recent = o.where(F.col("o_orderdate") >= F.lit("1999-01-01")).select("o_custkey")
    return (
        in_set.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, in_set.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
    )


QUERIES = {
    "q8_market_share": q8_market_share,
    "q11_important_parts": q11_important_parts,
    "q12_ship_priority_delay": q12_ship_priority_delay,
    "q13_customer_distribution": q13_customer_distribution,
    "q14_promo_revenue": q14_promo_revenue,
    "q15_top_supplier": q15_top_supplier,
    "q16_supplier_part_count": q16_supplier_part_count,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q18_large_volume_customer": q18_large_volume_customer,
    "q19_discounted_revenue": q19_discounted_revenue,
    "q20_promo_part_suppliers": q20_promo_part_suppliers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q22_global_sales_opportunity": q22_global_sales_opportunity,
}


ORACLE = {
    "q8_market_share": """
        WITH joined AS (
            SELECT year(o_orderdate)::BIGINT AS o_year,
                   l_extendedprice * (1 - l_discount) AS volume,
                   n1.n_name AS supp_nation
            FROM lineitem
            JOIN part ON l_partkey = p_partkey AND p_type = 'STANDARD'
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            JOIN region ON n2.n_regionkey = r_regionkey AND r_name = 'AMERICA'
            WHERE o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01')
        SELECT o_year,
               round((round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END), 4)::DECIMAL(18,4))::DOUBLE
                     / (round(sum(volume), 4)::DECIMAL(18,4))::DOUBLE, 6) AS mkt_share
        FROM joined GROUP BY o_year
    """,
    "q11_important_parts": """
        WITH value AS (
            SELECT l_partkey, round(sum(l_extendedprice), 4) AS value
            FROM lineitem
            WHERE l_suppkey IN (
                SELECT s_suppkey FROM supplier
                JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
                WHERE r_name = 'EUROPE')
            GROUP BY l_partkey)
        SELECT l_partkey, value FROM value
        WHERE value > 0.001 * (SELECT sum(value) FROM value)
    """,
    "q12_ship_priority_delay": """
        SELECT CASE WHEN date_diff('day', o_orderdate::DATE, l_shipdate::DATE) > 60
                    THEN 'SLOW' ELSE 'FAST' END AS ship_mode,
               sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS high_line_count,
               sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1
    """,
    "q13_customer_distribution": """
        WITH per_cust AS (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
            GROUP BY c_custkey)
        SELECT c_count, count(*) AS custdist
        FROM per_cust GROUP BY c_count
    """,
    "q14_promo_revenue": """
        SELECT round(100.0
                 * (round(sum(CASE WHEN p_type = 'PROMO'
                                   THEN l_extendedprice * (1 - l_discount)
                                   ELSE 0 END), 4)::DECIMAL(18,4))::DOUBLE
                 / (round(sum(l_extendedprice * (1 - l_discount)), 4)::DECIMAL(18,4))::DOUBLE,
                 6) AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-03-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
    """,
    "q15_top_supplier": """
        WITH revenue AS (
            SELECT l_suppkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM revenue JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    "q16_supplier_part_count": """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
    """,
    "q17_small_quantity_revenue": """
        SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
        FROM lineitem l
        JOIN part ON l.l_partkey = p_partkey AND p_brand = 'Brand#13'
        WHERE l.l_quantity < 0.2 * (
            SELECT avg(l2.l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = l.l_partkey)
    """,
    "q18_large_volume_customer": """
        SELECT c_name, c_custkey, o_orderkey,
               o_orderdate::DATE AS order_date, o_totalprice,
               sum(l_quantity) AS total_qty
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate::DATE, o_totalprice
        HAVING sum(l_quantity) > 300
    """,
    "q19_discounted_revenue": """
        SELECT round(coalesce(sum(l_extendedprice * (1 - l_discount)), 0.0), 4) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 15 AND p_size BETWEEN 1 AND 10)
           OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 25 AND p_size BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 35 AND p_size BETWEEN 1 AND 30)
    """,
    "q20_promo_part_suppliers": """
        SELECT s_name, s_acctbal, n_name AS nation
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
        WHERE s_suppkey IN (
            SELECT l_suppkey FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
              AND l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY l_suppkey
            HAVING sum(l_quantity) > 200)
    """,
    "q21_waiting_suppliers": """
        SELECT s_name, count(*) AS numwait
        FROM lineitem l1
        JOIN orders ON l1.l_orderkey = o_orderkey AND o_orderstatus = 'F'
        JOIN supplier ON l1.l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
        WHERE l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
        GROUP BY s_name
    """,
    "q22_global_sales_opportunity": """
        SELECT c_nationkey AS cntrycode, count(*) AS numcust,
               round(sum(c_acctbal), 4) AS totacctbal
        FROM customer
        WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
          AND c_acctbal > (SELECT round(avg(c_acctbal), 4) FROM customer
                           WHERE c_acctbal > 0
                             AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1999-01-01')
        GROUP BY c_nationkey
    """,
}
