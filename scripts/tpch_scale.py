"""10x scale smoke for the TPC-H completion tier (plans/tpch.py).

Synthesizes an N-times-sf0.1 TPC-H-ish dataset (default --mult 10: 6M
lineitem / 1.5M orders / 150k customer as N deterministic key-offset
copies; part/supplier/nation/region dims stay FIXED — dims grow slower
than facts in practice, which is exactly the regime the tier's broadcast
strategy assumes) and runs the shapes whose cost is fact-side: Q8 (6-way
join ratio), Q13 (left-join histogram), Q16 (distinct part×supplier
pairs), Q18 (full-fact agg→join chain), Q21 (three lineitem legs with
semi/anti residuals). Key offsets keep per-copy join fan-out identical,
so result cardinality and shuffle volume must scale ~linearly in mult;
wall-clock ratio vs the same queries at sf0.1 (mult=1 inputs) is printed
alongside per-query shuffle totals from the Spark stages REST API.

Usage:
    python scripts/tpch_scale.py [--mult 10] [--base /tmp/bdp_tpch_scale]
        [--sf-dir /root/testdata/sf0.1]

Prints one `FINAL {json}` line; round records live in BASELINE.md.
"""

import argparse
import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from binance_data_pipeline_spark.plans import tpch
from binance_data_pipeline_spark.session import get_spark


def warm_arrow_worker(spark) -> None:
    """Untimed Arrow/pandas-UDF worker warmup (VERDICT r10 task 4): the
    FIRST pandas_udf action in a fresh JVM pays several seconds of
    Python-worker + Arrow setup (r10 measured simhash 100x at 34.0 s
    cold vs 9.1 s warm). Smoke tables are warm-context by contract —
    pay it here, before anything is timed."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(64).select(_warm("id")).write.format("noop").mode(
        "overwrite"
    ).save()


SCALED = {"lineitem": "l_orderkey", "orders": "o_orderkey", "customer": None}
FIXED = ("region", "nation", "supplier", "part", "events", "documents", "embeddings")
KEY_STRIDE = 10_000_000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--base", default=None)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    mult = args.mult
    base = args.base or f"/tmp/bdp_tpch_scale_m{mult}"

    spark = get_spark("tpch-scale", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    def gen():
        if os.path.exists(f"{base}/_READY"):
            return
        os.makedirs(base, exist_ok=True)
        # Offsets must stay consistent ACROSS tables so joins fan out
        # identically per copy: lineitem.l_orderkey ↔ orders.o_orderkey,
        # orders.o_custkey ↔ customer.c_custkey.
        li = spark.read.parquet(f"{args.sf_dir}/lineitem.parquet")
        o = spark.read.parquet(f"{args.sf_dir}/orders.parquet")
        c = spark.read.parquet(f"{args.sf_dir}/customer.parquet")

        def copies(df, cols):
            parts = []
            for i in range(mult):
                d = df
                for col in cols:
                    d = d.withColumn(col, F.col(col) + F.lit(i * KEY_STRIDE))
                parts.append(d)
            u = parts[0]
            for p in parts[1:]:
                u = u.unionByName(p)
            return u

        copies(li, ["l_orderkey"]).repartition(32).write.mode("overwrite").parquet(
            f"{base}/lineitem.parquet"
        )
        copies(o, ["o_orderkey", "o_custkey"]).repartition(32).write.mode(
            "overwrite"
        ).parquet(f"{base}/orders.parquet")
        copies(c, ["c_custkey"]).repartition(8).write.mode("overwrite").parquet(
            f"{base}/customer.parquet"
        )
        for t in FIXED:
            src = f"{args.sf_dir}/{t}.parquet"
            if os.path.exists(src):
                dst = f"{base}/{t}.parquet"
                if os.path.isdir(src):
                    shutil.copytree(src, dst, dirs_exist_ok=True)
                else:
                    shutil.copyfile(src, dst)
        open(f"{base}/_READY", "w").close()

    gen()
    warm_arrow_worker(spark)

    ui = spark.sparkContext.uiWebUrl
    app = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0]["id"]

    def stages():
        data = json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages?status=complete"
            )
        )
        return {s["stageId"]: s for s in data}

    results = {"mult": mult}
    names = (
        "q8_market_share",
        "q13_customer_distribution",
        "q16_supplier_part_count",
        "q18_large_volume_customer",
        "q21_waiting_suppliers",
    )

    for name in names:
        entry = {}
        for label, sf_dir in (("base", args.sf_dir), ("scaled", base)):
            before = set(stages())
            t0 = time.time()
            rows = tpch.QUERIES[name](spark, sf_dir).count()
            wall = round(time.time() - t0, 2)
            time.sleep(1.0)
            new = [s for sid, s in stages().items() if sid not in before]
            entry[label] = {
                "wall_sec": wall,
                "rows": rows,
                "shuffle_write_mb": round(
                    sum(s.get("shuffleWriteBytes", 0) for s in new) / 1e6, 1
                ),
                "peak_stage_shuffle_write_mb": round(
                    max((s.get("shuffleWriteBytes", 0) for s in new), default=0) / 1e6, 1
                ),
            }
        entry["wall_ratio"] = round(
            entry["scaled"]["wall_sec"] / max(entry["base"]["wall_sec"], 1e-9), 2
        )
        entry["shuffle_ratio"] = round(
            entry["scaled"]["shuffle_write_mb"]
            / max(entry["base"]["shuffle_write_mb"], 1e-3),
            2,
        )
        results[name] = entry
        print(name, json.dumps(entry), flush=True)

    print("FINAL " + json.dumps(results), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
