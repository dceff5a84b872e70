"""Skew-join smoke: plain shuffle join vs scale.skew_join on a 6M-row
frame with 90% of rows on ONE key, fan-out 3 on the other side (18M
output rows), broadcast disabled so both forms shuffle — the regime the
operator exists for. AQE (incl. its skew split) stays ON for the plain
leg: the measured gap is what explicit salting buys BEYOND AQE, because
AQE's split works at partition granularity while one 5.4M-row key always
hashes to a single build/probe task.

Usage: python scripts/skew_smoke.py [--rows 6000000] [--salts 32]
Prints one FINAL json line; round records live in BASELINE.md.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from binance_data_pipeline_spark.operators.scale import skew_join
from binance_data_pipeline_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=6_000_000)
    ap.add_argument("--salts", type=int, default=32)
    args = ap.parse_args()

    spark = get_spark("skew-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    big = spark.range(args.rows).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 200_000).alias("k"),
        F.col("id").alias("payload"),
    )
    other = spark.range(200_000).select(F.col("id").alias("k"), F.lit("d").alias("tag"))
    other = other.union(other).union(other)  # fan-out 3 per key

    def force(df) -> float:
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 2)

    force(big.groupBy("k").count())  # warmup
    t_plain = min(force(big.join(other, "k")) for _ in range(2))
    t_skew = min(force(skew_join(big, other, "k", n_salts=args.salts)) for _ in range(2))
    n_plain = big.join(other, "k").count()
    n_skew = skew_join(big, other, "k", n_salts=args.salts).count()
    print(
        "FINAL "
        + json.dumps(
            {
                "rows": args.rows,
                "n_salts": args.salts,
                "plain_join_sec": t_plain,
                "skew_join_sec": t_skew,
                "speedup": round(t_plain / t_skew, 2),
                "output_rows_equal": n_plain == n_skew,
                "output_rows": n_plain,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
