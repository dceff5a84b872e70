"""Control experiment for the commit-loop smoke's residual 1.2x
late/early drift (VERDICT r9 task 8).

The mult-100 snapshot commit loop in `scale_smoke.py` shows per-commit
wall growing ~1.2x from the first to the last decile, while the
pure-metadata instrument (60 tiny commits) is FLAT at 0.87x — the
hypothesis is that the drift is driver/JVM aging over a ~10-minute
loop of 600k-row parquet writes, not manifest machinery. This control
runs the SAME cadence with the manifest machinery removed entirely:
100 iterations of read-chunk -> write-parquet to a fresh directory,
nothing else. If the control shows the same drift, the residual is
environmental (JVM/page-cache/GC aging) and the manifest log is
exonerated; if the control is flat, the drift lives in our code.

Usage:
    python scripts/commit_loop_control.py [--iters 100]
        [--chunk /root/testdata/sf0.1/lineitem.parquet]
        [--base /tmp/bdp_ctrl_loop]

Prints one `FINAL {json}` line: per-iteration seconds (first/last
decile means), the late/early ratio, and the total wall. Round records
live in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binance_data_pipeline_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--chunk", default="/root/testdata/sf0.1/lineitem.parquet")
    ap.add_argument("--base", default="/tmp/bdp_ctrl_loop")
    args = ap.parse_args()

    spark = get_spark("commit-loop-control")
    spark.sparkContext.setLogLevel("ERROR")
    if os.path.exists(args.base):
        shutil.rmtree(args.base)
    os.makedirs(args.base)

    # same per-iteration work as one commit_snapshot data leg: read the
    # 600k-row chunk fresh, write it as parquet — no manifest, no
    # listing, no stats collection
    times: list[float] = []
    t_all = time.time()
    for i in range(args.iters):
        t0 = time.time()
        spark.read.parquet(args.chunk).write.mode("overwrite").parquet(
            f"{args.base}/v{i}"
        )
        times.append(round(time.time() - t0, 3))
    total = round(time.time() - t_all, 1)

    k = max(args.iters // 10, 1)
    early = sum(times[:k]) / k
    late = sum(times[-k:]) / k
    print("FINAL " + json.dumps({
        "iters": args.iters,
        "early_decile_mean_sec": round(early, 3),
        "late_decile_mean_sec": round(late, 3),
        "late_over_early": round(late / early, 3),
        "total_sec": total,
        "per_iter": times,
    }))


if __name__ == "__main__":
    main()
