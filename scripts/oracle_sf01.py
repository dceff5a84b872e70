"""Catalog-wide oracle comparison at sf0.1 — the scale the bench runs.

The driver's correctness gate runs at sf0.01; the bench at sf0.1 was
previously performance-only. This smoke runs every oracle-backed
catalog query through the SAME row/schema/value comparison at sf0.1,
so correctness is pinned at the scale performance is measured
(VERDICT r8 task 5). Prints one line per query and a final JSON
summary; exit code 0 iff all pass.

    python scripts/oracle_sf01.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    import __spark_entry__ as E
    from oracle_harness import compare, duck_connection

    from binance_data_pipeline_spark.session import get_spark

    spark = get_spark("oracle-sf01")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(args.sf_dir)
    queries, oracles = E.queries(), E.oracle_sql()

    failed: dict[str, list[str]] = {}
    n_ok = 0
    t0 = time.time()
    for name, fn in queries.items():
        if name not in oracles:
            continue  # rows-only entries (ANN family) — no SQL oracle
        sdf = fn(spark, args.sf_dir)
        odf = con.execute(oracles[name]).df()
        errs = compare(sdf, odf, name)
        if errs:
            failed[name] = errs
            print(f"FAIL {name}: {errs[0]}")
        else:
            n_ok += 1
            print(f"ok   {name}")
    print(json.dumps({
        "sf_dir": args.sf_dir,
        "compared": n_ok + len(failed),
        "passed": n_ok,
        "failed": sorted(failed),
        "wall_sec": round(time.time() - t0, 1),
    }))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
