"""Cadence scheduler: the engine-side twin of the reference's Airflow
schedules, closing the "bring your own orchestrator" gap with a
dependency-free runner a deployment can actually start.

The reference defines two cadences and one retry policy:
  - ``binance_dbt_transformation``: ``schedule_interval='@hourly'``,
    ``catchup=False`` (airflow/dags/binance_dbt_dag.py:23-24)
  - ``binance_revenue_pipeline``: ``schedule_interval='@daily'``,
    ``catchup=False``, ``max_active_runs=1``
    (airflow/dags/binance_revenue_dag.py:48-51)
  - both: ``retries: 1, retry_delay: timedelta(minutes=5)``
    (binance_dbt_dag.py:11-12)

This module reproduces exactly those semantics — interval schedules
anchored to the epoch (so "@hourly" fires at :00 like Airflow's
schedule, not at process-start offsets), no catchup (a stopped
scheduler runs a missed job ONCE on restart, not once per missed
interval), one run at a time per job, and per-job retries via
jobs.run_with_retries. It is deliberately NOT an Airflow: no DAG-level
parallelism (the reference's task graphs are linear — dbt_run >>
dbt_test — and jobs.py encodes those edges as function-call order), no
distributed executor, no UI. ``run_pending(now)`` is pure logic driven
by an injected clock so tests run without sleeping; ``run_forever``
is the thin wall-clock loop around it.

Use: schedule the engine's job entry points (jobs.py) —

    sched = Scheduler([
        Job("hourly_transform", lambda: hourly_transform(spark, ...),
            every_s=3600),
        Job("daily_revenue", lambda: daily_backfill_and_transform(
            spark, ...), every_s=86400),
    ])
    sched.run_forever()
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field

from .jobs import run_with_retries

__all__ = ["Job", "Scheduler"]


@dataclass
class Job:
    """One scheduled entry point.

    ``every_s``: the interval; ticks fire at multiples of it since the
    epoch (Airflow-style aligned schedule: 3600 → :00 each hour).
    ``retries``/``retry_delay_s``: the reference's default_args
    (1 retry / 300 s). A job that still fails after retries logs through
    ``on_error`` and waits for its next tick — one bad run never kills
    the scheduler loop (Airflow marks the run failed and moves on)."""

    name: str
    fn: Callable[[], object]
    every_s: float
    retries: int = 1
    retry_delay_s: float = 300.0
    last_tick: int | None = field(default=None, repr=False)


class Scheduler:
    def __init__(
        self,
        jobs: list[Job],
        on_error: Callable[[str, BaseException], None] | None = None,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        names = [j.name for j in jobs]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate job names: {names}")
        if any(j.every_s <= 0 for j in jobs):
            raise ValueError("every_s must be positive")
        self.jobs = list(jobs)
        self._on_error = on_error
        self._sleep = sleep
        self.runs: list[tuple[str, int, bool]] = []  # (name, tick, ok) audit

    def run_pending(self, now: float) -> list[str]:
        """Run every job whose current tick (``now // every_s``) hasn't
        run yet; returns the names that ran. No catchup: a job that
        missed N ticks while the process was down runs ONCE (for the
        current tick) — the reference sets ``catchup=False`` on both
        DAGs. Jobs run serially in list order (``max_active_runs=1``,
        and the reference's DAG edges are call order)."""
        ran: list[str] = []
        for job in self.jobs:
            tick = int(now // job.every_s)
            if job.last_tick is not None and tick <= job.last_tick:
                continue
            job.last_tick = tick
            ok = True
            try:
                run_with_retries(
                    job.fn,
                    retries=job.retries,
                    retry_delay_s=job.retry_delay_s,
                    sleep=self._sleep,
                )
            except BaseException as exc:  # noqa: BLE001 — isolate per job
                ok = False
                if self._on_error is not None:
                    self._on_error(job.name, exc)
            self.runs.append((job.name, tick, ok))
            ran.append(job.name)
        return ran

    def seconds_until_next_tick(self, now: float) -> float:
        """Sleep horizon for the wall-clock loop: time to the nearest
        upcoming tick across jobs (0 when something is already due)."""
        due = [
            0.0
            if job.last_tick is None or int(now // job.every_s) > job.last_tick
            else job.every_s - (now % job.every_s)
            for job in self.jobs
        ]
        return min(due) if due else float("inf")

    def run_forever(
        self,
        poll_s: float = 1.0,
        clock: Callable[[], float] = time.time,
        until: Callable[[], bool] | None = None,
    ) -> None:
        """The wall-clock loop: run what's due, sleep to the next tick
        (bounded by ``poll_s`` granularity), repeat. ``until`` (when
        given) is checked each iteration — tests and graceful shutdown
        hooks flip it; None loops until interrupted."""
        while until is None or not until():
            self.run_pending(clock())
            horizon = self.seconds_until_next_tick(clock())
            self._sleep(min(max(horizon, 0.0), poll_s) if horizon > 0 else poll_s)
