"""Cadence scheduler (scheduler.py) — the engine-side twin of the
reference's Airflow schedules (@hourly / @daily, catchup=False,
retries=1/300 s; airflow/dags/binance_dbt_dag.py:11-24,
binance_revenue_dag.py:39-51). All clock-driven: no test sleeps."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import pytest

from binance_data_pipeline_spark.scheduler import Job, Scheduler


class FakeClock:
    def __init__(self, t0: float = 0.0) -> None:
        self.t = t0

    def __call__(self) -> float:
        return self.t

    def sleep(self, s: float) -> None:
        self.t += s


def test_epoch_aligned_ticks_run_once_per_interval():
    calls: list[float] = []
    clock = FakeClock()
    sched = Scheduler(
        [Job("hourly", lambda: calls.append(1), every_s=3600)], sleep=clock.sleep
    )
    assert sched.run_pending(7200.5) == ["hourly"]   # tick 2
    assert sched.run_pending(7300.0) == []           # same tick: no re-run
    assert sched.run_pending(10800.0) == ["hourly"]  # tick 3
    assert len(calls) == 2


def test_no_catchup_after_downtime():
    """A scheduler down for many intervals runs the job ONCE on restart
    (catchup=False on both reference DAGs), not once per missed tick."""
    calls: list[float] = []
    sched = Scheduler([Job("daily", lambda: calls.append(1), every_s=86400)])
    sched.run_pending(86400.0)
    assert len(calls) == 1
    sched.run_pending(86400.0 * 50)  # 49 missed days
    assert len(calls) == 2


def test_retry_semantics_match_reference_default_args():
    """One retry after 300 s (the Airflow default_args) — the failing
    first attempt is retried inside the SAME tick and succeeds."""
    attempts: list[int] = []
    slept: list[float] = []

    def flaky():
        attempts.append(1)
        if len(attempts) == 1:
            raise RuntimeError("transient")

    sched = Scheduler([Job("j", flaky, every_s=60)], sleep=slept.append)
    sched.run_pending(60.0)
    assert len(attempts) == 2 and slept == [300.0]
    assert sched.runs == [("j", 1, True)]


def test_failed_job_is_isolated_and_loop_survives():
    errors: list[tuple[str, str]] = []
    ran: list[str] = []

    def bad():
        raise RuntimeError("permanent")

    sched = Scheduler(
        [
            Job("bad", bad, every_s=60, retries=1, retry_delay_s=1.0),
            Job("good", lambda: ran.append("good"), every_s=60),
        ],
        on_error=lambda name, exc: errors.append((name, str(exc))),
        sleep=lambda s: None,
    )
    assert sched.run_pending(60.0) == ["bad", "good"]
    assert errors == [("bad", "permanent")] and ran == ["good"]
    assert sched.runs == [("bad", 1, False), ("good", 1, True)]
    # next tick: both run again — a failed run never wedges the schedule
    sched.run_pending(120.0)
    assert len(errors) == 2 and ran == ["good", "good"]


def test_serial_order_is_list_order():
    """max_active_runs=1 + linear task graphs: jobs run serially in
    declaration order (jobs.py encodes DAG edges as call order)."""
    order: list[str] = []
    sched = Scheduler(
        [
            Job("ingest", lambda: order.append("ingest"), every_s=60),
            Job("transform", lambda: order.append("transform"), every_s=60),
        ]
    )
    sched.run_pending(60.0)
    assert order == ["ingest", "transform"]


def test_validation():
    with pytest.raises(ValueError, match="duplicate"):
        Scheduler([Job("a", lambda: None, 60), Job("a", lambda: None, 60)])
    with pytest.raises(ValueError, match="positive"):
        Scheduler([Job("a", lambda: None, 0)])


def test_sleep_horizon():
    sched = Scheduler([Job("a", lambda: None, every_s=100)])
    assert sched.seconds_until_next_tick(150.0) == 0.0  # never ran: due now
    sched.run_pending(150.0)
    assert sched.seconds_until_next_tick(150.0) == 50.0
    assert sched.seconds_until_next_tick(199.0) == 1.0
    assert sched.seconds_until_next_tick(205.0) == 0.0  # tick 2 due


def test_run_forever_with_injected_clock():
    """The wall-clock loop on a fake clock: a 10 s job over ~35 s of
    simulated time fires for ticks 1, 2 and 3 — no real sleeping."""
    calls: list[float] = []
    clock = FakeClock(t0=5.0)
    sched = Scheduler(
        [Job("fast", lambda: calls.append(clock.t), every_s=10)],
        sleep=clock.sleep,
    )
    sched.run_forever(poll_s=1.0, clock=clock, until=lambda: clock.t >= 35.0)
    # ran at first poll (t=5, tick 0 is None→run), then ticks 1, 2, 3
    assert len(calls) == 4
    assert [int(t // 10) for t in calls] == [0, 1, 2, 3]
