"""Model-based differential test of the snapshot table format.

Seeded random sequences of append / merge / delete / update /
replace_where / rollback / compact / vacuum run against a snapshot
table, while a driver-side reference model (a plain dict keyed by id,
with full per-version history) applies the same semantics. After every
operation the table must equal the model; at checkpoints a random
RETAINED version must time-travel to the model's history — including
across delta-manifest chains, checkpoint boundaries, and
vacuum-written sidecar checkpoints (the round-9 format change this
file exists to stress). SQLancer-style: a failing sequence prints
itself, which is the reproducer.
"""

from __future__ import annotations

import random
import sys

sys.path.insert(0, "/root/repo")

import pytest
from pyspark.sql import functions as F

from binance_data_pipeline_spark.operators.snapshots import (
    _list_versions,
    commit_snapshot,
    compact_snapshot,
    read_snapshot,
    rollback_snapshot,
    snapshot_delete,
    snapshot_merge,
    snapshot_replace_where,
    snapshot_update,
    vacuum_snapshots,
)

SCHEMA = "id long, domain string, score double"
DOMAINS = ["a", "b", "c", "d"]


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _table_state(spark, t, version=None):
    return {
        r["id"]: (r["domain"], r["score"])
        for r in read_snapshot(spark, t, version=version).collect()
    }


def _run_sequence(spark, tmp_path, seed, n_ops):
    rng = random.Random(seed)
    t = str(tmp_path / f"t{seed}")
    next_id = 0

    def fresh_rows(k, domain=None):
        nonlocal next_id
        out = []
        for _ in range(k):
            out.append(
                (next_id, domain or rng.choice(DOMAINS), round(rng.uniform(0, 100), 2))
            )
            next_id += 1
        return out

    # bootstrap
    rows = fresh_rows(6)
    v = commit_snapshot(spark, t, _df(spark, rows))
    model = {i: (d, s) for i, d, s in rows}
    history = {v: dict(model)}  # version -> state
    trace = [("bootstrap", rows)]

    for step in range(n_ops):
        op = rng.choice(
            ["append", "append", "merge", "delete", "update",
             "replace_where", "rollback", "compact", "vacuum"]
        )
        trace.append((step, op))
        if op == "append":
            rows = fresh_rows(rng.randint(1, 4))
            v = commit_snapshot(spark, t, _df(spark, rows), mode="append")
            model.update({i: (d, s) for i, d, s in rows})
        elif op == "merge":
            # upsert: half existing ids revalued, half new
            ups = []
            existing = sorted(model)
            for i in rng.sample(existing, min(2, len(existing))):
                ups.append((i, model[i][0], round(rng.uniform(0, 100), 2)))
            ups += fresh_rows(1)
            v = snapshot_merge(spark, t, _df(spark, ups), key_cols=["id"])
            model.update({i: (d, s) for i, d, s in ups})
        elif op == "delete":
            cut = round(rng.uniform(0, 100), 2)
            head = _list_versions(spark, t)[-1]
            v = snapshot_delete(spark, t, F.col("score") < cut)
            new_model = {i: ds for i, ds in model.items() if not ds[1] < cut}
            if new_model == model:
                assert v == head, "no-match delete must not commit"
                continue  # no new version; history unchanged
            model = new_model
        elif op == "update":
            d = rng.choice(DOMAINS)
            head = _list_versions(spark, t)[-1]
            v = snapshot_update(
                spark, t, {"score": F.col("score") + 1.0}, F.col("domain") == d
            )
            touched = {i for i, ds in model.items() if ds[0] == d}
            if not touched:
                assert v == head
                continue
            for i in touched:
                model[i] = (model[i][0], round(model[i][1] + 1.0, 10))
        elif op == "replace_where":
            d = rng.choice(DOMAINS)
            repl = fresh_rows(rng.randint(1, 3), domain=d)
            v = snapshot_replace_where(
                spark, t, F.col("domain") == d, _df(spark, repl)
            )
            model = {i: ds for i, ds in model.items() if ds[0] != d}
            model.update({i: (dd, s) for i, dd, s in repl})
        elif op == "rollback":
            retained = [u for u in _list_versions(spark, t) if u in history]
            target = rng.choice(retained)
            v = rollback_snapshot(spark, t, target)
            model = dict(history[target])
        elif op == "compact":
            v = compact_snapshot(spark, t, target_file_mb=64)
            if v in history:  # nothing to coalesce -> no commit
                continue
        else:  # vacuum
            keep = rng.randint(2, 4)
            vacuum_snapshots(spark, t, keep_versions=keep, min_age_seconds=0)
            live = set(_list_versions(spark, t))
            history = {u: s for u, s in history.items() if u in live}
            # every retained version must still resolve (sidecar path)
            for u in sorted(live):
                if u in history:
                    assert _table_state(spark, t, u) == history[u], (
                        f"seed={seed} step={step} vacuum broke time travel "
                        f"to v{u}\ntrace={trace}"
                    )
            continue
        history[v] = dict(model)
        got = _table_state(spark, t)
        assert got == model, (
            f"seed={seed} step={step} op={op}: table != model\n"
            f"extra={set(got) - set(model)} missing={set(model) - set(got)}\n"
            f"trace={trace}"
        )
        # random retained-version time travel
        if rng.random() < 0.3:
            u = rng.choice(sorted(history))
            assert _table_state(spark, t, u) == history[u], (
                f"seed={seed} step={step}: time travel to v{u} diverged\n"
                f"trace={trace}"
            )


@pytest.mark.parametrize("seed", [101, 202])
def test_random_op_sequence_matches_model(spark, tmp_path, seed):
    _run_sequence(spark, tmp_path, seed, n_ops=16)
