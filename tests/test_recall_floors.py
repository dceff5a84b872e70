"""Recall floors for the rows-only (LSH/IVF family) catalog entries.

These five queries have no DuckDB oracle, so their correctness evidence
is the self-measured ``recall_vs_exact``/``recall_ok`` columns
(plans/northstar._with_recall). Two guarantees are pinned here:

  1. the floors HOLD on the real fixtures — an LSH/IVF parameter change
     that silently tanks recall turns this file red;
  2. strict mode is the DEFAULT: a floor breach raises, failing the
     driver/bench run; BDP_STRICT_RECALL=0 opts down to flag-only.
"""

from __future__ import annotations

import sys
import uuid

sys.path.insert(0, "/root/repo")

import pytest
from pyspark.sql import functions as F

from binance_data_pipeline_spark.plans import northstar as N

SF = "/root/testdata/sf0.001"

#: query name -> (callable, floor) — floors mirror the _with_recall args
FLOORS = {
    "embed_ann_lsh": (N.q_embed_ann_lsh, 0.5),
    "embed_ann_ivf": (N.q_embed_ann_ivf, 0.4),
    "minhash_near_dups": (N.q_minhash_near_dups, 0.5),
    "simhash_near_dups": (N.q_simhash_near_dups, 0.5),
    "embed_near_dups_lsh": (N.q_embed_near_dups_lsh, 0.5),
}


@pytest.mark.parametrize("qname", sorted(FLOORS))
def test_recall_floor_holds_on_fixtures(spark, qname):
    fn, floor = FLOORS[qname]
    row = fn(spark, SF).select("recall_vs_exact", "recall_ok").first()
    assert row is not None, f"{qname} returned no rows at {SF}"
    assert row["recall_vs_exact"] >= floor, (
        f"{qname}: recall {row['recall_vs_exact']} below floor {floor}"
    )
    assert row["recall_ok"] is True


def test_strict_mode_raises_below_floor(spark, monkeypatch):
    """A breached floor must RAISE by default (and with the env var
    unset or truthy) and only flag under BDP_STRICT_RECALL=0 — driven
    through _with_recall with a fabricated empty approx set (recall
    0.0) so the test doesn't depend on breaking a real operator."""
    probe = f"strict-probe-{uuid.uuid4().hex[:8]}"
    result = spark.range(3).select(F.col("id").alias("query_id"))
    approx = result.where(F.lit(False)).select("query_id")  # recall = 0

    def run():
        return N._with_recall(
            spark, SF, "documents", probe, "p1",
            result, approx,
            lambda: spark.range(3).select(F.col("id").alias("query_id")),
            ["query_id"], floor=0.5,
        )

    monkeypatch.setenv("BDP_STRICT_RECALL", "0")
    flagged = run().first()
    assert flagged["recall_vs_exact"] == 0.0 and flagged["recall_ok"] is False

    # default (unset) = strict: the same breach raises
    monkeypatch.delenv("BDP_STRICT_RECALL", raising=False)
    N._RECALL_MEMO.clear()  # force re-evaluation of the strict check
    with pytest.raises(RuntimeError, match="below the floor"):
        run()

    monkeypatch.setenv("BDP_STRICT_RECALL", "1")
    N._RECALL_MEMO.clear()
    with pytest.raises(RuntimeError, match="below the floor"):
        run()
