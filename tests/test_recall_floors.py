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


def test_recall_sidecar_roundtrip_and_invalidation(spark, tmp_path, monkeypatch):
    """Round 13: the recall evidence persists as a JSON sidecar read with
    plain driver-side file I/O (no Spark job on the warm path). Pins:
    first call writes the sidecar; a fresh-memo call serves the SAME
    values from it; a corrupt sidecar or a fingerprint mismatch forces a
    recompute instead of serving garbage."""
    import hashlib
    import json
    import os
    import tempfile

    probe = f"sidecar-probe-{uuid.uuid4().hex[:8]}"
    result = spark.range(3).select(F.col("id").alias("query_id"))
    approx = result  # recall = 1.0

    def run():
        return N._with_recall(
            spark, SF, "documents", probe, "p1",
            result, approx,
            lambda: spark.range(3).select(F.col("id").alias("query_id")),
            ["query_id"], floor=0.5,
        )

    first = run().first()
    assert first["recall_vs_exact"] == 1.0 and first["recall_ok"] is True
    key = hashlib.sha1(
        f"{os.path.abspath(SF)}|{probe}|p1".encode()
    ).hexdigest()[:16]
    cache = os.path.join(tempfile.gettempdir(), f"bdp_recall_{key}.json")
    with open(cache) as f:
        d = json.load(f)
    assert d["recall_vs_exact"] == 1.0 and d["recall_ok"] is True
    assert d["fingerprint"]

    # warm path: fresh memo, sidecar serves the row
    N._RECALL_MEMO.clear()
    again = run().first()
    assert again["recall_vs_exact"] == 1.0 and again["recall_ok"] is True

    # corrupt sidecar: recomputed (and rewritten), not served
    with open(cache, "w") as f:
        f.write("{not json")
    N._RECALL_MEMO.clear()
    assert run().first()["recall_vs_exact"] == 1.0
    with open(cache) as f:
        assert json.load(f)["recall_ok"] is True

    # fingerprint mismatch: stale evidence is never served
    d = json.load(open(cache))
    d["fingerprint"] = "stale"
    d["recall_vs_exact"] = 0.123
    json.dump(d, open(cache, "w"))
    N._RECALL_MEMO.clear()
    assert run().first()["recall_vs_exact"] == 1.0
