from __future__ import annotations

import pytest

from binance_data_pipeline_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"

# ---- smoke tier (`pytest -m smoke`) -----------------------------------------
# One representative test per operator-family module plus the FULL oracle
# catalog and the plan-pin suite, so a ~15-minute run still pins every
# oracle query and one behavior per family. Selection is centralized here
# (not scattered pytestmark lines): every module contributes its
# alphabetically-FIRST collected test by default (order-independent, so
# -p xdist / random collection order can't change the tier); modules
# below override that. NOTE (ADVICE r10): the representative is chosen
# among COLLECTED items — `-m smoke` is only meaningful over the full
# tests/ directory; running it on a file subset or under -k picks the
# representative within that subset by design.

# every test in these modules is smoke (the correctness gate itself)
_SMOKE_ALL = {
    "test_oracle_parity.py",   # all catalog queries vs DuckDB
    "test_plans.py",           # plan-shape pins (fast, catalog-wide)
}

# module -> explicit test-name prefix to use instead of the first test
# (None = contribute nothing; family covered by a sibling module)
_SMOKE_OVERRIDE: dict[str, str | None] = {
    "test_manifest_model.py": None,   # model-based format differential is
                                      # minutes/seed; manifest family is
                                      # smoked by test_manifest_log.py
}


def pytest_collection_modifyitems(config, items):
    rep_by_module: dict[str, object] = {}

    def _offer(fname: str, item) -> None:
        # alphabetically-first nodeid wins: deterministic regardless of
        # collection order (ADVICE r10)
        cur = rep_by_module.get(fname)
        if cur is None or item.nodeid < cur.nodeid:
            rep_by_module[fname] = item

    for item in items:
        fname = item.fspath.basename
        if fname in _SMOKE_ALL:
            item.add_marker(pytest.mark.smoke)
            continue
        if fname in _SMOKE_OVERRIDE:
            want = _SMOKE_OVERRIDE[fname]
            if want is not None and item.name.startswith(want):
                _offer(fname, item)
            continue
        _offer(fname, item)
    for item in rep_by_module.values():
        item.add_marker(pytest.mark.smoke)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("bdp-tests", shuffle_partitions=8)
    yield s
    s.stop()
