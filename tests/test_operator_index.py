"""The operators package docstring is the human map of the engine —
every module must import cleanly and appear in the index (a module
missing from the map is invisible to the next reader)."""

from __future__ import annotations

import importlib
import pkgutil
import sys

sys.path.insert(0, "/root/repo")


def test_every_operator_module_imports_and_is_indexed():
    import binance_data_pipeline_spark.operators as ops

    mods = [m.name for m in pkgutil.iter_modules(ops.__path__)]
    assert len(mods) >= 35
    for m in mods:
        importlib.import_module(f"binance_data_pipeline_spark.operators.{m}")
    missing = [m for m in mods if m not in (ops.__doc__ or "")]
    assert missing == [], f"modules absent from the package index: {missing}"
