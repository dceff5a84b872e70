"""Parsers in scripts/round_close.py (ADVICE r10): the FINAL-prefixed
JSON extractor must ignore un-prefixed JSON lines, and suite counts must
come from pytest's own summary line, not incidental log text."""

from __future__ import annotations

import importlib.util
import sys

sys.path.insert(0, "/root/repo")

_spec = importlib.util.spec_from_file_location(
    "round_close", "/root/repo/scripts/round_close.py"
)
RC = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(RC)


def test_prefixed_json_ignores_stray_json_after_marker():
    text = "\n".join([
        'FINAL {"recall_at_scale": {"ivf": {"recall": 1.0, "floor": 0.4}}}',
        "some shutdown log line",
        '{"level": "ERROR", "msg": "executor lost"}',  # stray JSON, later
    ])
    j = RC._last_json_line(text, prefix="FINAL")
    assert j is not None and "recall_at_scale" in j
    assert "level" not in j


def test_prefixed_json_none_when_marker_absent():
    assert RC._last_json_line('{"oops": 1}', prefix="FINAL") is None


def test_unprefixed_json_still_takes_last_line():
    text = 'noise\n{"a": 1}\nmore\n{"b": 2}'
    assert RC._last_json_line(text) == {"b": 2}


def test_pytest_summary_anchored_to_summary_line():
    tail = "\n".join([
        "tests/test_x.py::test_y PASSED",
        "captured log: 3 error responses retried, 1 failed request OK",
        "=========== 1109 passed, 2 skipped in 7071.88s (1:57:51) ===========",
        "post-run note: 7 failed attempts were retried upstream",
    ])
    c = RC._pytest_summary(tail)
    assert c == {"passed": 1109, "failed": 0, "skipped": 2, "errors": 0}


def test_pytest_summary_counts_failures_and_errors():
    tail = "====== 3 failed, 100 passed, 2 errors in 60.00s ======"
    c = RC._pytest_summary(tail)
    assert c == {"passed": 100, "failed": 3, "skipped": 0, "errors": 2}


def test_pytest_summary_parses_quiet_mode_bare_line():
    """pytest -q omits the === border — the r11 suite log's actual shape."""
    c = RC._pytest_summary("noise\n1138 passed in 2959.30s (0:49:19)")
    assert c == {"passed": 1138, "failed": 0, "skipped": 0, "errors": 0}
    c = RC._pytest_summary("2 failed, 1135 passed in 3396.06s (0:56:36)")
    assert c == {"passed": 1135, "failed": 2, "skipped": 0, "errors": 0}


def test_pytest_summary_none_without_summary_line():
    assert RC._pytest_summary("no summary here\n5 passed maybe") is None
    assert RC._pytest_summary("3 error responses retried in 2 clients") is None
