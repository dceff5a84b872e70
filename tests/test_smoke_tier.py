"""The `-m smoke` tier's coverage contract (tests/conftest.py): every
test module contributes at least one test (or is explicitly opted out),
and the oracle-parity + plan-pin modules are in full. A new module
added without thought lands in the tier automatically via the
first-test default — this pin catches someone breaking that hook."""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_smoke_tier_covers_every_module():
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-m", "smoke",
         "--collect-only", "-q", "-p", "no:cacheprovider"],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    collected = {
        line.split("::")[0].rsplit("/", 1)[-1]
        for line in out.stdout.splitlines()
        if line.startswith("tests/") and "::" in line
    }
    all_mods = {p.name for p in (Path(REPO) / "tests").glob("test_*.py")}
    opted_out = {"test_manifest_model.py"}  # mirrors conftest._SMOKE_OVERRIDE
    missing = all_mods - collected - opted_out
    assert not missing, f"modules absent from the smoke tier: {sorted(missing)}"
    # the full-module members really are in full
    n_oracle = sum(
        1 for line in out.stdout.splitlines()
        if line.startswith("tests/test_oracle_parity.py::")
    )
    assert n_oracle > 10, "oracle-parity module must be in the tier in FULL"


def test_fast_tier_keeps_correctness_gate_and_drops_slow():
    """The default `pytest tests/` tier (VERDICT r12 task 1): slow-marked
    tests are deselected so the driver's single-process run completes,
    but the correctness gate — oracle parity and plan pins — must remain
    in FULL, and an explicit -m expression must restore the whole
    collection (checked by the smoke pin above running with -m)."""
    env = {k: v for k, v in os.environ.items() if k != "BDP_FULL_SUITE"}
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q",
         "-p", "no:cacheprovider"],
        capture_output=True, text=True, cwd=REPO, timeout=300, env=env,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    lines = out.stdout.splitlines()
    assert any("deselected" in l for l in lines[-3:]), lines[-3:]
    collected = [l for l in lines if l.startswith("tests/") and "::" in l]
    # the redundancy tiers are out of the default run...
    assert not any(l.startswith("tests/test_differential_fuzz.py") for l in collected)
    assert not any(l.startswith("tests/test_scale.py") for l in collected)
    # ...but the correctness gate is untouched
    n_oracle = sum(1 for l in collected if l.startswith("tests/test_oracle_parity.py::"))
    n_plans = sum(1 for l in collected if l.startswith("tests/test_plans.py::"))
    assert n_oracle > 10 and n_plans > 5, (n_oracle, n_plans)

    full = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q",
         "-p", "no:cacheprovider"],
        capture_output=True, text=True, cwd=REPO, timeout=300,
        env={**os.environ, "BDP_FULL_SUITE": "1"},
    )
    assert full.returncode == 0
    assert not any("deselected" in l for l in full.stdout.splitlines()[-3:])
