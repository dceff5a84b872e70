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
