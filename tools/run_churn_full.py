"""Round-close runner for the FULL 100-batch churn property test.

The routine suite runs tests/test_nd_store_longhorizon.py at 20 batches
(VERDICT r11 #4: the 100-batch default made `pytest tests/` a 40-minute
long pole). The >=100-batch property criterion still holds per round:
this tool executes the same test at the full horizon and writes a small
JSON artifact (CHURN_r{N}.json at the repo root) recording the outcome
and wall time, so the evidence is committed even though CI defaults
lower.

Usage:  python tools/run_churn_full.py [round_tag] [n_batches]
        e.g.  python tools/run_churn_full.py r12 100
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "rX"
    n = sys.argv[2] if len(sys.argv) > 2 else "100"
    env = dict(os.environ, SPARK_GRAFT_CHURN_BATCHES=n)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest",
         "tests/test_nd_store_longhorizon.py", "-x", "-q"],
        cwd=REPO, env=env, capture_output=True, text=True,
    )
    wall = round(time.time() - t0, 1)
    tail = (proc.stdout or "").strip().splitlines()[-3:]
    out = {
        "artifact": "full-churn property run (round close)",
        "n_batches": int(n),
        "passed": proc.returncode == 0,
        "wall_sec": wall,
        "pytest_tail": tail,
    }
    path = os.path.join(REPO, f"CHURN_{tag}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    print(f"wrote {path}")
    return proc.returncode


if __name__ == "__main__":
    raise SystemExit(main())
