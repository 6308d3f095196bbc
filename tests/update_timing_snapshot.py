"""Regenerate tests/timing_snapshot.json (the per-query timing floors
the full-registry ceiling gate ratchets against).

Run after intentionally changing a query's cost profile or adding
queries:

    python tests/update_timing_snapshot.py

Runs bench.py in all-only mode (single-run per registered query at
sf0.01 in this process's fresh JVM) and rewrites the snapshot.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    out = os.path.join(tempfile.mkdtemp(prefix="timing_snap_"), "allq.json")
    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_ALL_ONLY="1",
        SPARK_GRAFT_SF1="0",
        SPARK_GRAFT_BENCH_FULL_PATH=out,
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "bench.py")],
        env=env,
        cwd=_REPO,
        timeout=1800,
    )
    if proc.returncode != 0:
        return proc.returncode
    with open(out) as f:
        payload = json.load(f)
    allq = payload["all_queries"]
    if allq.get("errors"):
        print(f"refusing to snapshot: query errors {allq['errors']}",
              file=sys.stderr)
        return 1
    snap = {
        "sf_dir": allq["sf_dir"],
        "note": (
            "single-run per-query floors at sf0.01 in a fresh JVM; "
            "regenerate with tests/update_timing_snapshot.py"
        ),
        "floors": {n: round(s, 4) for n, s in sorted(allq["queries"].items())},
    }
    snap_path = os.path.join(_REPO, "tests", "timing_snapshot.json")
    with open(snap_path, "w") as f:
        json.dump(snap, f, indent=1, sort_keys=True)
    print(f"wrote {len(snap['floors'])} floors to {snap_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
