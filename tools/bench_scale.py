"""BENCH_SCALE.json generator (VERDICT r3 task 9): run the sf1/sf4
registered-query scale bench and persist the result as a mechanical
artifact so scale regressions are caught by diffing files, not by
re-reading SCALE.md prose.

For each query it stores the sf1 and sf4 wall times plus the wall
ratio; data grows 4x between the points, so ``ratio <= 4 * slack``
(default slack 1.5, i.e. ratio <= 6) marks the query ``linear_ok``.
Sub-linear ratios are expected for the iteration-bound ANN/k-means
queries, whose cost is dominated by centroid scans, not data.

Usage: python tools/bench_scale.py [out_path]   (default BENCH_SCALE.json)
Exit code = number of queries failing the linearity gate.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from deepicedrain_spark.session import get_spark
from scalecheck_queries import run


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SCALE.json"
    slack = float(os.environ.get("SPARK_GRAFT_SCALE_SLACK", "1.5"))

    spark = get_spark(app_name="bench_scale")
    spark.sparkContext.setLogLevel("ERROR")

    sf1 = run(spark, 10)
    sf4 = run(spark, 40)

    per_query = {}
    failures = 0
    for name, t1 in sf1["queries"].items():
        t4 = sf4["queries"].get(name)
        if t4 is None:
            continue
        ratio = round(t4["sec"] / max(t1["sec"], 0.1), 2)
        ok = ratio <= 4.0 * slack
        failures += 0 if ok else 1
        per_query[name] = {
            "sf1_sec": t1["sec"],
            "sf4_sec": t4["sec"],
            "wall_ratio_4x_data": ratio,
            "linear_ok": ok,
        }

    artifact = {
        "metric": "bench_scale_sf1_sf4",
        "slack": slack,
        "sf1": sf1,
        "sf4": sf4,
        "per_query": per_query,
        "n_failing_linearity": failures,
    }
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps({"wrote": out_path, "n_failing_linearity": failures}))
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
