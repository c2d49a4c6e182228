"""Benchmark harness: runs the suite's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes its full physical plan through a no-op sink
(format("noop")) so timings measure scan+compute+shuffle, not driver
collect. A warmup query amortizes JVM/codegen startup, and every query
is timed over two passes with the MIN reported: single-pass timings on
a shared host swing 2-3x under transient CPU contention (observed:
same suite 60s vs 156s minutes apart), and min-of-2 recovers the
machine-capability number instead of the noise.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from deepicedrain_spark.session import get_spark  # noqa: E402
from deepicedrain_spark import suite  # noqa: E402
from deepicedrain_spark import suite_custom  # noqa: E402,F401
from deepicedrain_spark import suite_llm  # noqa: E402,F401
from deepicedrain_spark import suite_retrieval  # noqa: E402,F401
from deepicedrain_spark import suite_sketch  # noqa: E402,F401
from deepicedrain_spark import suite_streaming  # noqa: E402,F401

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_one(spark, fn, sf_dir: str) -> float:
    t0 = time.time()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM + codegen + parquet footer caches (tolerated like the
    # timed loop — a bad SF dir must still produce the JSON line, with
    # errors visible in it, not a naked traceback the capture drops)
    try:
        run_one(spark, suite.q_height_range, SF_DIR)
    except Exception as e:  # noqa: BLE001
        print(f"bench warmup error: {e}", file=sys.stderr)

    timings: dict[str, float] = {}
    for _pass in range(2):
        for name, fn in suite.queries().items():
            try:
                t = round(run_one(spark, fn, SF_DIR), 3)
            except Exception as e:  # noqa: BLE001
                print(f"bench error {name}: {e}", file=sys.stderr)
                t = -1.0
            prev = timings.get(name)
            timings[name] = t if prev is None or prev < 0 else (prev if t < 0 else min(prev, t))
            # queries persist intermediates reused inside their own
            # plan; drop them so later queries aren't squeezed by
            # stale caches
            spark.catalog.clearCache()

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    errors = sorted(n for n, t in timings.items() if t < 0)
    sf = 0.1
    try:
        sf = float(SF_DIR.rstrip("/").split("sf")[-1])
    except ValueError:
        pass
    # Round 1 the full 90-query dict overflowed the driver's capture
    # (BENCH_r01.json "parsed": null) — keep the stdout line compact:
    # suite total + 10 slowest queries; full detail goes to a file.
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    with open(detail_path, "w") as f:
        json.dump(
            {"metric": "suite_total_wall", "value": total, "unit": "sec",
             "queries": timings, "n_queries": len(timings), "sf": sf,
             "errors": errors},
            f, indent=1, sort_keys=True,
        )
    top10 = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    print(
        json.dumps(
            {
                "metric": "suite_total_wall",
                "value": total,
                "unit": "sec",
                "queries": top10,
                "n_queries": len(timings),
                "sf": sf,
                "n_errors": len(errors),
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
