"""Same-session A/B attribution for ambient-band driver-bench lines
(VERDICT r10 task 2): run the flagged queries INTERLEAVED with a fixed
sentinel query in one session at the driver-bench config (get_spark,
sf0.1, noop sink — exactly bench.py's measurement), min-of-4 per
query.

The logic: the driver bench is min-of-2 in a shared container whose
ambient CPU availability swings 2-3x between runs (SCALE.md round-5/6
attributions). If a flagged query's slow driver line were CODE, its
min-of-4 here would stay high while the sentinel stays at its
historical value; if it's AMBIENT, the flagged queries land back in
their historical band and/or the sentinel moves with them.

Usage: python tools/ab_ambient.py [sf_dir]
Prints one JSON line: {"sentinel": {...}, "targets": {...}, "rounds": 4}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepicedrain_spark.session import get_spark  # noqa: E402
from deepicedrain_spark import suite  # noqa: E402
from deepicedrain_spark import suite_custom  # noqa: E402,F401
from deepicedrain_spark import suite_llm  # noqa: E402,F401
from deepicedrain_spark import suite_retrieval  # noqa: E402,F401
from deepicedrain_spark import suite_sketch  # noqa: E402,F401
from deepicedrain_spark import suite_streaming  # noqa: E402,F401

SENTINEL = "pricing_summary"  # stable, scan+agg bound, never flagged
TARGETS = ["ivf_topk_trained", "lake_region_subset", "hdf5_roundtrip"]
ROUNDS = 4


def run_one(spark, fn, sf_dir: str) -> float:
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ab_ambient")
    spark.sparkContext.setLogLevel("ERROR")
    qs = suite.queries()
    run_one(spark, qs[SENTINEL], sf_dir)  # warmup (JVM + codegen)

    times: dict[str, list[float]] = {SENTINEL: [], **{t: [] for t in TARGETS}}
    for _ in range(ROUNDS):
        for name in [SENTINEL, *TARGETS]:
            times[name].append(round(run_one(spark, qs[name], sf_dir), 3))
            spark.catalog.clearCache()

    out = {
        "rounds": ROUNDS,
        "sf_dir": sf_dir,
        "sentinel": {SENTINEL: {"min": min(times[SENTINEL]), "all": times[SENTINEL]}},
        "targets": {
            t: {"min": min(times[t]), "all": times[t]} for t in TARGETS
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
