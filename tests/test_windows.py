"""Window operator tests: prefix-sum trailing frames vs native RANGE frame."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from deepicedrain_spark.operators.windows import trailing_range_sums_prefix

SF_SMALL = "/root/testdata/sf0.001"


def test_trailing_range_sums_prefix_matches_native_frame(spark):
    ev = (
        spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .select(
            "event_type",
            F.col("ts").cast("timestamp").cast("long").alias("t"),
            F.round(F.col("value") * 100).cast("long").alias("c"),
        )
        .limit(2000)
        .cache()
    )
    rng = 3600  # 1h trailing window in seconds
    got = {
        tuple(r[:2]): (r[2], r[3])
        for r in trailing_range_sums_prefix(ev, ["event_type"], "t", ["c"], rng)
        .select("event_type", "t", "n_w", "c_w")
        .collect()
    }
    w = Window.partitionBy("event_type").orderBy("t").rangeBetween(-rng, 0)
    want = {
        tuple(r[:2]): (r[2], r[3])
        for r in ev.select(
            "event_type",
            "t",
            F.count("c").over(w).alias("n"),
            F.sum("c").over(w).alias("s"),
        )
        .dropDuplicates(["event_type", "t"])
        .collect()
    }
    assert got == want
    assert len(got) > 0


def test_sessionize_boundary_matches_session_window(spark):
    """Review finding r4: events exactly `gap` apart must land in
    SEPARATE sessions — Spark's session_window merges only when the
    next start is strictly before the current end."""
    import pandas as pd

    from deepicedrain_spark.operators.windows import sessionize

    df = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 1, 1], "t": [0, 10, 20, 25]})
    )
    got = {
        r["t"]: r["session_id"]
        for r in sessionize(df, ["k"], "t", gap=10).collect()
    }
    # 0 -> s1; 10 is exactly gap after 0 -> NEW session; 20 likewise;
    # 25 is 5 < gap after 20 -> same session
    assert got == {0: 1, 10: 2, 20: 3, 25: 3}
