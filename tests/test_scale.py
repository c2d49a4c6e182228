"""Scale-operator tests: salted aggregation equivalence and bucketed
shuffle-free joins."""

import pandas as pd
from pyspark.sql import functions as F

from deepicedrain_spark.operators.scale import (
    bucketed_join_is_shuffle_free,
    salted_aggregate,
    write_bucketed,
)

SF_SMALL = "/root/testdata/sf0.001"


def test_salted_aggregate_matches_plain_groupby(spark):
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet").select(
        "event_type", "user_id", "value"
    )
    got = {
        r["event_type"]: r
        for r in salted_aggregate(
            ev,
            ["event_type"],
            {"value": ["sum", "avg", "min", "max"], "user_id": ["count"]},
            salt_buckets=8,
        ).collect()
    }
    want = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.sum("value").alias("sum_value"),
            F.avg("value").alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.count("user_id").alias("count_user_id"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k]["count_user_id"] == want[k]["count_user_id"]
        assert got[k]["min_value"] == want[k]["min_value"]
        assert got[k]["max_value"] == want[k]["max_value"]
        assert abs(got[k]["sum_value"] - want[k]["sum_value"]) < 1e-6
        assert abs(got[k]["avg_value"] - want[k]["avg_value"]) < 1e-9


def test_bucketed_join_drops_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        lineitem = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select(
            "l_orderkey", "l_extendedprice"
        )
        write_bucketed(orders, "t_orders_b", ["o_orderkey"], num_buckets=8)
        write_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            "t_lineitem_b",
            ["o_orderkey"],
            num_buckets=8,
        )
        a = spark.table("t_orders_b")
        b = spark.table("t_lineitem_b")
        joined = a.join(b, "o_orderkey")
        assert bucketed_join_is_shuffle_free(joined)
        # and it still computes the right thing
        n = joined.count()
        plain = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).count()
        assert n == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_shuffle_free_helper_catches_all_exchange_kinds(spark):
    """ADVICE r4 (low): the helper must flag range-partitioning and
    SinglePartition exchanges too, not just hash shuffles — while still
    treating BroadcastExchange as shuffle-free."""
    from pyspark.sql import functions as F

    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    # orderBy on a derived column => Exchange rangepartitioning
    # (orderBy("id") would NOT do: Range reports sorted-by-id output
    # ordering and Catalyst eliminates that sort outright)
    assert not bucketed_join_is_shuffle_free(df.orderBy("k"))
    # global agg => Exchange SinglePartition
    assert not bucketed_join_is_shuffle_free(df.groupBy().sum("id"))
    # groupBy => Exchange hashpartitioning
    assert not bucketed_join_is_shuffle_free(df.groupBy("k").count())
    # broadcast join only => shuffle-free
    small = spark.range(0, 7).select(F.col("id").alias("k"))
    from pyspark.sql.functions import broadcast

    assert bucketed_join_is_shuffle_free(df.join(broadcast(small), "k"))
