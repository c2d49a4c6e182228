"""Physical-plan shape assertions for the newer suite queries: the
point is not that they run, but that Catalyst produced the plan we
designed for 100 TB (pushdown reaching the scan, dims broadcast, the
as-of join collapsing to a single exchange)."""

from __future__ import annotations

from deepicedrain_spark import suite_custom

SF_SMALL = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_shipping_priority_pushdown_and_broadcast(spark):
    df = suite_custom.q_shipping_priority(spark, SF_SMALL)
    plan = plan_of(df)
    # the l_shipdate range predicate must reach the parquet scan
    assert "PushedFilters: [" in plan and "l_shipdate" in plan
    # customer (the dim side) must build a broadcast, not shuffle
    assert "BroadcastHashJoin" in plan
    # only lineitem columns actually used are read
    assert "l_comment" not in plan


def test_asof_join_single_exchange(spark):
    df = suite_custom.q_asof_last_purchase(spark, SF_SMALL)
    plan = plan_of(df)
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    # exchanges: one for the right-side pre-aggregation groupBy
    # (user_id, p_us) and one keying the union'd window on user_id —
    # never more (no join operator, no range-join explosion)
    assert plan.count("Exchange hashpartitioning") <= 2


def test_gridded_pip_is_equi_join(spark):
    df = suite_custom.q_point_in_polygon_gridded(spark, SF_SMALL)
    plan = plan_of(df)
    # the scale path must not fall back to a nested-loop cross join
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_wide_regression_is_map_only(spark, tmp_path):
    from deepicedrain_spark.suite_custom import build_wide_events, wide_regression

    path = str(tmp_path / "wide")
    build_wide_events(spark, SF_SMALL).write.parquet(path)
    plan = plan_of(wide_regression(spark.read.parquet(path)))
    # the wide-at-rest path must be scan -> project, nothing else
    assert "Exchange" not in plan
    # "*(1)" is toString()'s whole-stage-codegen marker: one codegen
    # stage wrapping the whole plan
    assert plan.startswith("*(1) Project")


def test_ngram_jaccard_no_cartesian(spark):
    from deepicedrain_spark import suite_llm

    plan = plan_of(suite_llm.q_ngram_jaccard(spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_simhash_pairs_equi_join_only(spark):
    """The SCALE path (banding) must produce hash equi-joins, never a
    non-equi loop join. The registered query legitimately switches to
    the brute-force branch below SMALL_CORPUS_DOCS (round 3 fast path),
    so pin the plan on the operator with the small path disabled."""
    from deepicedrain_spark.io import load_table
    from deepicedrain_spark.operators.dedup import simhash, simhash_near_pairs

    docs = load_table(spark, SF_SMALL, "documents")
    fps = simhash(docs, bits=32)
    plan = plan_of(simhash_near_pairs(fps, max_hamming=2, bits=32, n_docs=None))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_embedding_lsh_equi_join_only(spark):
    from deepicedrain_spark import suite_llm

    plan = plan_of(suite_llm.q_embedding_near_dup_lsh(spark, SF_SMALL))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pvalue_single_exchange(spark):
    from deepicedrain_spark import suite

    plan = plan_of(suite.q_dhdt_regression_pvalue(spark, SF_SMALL))
    # regr_* partial+final aggregation: exactly one exchange; the
    # betainc UDF must sit ABOVE the aggregation (ArrowEvalPython over
    # O(groups) rows), adding no shuffle
    assert plan.count("Exchange hashpartitioning") == 1
    assert "ArrowEvalPython" in plan


def test_densify_single_window_no_join(spark):
    from deepicedrain_spark import suite_custom

    plan = plan_of(suite_custom.q_track_densify(spark, SF_SMALL))
    # one lead() window partitioning plus explode — no join of any kind
    for op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
               "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert op not in plan
    assert "Generate explode" in plan


def test_kmeans_assignment_map_only(spark):
    from deepicedrain_spark.io import load_table
    from deepicedrain_spark.operators.kmeans import assign_to_centroids, seed_centroids

    emb = load_table(spark, SF_SMALL, "embeddings")
    cents = seed_centroids(emb, "embedding", "vec_id", 4)
    plan = plan_of(assign_to_centroids(emb, "embedding", cents))
    # centroids enter as literals: no join, no shuffle — pure scan+project
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_bloom_probe_broadcasts_filter(spark):
    from pyspark.sql import functions as F

    from deepicedrain_spark.io import load_table
    from deepicedrain_spark.operators.sketches import bloom_bits, bloom_probe

    docs = load_table(spark, SF_SMALL, "documents")
    a = docs.where(F.col("doc_id") % 2 == 0)
    b = docs.where(F.col("doc_id") % 3 == 0)
    bits = bloom_bits(a, F.col("text"), k=4, m=1 << 12)
    plan = plan_of(bloom_probe(b, bits, F.col("text"), "doc_id", k=4, m=1 << 12))
    # the bit set joins broadcast; the probed corpus is never shuffled
    # for the membership test (only the final per-doc groupBy keys it)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_hll_single_register_shuffle(spark):
    from deepicedrain_spark.io import load_table
    from deepicedrain_spark.operators.sketches import hll_estimate

    orders = load_table(spark, SF_SMALL, "orders")
    plan = plan_of(hll_estimate(orders, "o_custkey", b=10))
    # one hash shuffle (the 2^b register groupBy) + the final 1-row
    # single-partition agg; partial aggregation runs map-side
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_max" in plan or "partial" in plan.lower()


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    from pyspark.sql import functions as F

    from deepicedrain_spark.io import load_table, write_parquet

    ev = load_table(spark, SF_SMALL, "events").select("event_id", "event_type", "value")
    path = str(tmp_path / "ev_part")
    write_parquet(ev, path, partition_by=["event_type"])
    back = spark.read.parquet(path).where(F.col("event_type") == "click")
    plan = plan_of(back)
    # the directory-partition predicate must prune at planning time,
    # never scan-and-filter
    assert "PartitionFilters: [" in plan and "event_type" in plan.split("PartitionFilters:")[1][:120]


def test_zordered_write_layout(spark, tmp_path):
    import glob

    from pyspark.sql import functions as F

    from deepicedrain_spark.io import load_table, write_zordered
    from deepicedrain_spark.operators.spatial import morton_code_sql

    emb = load_table(spark, SF_SMALL, "embeddings").select(
        "vec_id",
        F.expr(
            "CAST(least(65535.0, greatest(0.0, floor((CAST(element_at(embedding, 1) AS DOUBLE) + 1.0) / 2.0 * 65536.0))) AS BIGINT)"
        ).alias("xi"),
        F.expr(
            "CAST(least(65535.0, greatest(0.0, floor((CAST(element_at(embedding, 2) AS DOUBLE) + 1.0) / 2.0 * 65536.0))) AS BIGINT)"
        ).alias("yi"),
    )
    # the write plan must use ONE range-partitioning exchange
    staged = emb.withColumn("_z", F.expr(morton_code_sql("xi", "yi", dialect="spark")))
    plan = plan_of(staged.repartitionByRange(4, "_z").sortWithinPartitions("_z"))
    assert "rangepartitioning" in plan.lower()

    path = str(tmp_path / "zorder")
    write_zordered(emb, path, "xi", "yi", n_files=4)
    files = glob.glob(f"{path}/part-*.parquet")
    assert len(files) <= 4 and files
    back = spark.read.parquet(path)
    assert back.count() == emb.count()
    # each file covers a DISJOINT morton range (the pruning property)
    per_file = (
        back.withColumn("_z", F.expr(morton_code_sql("xi", "yi", dialect="spark")))
        .withColumn("_f", F.input_file_name())
        .groupBy("_f")
        .agg(F.min("_z").alias("lo"), F.max("_z").alias("hi"))
        .collect()
    )
    spans = sorted((r["lo"], r["hi"]) for r in per_file)
    for (_, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 <= lo2, "file Z-ranges overlap — layout not range-partitioned"


def test_hilbert_write_layout_disjoint_and_tighter(spark, tmp_path):
    """curve='hilbert' write: per-file key ranges are DISJOINT (the
    pruning property), round-trip is lossless, and the layout's file
    bboxes are no looser than random placement (seam-free locality)."""
    import glob

    from pyspark.sql import functions as F

    from deepicedrain_spark.io import load_table, write_zordered
    from deepicedrain_spark.operators.spatial import hilbert_order_sql

    emb = load_table(spark, SF_SMALL, "embeddings").select(
        "vec_id",
        F.expr(
            "CAST(least(65535.0, greatest(0.0, floor((CAST(element_at(embedding, 1) AS DOUBLE) + 1.0) / 2.0 * 65536.0))) AS BIGINT)"
        ).alias("xi"),
        F.expr(
            "CAST(least(65535.0, greatest(0.0, floor((CAST(element_at(embedding, 2) AS DOUBLE) + 1.0) / 2.0 * 65536.0))) AS BIGINT)"
        ).alias("yi"),
    )
    path = str(tmp_path / "hilbert")
    write_zordered(emb, path, "xi", "yi", n_files=4, curve="hilbert")
    files = glob.glob(f"{path}/part-*.parquet")
    assert len(files) <= 4 and files
    back = spark.read.parquet(path)
    assert back.count() == emb.count()
    assert set(back.columns) == {"vec_id", "xi", "yi"}
    back.createOrReplaceTempView("hilb_back")
    keyed = spark.sql(
        hilbert_order_sql(
            "SELECT * FROM hilb_back", "xi", "yi", "vec_id, xi, yi",
            bits=16, dialect="spark",
        )
    )
    per_file = (
        keyed.withColumn("_f", F.input_file_name())
        .groupBy("_f")
        .agg(F.min("hilbert").alias("lo"), F.max("hilbert").alias("hi"))
        .collect()
    )
    spans = sorted((r["lo"], r["hi"]) for r in per_file)
    for (_, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 <= lo2, "file Hilbert ranges overlap — not range-partitioned"


def test_dissolve_no_cartesian_no_nested_loop(spark):
    """The planar overlay must plan as equi-joins on the dissolve key
    (+pid/eid) — no cartesian product, no broadcast nested loop."""
    from pyspark.sql import functions as F

    from deepicedrain_spark.operators.dissolve import dissolve_stats

    rows = []
    for k in range(4):
        rows.append((f"k{k}", 0, [0.0, 1.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 1.0, 0.0]))
        rows.append((f"k{k}", 1, [0.5, 1.5, 1.5, 0.5, 0.5], [0.0, 0.0, 1.0, 1.0, 0.0]))
    df = spark.createDataFrame(
        rows, "key string, pid long, xs array<double>, ys array<double>"
    )
    plan = plan_of(dissolve_stats(df, ["key"]))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hdf5_partitioned_write_no_driver_collect(spark, tmp_path):
    """The distributed granule sink is one shuffle (groupBy key) into
    applyInPandas — no CollectLimit / driver materialization node."""
    from pyspark.sql import functions as F

    from deepicedrain_spark.sources.hdf5 import write_hdf5_partitioned

    df = spark.range(0, 1000).select(
        (F.col("id") % 4).alias("rgt"), F.col("id").alias("seg"), (F.col("id") * 0.5).alias("h")
    )
    manifest = write_hdf5_partitioned(
        df, str(tmp_path / "g"), "gt1l/land_ice_segments", key_col="rgt",
        columns=["seg", "h"],
    )
    plan = plan_of(manifest)
    assert "CollectLimit" not in plan and "FlatMapGroupsInPandas" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_dissolve_cells_strategy_no_cartesian(spark):
    """Round 7: the grid-bucketed overlay must also plan every join as
    an equi-join — (key, cx, cy[, salt]) for pair candidates,
    (key, cx, cy) for the ray casts — never a cartesian."""
    from pyspark.sql import functions as F

    from deepicedrain_spark.operators.dissolve import dissolve_stats

    rows = []
    for k in range(3):
        rows.append((f"k{k}", 0, [0.0, 1.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 1.0, 0.0]))
        rows.append((f"k{k}", 1, [0.5, 1.5, 1.5, 0.5, 0.5], [0.0, 0.0, 1.0, 1.0, 0.0]))
    df = spark.createDataFrame(
        rows, "key string, pid long, xs array<double>, ys array<double>"
    )
    plan = plan_of(dissolve_stats(df, ["key"], strategy="cells"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dsir_two_pass_broadcast_model(spark):
    """Round-10 DSIR shape: the r9 per-bigram cache is GONE (it was one
    cached row PER BIGRAM — larger than the corpus text at scale, with
    no safe in-function unpersist point). The returned plan is the
    SCORING pass only: one streaming explode (model pass 1 already ran
    and collected to <=256 buckets by the time the DataFrame exists)
    joined to the 256-row literal ratio table map-side — so exactly one
    Generate, zero InMemoryTableScan, and a broadcast join, never a
    shuffle of the bigram stream against the model."""
    from deepicedrain_spark.suite_sketch import q_dsir_importance_weights

    df = q_dsir_importance_weights(spark, SF_SMALL)
    plan = plan_of(df)
    assert plan.count("Generate") == 1, plan.count("Generate")
    assert "InMemoryTableScan" not in plan
    assert "BroadcastHashJoin" in plan
    assert df.count() > 0


def test_hilbert_sentinel_columns_no_collision(spark, tmp_path):
    """A source frame whose passthrough columns are named like the
    Hilbert state-machine working columns (hx/sw/cm) must survive
    write_zordered(curve='hilbert') unchanged (ADVICE r8: the working
    columns are now __hilb_-prefixed); the reserved output names
    (hilbert/_z) raise a clear error; the staging temp view is
    dropped after the plan is built."""
    import pytest

    from deepicedrain_spark.io import write_zordered

    df = spark.createDataFrame(
        [(1, 3, 5, 7, 9), (2, 4, 6, 8, 10)],
        "vec_id long, hx long, sw long, cm long, hd long",
    )
    before = {v.name for v in spark.catalog.listTables() if v.isTemporary}
    path = str(tmp_path / "hilb_collide")
    write_zordered(df, path, "hx", "sw", n_files=1, curve="hilbert")
    after = {v.name for v in spark.catalog.listTables() if v.isTemporary}
    assert after == before  # staging view dropped
    back = spark.read.parquet(path)
    assert set(back.columns) == {"vec_id", "hx", "sw", "cm", "hd"}
    assert {tuple(r) for r in back.select("vec_id", "hx", "sw", "cm", "hd").collect()} == {
        (1, 3, 5, 7, 9),
        (2, 4, 6, 8, 10),
    }
    bad = df.withColumnRenamed("hd", "hilbert")
    with pytest.raises(ValueError, match="reserves column names"):
        write_zordered(bad, str(tmp_path / "x"), "hx", "sw", curve="hilbert")
    # morton reserves _z too (it would silently be overwritten, then
    # dropped from the written output)
    badz = df.withColumnRenamed("hd", "_z")
    with pytest.raises(ValueError, match="reserves column names"):
        write_zordered(badz, str(tmp_path / "y"), "hx", "sw", curve="morton")


def test_atl11_e2e_single_aggregation_exchange(spark):
    """The whole-ATL11 pipeline (multi-store 2-D Zarr scan -> long ->
    per-point regression -> partitioned parquet sink -> re-scan) must
    keep ONE hash exchange between the granule scan and the sink: the
    partial regr_* aggregates combine map-side inside each
    (store x stripe) task, and only the per-(track, ref_pt) merge
    shuffles. On the reference's real 1387-store archive anything
    more (a per-store union plan, an extra repartition) multiplies
    the shuffled bytes by the store count."""
    df = suite_custom.q_atl11_dhdt_end_to_end(spark, SF_SMALL)
    # df is the parquet read-back; assert on the plan that PRODUCED
    # the sink instead: rebuild the pre-sink aggregate the query runs
    import os

    from pyspark.sql import functions as F

    from deepicedrain_spark.sources.zarr import read_zarr_dir

    parent = suite_custom.scratch_path(SF_SMALL, "zarr_atl11_e2e")
    assert os.path.isdir(parent)  # fixture synthesized by the query
    cube = read_zarr_dir(spark, parent, columns=["ref_pt", "h_corr", "delta_time"])
    long = (
        cube.select(
            F.col("store").alias("track"),
            "ref_pt",
            F.explode(F.arrays_zip("h_corr", "delta_time")).alias("z"),
        )
        .select(
            "track",
            "ref_pt",
            F.col("z.h_corr").cast("double").alias("h"),
            F.col("z.delta_time").alias("t"),
        )
        .where(~F.isnan("h"))
    )
    fit = long.groupBy("track", "ref_pt").agg(
        F.expr("regr_count(h, t)").cast("long").alias("n")
    )
    plan = plan_of(fit)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_count" in plan  # map-side combine below the exchange
    # and the certified result itself: right shape, every track present
    rows = df.groupBy("track").count().collect()
    assert {r["track"] for r in rows} == {f"track_{1000 + g}" for g in range(6)}


def test_covariance_one_pass_one_exchange(spark):
    """The covariance plan must read the data ONCE (one MapInPandas
    moment pass) with exactly one hash exchange (the pidx reduce over
    batches x (1+d+d^2) doubles) — no joins: a join-based assembly
    re-executes the un-persisted moment subplan once per branch,
    turning a one-pass algorithm into four passes at 100 TB."""
    from deepicedrain_spark.io import load_table
    from deepicedrain_spark.operators.linalg import covariance_long

    emb = load_table(spark, SF_SMALL, "embeddings")
    plan = plan_of(covariance_long(emb, dims=64))
    assert plan.count("MapInPandas") == 1  # the data pass happens once
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    # the only Generate is the final 2080-entry explode; the vectors
    # themselves are never exploded
    assert "posexplode(m" in plan or plan.count("Generate") == 2


def test_knn_graph_prunes_before_merge(spark):
    """The k-NN graph's merge window must consume the block tasks'
    pruned top-k output (O(n*B*k) rows), with Spark's rank-filter
    rewrite (WindowGroupLimit) bounding the merge, and exactly two
    exchanges: block-pair grouping and the query_id window."""
    from deepicedrain_spark.io import load_table
    from deepicedrain_spark.operators.similarity import knn_graph_blocked

    emb = load_table(spark, SF_SMALL, "embeddings")
    plan = plan_of(knn_graph_blocked(emb, k=3, n_blocks=4))
    assert "FlatMapGroupsInArrow" in plan or "FlatMapGroupsInPandas" in plan
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange hashpartitioning") == 2
