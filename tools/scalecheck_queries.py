"""Per-query scale bench: the top LLM/ANN queries at synthetic sf1+.

BENCH_r2's per-query numbers at sf0.1 (5 000 docs / 2 000 vectors) are
dominated by fixed Spark job overhead, not data (VERDICT r2 next-step
#9). This tool stages a synthetic sf directory with the SAME schemas
and distribution shapes as the driver testdata (documents with hashed
token streams + 1-in-50 planted near-dups, 64-dim float embeddings in
10 label clusters, TPC-H-ish customer/orders) at a chosen multiple of
sf0.1, then times the REGISTERED query functions — the exact plans the
driver runs — against it.

Usage: python tools/scalecheck_queries.py [sf_multiple_of_0.1]
  (default 10 → "sf1": 50 k docs, 20 k vectors, 1.5 M orders)
Prints one JSON line; human summary goes to SCALE.md by hand.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from deepicedrain_spark.session import get_spark

TOKENS = 50
VOCAB = 30_000

QUERIES = [
    "ngram_jaccard_pairs",
    "simhash_near_pairs",
    "minhash_near_dup",
    "near_dup_components",
    "pagerank_near_dup",
    "leakage_safe_split",
    "dedup_keep_best",
    "pq_encode",
    "pq_adc_topk",
    "kmeans_clusters",
    "ivf_topk_trained",
    "cosine_topk_lsh",
    "embedding_near_dup_lsh",
    "bloom_semijoin_reduction",
    # round 8 session 2: ExactSubstr spans (2-exchange window-hash
    # plan), BPE train (vocab-table iterations) + dictionary-encoded
    # token counts, ANN recall@3 roll-up. The near-dup graph family
    # above now shares the memoized pair table within a staging dir,
    # so each downstream query's ratio gates ITS OWN plan.
    "exact_substring_spans",
    "bpe_merge_table",
    "bpe_encode_tokens",
    "ann_recall_at_k",
    # round 8 session 3: DSIR importance weights, CCNet perplexity
    # thirds, Gopher quality gate, KMV distinct sketch (shingle
    # explode + distributed top-k), Hilbert layout key (map-only +
    # global sort), IVFADC search (cell equi-join over PQ codes).
    # kmv_set_ops_custkeys is excluded: it filters orders to 1995,
    # which the staged o_orderdate range (1996+) doesn't contain.
    "dsir_importance_weights",
    "perplexity_buckets",
    "gopher_quality_rules",
    "kmv_distinct_shingles",
    "hilbert_spatial_order",
    "ivfpq_topk",
    "quality_classifier_train",
    "quality_classifier_score",
    "streaming_classifier_score",
    "temperature_mixture_quota",
    "streaming_dim_enrich",
    "ivfpq_recall_at_k",
    "llm_corpus_pipeline",
    "jsonl_roundtrip",
    # geo/streaming family (round 7, VERDICT r6 task 4): the same
    # sf1/sf4 linearity gate over the crossover join, gridded PIP,
    # raster/gridding aggregates, per-point regression, rolling
    # window, and the streaming upsert/sliding sinks. (Dissolve's
    # scale story is key-shaped, not row-shaped — it is gated
    # separately by tools/scalecheck_dissolve.py's single-key and
    # many-keys modes.)
    # round 10 session 3: retrieval / evaluation family. BM25 (postings
    # shuffle + broadcast model tables), Kneser–Ney LM (same shape as
    # perplexity_buckets — ALSO run on the Zipf fixture below, since
    # the uniform fixture's near-unique bigrams grow the model table
    # with the corpus, the documented perplexity artifact), entropy
    # signals (two doc-keyed count aggs), exact ROC-AUC (per-score
    # groupBy + compressed distinct-score pass), MMR (distributed
    # top-M pool + bounded driver greedy).
    "bm25_topk_per_lang",
    "kneser_ney_lm_score",
    "entropy_quality",
    "classifier_auc_eval",
    "mmr_diversified_topk",
    # session-3 batch 2: one-sided-prefix containment (its own filter,
    # not covered by ngram_jaccard's symmetric gate) and 13-gram
    # decontamination (benchmark-gram broadcast + corpus shingle scan)
    "containment_dedup",
    "ngram_decontamination",
    # round 11: corpus-analysis / drift family. PMI shares Kneser–Ney's
    # bigram-model-table sensitivity on the uniform fixture (near-unique
    # synthetic bigrams grow the count table with the corpus), so it
    # ALSO runs on the Zipf fixture; keyness/JS are unigram-bounded
    # (30k vocab cap); PSI is a value-domain edge pass + two map-side
    # bucket counts; the streaming PSI gate adds only the
    # complete-mode count maintenance.
    # round 12: winnowing fingerprint family (map-only selection +
    # winnowed-set distinct; the match join adds the fp equi-join) and
    # the broadcast-benchmark semantic decontamination scan
    "winnowing_fingerprints",
    "winnowing_matches",
    "semantic_decontamination",
    "bigram_pmi_top",
    "keyness_terms_per_source",
    "js_divergence_sources",
    "psi_value_drift",
    "streaming_psi_drift",
    "classifier_agreement_kappa",
    "classifier_auc_quantized",
    "crossover_track_intersections",
    "point_in_polygon_gridded",
    "raster_datashade",
    "raster_cube",
    "block_median",
    "surface_tension_spline",
    "dhdt_per_point_regression",
    "rolling_time_mean",
    "volume_time_series",
    "streaming_sliding_means",
    "streaming_upsert_bucketed",
]


def embedding_exprs(id_col: str = "id"):
    """(label, embedding) column exprs for the synthetic 64-dim
    vectors — 10 sin-cluster centers + hash noise over a long id
    column. The ONE definition every scale probe shares (stage() here
    and tools/scalecheck_linalg.py), so the probes stay comparable."""
    lab = F.pmod(F.xxhash64(id_col, F.lit(3)), F.lit(10)).cast("int")
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: (
            F.sin(lab * F.lit(1.7) + i * F.lit(0.31))
            + (F.pmod(F.xxhash64(F.col(id_col), i), F.lit(2001)) - 1000)
            / F.lit(4000.0)
        ).cast("float"),
    )
    return lab, emb


def stage(spark, out_dir: str, mult: int) -> None:
    N_DOCS = 5_000 * mult
    N_VECS = 2_000 * mult
    N_CUST = 15_000 * mult
    N_ORDERS = 150_000 * mult
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    # documents: hashed token streams, 1-in-50 near-dup of the prior doc
    rows = spark.range(N_DOCS)
    base = F.when(F.col("id") % 50 == 0, F.col("id") - 1).otherwise(F.col("id"))
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(TOKENS - 1)),
        lambda i: F.concat(
            F.lit("w"),
            F.when(
                (F.col("id") % 50 == 0) & (i == 7),
                F.pmod(F.xxhash64(F.col("id"), i, F.lit(99)), F.lit(VOCAB)),
            ).otherwise(F.pmod(F.xxhash64(base, i), F.lit(VOCAB))),
        ),
    )
    docs = rows.select(
        F.col("id").alias("doc_id"),
        F.array_join(toks, " ").alias("text"),
        F.element_at(
            F.array(F.lit("en"), F.lit("en"), F.lit("en"), F.lit("fr"), F.lit("zh")),
            (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(5)) + 1).cast("int"),
        ).alias("lang"),
        F.concat(F.lit("src"), F.pmod(F.xxhash64("id", F.lit(2)), F.lit(20)).cast("string")).alias("source"),
    ).withColumn("n_chars", F.length("text"))
    docs.coalesce(8).write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))

    # embeddings: 10 gaussian-ish label clusters in 64-dim float
    v = spark.range(N_VECS)
    lab, emb = embedding_exprs()
    v.select(
        F.col("id").alias("vec_id"), emb.alias("embedding"), lab.alias("label")
    ).coalesce(8).write.mode("overwrite").parquet(os.path.join(out_dir, "embeddings.parquet"))

    # events: same shape as the driver testdata (30 days of ts, 5 event
    # types, JSON props, value 0-500), users scaled WITH the data so
    # per-user series stay constant-density (regression/rolling windows
    # measure more groups, not longer groups; crossover's 4 tracks do
    # lengthen — its crossings and cell join both grow linearly)
    N_EVENTS = 100_000 * mult
    n_users = 500 * mult
    etypes = F.array(*[F.lit(s) for s in ("click", "view", "purchase", "signup", "error")])
    spark.range(N_EVENTS).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.lit(1_704_067_200_000_000)
            + F.pmod(F.xxhash64("id", F.lit(12)), F.lit(2_592_000)) * F.lit(1_000_000)
        ).alias("ts"),
        F.pmod(F.xxhash64("id", F.lit(13)), F.lit(n_users)).alias("user_id"),
        F.element_at(
            etypes, (F.pmod(F.xxhash64("id", F.lit(14)), F.lit(5)) + 1).cast("int")
        ).alias("event_type"),
        (F.pmod(F.xxhash64("id", F.lit(15)), F.lit(49_000)) / 100.0 + 0.01).alias("value"),
        F.concat(
            F.lit('{"k": '), F.pmod(F.xxhash64("id", F.lit(16)), F.lit(100)).cast("string"), F.lit("}")
        ).alias("props"),
    ).coalesce(8).write.mode("overwrite").parquet(os.path.join(out_dir, "events.parquet"))

    # TPC-H-ish customer/orders (only what bloom_semijoin needs)
    segs = F.array(*[F.lit(s) for s in ("MACHINERY", "BUILDING", "FURNITURE", "HOUSEHOLD", "AUTOMOBILE")])
    spark.range(N_CUST).select(
        (F.col("id") + 1).alias("c_custkey"),
        F.concat(F.lit("Customer#"), F.col("id").cast("string")).alias("c_name"),
        F.pmod(F.xxhash64("id", F.lit(4)), F.lit(25)).cast("int").alias("c_nationkey"),
        ((F.pmod(F.xxhash64("id", F.lit(5)), F.lit(1_000_000)) - 100_000) / 100.0).alias("c_acctbal"),
        F.element_at(segs, (F.pmod(F.xxhash64("id", F.lit(6)), F.lit(5)) + 1).cast("int")).alias("c_mktsegment"),
    ).coalesce(8).write.mode("overwrite").parquet(os.path.join(out_dir, "customer.parquet"))
    spark.range(N_ORDERS).select(
        (F.col("id") + 1).alias("o_orderkey"),
        (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(N_CUST)) + 1).alias("o_custkey"),
        F.element_at(
            F.array(F.lit("O"), F.lit("F"), F.lit("P")),
            (F.pmod(F.xxhash64("id", F.lit(8)), F.lit(3)) + 1).cast("int"),
        ).alias("o_orderstatus"),
        (F.pmod(F.xxhash64("id", F.lit(9)), F.lit(50_000_000)) / 100.0).alias("o_totalprice"),
        F.timestamp_micros(
            F.lit(820454400000000) + F.pmod(F.xxhash64("id", F.lit(10)), F.lit(189216000)) * F.lit(1_000_000)
        ).alias("o_orderdate"),
        F.concat(F.lit(""), F.pmod(F.xxhash64("id", F.lit(11)), F.lit(5)).cast("string"), F.lit("-X")).alias("o_orderpriority"),
    ).coalesce(16).write.mode("overwrite").parquet(os.path.join(out_dir, "orders.parquet"))


def stage_zipf(spark, out_dir: str, mult: int) -> None:
    """Documents-only variant with Zipf(1) token ranks instead of the
    uniform hash stream. The uniform fixture's bigrams are near-unique
    (VOCAB^2 space), so the perplexity LM model table GROWS with the
    corpus — the documented reason perplexity_buckets' uniform-fixture
    ratio sits superlinear. Real corpora are Zipf-distributed: the
    model table plateaus (hot bigrams repeat), and the unhinted
    sort-merge LM join should scale ~linearly. Both fixtures in the
    gate keep that attribution measured, not asserted (VERDICT r8
    task 6). Token rank r ∈ [1, VOCAB] with p(r) ∝ 1/r via the
    log-uniform inverse transform exp(u·ln VOCAB)."""
    N_DOCS = 5_000 * mult
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    rows = spark.range(N_DOCS)
    # per-token uniform draw, mapped through the Zipf inverse CDF
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(TOKENS - 1)),
        lambda i: F.concat(
            F.lit("w"),
            F.floor(
                F.exp(
                    ((F.pmod(F.xxhash64(F.col("id"), i, F.lit(22)), F.lit(1_000_000)) + 0.5) / 1e6)
                    * F.lit(float(math.log(VOCAB)))
                )
            ).cast("long"),
        ),
    )
    rows.select(
        F.col("id").alias("doc_id"),
        F.array_join(toks, " ").alias("text"),
        F.element_at(
            F.array(F.lit("en"), F.lit("en"), F.lit("en"), F.lit("fr"), F.lit("zh")),
            (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(5)) + 1).cast("int"),
        ).alias("lang"),
        F.concat(F.lit("src"), F.pmod(F.xxhash64("id", F.lit(2)), F.lit(20)).cast("string")).alias("source"),
    ).withColumn("n_chars", F.length("text")).coalesce(8).write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "documents.parquet"))


def run(spark, mult: int, only: set[str] | None = None) -> dict:
    """Stage a synthetic sf directory at ``mult`` x sf0.1 and time the
    registered queries against it. Returns the result dict (also the
    shape BENCH_SCALE.json stores per scale point). ``only`` restricts
    to a named subset (the ``_zipf`` variants match their base name)."""
    out_dir = f"/tmp/spark_graft_sfx{mult}"
    t0 = time.time()
    stage(spark, out_dir, mult)
    # the Zipf fixture only feeds the _zipf runs — skip its staging
    # when a subset run requests none of them
    if not only or only & {"perplexity_buckets", "kneser_ney_lm_score", "bigram_pmi_top"}:
        stage_zipf(spark, out_dir + "_zipf", mult)
    t_stage = time.time() - t0

    import __spark_entry__ as entry

    qs = entry.queries()
    timings = {}
    for name in QUERIES:
        if only and name not in only:
            continue
        t0 = time.time()
        n = qs[name](spark, out_dir).count()
        timings[name] = {"sec": round(time.time() - t0, 1), "rows": n}
    # perplexity over the Zipf fixture: same plan, realistic token
    # distribution — the LM model table plateaus instead of growing
    # with the corpus, isolating the uniform fixture's superlinear
    # ratio as a data artifact (near-unique synthetic bigrams)
    if not only or "perplexity_buckets" in only:
        t0 = time.time()
        n = qs["perplexity_buckets"](spark, out_dir + "_zipf").count()
        timings["perplexity_buckets_zipf"] = {"sec": round(time.time() - t0, 1), "rows": n}
    # Kneser–Ney has the same LM-model-table sensitivity: the Zipf run
    # is the realistic-plateau measurement, the uniform run above the
    # adversarial (model-table-grows) one
    if not only or "kneser_ney_lm_score" in only:
        t0 = time.time()
        n = qs["kneser_ney_lm_score"](spark, out_dir + "_zipf").count()
        timings["kneser_ney_lm_score_zipf"] = {"sec": round(time.time() - t0, 1), "rows": n}
    # PMI shares the bigram-model-table sensitivity: Zipf = realistic
    # plateau, uniform = adversarial model-table growth
    if not only or "bigram_pmi_top" in only:
        t0 = time.time()
        n = qs["bigram_pmi_top"](spark, out_dir + "_zipf").count()
        timings["bigram_pmi_top_zipf"] = {"sec": round(time.time() - t0, 1), "rows": n}
    return {
        "metric": "query_scale_sfx",
        "sf_multiple_of_0.1": mult,
        "n_docs": 5_000 * mult,
        "n_vecs": 2_000 * mult,
        "stage_sec": round(t_stage, 1),
        "queries": timings,
    }


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    only = set(sys.argv[2:]) or None
    spark = get_spark(app_name="scalecheck_queries")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(run(spark, mult, only), separators=(",", ":")))


if __name__ == "__main__":
    main()
