"""Driver-contract queries for the retrieval / evaluation operators
(round-10 session-3 extension): BM25 keyword retrieval, MMR
diversity-aware selection, Kneser–Ney LM scoring, distributed
classifier evaluation (ROC-AUC + PR grid), and Shannon-entropy quality
signals — the training-data-pipeline stages that sit between the
dedup/quality family (suite_llm/suite_sketch) and model training.

Determinism follows the suite_llm.py header contract: counts are
exact integers, per-row double arithmetic is the identical expression
tree in both engines, double SUMS are rounded to 6 d.p. (generic
values never land on a half-quantum), and driver-side (numpy) cosines
use the multiply-round form certified bit-identical to DuckDB's
round(x, 6) in operators/similarity.knn_graph_blocked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from deepicedrain_spark.io import load_table, spread_scan
from deepicedrain_spark.operators import textstats as ts_ops
from deepicedrain_spark.operators.evalmetrics import pr_at_thresholds, roc_auc
from deepicedrain_spark.operators.lm import kneser_ney_score
from deepicedrain_spark.operators.retrieval import bm25_topk, mmr_select
from deepicedrain_spark.operators.similarity import cosine_topk
from deepicedrain_spark.suite import register

# shared oracle fragment: whitespace tokens, the corpus convention
_TOKS = "list_filter(string_split(text, ' '), x -> x != '')"


# --- BM25 keyword retrieval ---------------------------------------------
# Query set derived from the corpus itself (no artifact to ship): each
# language's 3 most frequent tokens, ties by token asc. The scoring
# plan: ONE corpus shuffle to (doc, term, tf) postings + a doc-length
# window over the same partitioning; query terms / per-term df / the
# one-row corpus stats broadcast; per-query rank window collapses via
# WindowGroupLimit. avgdl is spelled sum/count so both engines divide
# the same exact integer sum; k1+1 and 1−b are computed from the same
# literals in both engines.
@register(
    "bm25_topk_per_lang",
    f"""
    WITH toks AS (
      SELECT doc_id, lang, unnest({_TOKS}) AS tok FROM documents),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
    dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
    stats AS (
      SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
      FROM dl),
    qterms AS (
      SELECT lang AS query_id, tok AS term,
             row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, tok) AS r
      FROM toks GROUP BY lang, tok QUALIFY r <= 3),
    dfreq AS (
      SELECT tok, count(*) AS df FROM tf
      WHERE tok IN (SELECT term FROM qterms) GROUP BY 1),
    scored AS (
      SELECT q.query_id, t.doc_id,
             round(sum(
               ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
               * (t.tf * (1.2 + 1.0))
               / (t.tf + 1.2 * ((1.0 - 0.75) + 0.75 * d.dl / s.avgdl))
             ), 6) AS score
      FROM qterms q
      JOIN tf t ON t.tok = q.term
      JOIN dfreq f ON f.tok = q.term
      JOIN dl d ON d.doc_id = t.doc_id, stats s
      GROUP BY 1, 2)
    SELECT query_id, doc_id, rank, score FROM (
      SELECT query_id, doc_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id) AS rank
      FROM scored) WHERE rank <= 5
    """,
)
def q_bm25_topk_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread_scan(load_table(spark, sf_dir, "documents"))  # 1-split scan, CPU-heavy text pass (io.spread_scan: no-op at scale)
    toks = docs.select(
        "lang", F.explode(ts_ops.whitespace_tokens(F.col("text"))).alias("term")
    )
    counts = toks.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), "term")
    qterms = (
        counts.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= 3)
        .select(F.col("lang").alias("query_id"), "term")
    )
    out = bm25_topk(docs, qterms, k=5, k1=1.2, b=0.75)
    return out.select("query_id", "doc_id", "rank", "score")


# --- MMR diversity-aware selection --------------------------------------
# Pool = exact top-24 by round-6 cosine to the vec_id-0 query (the
# distributed stage, cosine_topk's broadcast + WindowGroupLimit plan);
# greedy MMR (λ=0.7, div=0.3, k=8) decides the ORDER driver-side over
# the bounded collected pool; output values re-derive Spark-side. The
# oracle replays the greedy as a recursive CTE with a LATERAL
# argmax-pick per step over the same round-6 rel/sim values.
@register(
    "mmr_diversified_topk",
    """
    WITH RECURSIVE
    q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
          FROM embeddings WHERE vec_id = 0),
    c AS (SELECT vec_id AS cand_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
          FROM embeddings WHERE vec_id <> 0),
    relall AS (
      SELECT cand_id, cv,
             round(list_sum(list_transform(generate_series(1, 64), i -> qv[i] * cv[i]))
                   / sqrt(list_sum(list_transform(generate_series(1, 64), i -> qv[i] * qv[i]))
                        * list_sum(list_transform(generate_series(1, 64), i -> cv[i] * cv[i]))), 6) AS rel
      FROM c, q),
    pool AS (
      SELECT cand_id, cv, rel,
             row_number() OVER (ORDER BY rel DESC, cand_id) AS rr
      FROM relall QUALIFY rr <= 24),
    sims AS (
      SELECT a.cand_id AS ia, b.cand_id AS ib,
             round(list_sum(list_transform(generate_series(1, 64), i -> a.cv[i] * b.cv[i]))
                   / sqrt(list_sum(list_transform(generate_series(1, 64), i -> a.cv[i] * a.cv[i]))
                        * list_sum(list_transform(generate_series(1, 64), i -> b.cv[i] * b.cv[i]))), 6) AS cos
      FROM pool a JOIN pool b ON a.cand_id <> b.cand_id),
    sel(step, picked, sel_ids) AS (
      (SELECT 1, cand_id, [cand_id] FROM pool ORDER BY 0.7 * rel DESC, cand_id LIMIT 1)
      UNION ALL
      SELECT s.step + 1, pick.cand_id, list_append(s.sel_ids, pick.cand_id)
      FROM sel s, LATERAL (
        SELECT p.cand_id,
               0.7 * p.rel - 0.3 * (SELECT max(si.cos) FROM sims si
                                    WHERE si.ia = p.cand_id
                                      AND list_contains(s.sel_ids, si.ib)) AS score
        FROM pool p WHERE NOT list_contains(s.sel_ids, p.cand_id)
        ORDER BY score DESC, p.cand_id LIMIT 1) pick
      WHERE s.step < 8)
    SELECT CAST(s.step AS BIGINT) AS rank, s.picked AS cand_id, p.rel
    FROM sel s JOIN pool p ON p.cand_id = s.picked
    ORDER BY rank
    """,
)
def q_mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qdf = emb.filter(F.col("vec_id") == 0)
    top = cosine_topk(qdf, emb, k=24)
    pool = top.join(
        emb.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cv")),
        "cand_id",
    ).select("cand_id", F.col("cos").alias("rel"), "cv")
    return mmr_select(pool, k=8, lam=0.7, div=0.3, max_pool=24)


# --- Kneser–Ney bigram LM scoring ----------------------------------------
@register(
    "kneser_ney_lm_score",
    f"""
    WITH ws AS (SELECT doc_id, {_TOKS} AS w FROM documents),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(w) - 1),
                                   i -> struct_pack(w1 := w[i], w2 := w[i+1]))) AS s
      FROM ws WHERE len(w) >= 2),
    bg2 AS (SELECT doc_id, s.w1 AS w1, s.w2 AS w2 FROM bg),
    bgc AS (SELECT w1, w2, count(*) AS c FROM bg2 GROUP BY 1, 2),
    lft AS (SELECT w1, sum(c) AS tot, count(*) AS fol FROM bgc GROUP BY 1),
    rgt AS (SELECT w2, count(*) AS prc FROM bgc GROUP BY 1),
    bt AS (SELECT count(*) AS bt FROM bgc),
    scored AS (
      SELECT g.doc_id,
             ln(greatest(c.c - 0.75, 0.0) / l.tot
                + 0.75 * l.fol / l.tot * r.prc / b.bt) AS lp
      FROM bg2 g
      JOIN bgc c ON c.w1 = g.w1 AND c.w2 = g.w2
      JOIN lft l ON l.w1 = g.w1
      JOIN rgt r ON r.w2 = g.w2, bt b)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(sum(lp) / count(*), 6) AS avg_logp
    FROM scored GROUP BY doc_id
    """,
)
def q_kneser_ney_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread_scan(load_table(spark, sf_dir, "documents"))  # 1-split scan, CPU-heavy text pass (io.spread_scan: no-op at scale)
    return kneser_ney_score(docs, discount=0.75)


# --- classifier evaluation: exact tie-corrected ROC-AUC -------------------
# Scores = the heuristic quality composite (textstats.quality_score —
# its unrounded double is certified bit-identical cross-engine by the
# driver-green quality_scores rows); labels = (lang = 'en'), i.e. "does
# the English-stopword-based quality score discriminate English docs".
# NOTE: this fragment is the SQL mirror of textstats.quality_score and
# must stay formula-identical to the driver-green quality_scores oracle
# in suite_llm.py (the formula is frozen by that certification — any
# change there requires a synchronized edit here and re-certification
# of the four eval queries built on it).
_QUALITY_FEATS = f"""
    feats AS (
      SELECT doc_id, lang, source,
             length(text) AS n_chars,
             len({_TOKS}) AS n_tokens,
             length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
             len(list_filter(string_split(text, ' '),
                 t -> t != '' AND list_contains(['the','a','of','and','to','in','is','it'], lower(t)))) AS n_stop,
             list_sum(list_transform({_TOKS}, t -> length(t))) AS tok_chars
      FROM documents),
    scored AS (
      SELECT doc_id, source, (lang = 'en') AS lab,
             least(n_tokens / 64.0, 1.0) * 0.4
               + least(round(CAST(n_punct AS DOUBLE) / n_chars, 6) * 20.0, 1.0) * 0.2
               + least(round(CAST(n_stop AS DOUBLE) / n_tokens, 6) * 5.0, 1.0) * 0.2
               + least(round(CAST(tok_chars AS DOUBLE) / n_tokens, 6) / 8.0, 1.0) * 0.2 AS s
      FROM feats)
"""


@register(
    "classifier_auc_eval",
    f"""
    WITH {_QUALITY_FEATS},
    per AS (
      SELECT s,
             sum(CASE WHEN lab THEN 1 ELSE 0 END) AS np,
             sum(CASE WHEN lab THEN 0 ELSE 1 END) AS nn
      FROM scored GROUP BY s),
    cum AS (
      SELECT np, nn,
             coalesce(sum(nn) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cnb
      FROM per),
    agg AS (
      SELECT CAST(sum(np) AS BIGINT) AS n_pos,
             CAST(sum(nn) AS BIGINT) AS n_neg,
             sum(np * (2 * cnb + nn)) AS num2
      FROM cum)
    SELECT n_pos, n_neg,
           round(num2 / (2.0 * n_pos * n_neg), 6) AS auc,
           round(2.0 * (num2 / (2.0 * n_pos * n_neg)) - 1.0, 6) AS gini
    FROM agg
    """,
)
def q_classifier_auc_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = ts_ops.quality_score(docs).select(
        F.col("quality").alias("score"), (F.col("lang") == "en").alias("label")
    )
    return roc_auc(scored, "score", "label")


# --- classifier evaluation: quantized-score ROC-AUC (the at-scale trade) --
# Same scores/labels as classifier_auc_eval, but bucketed to
# floor(s·16)/16 BEFORE the distinct-score pass (roc_auc quantize=16):
# the shuffle and ordered pass become O(16 buckets) instead of
# O(distinct raw scores) — the shape a continuous-score classifier
# needs at 100 TB. The result is the exact AUC of the quantized
# scores; both engines bucket with the same IEEE floor(s·16.0)/16.0.
@register(
    "classifier_auc_quantized",
    f"""
    WITH {_QUALITY_FEATS},
    per AS (
      SELECT floor(s * 16.0) / 16.0 AS qs,
             sum(CASE WHEN lab THEN 1 ELSE 0 END) AS np,
             sum(CASE WHEN lab THEN 0 ELSE 1 END) AS nn
      FROM scored GROUP BY 1),
    cum AS (
      SELECT np, nn,
             coalesce(sum(nn) OVER (ORDER BY qs
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cnb
      FROM per),
    agg AS (
      SELECT CAST(sum(np) AS BIGINT) AS n_pos,
             CAST(sum(nn) AS BIGINT) AS n_neg,
             sum(np * (2 * cnb + nn)) AS num2
      FROM cum)
    SELECT n_pos, n_neg,
           round(num2 / (2.0 * n_pos * n_neg), 6) AS auc,
           round(2.0 * (num2 / (2.0 * n_pos * n_neg)) - 1.0, 6) AS gini
    FROM agg
    """,
)
def q_classifier_auc_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = ts_ops.quality_score(docs).select(
        F.col("quality").alias("score"), (F.col("lang") == "en").alias("label")
    )
    return roc_auc(scored, "score", "label", quantize=16)


# --- classifier evaluation: precision/recall/F1 threshold grid ------------
@register(
    "precision_recall_curve",
    f"""
    WITH {_QUALITY_FEATS},
    th(threshold) AS (SELECT CAST(unnest([0.2, 0.4, 0.6, 0.8]) AS DOUBLE)),
    cnt AS (
      SELECT th.threshold,
             CAST(sum(CASE WHEN s >= threshold AND lab THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN s >= threshold AND NOT lab THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN s < threshold AND lab THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             CAST(sum(CASE WHEN s < threshold AND NOT lab THEN 1 ELSE 0 END) AS BIGINT) AS tn
      FROM scored, th GROUP BY 1)
    SELECT threshold, tp, fp, fn, tn,
           round(CAST(tp AS DOUBLE) / (tp + fp), 6) AS precision,
           round(CAST(tp AS DOUBLE) / (tp + fn), 6) AS recall,
           round(2.0 * tp / CAST(2 * tp + fp + fn AS DOUBLE), 6) AS f1
    FROM cnt ORDER BY threshold
    """,
)
def q_precision_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = ts_ops.quality_score(docs).select(
        F.col("quality").alias("score"), (F.col("lang") == "en").alias("label")
    )
    return pr_at_thresholds(scored, (0.2, 0.4, 0.6, 0.8), "score", "label")


# --- Shannon-entropy quality signals --------------------------------------
@register(
    "entropy_quality",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
    tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
    uni AS (
      SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_distinct,
             ln(CAST(sum(c) AS DOUBLE)) - sum(c * ln(c)) / sum(c) AS h1
      FROM tc GROUP BY 1),
    ws AS (SELECT doc_id, {_TOKS} AS w FROM documents),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(w) - 1),
                                   i -> w[i] || ' ' || w[i+1])) AS b
      FROM ws WHERE len(w) >= 2),
    bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
    bi AS (
      SELECT doc_id,
             ln(CAST(sum(c) AS DOUBLE)) - sum(c * ln(c)) / sum(c) AS h2
      FROM bc GROUP BY 1)
    SELECT u.doc_id, u.n_tokens, u.n_distinct,
           round(u.h1, 6) AS token_entropy,
           round(u.h1 / ln(CAST(u.n_distinct AS DOUBLE)), 6) AS norm_entropy,
           round(b.h2 - u.h1, 6) AS bigram_cond_entropy
    FROM uni u LEFT JOIN bi b ON b.doc_id = u.doc_id
    """,
)
def q_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ts_ops.entropy_features(docs)


# --- asymmetric containment dedup (doc-in-doc detection) ------------------
# Planted fixture (the exact_dedup_pairs convention): for each doc_id
# < 40 with ≥ 21 tokens, a NEGATIVE-id "quote" doc holding tokens
# 2..20 of the source — contained in its source at C = 1.0 while the
# symmetric Jaccard sits far below any threshold (the signal
# containment exists to catch).
@register(
    "containment_dedup",
    f"""
    WITH ws0 AS (SELECT doc_id, {_TOKS} AS ws FROM documents),
    pool AS (
      SELECT doc_id, ws FROM ws0
      UNION ALL
      SELECT -(doc_id + 1), ws[2:20] FROM ws0 WHERE len(ws) >= 21 AND doc_id < 40),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(ws) - 2),
                           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
      FROM pool WHERE len(ws) >= 3),
    ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
    sz AS (SELECT doc_id, len(s) AS n FROM sh),
    inter AS (
      SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id <> b.doc_id
      GROUP BY 1, 2)
    SELECT ia AS contained_id, ib AS container_id,
           round(CAST(c AS DOUBLE) / sa.n, 6) AS containment
    FROM inter JOIN sz sa ON sa.doc_id = ia
    WHERE round(CAST(c AS DOUBLE) / sa.n, 6) >= 0.9
    """,
)
def q_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deepicedrain_spark.operators.dedup import containment_pairs

    docs = spread_scan(load_table(spark, sf_dir, "documents"))  # 1-split scan, CPU-heavy text pass (io.spread_scan: no-op at scale)
    w = ts_ops.whitespace_tokens(F.col("text"))
    quotes = (
        docs.select("doc_id", w.alias("_w"))
        .filter((F.size("_w") >= 21) & (F.col("doc_id") < 40))
        .select(
            (-(F.col("doc_id") + F.lit(1))).alias("doc_id"),
            F.array_join(F.slice("_w", 2, 19), " ").alias("text"),
        )
    )
    pool = docs.select("doc_id", "text").unionByName(quotes)
    return containment_pairs(pool, n=3, threshold=0.9)


# --- exact 13-gram decontamination (GPT-3/PaLM recipe) --------------------
# One shared 13-gram with the benchmark flags a training doc (Brown et
# al. 2020 App. C) — vs benchmark_contamination's Jaccard THRESHOLD.
# Benchmark = the same planted 19-token slices (7 13-grams each).
# Exported as a constant: the streaming gate (suite_streaming.
# streaming_decontamination) registers the SAME oracle — one
# definition keeps the batch and streaming contracts in sync.
DECON_ORACLE_SQL = f"""
    WITH ws0 AS (SELECT doc_id, {_TOKS} AS ws FROM documents),
    bench AS (
      SELECT ws[2:20] AS ws FROM ws0 WHERE len(ws) >= 21 AND doc_id < 40),
    cg AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(generate_series(1, len(ws) - 12),
                           i -> array_to_string(ws[i:i+12], ' ')))) AS g
      FROM ws0 WHERE len(ws) >= 13),
    bg AS (
      SELECT DISTINCT unnest(list_distinct(list_transform(generate_series(1, len(ws) - 12),
                           i -> array_to_string(ws[i:i+12], ' ')))) AS g
      FROM bench WHERE len(ws) >= 13)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matching_ngrams
    FROM cg JOIN bg USING (g) GROUP BY doc_id
    """


@register("ngram_decontamination", DECON_ORACLE_SQL)
def q_ngram_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deepicedrain_spark.operators.dedup import ngram_overlap_hits

    docs = load_table(spark, sf_dir, "documents")
    w = ts_ops.whitespace_tokens(F.col("text"))
    bench = (
        docs.select("doc_id", w.alias("_w"))
        .filter((F.size("_w") >= 21) & (F.col("doc_id") < 40))
        .select(
            (-(F.col("doc_id") + F.lit(1))).alias("doc_id"),
            F.array_join(F.slice("_w", 2, 19), " ").alias("text"),
        )
    )
    return ngram_overlap_hits(docs, bench, n=13)


# --- semantic decontamination (round 12) -----------------------------------
# The semantic counterpart of ngram_decontamination just above, closing
# the same symmetry SemDeDup closes for dedup: 13-grams catch verbatim
# eval leakage, embeddings catch PARAPHRASED leakage that shares no
# n-gram. Benchmark = nudged copies of vec_id < 30 (the planted-twin
# recipe embedding_near_dup certifies: cosines land in [0.946, 0.966],
# 4 sigma clear of the 0.9 threshold on the round-6 value both engines
# agree on). The bench side is broadcast; the only shuffle is the
# per-corpus-id rank over HIT pairs (contamination-sized, not
# corpus-sized).
# exported: streaming_semantic_decontamination (suite_streaming)
# registers the SAME oracle — one definition keeps the batch and
# streaming contracts in sync (the DECON_ORACLE_SQL pattern)
SEMANTIC_DECON_SQL = """
    WITH corpus AS (
      SELECT vec_id, list_transform(generate_series(1, 64),
                       i -> CAST(embedding[i] AS DOUBLE)) AS v
      FROM embeddings),
    bench AS (
      SELECT vec_id AS bench_id,
             list_transform(generate_series(1, 64),
                            i -> CAST(embedding[i] AS DOUBLE)
                                 + 0.05 * ((i % 3) - 1)) AS v
      FROM embeddings WHERE vec_id < 30),
    pairs AS (
      SELECT c.vec_id, b.bench_id,
             round(list_sum(list_transform(generate_series(1, 64),
                     i -> c.v[i] * b.v[i]))
                   / sqrt(list_sum(list_transform(generate_series(1, 64),
                            i -> c.v[i] * c.v[i]))
                        * list_sum(list_transform(generate_series(1, 64),
                            i -> b.v[i] * b.v[i]))), 6) AS cos
      FROM corpus c CROSS JOIN bench b),
    hits AS (SELECT * FROM pairs WHERE cos >= 0.9),
    best AS (
      SELECT vec_id, bench_id, cos,
             count(*) OVER (PARTITION BY vec_id) AS n_bench_hits,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cos DESC, bench_id) AS rk
      FROM hits)
    SELECT vec_id, CAST(n_bench_hits AS BIGINT) AS n_bench_hits,
           bench_id, cos
    FROM best WHERE rk = 1 ORDER BY vec_id
    """


@register("semantic_decontamination", SEMANTIC_DECON_SQL)
def q_semantic_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deepicedrain_spark.operators.dedup import semantic_decontamination

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("embedding"),
    )
    bench = emb.filter(F.col("vec_id") < 30).select(
        "vec_id",
        F.expr(
            "transform(embedding, (x, i) -> cast(x as double)"
            " + 0.05D * (((i + 1) % 3) - 1))"
        ).alias("embedding"),
    )
    return semantic_decontamination(
        corpus, bench, "vec_id", "embedding", threshold=0.9
    ).orderBy("vec_id")


# --- deterministic negative sampling (contrastive training prep) ----------
_H15 = (
    "(SELECT sum(CAST(strpos('0123456789abcdef', substring({h}, j+1, 1)) - 1 AS BIGINT)"
    " << (4*(14-j))) FROM generate_series(0, 14) g(j))"
)


@register(
    "negative_sampling",
    f"""
    WITH a AS (SELECT vec_id AS anchor_id, label AS al FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS neg_id, label AS cl FROM embeddings),
    p AS (
      SELECT anchor_id, neg_id,
             {_H15.format(h="md5(CAST(anchor_id AS VARCHAR) || ':' || CAST(neg_id AS VARCHAR))")} AS h
      FROM c JOIN a ON al <> cl),
    r AS (
      SELECT anchor_id, neg_id,
             row_number() OVER (PARTITION BY anchor_id ORDER BY h, neg_id) AS rank
      FROM p)
    SELECT anchor_id, neg_id, rank FROM r WHERE rank <= 4
    """,
)
def q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deepicedrain_spark.operators.retrieval import sample_negatives

    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < 10)
    return sample_negatives(anchors, emb, k=4)


# --- hard-negative mining (top-k similar, WRONG label) --------------------
@register(
    "hard_negative_mining",
    """
    WITH q AS (
      SELECT vec_id AS query_id, label AS ql,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      FROM embeddings WHERE vec_id < 10),
    c AS (
      SELECT vec_id AS cand_id, label AS cl,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
      FROM embeddings),
    scored AS (
      SELECT query_id, cand_id,
             round(list_sum(list_transform(generate_series(1, 64), i -> qv[i] * cv[i]))
                   / sqrt(list_sum(list_transform(generate_series(1, 64), i -> qv[i] * qv[i]))
                        * list_sum(list_transform(generate_series(1, 64), i -> cv[i] * cv[i]))), 6) AS cos
      FROM c JOIN q ON ql <> cl),
    ranked AS (
      SELECT query_id, cand_id, cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, cand_id) AS rank
      FROM scored)
    SELECT query_id, cand_id, rank, cos FROM ranked WHERE rank <= 3
    """,
)
def q_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deepicedrain_spark.operators.retrieval import hard_negatives

    emb = load_table(spark, sf_dir, "embeddings")
    return hard_negatives(emb.filter(F.col("vec_id") < 10), emb, k=3)


# --- classifier calibration + Brier decomposition --------------------------
# The third leg of the evaluation family (AUC ranks, PR thresholds,
# calibration asks "does score 0.7 MEAN 70%?"): 10 equal-width score
# bins, per-bin observed positive rate vs mean score, per-bin Brier
# contribution. Scale: one corpus pass into a 10-group aggregate —
# bin counts are exact integers, mean/brier are double sums rounded
# to 6 (generic values).
@register(
    "calibration_brier",
    f"""
    WITH {_QUALITY_FEATS},
    binned AS (
      SELECT least(CAST(floor(s * 10) AS BIGINT), 9) AS bin,
             s, (CASE WHEN lab THEN 1.0 ELSE 0.0 END) AS y
      FROM scored)
    SELECT bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           round(sum(s) / count(*), 6) AS mean_score,
           round(CAST(sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS frac_pos,
           round(sum((s - y) * (s - y)) / count(*), 6) AS brier
    FROM binned GROUP BY bin ORDER BY bin
    """,
)
def q_calibration_brier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = ts_ops.quality_score(docs).select(
        F.col("quality").alias("s"), (F.col("lang") == "en").alias("lab")
    )
    y = F.when(F.col("lab"), F.lit(1.0)).otherwise(F.lit(0.0))
    binned = scored.select(
        F.least(F.floor(F.col("s") * 10).cast("long"), F.lit(9).cast("long")).alias("bin"),
        "s",
        y.alias("y"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("y") == 1.0, 1).otherwise(0)).cast("long").alias("n_pos"),
            F.round(F.sum("s") / F.count(F.lit(1)), 6).alias("mean_score"),
            F.round(
                F.sum(F.when(F.col("y") == 1.0, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("frac_pos"),
            F.round(
                F.sum((F.col("s") - F.col("y")) * (F.col("s") - F.col("y")))
                / F.count(F.lit(1)),
                6,
            ).alias("brier"),
        )
        .orderBy("bin")
    )


# --- tokenizer fertility (BPE eval metric) ---------------------------------
# Fertility = BPE tokens per word, chars per BPE token, per language —
# the standard tokenizer-quality report (a tokenizer trained on English
# shows inflated fertility on other languages). Reuses the certified
# BPE trainer (bpe_merge_table's memoized merges); encoding is the
# map-side literal fold, so the only exchanges are the word-frequency
# shuffle inside training and the per-lang aggregate.
@register(
    "tokenizer_fertility",
    None,  # placeholder, replaced below after importing the BPE chain
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deepicedrain_spark.operators.bpe import bpe_train, encode_word_expr
    from deepicedrain_spark.suite_llm import _BPE_MERGES

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=_BPE_MERGES)
    # encode each DISTINCT word once, not each occurrence (r12
    # optimization round): the merge fold is O(len²·merges) per word,
    # and fertility only needs per-(lang, word) COUNTS times the
    # per-word symbol length — so collapse the corpus to the
    # vocab-sized (lang, word) count table first (one word-sized
    # shuffle, partial map-side aggregation), fold the merge chain
    # over the distinct words of that table, and weight by count.
    # This is exactly the oracle's own plan (wlc JOIN state USING
    # word); all aggregates are integer sums (c, c·ns, c·nc), so the
    # per-lang totals — and the round-6 double ratios derived from
    # them — are bit-identical to encoding every occurrence.
    w = ts_ops.whitespace_tokens(F.col("text"))
    wlc = (
        docs.select("lang", F.explode(w).alias("word"))
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    encw = (
        wlc.select("word")
        .distinct()
        .select(
            "word",
            F.size(encode_word_expr(F.col("word"), merges)).alias("_ns"),
            F.length("word").cast("long").alias("_nc"),
        )
    )
    per = wlc.join(encw, "word").select(
        "lang",
        F.col("_c").alias("_nw"),
        (F.col("_c") * F.col("_ns")).alias("_nb"),
        (F.col("_c") * F.col("_nc")).alias("_ncs"),
    )
    return (
        per.groupBy("lang")
        .agg(
            F.sum("_nw").cast("long").alias("n_words"),
            F.sum("_nb").cast("long").alias("n_bpe_tokens"),
            F.round(F.sum("_nb").cast("double") / F.sum("_nw"), 6).alias("fertility"),
            F.round(F.sum("_ncs").cast("double") / F.sum("_nb"), 6).alias("chars_per_token"),
        )
        .orderBy("lang")
    )


# the fertility oracle replays the BPE merge chain (suite_llm._bpe_chain,
# MATERIALIZED per-merge states) and joins the per-(lang, word) counts
# against the final symbol table — installed after the function so the
# chain builder import stays local to suite_llm
def _install_fertility_oracle() -> None:
    from deepicedrain_spark.suite import REGISTRY, QuerySpec
    from deepicedrain_spark.suite_llm import _bpe_chain, _BPE_MERGES

    sql = (
        _bpe_chain()
        + f""",
    wl AS (
      SELECT lang, unnest({_TOKS}) AS word FROM documents),
    wlc AS (SELECT lang, word, count(*) AS c FROM wl GROUP BY 1, 2),
    j AS (
      SELECT lang, c, len(syms) AS ns, length(word) AS nc
      FROM wlc JOIN state{_BPE_MERGES} USING (word))
SELECT lang,
       CAST(sum(c) AS BIGINT) AS n_words,
       CAST(sum(c * ns) AS BIGINT) AS n_bpe_tokens,
       round(CAST(sum(c * ns) AS DOUBLE) / sum(c), 6) AS fertility,
       round(CAST(sum(c * nc) AS DOUBLE) / sum(c * ns), 6) AS chars_per_token
FROM j GROUP BY lang ORDER BY lang
"""
    )
    spec = REGISTRY["tokenizer_fertility"]
    REGISTRY["tokenizer_fertility"] = QuerySpec(spec.name, spec.fn, sql)


_install_fertility_oracle()


# --- per-slice AUC (evaluation by source) ----------------------------------
# The sliced variant every data-mixing decision needs ("is the quality
# classifier calibrated on src7 crawls too?"). The ordered Mann–Whitney
# pass is a window PARTITIONED on the slice key — it parallelizes
# across slices instead of the global single-partition sort, the
# better shape at 100 TB; a slice lacking positives or negatives
# yields NULL auc on both engines (try_divide / DuckDB x/0).
@register(
    "auc_by_source",
    f"""
    WITH {_QUALITY_FEATS},
    per AS (
      SELECT source, s,
             sum(CASE WHEN lab THEN 1 ELSE 0 END) AS np,
             sum(CASE WHEN lab THEN 0 ELSE 1 END) AS nn
      FROM scored GROUP BY 1, 2),
    cum AS (
      SELECT source, np, nn,
             coalesce(sum(nn) OVER (PARTITION BY source ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cnb
      FROM per),
    agg AS (
      SELECT source,
             CAST(sum(np) AS BIGINT) AS n_pos,
             CAST(sum(nn) AS BIGINT) AS n_neg,
             sum(np * (2 * cnb + nn)) AS num2
      FROM cum GROUP BY 1)
    SELECT source, n_pos, n_neg,
           round(num2 / (2.0 * n_pos * n_neg), 6) AS auc,
           round(2.0 * (num2 / (2.0 * n_pos * n_neg)) - 1.0, 6) AS gini
    FROM agg ORDER BY source
    """,
)
def q_auc_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = ts_ops.quality_score(docs).select(
        "source", F.col("quality").alias("score"), (F.col("lang") == "en").alias("label")
    )
    return roc_auc(scored, "score", "label", by=["source"]).orderBy("source")


# --- quantized per-slice AUC (round 12, VERDICT r11 task 4) -----------------
# The sliced pass above is exact per slice — at 100 TB a HOT slice has
# the same unbounded distinct-score exposure the global pass had before
# quantize. roc_auc's quantize composes with `by`: scores bucket to
# floor(s·Q)/Q map-side BEFORE the per-(slice, score) groupBy, so the
# per-slice ordered window is bounded at Q buckets regardless of slice
# size. Oracle buckets identically; result = exact AUC of the
# quantized scores (in-bucket ties count ½, like equal raw scores).
@register(
    "auc_by_source_quantized",
    f"""
    WITH {_QUALITY_FEATS},
    per AS (
      SELECT source, floor(s * 64) / 64 AS s,
             sum(CASE WHEN lab THEN 1 ELSE 0 END) AS np,
             sum(CASE WHEN lab THEN 0 ELSE 1 END) AS nn
      FROM scored GROUP BY 1, 2),
    cum AS (
      SELECT source, np, nn,
             coalesce(sum(nn) OVER (PARTITION BY source ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cnb
      FROM per),
    agg AS (
      SELECT source,
             CAST(sum(np) AS BIGINT) AS n_pos,
             CAST(sum(nn) AS BIGINT) AS n_neg,
             sum(np * (2 * cnb + nn)) AS num2
      FROM cum GROUP BY 1)
    SELECT source, n_pos, n_neg,
           round(num2 / (2.0 * n_pos * n_neg), 6) AS auc,
           round(2.0 * (num2 / (2.0 * n_pos * n_neg)) - 1.0, 6) AS gini
    FROM agg ORDER BY source
    """,
)
def q_auc_by_source_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = ts_ops.quality_score(docs).select(
        "source", F.col("quality").alias("score"), (F.col("lang") == "en").alias("label")
    )
    return roc_auc(scored, "score", "label", by=["source"], quantize=64).orderBy(
        "source"
    )


# --- bigram PMI collocations (round 11) ------------------------------------
# Phrase mining over the corpus: top-25 adjacent-bigram collocations by
# pointwise mutual information with a min-count floor — the signal a
# tokenizer-vocabulary/merge-rule builder ranks multi-word units with.
# Two pruned corpus scans (unigram + bigram counts, the entropy_features
# trade); all joins and the rank window are vocabulary-bounded.
@register(
    "bigram_pmi_top",
    f"""
    WITH toks AS (SELECT unnest({_TOKS}) AS tok FROM documents),
    uni AS (SELECT tok, count(*) AS c FROM toks GROUP BY 1),
    ut AS (SELECT CAST(sum(c) AS BIGINT) AS u FROM uni),
    ws AS (SELECT {_TOKS} AS w FROM documents),
    bg AS (
      SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                                   i -> struct_pack(w1 := w[i], w2 := w[i+1]))) AS s
      FROM ws WHERE len(w) >= 2),
    bgc AS (SELECT s.w1 AS w1, s.w2 AS w2, count(*) AS cb FROM bg GROUP BY 1, 2),
    bt AS (SELECT CAST(sum(cb) AS BIGINT) AS bt FROM bgc),
    scored AS (
      SELECT g.w1, g.w2, g.cb,
             round(ln((CAST(g.cb AS DOUBLE) / t.bt)
                      / ((CAST(u1.c AS DOUBLE) / ut.u)
                         * (CAST(u2.c AS DOUBLE) / ut.u))), 6) AS pmi
      FROM bgc g
      JOIN uni u1 ON u1.tok = g.w1
      JOIN uni u2 ON u2.tok = g.w2, bt t, ut
      WHERE g.cb >= 5)
    SELECT w1, w2, cb, pmi, rank FROM (
      SELECT *, row_number() OVER (ORDER BY pmi DESC, w1, w2) AS rank
      FROM scored)
    WHERE rank <= 25
    ORDER BY rank
    """,
)
def q_bigram_pmi_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ts_ops.bigram_pmi(docs, min_count=5, top_k=25).orderBy("rank")


# --- PSI feature drift (round 11) -------------------------------------------
# Population Stability Index of the events value column between the
# even-user (reference) and odd-user (current) slices: exact equi-depth
# decile edges of the reference (the equi_depth_deciles value-domain
# shape — no fact-table sort), map-side bucketing of both slices
# against the broadcast 9-edge array, per-bucket
# (p_cur − p_ref)·ln(p_cur/p_ref) contributions, and a
# summation-order-free decimal total.
# shared with streaming_psi_drift (suite_streaming): the stream's
# merged bucket counts equal the batch ones exactly (count-merge is
# order/replay-free), so the batch statement is the oracle verbatim
PSI_VALUE_DRIFT_SQL = """
    WITH ref AS (SELECT value AS v FROM events WHERE user_id % 2 = 0),
    cur AS (SELECT value AS v FROM events WHERE user_id % 2 = 1),
    counts AS (SELECT v, count(*) AS n FROM ref GROUP BY 1),
    cum AS (SELECT v, sum(n) OVER (ORDER BY v) AS c,
                   sum(n) OVER () AS total FROM counts),
    edges AS (
      SELECT list(e ORDER BY q) AS edges FROM (
        SELECT q, min(v) AS e
        FROM generate_series(1, 9) g(q) JOIN cum
          ON cum.c >= ceil(q * cum.total / 10.0)
        GROUP BY q)),
    rb AS (SELECT 1 + len(list_filter(edges.edges, e -> v > e)) AS bucket,
                  count(*) AS c_ref FROM ref, edges GROUP BY 1),
    cb AS (SELECT 1 + len(list_filter(edges.edges, e -> v > e)) AS bucket,
                  count(*) AS c_cur FROM cur, edges GROUP BY 1),
    grid AS (SELECT CAST(unnest(range(1, 11)) AS INTEGER) AS bucket),
    j AS (
      SELECT g.bucket,
             CAST(coalesce(rb.c_ref, 0) AS BIGINT) AS c_ref,
             CAST(coalesce(cb.c_cur, 0) AS BIGINT) AS c_cur
      FROM grid g
      LEFT JOIN rb ON rb.bucket = g.bucket
      LEFT JOIN cb ON cb.bucket = g.bucket),
    k AS (
      SELECT bucket, c_ref, c_cur,
             CASE WHEN c_ref > 0 AND c_cur > 0 THEN
               round((CAST(c_cur AS DOUBLE) / (sum(c_cur) OVER ())
                      - CAST(c_ref AS DOUBLE) / (sum(c_ref) OVER ()))
                     * ln((CAST(c_cur AS DOUBLE) / (sum(c_cur) OVER ()))
                          / (CAST(c_ref AS DOUBLE) / (sum(c_ref) OVER ()))), 6)
             END AS contrib
      FROM j)
    SELECT bucket, c_ref, c_cur, contrib,
           round(CAST(sum(CAST(contrib AS DECIMAL(18,6))) OVER () AS DOUBLE), 6)
             AS psi_total
    FROM k ORDER BY bucket
    """


@register("psi_value_drift", PSI_VALUE_DRIFT_SQL)
def q_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deepicedrain_spark.operators.evalmetrics import psi_drift

    ev = load_table(spark, sf_dir, "events")
    ref = ev.filter(F.pmod("user_id", F.lit(2)) == 0)
    cur = ev.filter(F.pmod("user_id", F.lit(2)) == 1)
    return psi_drift(ref, cur, "value", buckets=10)


# --- epsilon-smoothed PSI (round 12, ADVICE r11) ----------------------------
# The default psi_drift excludes zero-mass buckets from psi_total (the
# contribution is mathematically undefined there) — which understates
# exactly the most extreme shifts: current mass landing where the
# reference had none, or deserting reference-heavy buckets. The
# conventional smoothed PSI floors both proportions at ε so EVERY
# bucket contributes. This query manufactures such a shift: the
# current slice is the odd users' value compressed by half, so the top
# reference deciles are empty in the current slice; with ε=1e-4 those
# buckets contribute their full (p_ref' − ε)-scale penalty instead of
# vanishing, and psi_total reads "badly shifted" as it should.
PSI_SMOOTHED_SQL = """
    WITH ref AS (SELECT value AS v FROM events WHERE user_id % 2 = 0),
    cur AS (SELECT value * 0.5 AS v FROM events WHERE user_id % 2 = 1),
    counts AS (SELECT v, count(*) AS n FROM ref GROUP BY 1),
    cum AS (SELECT v, sum(n) OVER (ORDER BY v) AS c,
                   sum(n) OVER () AS total FROM counts),
    edges AS (
      SELECT list(e ORDER BY q) AS edges FROM (
        SELECT q, min(v) AS e
        FROM generate_series(1, 9) g(q) JOIN cum
          ON cum.c >= ceil(q * cum.total / 10.0)
        GROUP BY q)),
    rb AS (SELECT 1 + len(list_filter(edges.edges, e -> v > e)) AS bucket,
                  count(*) AS c_ref FROM ref, edges GROUP BY 1),
    cb AS (SELECT 1 + len(list_filter(edges.edges, e -> v > e)) AS bucket,
                  count(*) AS c_cur FROM cur, edges GROUP BY 1),
    grid AS (SELECT CAST(unnest(range(1, 11)) AS INTEGER) AS bucket),
    j AS (
      SELECT g.bucket,
             CAST(coalesce(rb.c_ref, 0) AS BIGINT) AS c_ref,
             CAST(coalesce(cb.c_cur, 0) AS BIGINT) AS c_cur
      FROM grid g
      LEFT JOIN rb ON rb.bucket = g.bucket
      LEFT JOIN cb ON cb.bucket = g.bucket),
    k AS (
      SELECT bucket, c_ref, c_cur,
             round((greatest(CAST(c_cur AS DOUBLE) / (sum(c_cur) OVER ()), 1e-4)
                    - greatest(CAST(c_ref AS DOUBLE) / (sum(c_ref) OVER ()), 1e-4))
                   * ln(greatest(CAST(c_cur AS DOUBLE) / (sum(c_cur) OVER ()), 1e-4)
                        / greatest(CAST(c_ref AS DOUBLE) / (sum(c_ref) OVER ()), 1e-4)),
                   6) AS contrib
      FROM j)
    SELECT bucket, c_ref, c_cur, contrib,
           round(CAST(sum(CAST(contrib AS DECIMAL(18,6))) OVER () AS DOUBLE), 6)
             AS psi_total
    FROM k ORDER BY bucket
    """


@register("psi_value_drift_smoothed", PSI_SMOOTHED_SQL)
def q_psi_value_drift_smoothed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deepicedrain_spark.operators.evalmetrics import psi_drift

    ev = load_table(spark, sf_dir, "events")
    ref = ev.filter(F.pmod("user_id", F.lit(2)) == 0)
    cur = ev.filter(F.pmod("user_id", F.lit(2)) == 1).withColumn(
        "value", F.col("value") * F.lit(0.5)
    )
    return psi_drift(ref, cur, "value", buckets=10, epsilon=1e-4)


# --- Cohen's kappa labeler agreement (round 11) ----------------------------
# Chance-corrected agreement between the heuristic quality gate
# (quality > 0.5) and the English-language labeler (lang = 'en') — the
# cross-check a pipeline reports before trusting a cheap gate. One
# corpus pass into four confusion counters; po/pe/kappa are identical
# double expressions over exact integers in both engines.
@register(
    "classifier_agreement_kappa",
    f"""
    WITH {_QUALITY_FEATS},
    cnt AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN s > 0.5 AND lab THEN 1 ELSE 0 END) AS BIGINT) AS n11,
             CAST(sum(CASE WHEN s > 0.5 AND NOT lab THEN 1 ELSE 0 END) AS BIGINT) AS n10,
             CAST(sum(CASE WHEN NOT (s > 0.5) AND lab THEN 1 ELSE 0 END) AS BIGINT) AS n01,
             CAST(sum(CASE WHEN NOT (s > 0.5) AND NOT lab THEN 1 ELSE 0 END) AS BIGINT) AS n00
      FROM scored)
    SELECT n, n11, n10, n01, n00,
           round(CAST(n11 + n00 AS DOUBLE) / n, 6) AS po,
           round((CAST(n11 + n10 AS DOUBLE) / n) * (CAST(n11 + n01 AS DOUBLE) / n)
                 + (1.0 - CAST(n11 + n10 AS DOUBLE) / n)
                   * (1.0 - CAST(n11 + n01 AS DOUBLE) / n), 6) AS pe,
           CASE WHEN 1.0 - ((CAST(n11 + n10 AS DOUBLE) / n) * (CAST(n11 + n01 AS DOUBLE) / n)
                 + (1.0 - CAST(n11 + n10 AS DOUBLE) / n)
                   * (1.0 - CAST(n11 + n01 AS DOUBLE) / n)) = 0 THEN NULL
           ELSE round((CAST(n11 + n00 AS DOUBLE) / n
                 - ((CAST(n11 + n10 AS DOUBLE) / n) * (CAST(n11 + n01 AS DOUBLE) / n)
                    + (1.0 - CAST(n11 + n10 AS DOUBLE) / n)
                      * (1.0 - CAST(n11 + n01 AS DOUBLE) / n)))
                / (1.0 - ((CAST(n11 + n10 AS DOUBLE) / n) * (CAST(n11 + n01 AS DOUBLE) / n)
                    + (1.0 - CAST(n11 + n10 AS DOUBLE) / n)
                      * (1.0 - CAST(n11 + n01 AS DOUBLE) / n))), 6) END AS kappa
    FROM cnt
    """,
)
def q_classifier_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deepicedrain_spark.operators.evalmetrics import cohens_kappa

    docs = load_table(spark, sf_dir, "documents")
    labeled = ts_ops.quality_score(docs).select(
        (F.col("quality") > 0.5).alias("a"), (F.col("lang") == "en").alias("b")
    )
    return cohens_kappa(labeled, "a", "b")


# --- Dunning G² keyness per source (round 11) -------------------------------
# Which terms are over-represented in each source vs the rest of the
# corpus — the corpus-comparison statistic a mixture curator reads
# before setting source weights. Vocabulary-bounded joins; per-source
# rank via WindowGroupLimit.
@register(
    "keyness_terms_per_source",
    f"""
    WITH toks AS (SELECT source AS s, unnest({_TOKS}) AS term FROM documents),
    sc AS (SELECT s, term, count(*) AS a FROM toks GROUP BY 1, 2),
    tt AS (SELECT term, CAST(sum(a) AS BIGINT) AS t FROM sc GROUP BY 1),
    ts AS (SELECT s, CAST(sum(a) AS BIGINT) AS n_s FROM sc GROUP BY 1),
    ta AS (SELECT CAST(sum(n_s) AS BIGINT) AS n_all FROM ts),
    j AS (
      SELECT sc.s, sc.term, sc.a, tt.t - sc.a AS b,
             ts.n_s, ta.n_all - ts.n_s AS n_o, tt.t, ta.n_all
      FROM sc JOIN tt USING (term) JOIN ts USING (s), ta),
    scored AS (
      SELECT s, term, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
             round(2.0 * (a * ln(CAST(a AS DOUBLE)
                                 / (t * (CAST(n_s AS DOUBLE) / n_all)))
                   + CASE WHEN b > 0
                          THEN b * ln(CAST(b AS DOUBLE)
                                      / (t * (CAST(n_o AS DOUBLE) / n_all)))
                          ELSE 0.0 END), 6) AS g2
      FROM j
      WHERE a >= 5 AND CAST(a AS DOUBLE) / n_s > CAST(t AS DOUBLE) / n_all)
    SELECT s AS source, term, a, b, g2, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY s ORDER BY g2 DESC, term) AS rank
      FROM scored)
    WHERE rank <= 5 ORDER BY source, rank
    """,
)
def q_keyness_terms_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ts_ops.keyness_g2(docs, by="source", top_k=5, min_count=5).orderBy(
        "source", "rank"
    )


# --- Jensen–Shannon source divergence (round 11) ----------------------------
# Bounded symmetric "how different is this source's language" scalar
# vs the whole corpus; the (slice × vocabulary) grid is
# vocabulary-bounded and the corpus distribution derives from the same
# count table (no second corpus pass).
@register(
    "js_divergence_sources",
    f"""
    WITH toks AS (SELECT source AS s, unnest({_TOKS}) AS term FROM documents),
    sc AS (SELECT s, term, count(*) AS a FROM toks GROUP BY 1, 2),
    tt AS (SELECT term, CAST(sum(a) AS BIGINT) AS t FROM sc GROUP BY 1),
    ts AS (SELECT s, CAST(sum(a) AS BIGINT) AS n_s,
                  CAST(count(*) AS BIGINT) AS n_terms FROM sc GROUP BY 1),
    ta AS (SELECT CAST(sum(n_s) AS BIGINT) AS n_all FROM ts),
    grid AS (
      SELECT ts.s, ts.n_s, ts.n_terms, tt.term, tt.t,
             coalesce(sc.a, 0) AS a, ta.n_all
      FROM ts CROSS JOIN tt
      LEFT JOIN sc ON sc.s = ts.s AND sc.term = tt.term, ta),
    c AS (
      SELECT s, n_terms,
             CASE WHEN a > 0
                  THEN (CAST(a AS DOUBLE) / n_s)
                       * ln((CAST(a AS DOUBLE) / n_s)
                            / (0.5 * ((CAST(a AS DOUBLE) / n_s)
                                      + (CAST(t AS DOUBLE) / n_all))))
                  ELSE 0.0 END
           + CASE WHEN t > 0
                  THEN (CAST(t AS DOUBLE) / n_all)
                       * ln((CAST(t AS DOUBLE) / n_all)
                            / (0.5 * ((CAST(a AS DOUBLE) / n_s)
                                      + (CAST(t AS DOUBLE) / n_all))))
                  ELSE 0.0 END AS contrib
      FROM grid)
    SELECT s AS source, n_terms, round(0.5 * sum(contrib), 6) AS js
    FROM c GROUP BY 1, 2 ORDER BY source
    """,
)
def q_js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ts_ops.js_divergence(docs, by="source")
