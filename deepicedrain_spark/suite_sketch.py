"""Driver-contract queries for the sketch / scrubbing operators
(HyperLogLog, Bloom membership, count-min heavy hitters, stratified
sampling, PII redaction) — the approximate/streaming-friendly side of
the LLM-data-pipeline surface.

Determinism: all sketch hash math is md5-derived (operators/sketches
.py:md5_long60), integer until the final estimate, so the DuckDB
oracles replay every stage bit-for-bit; the single ``ln`` in the HLL
small-range correction is guarded by emitting the estimate as a
rounded BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from deepicedrain_spark.io import load_table
from deepicedrain_spark.operators.dedup import normalize_text
from deepicedrain_spark.operators.sketches import (
    bloom_bits,
    bloom_probe,
    cms_estimate,
    cms_table,
    hll_estimate,
    hll_oracle_sql,
    stratified_sample,
)
from deepicedrain_spark.operators.textstats import whitespace_tokens
from deepicedrain_spark.suite import register

# DuckDB equivalent of sketches.md5_long60 (verified equal on shared
# inputs — tests/test_sketches.py).
_H60 = "CAST(concat('0x', substr(md5({x}), 1, 15)) AS BIGINT)"


# --- HyperLogLog distinct --------------------------------------------
@register("hll_distinct_custkeys", hll_oracle_sql("orders", "o_custkey", b=10))
def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct buyers: the 100 TB replacement for
    count(DISTINCT) — one O(m)-payload shuffle instead of a full
    repartition of the key column."""
    orders = load_table(spark, sf_dir, "orders")
    return hll_estimate(orders, "o_custkey", b=10)


# --- Bloom cross-corpus membership -----------------------------------
_BLOOM_K, _BLOOM_M = 4, 1 << 16

_BLOOM_SQL = f"""
WITH a AS (
  SELECT lower(trim(regexp_replace(text, ' +', ' ', 'g'))) AS nt
  FROM documents WHERE doc_id % 2 = 0),
b AS (
  SELECT doc_id, lower(trim(regexp_replace(text, ' +', ' ', 'g'))) AS nt
  FROM documents WHERE doc_id % 3 = 0),
bits AS (
  SELECT DISTINCT {_H60.format(x="concat(nt, '|', CAST(j AS VARCHAR))")} % {_BLOOM_M} AS pos
  FROM a CROSS JOIN generate_series(0, {_BLOOM_K - 1}) g(j)),
probe AS (
  SELECT b.doc_id,
         {_H60.format(x="concat(b.nt, '|', CAST(j AS VARCHAR))")} % {_BLOOM_M} AS pos
  FROM b CROSS JOIN generate_series(0, {_BLOOM_K - 1}) g(j)),
hits AS (
  SELECT probe.doc_id,
         count(bits.pos) = {_BLOOM_K} AS maybe_member
  FROM probe LEFT JOIN bits USING (pos)
  GROUP BY probe.doc_id),
exact AS (
  SELECT b.doc_id, count(a.nt) > 0 AS exact_member
  FROM b LEFT JOIN (SELECT DISTINCT nt FROM a) a USING (nt)
  GROUP BY b.doc_id)
SELECT doc_id, maybe_member, exact_member
FROM hits JOIN exact USING (doc_id)
ORDER BY doc_id
"""


@register("bloom_cross_corpus", _BLOOM_SQL)
def q_bloom_cross_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus dedup probe: corpus B documents tested against a
    Bloom filter built from corpus A.  The filter is ≤ 2**16 rows
    however large A is, and the probe side joins it broadcast — the
    shape that lets one node's filter screen a 100 TB corpus."""
    docs = load_table(spark, sf_dir, "documents")
    a = docs.where(F.col("doc_id") % 2 == 0)
    b = docs.where(F.col("doc_id") % 3 == 0)
    bits = bloom_bits(a, normalize_text(F.col("text")), k=_BLOOM_K, m=_BLOOM_M)
    probed = bloom_probe(
        b, bits, normalize_text(F.col("text")), "doc_id", k=_BLOOM_K, m=_BLOOM_M
    )
    a_keys = a.select(normalize_text(F.col("text")).alias("nt")).distinct()
    exact = (
        b.select("doc_id", normalize_text(F.col("text")).alias("nt"))
        .join(F.broadcast(a_keys.withColumn("_in", F.lit(1))), "nt", "left")
        .groupBy("doc_id")
        .agg((F.count("_in") > 0).alias("exact_member"))
    )
    return (
        probed.join(exact, "doc_id")
        .select("doc_id", "maybe_member", "exact_member")
        .orderBy("doc_id")
    )


# --- Count-min heavy hitters -----------------------------------------
_CMS_D, _CMS_W = 3, 32

_CMS_SQL = f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x != '')) AS t
  FROM documents),
sketch AS (
  SELECT j, {_H60.format(x="concat(t, '#', CAST(j AS VARCHAR))")} % {_CMS_W} AS pos,
         count(*) AS cnt
  FROM toks CROSS JOIN generate_series(0, {_CMS_D - 1}) g(j)
  GROUP BY 1, 2),
exact AS (
  SELECT t, count(*) AS exact_cnt FROM toks GROUP BY t),
est AS (
  SELECT exact.t,
         min(sketch.cnt) AS est
  FROM exact
  CROSS JOIN generate_series(0, {_CMS_D - 1}) g(j)
  JOIN sketch ON sketch.j = g.j
    AND sketch.pos = {_H60.format(x="concat(exact.t, '#', CAST(g.j AS VARCHAR))")} % {_CMS_W}
  GROUP BY exact.t)
SELECT est.t AS token, est.est AS est, exact.exact_cnt AS exact_cnt
FROM est JOIN exact ON est.t = exact.t
ORDER BY est DESC, token
LIMIT 20
"""


@register("cms_heavy_hitters", _CMS_SQL)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top tokens by count-min estimate, with the exact count beside
    the (upper-bound) estimate.  The sketch is d*w counters whatever
    the corpus size; candidates and sketch join broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(whitespace_tokens(F.col("text"))).alias("t"))
    sketch = cms_table(toks, "t", d=_CMS_D, w=_CMS_W)
    exact = toks.groupBy("t").agg(F.count(F.lit(1)).alias("exact_cnt"))
    est = cms_estimate(exact.select("t"), sketch, "t", d=_CMS_D, w=_CMS_W)
    return (
        est.join(exact, "t")
        .select(F.col("t").alias("token"), "est", "exact_cnt")
        .orderBy(F.desc("est"), "token")
        .limit(20)
    )


# --- Deterministic stratified sampling --------------------------------
@register(
    "stratified_sample_events",
    """
    SELECT event_id, event_type FROM (
      SELECT event_id, event_type,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rk
      FROM events)
    WHERE rk <= 50
    ORDER BY event_type, event_id
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-50-per-event-type sample, content-stable (md5 order, no
    RNG) — reproducible train/eval subsets across engines and reruns."""
    ev = load_table(spark, sf_dir, "events")
    return (
        stratified_sample(ev, ["event_type"], "event_id", 50)
        .select("event_id", "event_type")
        .orderBy("event_type", "event_id")
    )


# --- PII redaction ----------------------------------------------------
# Regex subset shared by Java regex (Spark) and RE2 (DuckDB): character
# classes, bounded repeats, \\b word boundaries — no backreferences or
# lookaround.
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_IP_RE = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

_PII_SQL = f"""
WITH injected AS (
  SELECT doc_id,
         concat(text, ' contact user', CAST(doc_id AS VARCHAR),
                '@mail.example from 10.', CAST(doc_id % 200 AS VARCHAR),
                '.0.', CAST(doc_id % 250 AS VARCHAR)) AS t
  FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{_IP_RE}')) AS BIGINT) AS n_ips,
       md5(regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_IP_RE}', '<IP>', 'g')) AS redacted_md5
FROM injected
ORDER BY doc_id
"""


@register("pii_redaction", _PII_SQL)
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII scrub: count and redact emails / IPv4s with
    engine-portable regexes.  Map-only — no shuffle; the redacted text
    is emitted as md5 so the compare stays compact."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example from 10."),
        (F.col("doc_id") % 200).cast("string"),
        F.lit(".0."),
        (F.col("doc_id") % 250).cast("string"),
    )
    injected = docs.select("doc_id", t.alias("t"))
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("t"), _EMAIL_RE, "<EMAIL>"), _IP_RE, "<IP>"
    )
    return injected.select(
        "doc_id",
        F.regexp_count(F.col("t"), F.lit(_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(F.col("t"), F.lit(_IP_RE)).cast("long").alias("n_ips"),
        F.md5(redacted).alias("redacted_md5"),
    ).orderBy("doc_id")
