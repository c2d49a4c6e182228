"""Distributed sketch operators: HyperLogLog distinct, Bloom-filter
membership, count-min heavy hitters, deterministic stratified sampling.

These extend the LLM-data-pipeline surface (dedup / corpus statistics)
with the approximate structures a 100 TB pipeline leans on when exact
answers would shuffle the full corpus.  Every sketch here is a pure
Catalyst composition whose shuffle payload is O(sketch size) — the
registers / bit positions / counters — never O(rows):

  - map side: a per-row hash expression (md5-derived, whole-stage
    codegen) emits (bucket, value) pairs;
  - one partial-aggregating groupBy collapses them to the sketch
    (≤ a few thousand rows regardless of input scale);
  - the estimate is a scalar expression over the sketch.

All hash math derives from md5 rather than Spark's xxhash64 so a SQL
oracle (DuckDB) reproduces every stage bit-for-bit: the first 15 hex
chars of md5 parse to the same non-negative 60-bit integer in both
engines (Spark ``conv(substring(md5(x),1,15),16,10)``; DuckDB
``CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)``).

The reference engine has no sketch surface (it materializes exact
pandas/cuDF frames — e.g. uniqueness via ``drop_duplicates``,
/root/reference/atlxi_dhdt.py and deepicedrain/spatiotemporal.py); the
sketches are the scale-path replacement for those exact passes, the
way DataSketches extends Hive/Druid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def md5_long60(col: Column) -> Column:
    """First 60 bits of md5(col) as a non-negative BIGINT.

    Engine-portable: DuckDB computes the identical value with
    ``CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)``.  60 bits
    (15 hex chars) keeps the value strictly inside a signed 64-bit
    range, so no engine-specific unsigned/overflow semantics leak in.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007), deterministic md5 register variant
# ---------------------------------------------------------------------------


def hll_registers(df: DataFrame, col: str, b: int = 10) -> DataFrame:
    """HLL register table: bucket (first ``b`` hash bits) → max rank.

    rho = 1 + number of leading zeros of the remaining ``60-b`` bits;
    an all-zero remainder scores ``60-b+1``.  The groupBy partially
    aggregates map-side, so the shuffle moves at most
    ``m = 2**b`` rows per input partition — O(sketch), not O(rows).
    """
    sh = 60 - b
    # NULLs are excluded, matching COUNT(DISTINCT col) semantics — a
    # NULL hash would create a NULL-bucket register row that inflates
    # m_nz while contributing nothing to s_nz (upward-biased estimate)
    t = df.filter(F.col(col).isNotNull()).select(
        md5_long60(F.col(col).cast("string")).alias("v")
    ).select(
        F.expr(f"v DIV {1 << sh}").alias("bucket"),
        F.expr(f"v % {1 << sh}").alias("w"),
    )
    # length(bin(w)) = floor(log2 w)+1 for w>0 (bin() strips leading
    # zeros in both engines), so rho = (sh+1) - length(bin(w)).
    rho = (
        F.when(F.col("w") == 0, F.lit(sh + 1))
        .otherwise(F.lit(sh + 1) - F.length(F.bin(F.col("w"))))
        .cast("int")
    )
    return t.groupBy("bucket").agg(F.max(rho).alias("r"))


def hll_estimate(df: DataFrame, col: str, b: int = 10) -> DataFrame:
    """One-row HLL distinct-count estimate for ``df[col]``.

    The harmonic sum is kept in EXACT integer arithmetic (each
    register contributes ``2**(sh+1-r)``, an empty one ``2**(sh+1)``;
    the total fits a BIGINT for b >= 4) and only the final estimate
    touches doubles, so both engines round the same way.  The
    small-range (linear counting) correction applies below ``2.5*m``
    when empty registers remain — the estimate is emitted as a rounded
    BIGINT so a last-ulp libm difference in ``ln`` cannot flip it.
    """
    return hll_estimate_from_registers(hll_registers(df, col, b), b)


def hll_estimate_from_registers(reg: DataFrame, b: int = 10) -> DataFrame:
    """Estimate tail over a (bucket, r) register table — shared by the
    batch path and the streaming path (whose register table comes out
    of a complete-mode streaming aggregation: max-merge is order- and
    replay-insensitive, so stream and batch registers are identical)."""
    m = 1 << b
    sh = 60 - b
    top = 1 << (sh + 1)
    agg = reg.agg(
        F.count(F.lit(1)).alias("m_nz"),
        F.sum(F.expr(f"CAST({top} AS BIGINT) DIV shiftleft(CAST(1 AS BIGINT), r)")).alias(
            "s_nz"
        ),
    )
    # alpha_m * m^2, written as the same literal arithmetic the oracle
    # uses so the double is produced by an identical IEEE op sequence.
    alpha_mm = f"0.7213 / (1.0 + 1.079 / {m}.0) * {m}.0 * {m}.0"
    return agg.select(
        F.lit(m).cast("long").alias("m"),
        F.col("m_nz").cast("long").alias("m_nz"),
        F.expr(
            f"""
            CAST(round(CASE
              WHEN ({alpha_mm}) / ((CAST(s_nz + ({m} - m_nz) * CAST({top} AS BIGINT)
                        AS DOUBLE)) / {top}.0) <= 2.5 * {m}.0
                   AND m_nz < {m}
                THEN {m}.0 * ln({m}.0 / CAST({m} - m_nz AS DOUBLE))
              ELSE ({alpha_mm}) / ((CAST(s_nz + ({m} - m_nz) * CAST({top} AS BIGINT)
                        AS DOUBLE)) / {top}.0)
            END) AS BIGINT)
            """
        ).alias("estimate"),
    )


def hll_oracle_sql(source_sql: str, expr: str, b: int = 10) -> str:
    """DuckDB SQL reproducing :func:`hll_estimate` bit-for-bit.

    ``source_sql`` is a FROM-able relation, ``expr`` the hashed column
    expression (cast to VARCHAR by the caller if needed).
    """
    m = 1 << b
    sh = 60 - b
    top = 1 << (sh + 1)
    alpha_mm = f"0.7213 / (1.0 + 1.079 / {m}.0) * {m}.0 * {m}.0"
    return f"""
    WITH hashed AS (
      SELECT CAST(concat('0x', substr(md5(CAST({expr} AS VARCHAR)), 1, 15)) AS BIGINT) AS v
      FROM {source_sql}
      WHERE {expr} IS NOT NULL),
    split AS (
      SELECT v // {1 << sh} AS bucket, v % {1 << sh} AS w FROM hashed),
    reg AS (
      SELECT bucket,
             max(CASE WHEN w = 0 THEN {sh + 1}
                      ELSE {sh + 1} - length(bin(w)) END) AS r
      FROM split GROUP BY bucket),
    agg AS (
      SELECT count(*) AS m_nz,
             sum(CAST({top} AS BIGINT) // (CAST(1 AS BIGINT) << r)) AS s_nz
      FROM reg)
    SELECT CAST({m} AS BIGINT) AS m,
           CAST(m_nz AS BIGINT) AS m_nz,
           CAST(round(CASE
             WHEN ({alpha_mm}) / ((CAST(s_nz + ({m} - m_nz) * CAST({top} AS BIGINT)
                       AS DOUBLE)) / {top}.0) <= 2.5 * {m}.0
                  AND m_nz < {m}
               THEN {m}.0 * ln({m}.0 / CAST({m} - m_nz AS DOUBLE))
             ELSE ({alpha_mm}) / ((CAST(s_nz + ({m} - m_nz) * CAST({top} AS BIGINT)
                       AS DOUBLE)) / {top}.0)
           END) AS BIGINT) AS estimate
    FROM agg
    """


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970) — corpus membership without the corpus
# ---------------------------------------------------------------------------


def _bloom_pos(key: Column, j: Column, m: int) -> Column:
    return md5_long60(F.concat(key, F.lit("|"), j.cast("string"))) % m


def bloom_bits(df: DataFrame, key: Column, k: int = 4, m: int = 1 << 16) -> DataFrame:
    """PACKED Bloom filter over ``key`` (k hashes, m bits): 32 bits per
    row as (word, bits) — ``m/32`` rows however large the corpus, so a
    2^28-bit filter broadcasts as ~8M longs (~64 MB), not 2^28 position
    rows.  One map (k rows per input) + one partial-aggregating bit_or
    groupBy.  32-bit words keep every mask strictly positive, dodging
    engine-specific signed-shift-overflow semantics (DuckDB errors on
    1<<63)."""
    e = df.select(key.alias("_k"), F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j"))
    pos = _bloom_pos(F.col("_k"), F.col("j"), m)
    return (
        e.select(pos.alias("pos"))
        .select(
            F.expr("pos DIV 32").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias("b"),
        )
        .groupBy("word")
        .agg(F.bit_or("b").alias("bits"))
    )


def bloom_probe(
    probe: DataFrame,
    bits: DataFrame,
    key: Column,
    id_col: str,
    k: int = 4,
    m: int = 1 << 16,
) -> DataFrame:
    """Membership probe: ``maybe_member`` is true iff ALL ``k`` hash
    bits of the probe key are set (one-sided error: false positives
    only).  The packed word table joins BROADCAST, so the probed
    corpus is never shuffled for the membership test."""
    e = probe.select(
        F.col(id_col), key.alias("_k"), F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j")
    ).select(F.col(id_col), _bloom_pos(F.col("_k"), F.col("j"), m).alias("pos"))
    hit_bit = F.expr("(shiftright(bits, CAST(pos % 32 AS INT)) & 1) = 1")
    return (
        e.withColumn("word", F.expr("pos DIV 32"))
        .join(F.broadcast(bits), "word", "left")
        .select(F.col(id_col), F.coalesce(hit_bit, F.lit(False)).alias("_set"))
        .groupBy(id_col)
        # compare against the GROUP's row count, not the constant k: a
        # duplicated probe id contributes 2k position rows and summing
        # against k would report a false NEGATIVE for a true member
        .agg(
            (F.sum(F.col("_set").cast("int")) == F.count(F.lit(1))).alias(
                "maybe_member"
            )
        )
    )


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005) — heavy hitters
# ---------------------------------------------------------------------------


def cms_table(items: DataFrame, item_col: str, d: int = 3, w: int = 32) -> DataFrame:
    """Count-min counter table (j, pos) → cnt: ``d`` hash rows of
    width ``w``.  ``d*w`` counters total; the groupBy partially
    aggregates so the shuffle is O(d*w) per input partition."""
    e = items.select(
        F.col(item_col).alias("_t"),
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("j"),
    )
    pos = md5_long60(F.concat(F.col("_t"), F.lit("#"), F.col("j").cast("string"))) % w
    return e.select("j", pos.alias("pos")).groupBy("j", "pos").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_estimate(
    candidates: DataFrame, sketch: DataFrame, item_col: str, d: int = 3, w: int = 32
) -> DataFrame:
    """CMS point estimate for each candidate item: min over the ``d``
    rows of the counter each hash lands in (an upper bound on the true
    count).  Sketch and candidates are both tiny → broadcast joins."""
    e = candidates.select(
        F.col(item_col), F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("j")
    )
    pos = md5_long60(F.concat(F.col(item_col), F.lit("#"), F.col("j").cast("string"))) % w
    return (
        e.select(item_col, "j", pos.alias("pos"))
        # LEFT join + zero-fill: a candidate hashing to an untouched
        # counter must see 0 there (an inner join would drop the row,
        # inflating the min — or losing the candidate entirely)
        .join(F.broadcast(sketch), ["j", "pos"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling
# ---------------------------------------------------------------------------


def stratified_sample(
    df: DataFrame, stratum_cols: list[str], id_col: str, n_per_stratum: int
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum
    is smaller), chosen by md5 order of the id — content-stable across
    runs, partitionings, and engines (no RNG).  One shuffle on the
    stratum key; rank via window."""
    from pyspark.sql import Window

    w = Window.partitionBy(*stratum_cols).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= n_per_stratum)
        .drop("rk")
    )


# ---------------------------------------------------------------------------
# KMV / theta sketch (Bar-Yossef et al. 2002; Dasgupta et al. 2016)
# ---------------------------------------------------------------------------


def kmv_minima(
    df: DataFrame, group_cols: list[str], key: Column, k: int = 64
) -> DataFrame:
    """K-minimum-values sketch table: per group, the ``k`` smallest
    DISTINCT 60-bit md5 hash values of ``key`` → rows
    ``(*group_cols, h, rk)`` with ``rk`` the 1-based hash rank.

    Every exchange shrinks: the (group, h) groupBy collapses duplicate
    keys MAP-SIDE (partial aggregation) so only distinct 16-byte pairs
    shuffle; a per-(group, h mod 32) pre-rank then keeps ≤ k hashes
    per bucket IN PARALLEL, so the final per-group rank — the only
    place one task sees a whole group — reads at most 32·k rows per
    group regardless of distinct cardinality (the classic distributed
    top-k shape).  The sketch itself is ≤ k rows per group.  Unlike
    HLL this sketch supports SET EXPRESSIONS (union / intersection /
    difference estimates via ``kmv_theta_counts``), which is why
    DataSketches ships theta alongside HLL.
    """
    distinct = (
        df.select(*group_cols, md5_long60(key).alias("h"))
        .groupBy(*group_cols, "h")
        .agg(F.count(F.lit(1)).alias("_n"))
        .drop("_n")
    )
    return kmv_minima_hashed(distinct, group_cols, k=k)


def kmv_minima_hashed(
    distinct: DataFrame, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Rank stage of ``kmv_minima`` over an ALREADY-DISTINCT
    (group, h) table — exposed so a caller that needs the distinct
    pair table for other aggregates too (e.g. an exact-count audit)
    computes the expensive text→hash pass once and shares it."""
    from pyspark.sql import Window

    # the k smallest of any bucket-partition of the hashes is a
    # superset of the k smallest overall, so the pre-prune is exact
    wb = Window.partitionBy(*group_cols, F.pmod(F.col("h"), F.lit(32))).orderBy("h")
    pruned = (
        distinct.withColumn("_bk", F.row_number().over(wb))
        .where(F.col("_bk") <= k)
        .drop("_bk")
    )
    w = Window.partitionBy(*group_cols).orderBy("h")
    return pruned.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)


_KMV_SCALE = float(1 << 60)


def kmv_estimate(minima: DataFrame, group_cols: list[str], k: int = 64) -> DataFrame:
    """Distinct-count estimate per group from a ``kmv_minima`` table:
    (k-1) / (R_k / 2^60) when the sketch is full (unbiased KMV
    estimator), else the exact sketch size.  Emitted as a rounded
    BIGINT so both engines hash identically."""
    agg = minima.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_sketch"), F.max("h").alias("r_k")
    )
    est = F.when(
        F.col("n_sketch") < k, F.col("n_sketch").cast("double")
    ).otherwise((k - 1) / (F.col("r_k").cast("double") / _KMV_SCALE))
    return agg.select(
        *group_cols,
        F.col("n_sketch").cast("long").alias("n_sketch"),
        F.round(est).cast("long").alias("est_distinct"),
    )


def kmv_theta_counts(
    a: DataFrame, b: DataFrame, k: int = 64
) -> DataFrame:
    """Theta-sketch set expressions over TWO single-group ``kmv_minima``
    tables (columns ``h``): one row with theta (the k-th smallest hash
    of the union sketch, normalized) and the union / intersection /
    A-only / B-only estimates, each ``round(count_below_theta /
    theta_norm)`` as BIGINT.

    Everything is a composition over ≤ 2k driver-free rows: the union
    re-rank is a window over the concatenated minima; the membership
    joins are broadcast-sized.  This is the mergeability HLL lacks —
    two corpus snapshots' sketches combine WITHOUT rescanning either
    corpus, and intersections (shared-vocabulary, cross-corpus
    contamination) fall out of the same k rows.
    """
    from pyspark.sql import Window

    ah = a.select(F.col("h").alias("h"), F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    bh = b.select(F.col("h").alias("h"), F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    merged = (
        ah.unionByName(bh)
        .groupBy("h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.orderBy("h")
    union_sk = merged.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)

    # theta = the k-th smallest union hash; in estimation mode (sketch
    # full) the theta row itself is EXCLUDED from the retained counts
    # (DataSketches convention), so each estimate is count(h < theta)
    # / theta_norm.  In exact mode (< k distinct hashes) theta_norm=1
    # and every row counts.
    def _cnt(expr: Column, name: str) -> list[Column]:
        return [
            F.sum(F.when(F.col("rk") < k, expr).otherwise(0)).alias(f"{name}_below"),
            F.sum(expr).alias(f"{name}_all"),
        ]

    stats = union_sk.agg(
        F.max("h").alias("theta"),
        F.max(F.when(F.col("rk") == k, 1).otherwise(0)).alias("_full"),
        *_cnt(F.lit(1), "n_union"),
        *_cnt(F.col("in_a") * F.col("in_b"), "n_inter"),
        *_cnt(F.col("in_a") * (1 - F.col("in_b")), "n_a_only"),
        *_cnt(F.col("in_b") * (1 - F.col("in_a")), "n_b_only"),
    )
    theta_norm = F.when(
        F.col("_full") == 1, F.col("theta").cast("double") / _KMV_SCALE
    ).otherwise(F.lit(1.0))

    def _est(name: str) -> Column:
        cnt = F.when(F.col("_full") == 1, F.col(f"{name}_below")).otherwise(
            F.col(f"{name}_all")
        )
        return F.round(cnt / theta_norm).cast("long")

    return stats.select(
        F.col("theta").cast("long").alias("theta"),
        _est("n_union").alias("est_union"),
        _est("n_inter").alias("est_intersection"),
        _est("n_a_only").alias("est_a_only"),
        _est("n_b_only").alias("est_b_only"),
    )
