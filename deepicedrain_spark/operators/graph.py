"""Distributed connected components over an edge DataFrame.

The lake-finder's cluster-merge step and the near-duplicate grouping
step (collapse pairwise near-dup edges into dedup groups) both need
components; the reference gets them implicitly from single-node DBSCAN
(/root/reference/deepicedrain/lake_algorithms.py:13-73) — at 100 TB
the edge set no longer fits one node, so components must be an
iterative DataFrame program.

Algorithm: min-label propagation with pointer jumping. Each round
  1. neighbor-min: l(v) <- min(l(v), min_{u in N(v)} l(u))  (one
     shuffle keyed on the edge endpoint), then
  2. pointer jump:  l(v) <- l(l(v))  (self-join on the label), which
     contracts label chains so convergence needs O(log n) rounds on a
     path instead of O(n) — the same doubling idea as the
     large-star/small-star MapReduce formulation (Kiveris et al. 2014).
Every round localCheckpoints its label table (eager) and drops the
previous one, so each round's plan is O(1) — without truncation the
logical plan re-carries both the whole upstream edge-producing subtree
and every earlier round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    out_node: str = "node",
    out_comp: str = "component",
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; the
    component id is the minimum node id in the component (stable,
    engine-independent)."""
    # localCheckpoint (not persist): every round's plan would otherwise
    # re-carry the upstream edge-producing subtree (e.g. a full
    # minhash pipeline), and per-round driver planning dominates on
    # small graphs
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    # labels only ever decrease, so the label sum is a strictly
    # decreasing convergence metric — one cheap agg per round instead
    # of an old-vs-new join. Probing every round is deliberate:
    # batching 2 rounds per probe was A/B-measured SLOWER at sf0.1
    # (4.3 s vs 3.3 s — deeper per-job plans + a forfeited early exit
    # beat the saved driver round-trip; see ROADMAP.md "Measured dead
    # ends").
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]

    for it in range(max_iter):
        nbr_min = (
            sym.join(
                labels.select(F.col("node").alias("b"), F.col("label").alias("bl")),
                "b",
            )
            .groupBy("a")
            .agg(F.min("bl").alias("nl"))
        )
        stepped = (
            labels.join(nbr_min, labels.node == nbr_min.a, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nl", F.col("label"))).alias("label"),
            )
        )
        # pointer jump: label <- label's label (labels are node ids, so
        # an inner self-join always finds the parent row)
        parents = stepped.select(
            F.col("node").alias("p"), F.col("label").alias("pl")
        )
        jumped = (
            stepped.join(parents, stepped.label == parents.p)
            .select("node", F.col("pl").alias("label"))
        )
        # checkpoint every round: label tables are tiny (one row per
        # node in the edge set) and a truncated plan keeps round
        # planning O(1) instead of O(iterations)
        jumped = jumped.localCheckpoint(eager=True)
        new_sum = jumped.agg(F.sum("label")).collect()[0][0]
        labels.unpersist()
        labels = jumped
        if new_sum == prev_sum:
            break
        prev_sum = new_sum

    sym.unpersist()
    return labels.select(F.col("node").alias(out_node), F.col("label").alias(out_comp))


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 5,
    round_dp: int = 9,
) -> DataFrame:
    """PageRank over an edge list as an iterative DataFrame program —
    per round ONE join (contributions keyed on the source) and ONE
    groupBy (summing into the destination), both equi-key shuffles, so
    each iteration is a fixed two-exchange plan at any graph size
    (the GraphX/Pregel shape expressed in plain DataFrames).

    Nodes = every endpoint; ranks start uniform at 1/N.  Dangling
    nodes (no out-edges) redistribute their rank mass uniformly each
    round (standard PageRank; total rank stays 1, matching
    GraphX/NetworkX on graphs with dangling nodes — ADVICE r2). The
    dangling mass is a 1-row aggregate broadcast into the update, so
    the per-iteration plan stays fixed-size. Ranks round to
    ``round_dp`` decimals each iteration IN BOTH ENGINES so
    cross-engine fp accumulation (~1e-16/term) cannot compound across
    rounds — the same drift-pinning trick as kmeans.updated_centroids.

    Every round localCheckpoints the O(nodes) rank table, keeping the
    per-round plan O(1) like connected_components above.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint(
        eager=True
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        # legitimately empty edge set (e.g. a near-dup threshold that
        # matched nothing): empty ranks, not a ZeroDivisionError
        return nodes.withColumn("rank", F.lit(0.0))
    base = (1.0 - damping) / n_nodes
    deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    ranks = nodes.withColumn("rank", F.round(F.lit(1.0 / n_nodes), round_dp))
    for _ in range(iters):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "u"), "u")
            .join(deg, "u")
            .select(F.col("v").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        # dangling mass: rank held by nodes with no out-edges (1-row
        # aggregate, broadcast; NULL → 0.0 when no node dangles)
        dangling = ranks.join(
            deg.withColumnRenamed("u", "node"), "node", "left_anti"
        ).agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
        prev = ranks
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                F.round(
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("in_sum"), F.lit(0.0))
                        + F.col("_dm") / F.lit(float(n_nodes))
                    ),
                    round_dp,
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        # drop the superseded round's checkpointed blocks (same hygiene
        # as connected_components) — without this a long run pins
        # `iters` copies of the O(nodes) rank table in executor storage
        try:
            prev.unpersist()
        except Exception:
            pass
    return ranks
