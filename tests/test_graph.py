"""Connected-components operator tests."""

import random

from deepicedrain_spark.operators.graph import connected_components


def _brute_components(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seen, comp = {}, {}
    for start in adj:
        if start in seen:
            continue
        stack, members = [start], []
        seen[start] = True
        while stack:
            v = stack.pop()
            members.append(v)
            for u in adj[v]:
                if u not in seen:
                    seen[u] = True
                    stack.append(u)
        root = min(members)
        for m in members:
            comp[m] = root
    return comp


def test_connected_components_chain_and_random(spark):
    rng = random.Random(7)
    # a long path (worst case for naive propagation), a star, a clique,
    # singleton-free random noise edges
    edges = [(i, i + 1) for i in range(100, 140)]
    edges += [(500, 500 + i) for i in range(1, 8)]
    edges += [(a, b) for a in range(900, 905) for b in range(a + 1, 905)]
    edges += [(rng.randrange(0, 50), rng.randrange(0, 50)) for _ in range(30)]
    edges = [(a, b) for a, b in edges if a != b]
    want = _brute_components(edges)
    got = {
        r["node"]: r["component"]
        for r in connected_components(
            spark.createDataFrame(edges, ["src", "dst"])
        ).collect()
    }
    assert got == want


def test_pagerank_uniform_on_regular_graph(spark):
    from deepicedrain_spark.operators.graph import pagerank

    # directed 4-cycle: every node has in-deg = out-deg = 1 → the
    # uniform distribution is stationary at exactly 1/4 per node
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], ["src", "dst"]
    )
    ranks = {r["node"]: r["rank"] for r in pagerank(edges, iters=4).collect()}
    for v in ranks.values():
        assert abs(v - 0.25) < 1e-8


def test_pagerank_mass_conserved_no_dangling(spark):
    from pyspark.sql import functions as F

    from deepicedrain_spark.operators.graph import pagerank

    # symmetric star: no dangling nodes → total rank mass stays 1
    pairs = [(0, i) for i in range(1, 6)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], ["src", "dst"]
    )
    ranks = pagerank(edges, iters=5)
    total = ranks.agg(F.sum("rank")).collect()[0][0]
    assert abs(total - 1.0) < 1e-6
    hub = {r["node"]: r["rank"] for r in ranks.collect()}
    assert hub[0] > max(hub[i] for i in range(1, 6))  # hub dominates


def test_pagerank_dangling_mass_redistributed(spark):
    """Standard PageRank semantics on a graph WITH dangling nodes
    (ADVICE r2): node 3 has no out-edges, its mass redistributes
    uniformly, so total rank stays 1 and matches the closed-form
    NetworkX-style iteration."""
    from deepicedrain_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src long, dst long"
    )
    ranks = {r["node"]: r["rank"] for r in pagerank(edges, iters=8).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-6  # mass conserved
    # replay the documented iteration in plain python
    import itertools
    n = 3
    r = {1: 1 / n, 2: 1 / n, 3: 1 / n}
    out = {1: [2, 3], 2: [3]}
    for _ in range(8):
        dm = r[3]
        contrib = {k: 0.0 for k in r}
        for u, vs in out.items():
            for v in vs:
                contrib[v] += r[u] / len(vs)
        r = {
            k: round(0.15 / n + 0.85 * (contrib[k] + dm / n), 9) for k in r
        }
    for k in r:
        assert abs(ranks[k] - r[k]) < 1e-9


def test_pagerank_empty_edges(spark):
    """Review finding r4: an empty edge set returns an empty rank
    table instead of ZeroDivisionError."""
    from deepicedrain_spark.operators.graph import pagerank

    empty = spark.createDataFrame([], "src long, dst long")
    assert pagerank(empty).count() == 0
