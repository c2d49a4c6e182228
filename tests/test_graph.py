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
