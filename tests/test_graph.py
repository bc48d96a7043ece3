"""PageRank (operators/graph.py)."""

import math

import pytest

from hail_spark.operators.graph import pagerank


def _np_pagerank(edges, n_iter=10, d=0.85):
    nodes = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = {v: 0 for v in nodes}
    for s, _ in set(edges):
        out[s] += 1
    r = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        contrib = {v: 0.0 for v in nodes}
        for s, t in set(edges):
            contrib[t] += r[s] / out[s]
        r = {v: (1 - d) / n + d * contrib[v] for v in nodes}
    return r


def test_matches_reference_implementation(spark):
    edges = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1), (4, 1)]  # dup edge
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iter=10).collect()}
    want = _np_pagerank(edges, n_iter=10)
    assert set(got) == set(want)
    for v in want:
        assert math.isclose(got[v], want[v], rel_tol=1e-9)
    # node 4 is a source-only node: rank = base
    assert math.isclose(got[4], 0.15 / 4, rel_tol=1e-12)
    # 1 receives from 3 and 4 -> highest rank
    assert got[1] == max(got.values())


def test_checkpointing_does_not_change_values(spark):
    edges = [(i, (i + 1) % 20) for i in range(20)] + [(0, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {r["node"]: r["rank"]
         for r in pagerank(df, n_iter=7, checkpoint_every=2).collect()}
    b = {r["node"]: r["rank"]
         for r in pagerank(df, n_iter=7, checkpoint_every=100).collect()}
    assert all(math.isclose(a[v], b[v], rel_tol=1e-12) for v in a)


def test_validation(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(df, n_iter=0)


def test_bfs_levels(spark):
    from hail_spark.operators.graph import bfs_levels

    # 0->1->2->3, 0->2 (shortcut), 4 isolated, 5->0 (unreachable upstream)
    edges = [(0, 1), (1, 2), (2, 3), (0, 2), (5, 0)]
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["level"] for r in bfs_levels(e, s).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 2}
    # undirected: 5 reachable
    got_u = {r["node"]: r["level"]
             for r in bfs_levels(e, s, directed=False).collect()}
    assert got_u == {0: 0, 1: 1, 2: 1, 5: 1, 3: 2}
    # depth cap
    got_d = {r["node"]: r["level"] for r in bfs_levels(e, s, max_depth=1).collect()}
    assert got_d == {0: 0, 1: 1, 2: 1}
