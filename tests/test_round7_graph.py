"""Round-7 graph hardenings: triangle degree orientation, PageRank
dangling mass + convergence stop."""

import pytest
from pyspark.sql import functions as F

from hail_spark.operators.graph import pagerank, triangle_count


def _star_with_triangles(spark, n_spokes=2000, hub=None):
    """A mid-id hub star plus scattered triangles: the adversarial
    graph where raw-id orientation makes the hub a wedge center with
    ~(n/2)^2 candidates."""
    hub = n_spokes // 2 if hub is None else hub
    edges = [(hub, i) for i in range(n_spokes + 1) if i != hub]
    # scattered triangles away from the hub id ordering
    tri_nodes = [(10_000 + 3 * i, 10_001 + 3 * i, 10_002 + 3 * i) for i in range(20)]
    for a, b, c in tri_nodes:
        edges += [(a, b), (b, c), (a, c)]
    return spark.createDataFrame(edges, "src long, dst long"), hub


def _wedge_candidates(e_oriented):
    ab = e_oriented.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    bc = e_oriented.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    return ab.join(bc, "b").count()


def test_triangle_degree_orientation_bounds_hub_wedges(spark):
    edges, hub = _star_with_triangles(spark)
    n_edges = edges.count()
    e = (
        edges.select(
            F.least("src", "dst").alias("lo"),
            F.greatest("src", "dst").alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
    )
    # raw-id orientation: the mid-id hub is a wedge center for every
    # (smaller spoke, larger spoke) pair — quadratic in hub degree
    raw_cands = _wedge_candidates(e)
    assert raw_cands > 100_000
    # degree orientation (what triangle_count does internally): the
    # hub has max degree, so it is never a wedge center — candidates
    # stay O(edges)
    deg = (
        e.select(F.col("lo").alias("node"))
        .unionByName(e.select(F.col("hi").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    keyed = (
        e.join(deg.withColumnRenamed("node", "lo"), "lo")
        .withColumnRenamed("d", "dlo")
        .join(deg.withColumnRenamed("node", "hi"), "hi")
        .withColumnRenamed("d", "dhi")
        .select(
            F.struct(F.col("dlo").alias("d"), F.col("lo").alias("n")).alias("u"),
            F.struct(F.col("dhi").alias("d"), F.col("hi").alias("n")).alias("v"),
        )
    )
    o = keyed.select(
        F.least("u", "v").alias("lo"), F.greatest("u", "v").alias("hi")
    )
    deg_cands = _wedge_candidates(o)
    assert deg_cands <= 3 * n_edges


def test_triangle_count_orientation_invariant(spark):
    edges, hub = _star_with_triangles(spark, n_spokes=200)
    with_relabel = {
        r["node"]: r["n_triangles"]
        for r in triangle_count(edges, relabel_by_degree=True).collect()
    }
    without = {
        r["node"]: r["n_triangles"]
        for r in triangle_count(edges, relabel_by_degree=False).collect()
    }
    assert with_relabel == without
    # 20 disjoint triangles, each corner in exactly one
    assert sum(with_relabel.values()) == 60
    assert hub not in with_relabel


def test_triangle_count_clique(spark):
    # K5: every node is in C(4,2) = 6 triangles
    nodes = range(5)
    edges = [(a, b) for a in nodes for b in nodes if a < b]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
    assert out == {n: 6 for n in nodes}


def test_pagerank_dangling_redistribution_sums_to_one(spark):
    # chain with a sink: 0 -> 1 -> 2 (2 is dangling)
    df = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    plain = pagerank(df, n_iter=20)
    total_plain = plain.agg(F.sum("rank")).head()[0]
    assert total_plain < 0.999  # mass leaks by the classic convention
    red = pagerank(df, n_iter=20, redistribute_dangling=True)
    total_red = red.agg(F.sum("rank")).head()[0]
    assert total_red == pytest.approx(1.0, abs=1e-9)


def test_pagerank_tol_early_stop_matches_fixed(spark):
    # ring graph converges immediately (uniform is stationary): tol
    # stop must trigger fast and agree with the fixed-iteration run
    n = 10
    df = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long"
    )
    fixed = {r["node"]: r["rank"] for r in pagerank(df, n_iter=30).collect()}
    early = {
        r["node"]: r["rank"]
        for r in pagerank(df, n_iter=30, tol=1e-6).collect()
    }
    for k in fixed:
        assert early[k] == pytest.approx(fixed[k], abs=1e-6)
    for k in fixed:
        assert fixed[k] == pytest.approx(1.0 / n, abs=1e-9)
