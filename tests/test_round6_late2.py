"""Round-6 late-wave batch 2: KMV theta sketches, label propagation,
conversion attribution, target encoding."""

import pytest
from pyspark.sql import functions as F

from hail_spark.llmdata.features import target_encode
from hail_spark.operators.graph import label_propagation
from hail_spark.operators.relational import attribute_conversions
from hail_spark.operators.sketches import (
    kmv_build,
    kmv_estimate,
    kmv_intersect_estimate,
    kmv_prefilter_threshold,
    kmv_union,
)


# ------------------------------------------------------------------ #
# KMV
# ------------------------------------------------------------------ #
def test_kmv_exact_small_group(spark):
    df = spark.createDataFrame(
        [("g", i % 10) for i in range(100)], "k string, v long"
    )
    sk = kmv_build(df, "k", "v", k=64)
    est = sk.select(kmv_estimate(F.col("kmv"), F.col("kmv_k")).alias("e")).head()["e"]
    assert est == 10.0  # below k -> the sketch IS the distinct set


def test_kmv_estimator_accuracy(spark):
    n = 5000
    df = spark.createDataFrame([("g", i) for i in range(n)], "k string, v long")
    sk = kmv_build(df, "k", "v", k=256)
    est = sk.select(kmv_estimate(F.col("kmv"), F.col("kmv_k")).alias("e")).head()["e"]
    assert abs(est - n) / n < 0.25  # ~4 sigma at k=256


def test_kmv_union_and_intersect_exact_regime(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(20)] + [("b", i) for i in range(10, 40)],
        "k string, v long",
    )
    sk = kmv_build(df, "k", "v", k=64)
    a = sk.filter(F.col("k") == "a").select(F.col("kmv").alias("ka"))
    b = sk.filter(F.col("k") == "b").select(F.col("kmv").alias("kb"))
    row = a.crossJoin(b).select(
        F.size(kmv_union(F.col("ka"), F.col("kb"), 64)).alias("nu"),
        kmv_intersect_estimate(F.col("ka"), F.col("kb"), 64).alias("ni"),
    ).head()
    assert row["nu"] == 40  # |0..39|
    assert row["ni"] == 10.0  # |10..19| exact (union unfilled)


def test_kmv_prefilter_preserves_sketch(spark):
    n = 5000
    df = spark.createDataFrame([("g", i) for i in range(n)], "k string, v long")
    full = kmv_build(df, "k", "v", k=64).head()["kmv"]
    thr = kmv_prefilter_threshold(64, n_lower_bound=n // 2)
    from hail_spark.operators.sketches import _kmv_hash

    pre = df.filter(_kmv_hash(F.col("v")) < thr)
    thinned = kmv_build(pre, "k", "v", k=64).head()["kmv"]
    assert thinned == full
    # and the thinned input really is much smaller than the corpus
    assert pre.count() < n // 2


# ------------------------------------------------------------------ #
# label propagation
# ------------------------------------------------------------------ #
def test_lpa_two_cliques(spark):
    # cliques {1,2,3,4} and {10,11,12,13} bridged by 4-10: labels
    # converge to each clique's min id; deterministic min tie-break
    def clique(ns):
        return [(a, b) for a in ns for b in ns if a < b]

    edges = clique([1, 2, 3, 4]) + clique([10, 11, 12, 13]) + [(4, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r["label"] for r in label_propagation(df, n_iter=4).collect()}
    assert all(out[n] == 1 for n in [1, 2, 3, 4])
    assert all(out[n] == 10 for n in [10, 11, 12, 13])


def test_lpa_deterministic(spark):
    edges = [(1, 2), (2, 3), (3, 4), (4, 1), (2, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted(map(tuple, label_propagation(df, n_iter=3).collect()))
    b = sorted(map(tuple, label_propagation(df, n_iter=3).collect()))
    assert a == b


# ------------------------------------------------------------------ #
# attribution
# ------------------------------------------------------------------ #
def test_attribution_first_last_and_boundaries(spark):
    H = 100
    rows = [
        # user 1: touches at 5 (view), 50 (click), conv at 100
        (1, 1, "view", 5),
        (2, 1, "click", 50),
        (3, 1, "purchase", 100),
        # boundary: touch at exactly conv-H (included), at conv (excluded)
        (4, 2, "view", 100),
        (5, 2, "click", 200),
        (6, 2, "purchase", 200),
        # user 3: conversion with no touches
        (7, 3, "purchase", 500),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts long"
    )
    out = attribute_conversions(
        df,
        "user_id",
        "ts",
        conversion_pred=F.col("event_type") == "purchase",
        touch_pred=F.col("event_type").isin("view", "click"),
        horizon=H,
        touch_cols=["event_type"],
    )
    got = {r["event_id"]: r for r in out.collect()}
    assert got[3]["first_event_type"] == "view"
    assert got[3]["last_event_type"] == "click"
    assert got[3]["n_touches"] == 2
    # user 2: view@100 == conv_ts-H -> included; click@200 == conv_ts -> excluded
    assert got[6]["first_event_type"] == "view"
    assert got[6]["last_event_type"] == "view"
    assert got[6]["n_touches"] == 1
    assert got[7]["n_touches"] == 0
    assert got[7]["first_event_type"] is None
    assert len(got) == 3  # one row per conversion, band duplication collapsed


def test_attribution_rejects_bad_horizon(spark):
    df = spark.createDataFrame([(1, 1, "a", 1)], "e long, u long, t string, ts long")
    with pytest.raises(ValueError):
        attribute_conversions(df, "u", "ts", F.lit(True), F.lit(True), 0)


# ------------------------------------------------------------------ #
# target encoding
# ------------------------------------------------------------------ #
def test_target_encode_loo_hand_values(spark):
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0)]
    df = spark.createDataFrame(rows, "c string, y double")
    out = target_encode(df, "c", "y", leave_one_out=True, smoothing=0.0)
    got = sorted((r["c"], r["y"], r["c_te"]) for r in out.collect())
    # a rows: (6 - y) / 2; b singleton -> global prior 4.0
    assert got[0] == ("a", 1.0, pytest.approx(2.5))
    assert got[1] == ("a", 2.0, pytest.approx(2.0))
    assert got[2] == ("a", 3.0, pytest.approx(1.5))
    assert got[3][2] == pytest.approx(16.0 / 4)


def test_target_encode_smoothing_pulls_to_prior(spark):
    rows = [("a", 0.0)] * 3 + [("b", 100.0)] * 3
    df = spark.createDataFrame(rows, "c string, y double")
    plain = target_encode(df, "c", "y", leave_one_out=False, smoothing=0.0)
    smooth = target_encode(df, "c", "y", leave_one_out=False, smoothing=3.0)
    p = {r["c"]: r["c_te"] for r in plain.collect()}
    s = {r["c"]: r["c_te"] for r in smooth.collect()}
    assert p["a"] == 0.0 and p["b"] == 100.0
    # m=3, prior=50: a -> (0 + 150)/6 = 25
    assert s["a"] == pytest.approx(25.0)
    assert s["b"] == pytest.approx(75.0)
    assert 0.0 < s["a"] < 50.0 < s["b"] < 100.0
