"""Round-6 late-wave operators: DSIR selection, MAD outliers, PMI
collocations, triangle counting, Welch/proportion A/B tests."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from hail_spark.llmdata.features import robust_outliers
from hail_spark.llmdata.sampling import dsir_select, hashed_gram_buckets
from hail_spark.llmdata.textstats import pmi_collocations
from hail_spark.operators.abtest import two_proportion_ztest, welch_ttest
from hail_spark.operators.graph import triangle_count


# ------------------------------------------------------------------ #
# DSIR
# ------------------------------------------------------------------ #
def test_dsir_prefers_target_like_docs(spark):
    # target corpus speaks "alpha beta"; raw pool has one doc in that
    # dialect and several in another — DSIR must rank the look-alike
    # first by importance weight.
    rows = [(i, "alpha beta alpha beta alpha", True) for i in range(10)]
    rows += [(100, "alpha beta alpha beta gamma", False)]
    rows += [(200 + i, "zeta eta theta iota kappa", False) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    out = dsir_select(df, "text", "doc_id", "tgt", k=3, n_buckets=256, seed=1)
    got = {r["doc_id"]: r["logw"] for r in out.collect()}
    assert len(got) == 3
    assert 100 in got, "the target-dialect raw doc must be selected"
    others = [v for k, v in got.items() if k != 100]
    assert all(got[100] > v for v in others)
    # target rows never appear in the selection
    assert all(k >= 100 for k in got)


def test_dsir_k_exceeds_pool(spark):
    rows = [(1, "a b", True), (2, "a c", False), (3, "b d", False)]
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    out = dsir_select(df, "text", "doc_id", "tgt", k=10, n_buckets=64)
    assert out.count() == 2  # whole raw pool, no phantom rows


def test_hashed_gram_buckets_multiplicity(spark):
    df = spark.createDataFrame([("x x",)], "text string")
    b = df.select(hashed_gram_buckets(F.col("text"), 64).alias("b")).head()["b"]
    # grams: ["x", "x", "x x"] — multiplicity preserved, bigram included
    assert len(b) == 3
    assert all(0 <= v < 64 for v in b)
    one = df.select(
        hashed_gram_buckets(F.lit("solo"), 64, include_bigrams=True).alias("b")
    ).head()["b"]
    assert len(one) == 1  # no phantom bigram from sequence(2, 1)


# ------------------------------------------------------------------ #
# MAD robust outliers
# ------------------------------------------------------------------ #
def test_robust_outliers_known_values(spark):
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 100.0]
    df = spark.createDataFrame([("g", v) for v in vals], "k string, value double")
    out = robust_outliers(df, "k", "value", threshold=3.5).collect()
    med = 3.5  # median of 6 values (interpolated)
    resid = sorted(abs(v - med) for v in vals)
    mad = (resid[2] + resid[3]) / 2  # 1.5
    by_val = {r["value"]: r for r in out}
    for v in vals:
        expect_rz = 0.6745 * (v - med) / mad
        assert by_val[v]["value_rz"] == pytest.approx(expect_rz, rel=1e-12)
        assert by_val[v]["value_outlier"] == (abs(expect_rz) > 3.5)
    assert sum(r["value_outlier"] for r in out) == 1  # only the 100


def test_robust_outliers_degenerate_mad(spark):
    # >half the group equals the median -> MAD 0 -> nothing flagged
    df = spark.createDataFrame(
        [("g", 5.0)] * 5 + [("g", 9.0)], "k string, value double"
    )
    out = robust_outliers(df, "k", "value").collect()
    assert all(not r["value_outlier"] for r in out)
    assert all(r["value_rz"] is None for r in out)


def test_robust_outliers_approx_close_to_exact(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "value"
    )
    exact = (
        robust_outliers(ev, "event_type", "value", exact=True)
        .agg(F.sum(F.col("value_outlier").cast("int")))
        .head()[0]
    )
    approx = (
        robust_outliers(ev, "event_type", "value", exact=False, accuracy=10000)
        .agg(F.sum(F.col("value_outlier").cast("int")))
        .head()[0]
    )
    n = ev.count()
    assert abs(exact - approx) <= max(2, 0.01 * n)


# ------------------------------------------------------------------ #
# PMI collocations
# ------------------------------------------------------------------ #
def test_pmi_hand_checked(spark):
    # corpus: "a b" x4, "a c" x1, "c b" x1 -> bigram table has 6 slots
    docs = ["a b"] * 4 + ["a c", "c b"]
    df = spark.createDataFrame([(t,) for t in docs], "text string")
    out = pmi_collocations(df, "text", min_count=1, top_k=10).collect()
    got = {(r["w1"], r["w2"]): (r["n_pair"], r["pmi"]) for r in out}
    # marginals over slots: left a=5, c=1; right b=5, c=1; N=6
    assert got[("a", "b")][0] == 4
    assert got[("a", "b")][1] == pytest.approx(math.log(4 * 6 / (5 * 5)))
    assert got[("c", "b")][1] == pytest.approx(math.log(1 * 6 / (1 * 5)))
    # the rare-but-exclusive pairs (pmi ln 1.2, tied -> w1 order) rank
    # above the frequent-but-expected (a,b) (pmi ln 0.96 < 0)
    assert [(r["w1"], r["w2"]) for r in out[:2]] == [("a", "c"), ("c", "b")]
    assert out[-1]["w1"] == "a" and out[-1]["w2"] == "b"


def test_pmi_min_count_filters(spark):
    docs = ["a b"] * 4 + ["a c"]
    df = spark.createDataFrame([(t,) for t in docs], "text string")
    out = pmi_collocations(df, "text", min_count=2, top_k=10).collect()
    assert [(r["w1"], r["w2"]) for r in out] == [("a", "b")]


# ------------------------------------------------------------------ #
# triangle counting
# ------------------------------------------------------------------ #
def test_triangle_count_k4_plus_tail(spark):
    # K4 on 1-4 (every node in C(3,2)=3 triangles) plus a dangling
    # edge 4-5 (no triangle for 5); duplicate/reversed/self edges
    # must not change counts.
    edges = [(a, b) for a in range(1, 5) for b in range(1, 5) if a != b]
    edges += [(4, 5), (5, 4), (3, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_count_no_triangles(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    assert triangle_count(df).count() == 0


# ------------------------------------------------------------------ #
# Welch t-test / two-proportion z-test
# ------------------------------------------------------------------ #
def _welch_numpy(a, b):
    a, b = np.asarray(a, float), np.asarray(b, float)
    na, nb = len(a), len(b)
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / na + vb / nb
    t = (a.mean() - b.mean()) / math.sqrt(se2)
    dof = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    return t, dof


def test_welch_ttest_matches_numpy(spark):
    rng = np.random.RandomState(7)
    a = np.round(rng.normal(10, 2, 40), 6)
    b = np.round(rng.normal(11, 3, 55), 6)
    rows = [("m", float(v), True) for v in a] + [
        ("m", float(v), False) for v in b
    ]
    df = spark.createDataFrame(rows, "g string, value double, cohort boolean")
    r = welch_ttest(df, "g", "value", "cohort", p_value=True).head()
    t, dof = _welch_numpy(a, b)
    assert r["n_a"] == 40 and r["n_b"] == 55
    assert r["mean_a"] == pytest.approx(a.mean(), abs=1e-9)
    assert r["t"] == pytest.approx(t, rel=1e-9)
    assert r["dof"] == pytest.approx(dof, rel=1e-9)
    # p via the engine's incomplete-beta t CDF
    from hail_spark.expr.stats import pT

    assert r["p"] == pytest.approx(
        2 * float(pT(abs(t), dof, lower_tail=False)), rel=1e-9
    )
    assert 0.0 < r["p"] < 1.0


def test_welch_ttest_degenerate_cohort(spark):
    rows = [("g", 1.0, True), ("g", 2.0, False), ("g", 3.0, False)]
    df = spark.createDataFrame(rows, "g string, value double, cohort boolean")
    r = welch_ttest(df, "g", "value", "cohort").head()
    assert r["t"] is None and r["dof"] is None


def test_two_proportion_ztest(spark):
    rows = [("e", i < 30, True) for i in range(100)]
    rows += [("e", i < 20, False) for i in range(100)]
    df = spark.createDataFrame(rows, "g string, success boolean, cohort boolean")
    r = two_proportion_ztest(df, "g", "success", "cohort").head()
    p_pool = 50 / 200
    z = (0.3 - 0.2) / math.sqrt(p_pool * (1 - p_pool) * (1 / 100 + 1 / 100))
    assert r["rate_a"] == pytest.approx(0.3)
    assert r["z"] == pytest.approx(z, rel=1e-12)
    assert 0.0 < r["p"] < 1.0
