

"""hl.agg.linreg full result struct (reference test_aggregators.py
linreg cases: numpy lstsq replay as the oracle)."""

from pyspark.sql import functions as F


def test_linreg_agg_full_struct(spark):
    import numpy as np

    from hail_spark.expr import aggregators as agg

    rng = np.random.default_rng(31)
    n = 200
    x = rng.normal(size=n)
    y = 2.0 + 3.0 * x + rng.normal(scale=0.5, size=n)
    grp = np.repeat([0, 1], n // 2)
    rows = [
        {"g": int(grp[i]), "y": float(y[i]), "x": float(x[i])} for i in range(n)
    ]
    df = spark.createDataFrame(rows)
    res = (
        df.groupBy("g")
        .agg(agg.linreg(F.col("y"), [F.lit(1.0), F.col("x")]).alias("lr"))
        .collect()
    )
    for r in res:
        sel = grp == r["g"]
        X = np.column_stack([np.ones(sel.sum()), x[sel]])
        yy = y[sel]
        beta = np.linalg.lstsq(X, yy, rcond=None)[0]
        resid = yy - X @ beta
        sigma2 = resid @ resid / (sel.sum() - 2)
        se = np.sqrt(np.diag(np.linalg.inv(X.T @ X)) * sigma2)
        lr = r["lr"]
        np.testing.assert_allclose(lr["beta"], beta, rtol=1e-8)
        np.testing.assert_allclose(lr["standard_error"], se, rtol=1e-8)
        sst = ((yy - yy.mean()) ** 2).sum()
        np.testing.assert_allclose(
            lr["multiple_r_squared"], 1 - resid @ resid / sst, rtol=1e-8
        )
        assert lr["n"] == int(sel.sum())
        assert 0 <= lr["p_value"][1] < 1e-6  # x is truly predictive
        assert lr["f_stat"] > 100 and lr["multiple_p_value"] < 1e-6


def test_linreg_agg_skips_missing(spark):
    from hail_spark.expr import aggregators as agg

    rows = [
        {"y": 1.0, "x": 1.0},
        {"y": 2.0, "x": 2.0},
        {"y": None, "x": 3.0},
        {"y": 4.0, "x": None},
        {"y": 3.0, "x": 3.0},
    ]
    df = spark.createDataFrame(rows, "y double, x double")
    r = df.agg(agg.linreg(F.col("y"), [F.lit(1.0), F.col("x")]).alias("lr")).collect()[0]["lr"]
    assert r["n"] == 3


def test_ndarray_sum_agg(spark):
    import numpy as np

    from hail_spark.expr import aggregators as agg
    from hail_spark.expr import ndarray as nd

    mats = [np.arange(6).reshape(2, 3) * (i + 1.0) for i in range(4)]
    rows = [
        {"g": i % 2, "shape": [2, 3], "data": m.ravel().tolist()}
        for i, m in enumerate(mats)
    ]
    df = spark.createDataFrame(rows, "g int, shape array<bigint>, data array<double>")
    df = df.select("g", F.struct("shape", "data").alias("nd"))
    out = {
        r["g"]: r["s"]
        for r in df.groupBy("g").agg(agg.ndarray_sum(F.col("nd")).alias("s")).collect()
    }
    np.testing.assert_allclose(
        np.array(out[0]["data"]).reshape(2, 3), mats[0] + mats[2]
    )
    np.testing.assert_allclose(
        np.array(out[1]["data"]).reshape(2, 3), mats[1] + mats[3]
    )
    assert out[0]["shape"] == [2, 3]


def test_general_pca(spark):
    import numpy as np

    from hail_spark.matrixtable import ENTRIES, MatrixTable
    from hail_spark.methods.statgen import pca

    rng = np.random.default_rng(8)
    X = rng.normal(size=(50, 6))
    rows = [
        {"vid": i, ENTRIES: [{"x": float(X[i, j])} for j in range(6)]}
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, f"vid int, {ENTRIES} array<struct<x: double>>")
    mt = MatrixTable(df, ("vid",), [{"s": f"S{j}"} for j in range(6)], ("s",))
    evals, scores_df, loadings_df = pca(mt, "x", k=3, compute_loadings=True)
    Xc = X - X.mean(axis=1, keepdims=True)
    want = np.sort(np.linalg.eigvalsh(Xc.T @ Xc))[::-1][:3]
    np.testing.assert_allclose(evals, want, rtol=1e-8)
    S = np.array([r["scores"] for r in scores_df.orderBy("s").collect()])
    np.testing.assert_allclose(np.diag(S.T @ S), want, rtol=1e-6)
    L = np.array([r["loadings"] for r in loadings_df.orderBy("vid").collect()])
    # loadings orthonormal: L^T L = I
    np.testing.assert_allclose(L.T @ L, np.eye(3), atol=1e-8)


def test_counter_ordering_and_weight(spark):
    # ref test_expr.py:552/556 — counter keys; weighted counter sums
    # weights (missing values dropped: Spark maps have no null keys)
    from hail_spark.expr.aggregators import counter

    df = spark.range(10).select((10 - F.col("id")).cast("int").alias("x"))
    m = df.agg(counter(F.col("x")).alias("c")).collect()[0]["c"]
    assert m[10] == 1 and m[1] == 1 and len(m) == 10

    rows = [("rabbit", 0.0), ("rabbit", 0.0), (None, 3.0), ("cat", 2.0), ("dog", 3.0), (None, 0.0)]
    d2 = spark.createDataFrame(rows, "a string, w double")
    m2 = d2.agg(counter(F.col("a"), weight=F.col("w")).alias("c")).collect()[0]["c"]
    assert m2 == {"rabbit": 0.0, "cat": 2.0, "dog": 3.0}


def test_max_min_empty_and_hist_edges(spark):
    # ref test_expr.py:1218/1263-1284 — max/min of all-missing is
    # missing; hist bin edges, -0.0 lands in bin 0, NaN falls nowhere
    from hail_spark.expr import aggregators as agg
    hist, max_, min_ = agg.hist, agg.max, agg.min

    t = spark.range(10).select(
        (-1 * F.col("id") - 5).cast("int").alias("x"),
        F.lit(None).cast("int").alias("y"),
    )
    r = t.agg(
        max_(F.col("x")).alias("mx"), max_(F.col("y")).alias("mxe"),
        min_(F.col("x")).alias("mn"), min_(F.col("y")).alias("mne"),
    ).collect()[0]
    assert (r["mx"], r["mxe"], r["mn"], r["mne"]) == (-5, None, -14, None)

    h = (
        spark.range(11)
        .select((F.col("id") - 1).cast("double").alias("d"))
        .agg(hist(F.col("d"), 0, 8, 4).alias("h"))
        .collect()[0]["h"]
    )
    assert list(h["bin_edges"]) == [0, 2, 4, 6, 8]
    assert list(h["bin_freq"]) == [2, 2, 2, 3]
    assert h["n_smaller"] == 1 and h["n_larger"] == 1

    hn = (
        spark.range(32)
        .select(F.when(F.col("id") == 11, -0.0).otherwise(F.col("id") / 3).alias("d"))
        .agg(hist(F.col("d"), 0, 10, 5).alias("h"))
        .collect()[0]["h"]
    )
    assert list(hn["bin_freq"]) == [7, 5, 6, 6, 7]
    assert hn["n_smaller"] == 0 and hn["n_larger"] == 1

    hnan = (
        spark.range(3)
        .select(F.lit(float("nan")).alias("x"))
        .agg(hist(F.col("x"), 0, 10, 2).alias("h"))
        .collect()[0]["h"]
    )
    assert list(hnan["bin_freq"]) == [0, 0]
    assert hnan["n_smaller"] == 0 and hnan["n_larger"] == 0


def test_agg_combinators(spark):
    # ref test_expr.py:648/839/902 — filter/explode/group_by aggregator
    # combinators
    from hail_spark.expr.aggregators import (
        agg_filter,
        explode_collect,
        explode_count,
        explode_sum,
        group_by,
        sum as agg_sum,
    )

    df = spark.range(6).select(
        F.col("id").cast("int").alias("i"),
        F.sequence(F.lit(0), F.col("id").cast("int")).alias("a"),
    )
    r = df.agg(
        agg_sum(agg_filter(F.col("i") % 2 == 0, F.col("i"))).alias("fsum"),
        explode_sum(F.col("a")).alias("esum"),
        explode_count(F.col("a")).alias("ecnt"),
        explode_collect(F.col("a")).alias("ecol"),
        group_by(F.col("i") % 3, F.col("i"), "collect").alias("g"),
        group_by(F.col("i") % 3, F.col("i"), "sum").alias("gs"),
        group_by(F.col("i") % 3, F.col("i"), "count").alias("gc"),
    ).collect()[0]
    assert r["fsum"] == 0 + 2 + 4
    flat = [x for i in range(6) for x in range(i + 1)]
    assert r["esum"] == float(sum(flat))
    assert r["ecnt"] == len(flat)
    assert sorted(r["ecol"]) == sorted(flat)
    g = {k: sorted(v) for k, v in r["g"].items()}
    assert g == {0: [0, 3], 1: [1, 4], 2: [2, 5]}
    assert r["gs"] == {0: 3.0, 1: 5.0, 2: 7.0}
    assert r["gc"] == {0: 2, 1: 2, 2: 2}


def test_group_by_mean_all_missing_key(spark):
    # ADVICE r2: a key whose every value is missing used to raise ANSI
    # DIVIDE_BY_ZERO in group_by(..., 'mean'); must yield a null mean
    from hail_spark.expr import aggregators as agg

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", None)], ["k", "v"]
    )
    row = df.agg(agg.group_by(F.col("k"), F.col("v"), "mean").alias("m")).collect()[0]
    assert row["m"]["a"] == 2.0
    assert row["m"]["b"] is None


def test_counter_weight_dtype(spark):
    from hail_spark.expr import aggregators as agg

    df = spark.createDataFrame([("F", 120), ("F", 10), ("M", 5)], ["k", "w"])
    dbl = df.agg(agg.counter(F.col("k"), F.col("w")).alias("c")).collect()[0]["c"]
    assert dbl == {"F": 130.0, "M": 5.0}
    big = df.agg(
        agg.counter(F.col("k"), F.col("w"), weight_dtype="bigint").alias("c")
    ).collect()[0]["c"]
    assert big == {"F": 130, "M": 5}
    assert all(isinstance(v, int) for v in big.values())


def test_approx_cdf_struct(spark):
    import numpy as np

    from hail_spark.expr import aggregators as agg

    vals = [float(v) for v in np.random.default_rng(7).normal(size=2000)]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    row = df.agg(agg.approx_cdf(F.col("x"), k=20).alias("c")).collect()[0]["c"]
    assert row["n"] == 2000
    # reference contract (ADVICE r03): ranks is one LONGER than values —
    # ranks[i] ≈ #< values[i], ranks[0] == 0, ranks[-1] == n
    assert len(row["ranks"]) == len(row["values"]) + 1 == 21
    assert row["ranks"][0] == 0 and row["ranks"][-1] == 2000
    assert row["ranks"] == sorted(row["ranks"])
    assert row["values"] == sorted(row["values"])
    assert row["values"][0] == min(vals)
    # values[i] approximates the ranks[i]-th order statistic
    srt = sorted(vals)
    for v, r in zip(row["values"], row["ranks"]):
        lo = srt[max(0, int(r) - 60)]
        hi = srt[min(1999, int(r) + 60)]
        assert lo <= v <= hi
