

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
