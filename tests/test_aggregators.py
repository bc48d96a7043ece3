

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
