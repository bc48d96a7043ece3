"""Distribution samplers (ref test strategy: moment/shape checks over
hash-seeded deterministic draws; determinism across re-evaluation)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hail_spark.expr import functions as hf

N = 20000


@pytest.fixture(scope="module")
def uids(spark):
    return spark.range(N).withColumnRenamed("id", "uid")


def _draws(df, col):
    return np.array([r["x"] for r in df.select(col.alias("x")).collect()])


def test_rand_pois_scalar(uids):
    x = _draws(uids, hf.rand_pois(F.col("uid"), 4.0, seed=1))
    assert abs(x.mean() - 4.0) < 0.1
    assert abs(x.var() - 4.0) < 0.3
    assert x.min() >= 0 and x.dtype.kind in "iu" or np.allclose(x, x.astype(int))


def test_rand_pois_column_lambda(uids):
    df = uids.withColumn("lam", (F.col("uid") % 3 + 1).cast("double"))
    x = np.array(
        [
            (r["lam"], r["x"])
            for r in df.select(
                "lam", hf.rand_pois(F.col("uid"), F.col("lam"), seed=2).alias("x")
            ).collect()
        ]
    )
    for lam in (1.0, 2.0, 3.0):
        sel = x[x[:, 0] == lam, 1]
        assert abs(sel.mean() - lam) < 0.15


def test_rand_gamma_moments(uids):
    x = _draws(uids, hf.rand_gamma(F.col("uid"), 3.0, 2.0, seed=3))
    assert abs(x.mean() - 6.0) < 0.15  # mean = shape*scale
    assert abs(x.var() - 12.0) < 1.0  # var = shape*scale^2
    assert (x > 0).all()


def test_rand_gamma_small_shape(uids):
    x = _draws(uids, hf.rand_gamma(F.col("uid"), 0.5, 1.0, seed=4))
    assert abs(x.mean() - 0.5) < 0.05
    assert (x > 0).all()


def test_rand_beta_moments(uids):
    a, b = 2.0, 5.0
    x = _draws(uids, hf.rand_beta(F.col("uid"), a, b, seed=5))
    assert ((x > 0) & (x < 1)).all()
    assert abs(x.mean() - a / (a + b)) < 0.01
    want_var = a * b / ((a + b) ** 2 * (a + b + 1))
    assert abs(x.var() - want_var) < 0.005


def test_rand_cat(uids):
    probs = [0.2, 0.5, 0.3]
    x = _draws(uids, hf.rand_cat(F.col("uid"), probs, seed=6))
    counts = np.bincount(x.astype(int), minlength=3) / N
    np.testing.assert_allclose(counts, probs, atol=0.02)


def test_rand_dirichlet(uids):
    alphas = [1.0, 2.0, 3.0]
    rows = (
        uids.select(hf.rand_dirichlet(F.col("uid"), alphas, seed=7).alias("x"))
        .collect()
    )
    arr = np.array([r["x"] for r in rows])
    np.testing.assert_allclose(arr.sum(axis=1), 1.0, atol=1e-9)
    np.testing.assert_allclose(arr.mean(axis=0), np.array(alphas) / 6.0, atol=0.02)


def test_rand_hyper(uids):
    # 7 good, 3 bad, draw 5 → mean = 5*7/10 = 3.5
    small = uids.limit(4000)
    x = _draws(small, hf.rand_hyper(F.col("uid"), 7, 3, 5, seed=8))
    assert abs(x.mean() - 3.5) < 0.1
    assert x.min() >= 2 and x.max() <= 5  # support [max(0,5-3), min(7,5)]


def test_determinism(uids):
    a1 = _draws(uids.limit(500), hf.rand_gamma(F.col("uid"), 2.0, 1.0, seed=9))
    a2 = _draws(uids.limit(500), hf.rand_gamma(F.col("uid"), 2.0, 1.0, seed=9))
    b = _draws(uids.limit(500), hf.rand_gamma(F.col("uid"), 2.0, 1.0, seed=10))
    np.testing.assert_array_equal(a1, a2)
    assert not np.array_equal(a1, b)
