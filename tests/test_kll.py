"""KLL sketch (operators/kll.py — ApproxCDFAggregator parity): rank
accuracy vs exact order statistics, merge associativity, and the
distributed mapInPandas + driver-merge path."""

import numpy as np
import pytest

from hail_spark.operators.kll import KLLSketch, approx_cdf_kll


def test_kll_rank_accuracy_and_merge():
    rng = np.random.default_rng(5)
    data = rng.normal(size=200_000)
    sk = KLLSketch(k=200)
    for chunk in np.array_split(data, 37):
        sk.update(chunk)
    srt = np.sort(data)
    cdf = sk.cdf()
    assert cdf["n"] == 200_000 and cdf["ranks"][-1] == 200_000
    vals = np.asarray(cdf["values"])
    ranks = np.asarray(cdf["ranks"][:-1])
    assert (vals == np.sort(vals)).all()
    err = np.abs(ranks - np.searchsorted(srt, vals, side="left")).max() / 200_000
    assert err < 0.02
    # space stays O(k) regardless of n
    assert sum(lv.size for lv in sk.levels) < 3 * 200 + 50

    a, b = KLLSketch(200), KLLSketch(200)
    a.update(data[:100_000])
    b.update(data[100_000:])
    a.merge(b)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        true_rank = np.searchsorted(srt, a.quantile(q)) / 200_000
        assert abs(true_rank - q) < 0.02
    assert a.quantile(0.0) == data.min() and a.quantile(1.0) == data.max()


def test_kll_nan_and_empty():
    sk = KLLSketch(50)
    sk.update([float("nan"), float("nan")])
    assert sk.cdf() == {"values": [], "ranks": [0], "n": 0}
    sk.update([3.0, float("nan"), 1.0])
    assert sk.cdf()["n"] == 2 and sk.min == 1.0 and sk.max == 3.0


def test_approx_cdf_kll_distributed(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet").repartition(8)
    cdf = approx_cdf_kll(df, "value", k=200)
    n = df.filter(df["value"].isNotNull()).count()
    assert cdf["n"] == n and cdf["ranks"][-1] == n
    exact = np.sort(
        np.asarray([r["value"] for r in df.select("value").collect() if r["value"] is not None])
    )
    vals = np.asarray(cdf["values"])
    ranks = np.asarray(cdf["ranks"][:-1])
    err = np.abs(ranks - np.searchsorted(exact, vals, side="left")).max() / max(n, 1)
    assert err < 0.02
