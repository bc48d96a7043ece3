"""t-digest sketch (operators/tdigest.py): exact-regime equivalence to
the linear order-statistic rule, estimate-regime quantile accuracy and
monotonicity, mergeability across partitionings, and empty-partition
robustness."""

import math

import numpy as np
import pytest

from hail_spark.operators.tdigest import TDigest, tdigest_sketch


def test_exact_regime_matches_numpy_linear():
    rng = np.random.RandomState(7)
    vals = rng.lognormal(0, 2, size=150)
    sk = TDigest(compression=256).update(vals)
    assert sk.is_exact()
    for q in (0.0, 0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0):
        want = float(np.quantile(vals, q))  # numpy 'linear' rule
        assert math.isclose(sk.quantile(q), want, rel_tol=1e-12), q


def test_estimate_regime_rank_accuracy_and_monotonic():
    rng = np.random.RandomState(11)
    vals = np.sort(rng.exponential(size=50_000))
    sk = TDigest(compression=100).update(vals)
    assert not sk.is_exact()
    assert len(sk.centroids()[0]) <= 3 * 100
    prev = -np.inf
    for q in np.linspace(0.001, 0.999, 41):
        est = sk.quantile(q)
        assert est >= prev  # quantiles monotone in q
        prev = est
        # rank error: position of the estimate within the sorted data
        # must be within a few percent of q*n (uniform-bound digest)
        rank = np.searchsorted(vals, est) / vals.size
        assert abs(rank - q) < 0.03, (q, rank)
    assert sk.quantile(0.0) == float(vals.min())
    assert sk.quantile(1.0) == float(vals.max())


def test_merge_matches_single_digest_in_exact_regime():
    rng = np.random.RandomState(3)
    vals = rng.normal(size=120)
    whole = TDigest(compression=256).update(vals)
    a = TDigest(compression=256).update(vals[:40])
    b = TDigest(compression=256).update(vals[40:90])
    c = TDigest(compression=256).update(vals[90:])
    merged = a.merge(b).merge(c)
    assert merged.is_exact() and merged.n == 120
    for q in (0.1, 0.5, 0.9):
        assert math.isclose(
            merged.quantile(q), whole.quantile(q), rel_tol=1e-12
        )


def test_weight_bound_holds():
    rng = np.random.RandomState(5)
    sk = TDigest(compression=50).update(rng.uniform(size=20_000))
    _, w = sk.centroids()
    assert int(w.sum()) == 20_000
    assert w.max() <= math.ceil(20_000 / 50) + 1


def test_distributed_sketch_matches_driver(spark):
    rows = [(float(i % 97) + 0.5,) for i in range(97)]
    df = spark.createDataFrame(rows, "v double").repartition(8)
    sk = tdigest_sketch(df, "v", compression=256)
    assert sk.is_exact() and sk.n == 97
    vals = np.array([r[0] for r in rows])
    for q in (0.05, 0.5, 0.95):
        assert math.isclose(
            sk.quantile(q), float(np.quantile(vals, q)), rel_tol=1e-12
        )


def test_distributed_handles_empty_partitions_and_nulls(spark):
    df = spark.createDataFrame(
        [(1.0,), (2.0,), (None,), (3.0,)], "v double"
    ).repartition(16)  # most partitions empty
    sk = tdigest_sketch(df, "v", compression=64)
    assert sk.n == 3
    assert sk.quantile(0.5) == 2.0
