"""Mergeable HLL distinct sketches (operators/sketches.py)."""

import pytest
from pyspark.sql import functions as F


def test_rollup_equals_exact_in_sparse_regime(spark, sf_dir):
    from hail_spark.operators.sketches import distinct_by_group_with_total

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {
        r["event_type"]: r["n_distinct"]
        for r in distinct_by_group_with_total(ev, "event_type", "user_id").collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact["__all__"] = ev.select("user_id").distinct().count()
    assert got == exact


def test_persisted_sketches_merge_without_rescan(spark, tmp_path):
    """The production shape: per-day sketch tables written to parquet,
    rolled up later by sketch union — result equals the exact distinct
    over the union of days (sparse regime)."""
    from hail_spark.operators.sketches import (
        hll_estimate,
        hll_rollup,
        hll_sketch_by_group,
    )

    rows = [(d, s, f"u{(d * 37 + i) % 500}") for d in range(3)
            for s in ("a", "b") for i in range(200)]
    df = spark.createDataFrame(rows, "day int, src string, user string")
    path = str(tmp_path / "daily_sketches")
    hll_sketch_by_group(df, ["day", "src"], "user").write.mode(
        "overwrite"
    ).partitionBy("day").parquet(path)

    sk = spark.read.parquet(path)
    rolled = {
        r["src"]: r["n_distinct"]
        for r in hll_estimate(hll_rollup(sk, "src")).collect()
    }
    exact = {
        r["src"]: r["n"]
        for r in df.groupBy("src").agg(F.countDistinct("user").alias("n")).collect()
    }
    assert rolled == exact


def test_dense_mode_error_bound(spark):
    """Past the sparse regime the estimate is approximate — assert the
    documented HLL_4 error bound (±1.04/sqrt(2^lgk), take 5 sigma)."""
    from hail_spark.operators.sketches import distinct_by_group_with_total

    n = 200_000
    df = spark.range(n).select(
        F.lit("g").alias("g"), F.concat(F.lit("u"), F.col("id")).alias("u")
    )
    got = {
        r["g"]: r["n_distinct"]
        for r in distinct_by_group_with_total(df, "g", "u", lgk=12).collect()
    }
    rse = 1.04 / (2**12) ** 0.5
    assert abs(got["g"] - n) <= 5 * rse * n
    assert abs(got["__all__"] - n) <= 5 * rse * n


class TestCountMin:
    def test_estimates_upper_bound_and_exact_when_sparse(self, spark):
        from collections import Counter

        from hail_spark.operators.sketches import cms_build, cms_query

        words = (["alpha"] * 50 + ["beta"] * 20 + ["gamma"] * 5
                 + [f"tail{i}" for i in range(30)])
        truth = Counter(words)
        df = spark.createDataFrame([(w,) for w in words], "tok string")
        sk = cms_build(df, "tok", width=2048, depth=4)
        keys = spark.createDataFrame(
            [(w,) for w in truth] + [("missing",)], "tok string"
        )
        est = {r["tok"]: r["est"]
               for r in cms_query(sk, keys, "tok", 2048, 4).collect()}
        assert est["missing"] == 0
        for w, n in truth.items():
            assert est[w] >= n            # CMS never underestimates
        # sparse regime (33 distinct << 2048 buckets): all exact
        assert all(est[w] == n for w, n in truth.items())

    def test_undersized_sketch_overestimates_only(self, spark):
        from collections import Counter

        from hail_spark.operators.sketches import cms_build, cms_query

        words = [f"w{i % 37}" for i in range(500)]
        truth = Counter(words)
        df = spark.createDataFrame([(w,) for w in words], "tok string")
        sk = cms_build(df, "tok", width=8, depth=2)  # forced collisions
        keys = spark.createDataFrame([(w,) for w in truth], "tok string")
        est = {r["tok"]: r["est"]
               for r in cms_query(sk, keys, "tok", 8, 2).collect()}
        assert all(est[w] >= n for w, n in truth.items())
        assert any(est[w] > n for w, n in truth.items())  # collisions real

    def test_merge_is_additive(self, spark):
        from hail_spark.operators.sketches import cms_build, cms_merge, cms_query

        a = spark.createDataFrame([("x",)] * 3 + [("y",)], "tok string")
        b = spark.createDataFrame([("x",)] * 2 + [("z",)], "tok string")
        m = cms_merge(cms_build(a, "tok", 512, 3), cms_build(b, "tok", 512, 3))
        keys = spark.createDataFrame([("x",), ("y",), ("z",)], "tok string")
        est = {r["tok"]: r["est"]
               for r in cms_query(m, keys, "tok", 512, 3).collect()}
        assert est == {"x": 5, "y": 1, "z": 1}
