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
