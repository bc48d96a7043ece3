"""Distributed scan primitive parity (ref LowerTableIR.scala:1284-1560)."""

from pyspark.sql import functions as F

from hail_spark import Table
from hail_spark.operators import scans


def test_scan_sum_exclusive(spark):
    t = Table.range(spark, 1000, n_partitions=13)
    out = scans.scan_sum(t, F.col("idx"), "run").collect()
    got = {r["idx"]: r["run"] for r in out}
    acc = 0
    for i in range(1000):
        assert got[i] == acc, f"row {i}"
        acc += i


def test_scan_sum_with_nulls(spark):
    t = Table.parallelize(
        spark,
        [{"k": i, "x": None if i % 3 == 0 else float(i)} for i in range(30)],
        schema="k int, x double",
    ).key_by("k")
    out = {r["k"]: r["run"] for r in scans.scan_sum(t, F.col("x"), "run").collect()}
    acc = 0.0
    for i in range(30):
        assert out[i] == acc
        if i % 3 != 0:
            acc += float(i)


def test_scan_count_dense_index(spark):
    t = Table.range(spark, 500, n_partitions=11)
    out = scans.add_index(t, "i2").collect()
    assert all(r["idx"] == r["i2"] for r in out)


def test_prev_nonnull(spark):
    rows = [{"k": i, "x": (f"v{i}" if i % 4 == 0 else None)} for i in range(40)]
    t = Table.parallelize(spark, rows, schema="k int, x string").key_by("k")
    out = {r["k"]: r["p"] for r in scans.prev_nonnull(t, F.col("x"), "p").collect()}
    for i in range(40):
        expect = f"v{(i // 4) * 4}"
        assert out[i] == expect


def test_scan_min_max_mean(spark):
    import math
    from hail_spark.operators.scans import scan_max, scan_mean, scan_min
    from hail_spark.table import Table

    vals = [5.0, 3.0, None, 8.0, 1.0, None, 9.0, 2.0]
    t = Table.parallelize(
        spark,
        [{"k": i, "v": v} for i, v in enumerate(vals)],
        "k int, v double",
        key=("k",),
    ).repartition(3)
    t = t.key_by("k")
    out = scan_mean(scan_max(scan_min(t, F.col("v"), "mn"), F.col("v"), "mx"), F.col("v"), "avg")
    rows = {r["k"]: r for r in out.df.collect()}
    # exclusive-prefix oracle in python
    def prefix(i, fn):
        seen = [x for x in vals[:i] if x is not None]
        return fn(seen) if seen else None
    for i in range(len(vals)):
        assert rows[i]["mn"] == prefix(i, min), i
        assert rows[i]["mx"] == prefix(i, max), i
        want = prefix(i, lambda s: sum(s) / len(s))
        got = rows[i]["avg"]
        assert (got is None and want is None) or math.isclose(got, want), i
