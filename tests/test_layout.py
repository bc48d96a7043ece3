"""Z-order layout key (io/layout.py)."""

import pytest
from pyspark.sql import functions as F

from hail_spark.io.layout import zorder_by, zorder_interleave


def test_interleave_known_bits(spark):
    df = spark.createDataFrame([(3, 0), (0, 3), (3, 3), (0, 0)], "x long, y long")
    got = [
        r["z"]
        for r in df.select(
            zorder_interleave([F.col("x"), F.col("y")], bits=4).alias("z")
        ).collect()
    ]
    # x bits land at even positions, y at odd: x=0b11 -> 0b0101 = 5,
    # y=0b11 -> 0b1010 = 10, both -> 15
    assert got == [5, 10, 15, 0]


def test_interleave_validation(spark):
    with pytest.raises(ValueError):
        zorder_interleave([], bits=4)
    with pytest.raises(ValueError):
        zorder_interleave([F.col("x")] * 3, bits=30)  # 90 > 60


def test_zorder_locality_beats_single_column_sort(spark, sf_dir):
    """The point of the layout: range-bucketing by z gives BOTH columns
    bounded per-bucket spans; bucketing by one column leaves the other
    column's span at ~full range (useless min/max stats)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey"
    )
    z = zorder_by(li, ["l_partkey", "l_suppkey"], bits=12)
    from pyspark.sql import Window as W

    def avg_span(df, order_col):
        b = df.withColumn(
            "b", F.ntile(16).over(W.orderBy(order_col))
        )
        spans = b.groupBy("b").agg(
            (F.max("l_suppkey") - F.min("l_suppkey")).alias("s_span"),
            (F.max("l_partkey") - F.min("l_partkey")).alias("p_span"),
        )
        r = spans.agg(F.avg("s_span"), F.avg("p_span")).collect()[0]
        return r[0], r[1]

    s_span_z, p_span_z = avg_span(z, "__z")
    s_span_p, p_span_p = avg_span(z, "l_partkey")
    # partkey-sorted: partkey span tiny but suppkey span ~ full range
    assert p_span_p < p_span_z
    # z-sorted: the suppkey span collapses vs the single-column layout
    assert s_span_z < 0.5 * s_span_p
    # and partkey locality is still far better than unsorted (full range)
    full_p = li.agg(F.max("l_partkey") - F.min("l_partkey")).collect()[0][0]
    assert p_span_z < 0.5 * full_p


def test_zorder_constant_column(spark):
    df = spark.createDataFrame([(1, 7), (2, 7), (3, 7)], "x long, y long")
    out = zorder_by(df, ["x", "y"], bits=8)
    zs = sorted(r["__z"] for r in out.collect())
    assert zs[0] == 0  # min x, constant y -> grid (0, 0)
    assert len(set(zs)) == 3  # x still distinguishes


def test_zorder_repartition_ranges_disjoint(spark):
    rows = [(i, (i * 37) % 101) for i in range(1000)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = zorder_by(df, ["x", "y"], bits=10, n_partitions=8)
    assert out.rdd.getNumPartitions() == 8
    parts = out.select("__z").rdd.mapPartitions(
        lambda it: [[min(r["__z"] for r in rows), max(r["__z"] for r in rows)]
                    if (rows := list(it)) else None]
    ).collect()
    parts = sorted(p for p in parts if p)
    for (lo1, hi1), (lo2, hi2) in zip(parts, parts[1:]):
        assert hi1 <= lo2  # range partitions are disjoint in z
