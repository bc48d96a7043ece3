"""Core Table operator semantics (parity cases modeled on the reference's
hail/python/test/hail/table/test_table.py)."""

import math

import pytest
from pyspark.sql import functions as F

from hail_spark import Table, agg, asc, desc, hf


def test_range_and_count(spark):
    t = Table.range(spark, 100, n_partitions=7)
    assert t.count() == 100
    assert t.key == ("idx",)


def test_filter_missing_drops(spark):
    t = Table.parallelize(
        spark,
        [{"id": 1, "x": 5}, {"id": 2, "x": None}, {"id": 3, "x": 1}],
        schema="id int, x int",
        key=["id"],
    )
    # x > 2 is missing for id=2 → row dropped (Hail semantics)
    assert t.filter(F.col("x") > 2).count() == 1
    # keep=False also drops the missing row
    assert t.filter(F.col("x") > 2, keep=False).count() == 1


def test_annotate_select_drop(spark):
    t = Table.range(spark, 10).annotate(y=F.col("idx") * 2)
    assert t.row == ("idx", "y")
    t2 = t.select("y")
    assert t2.row == ("idx", "y")  # key kept
    t3 = t.drop("y")
    assert t3.row == ("idx",)


def test_key_by_sorts(spark):
    t = Table.parallelize(
        spark,
        [{"k": 3}, {"k": 1}, {"k": None}, {"k": 2}],
        schema="k int",
    ).key_by("k")
    vals = [r["k"] for r in t.collect()]
    assert vals == [1, 2, 3, None]  # missing last


def test_join_null_keys_never_match(spark):
    left = Table.parallelize(
        spark,
        [{"k": 1, "a": 10}, {"k": None, "a": 20}],
        schema="k int, a int",
        key=["k"],
    )
    right = Table.parallelize(
        spark,
        [{"k": 1, "b": 100}, {"k": None, "b": 200}],
        schema="k int, b int",
        key=["k"],
    )
    inner = left.join(right, "inner")
    assert inner.count() == 1
    outer = left.join(right, "outer")
    assert outer.count() == 3


def test_join_collision_suffix(spark):
    left = Table.parallelize(
        spark, [{"k": 1, "v": 1}], schema="k int, v int", key=["k"]
    )
    right = Table.parallelize(
        spark, [{"k": 1, "v": 9}], schema="k int, v int", key=["k"]
    )
    j = left.join(right)
    assert set(j.row) == {"k", "v", "v_1"}


def test_semi_anti(spark):
    a = Table.range(spark, 10)
    b = Table.range(spark, 5)
    assert a.semi_join(b).count() == 5
    assert a.anti_join(b).count() == 5


def test_group_by_aggregate(spark):
    t = Table.parallelize(
        spark,
        [{"g": "a", "x": 1}, {"g": "a", "x": 2}, {"g": "b", "x": None}],
        schema="g string, x int",
    )
    out = {
        r["g"]: (r["n"], r["s"])
        for r in t.group_by("g").aggregate(n=agg.count(), s=agg.sum("x")).collect()
    }
    assert out == {"a": (2, 3), "b": (1, None)}


def test_aggregate_whole_table(spark):
    t = Table.range(spark, 100)
    res = t.aggregate(
        n=agg.count(),
        s=agg.sum("idx"),
        m=agg.mean("idx"),
        mx=agg.max("idx"),
        frac=agg.fraction(F.col("idx") % 2 == 0),
    )
    assert res["n"] == 100 and res["s"] == 4950 and res["mx"] == 99
    assert res["m"] == pytest.approx(49.5)
    assert res["frac"] == pytest.approx(0.5)


def test_counter_take_by_stats(spark):
    t = Table.parallelize(
        spark,
        [{"g": "a"}, {"g": "b"}, {"g": "a"}, {"g": None}],
        schema="g string",
    )
    res = t.aggregate(c=agg.counter("g"))
    assert res["c"] == {"a": 2, "b": 1}
    t2 = Table.range(spark, 10)
    res2 = t2.aggregate(top3=agg.take_by("idx", F.col("idx"), 3, ascending=False))
    assert res2["top3"] == [9, 8, 7]
    res3 = t2.aggregate(st=agg.stats("idx"))
    assert res3["st"]["n"] == 10 and res3["st"]["min"] == 0 and res3["st"]["max"] == 9


def test_min_max_nan(spark):
    t = Table.parallelize(
        spark,
        [{"x": 1.0}, {"x": float("nan")}, {"x": 3.0}, {"x": None}],
        schema="x double",
    )
    res = t.aggregate(mn=agg.min_nan("x"), mx=agg.max_nan("x"), m=agg.min("x"))
    assert math.isnan(res["mn"]) and math.isnan(res["mx"])
    assert res["m"] == 1.0  # spark min ignores NaN? (documents difference)


def test_order_by(spark):
    t = Table.parallelize(
        spark,
        [{"x": 2, "y": "b"}, {"x": None, "y": "c"}, {"x": 1, "y": "a"}],
        schema="x int, y string",
    )
    xs = [r["x"] for r in t.order_by("x").collect()]
    assert xs == [1, 2, None]
    xs = [r["x"] for r in t.order_by(desc("x")).collect()]
    assert xs == [None, 2, 1]


def test_explode(spark):
    t = Table.parallelize(
        spark,
        [{"id": 1, "a": [1, 2]}, {"id": 2, "a": []}, {"id": 3, "a": None}],
        schema="id int, a array<int>",
        key=["id"],
    )
    ex = t.explode("a")
    assert ex.count() == 2  # empty + missing drop rows


def test_distinct_union(spark):
    t = Table.parallelize(
        spark,
        [{"k": 1, "v": 1}, {"k": 1, "v": 2}, {"k": 2, "v": 3}],
        schema="k int, v int",
        key=["k"],
    )
    assert t.distinct().count() == 2
    assert t.union(t).count() == 6


def test_add_index_dense(spark):
    t = Table.parallelize(
        spark,
        [{"k": i} for i in [5, 3, 1, 4, 2, 0, 9, 8, 7, 6]],
        schema="k int",
    ).key_by("k")
    rows = t.add_index("i").collect()
    got = {r["k"]: r["i"] for r in rows}
    assert got == {k: k for k in range(10)}


def test_write_read_roundtrip(spark, tmp_path):
    p = str(tmp_path / "t.hst")
    t = Table.range(spark, 50).annotate(y=F.col("idx") * 3)
    t = t.annotate_globals(pop="test")
    t.write(p, overwrite=True)
    t2 = Table.read(spark, p)
    assert t2.count() == 50
    assert t2.key == ("idx",)
    assert t2.globals["pop"] == "test"


def test_collect_by_key(spark):
    t = Table.parallelize(
        spark,
        [{"k": 1, "v": 10}, {"k": 1, "v": 11}, {"k": 2, "v": 20}],
        schema="k int, v int",
        key=["k"],
    )
    rows = {r["k"]: len(r["values"]) for r in t.collect_by_key().collect()}
    assert rows == {1: 2, 2: 1}


def test_head_tail(spark):
    t = Table.range(spark, 100)
    assert t.head(10).count() == 10
    assert t.tail(7).count() == 7


def test_map_partitions_sample_coalesce(spark):
    import pandas as pd
    from hail_spark.table import Table

    t = Table.range(spark, 1000, n_partitions=8)

    def double_batch(batches):
        for pdf in batches:
            yield pd.DataFrame({"idx": pdf["idx"], "twice": pdf["idx"] * 2})

    m = t.map_partitions(double_batch, "idx bigint, twice bigint")
    rows = {r["idx"]: r["twice"] for r in m.df.collect()}
    assert len(rows) == 1000 and rows[7] == 14
    s = t.sample(0.2, seed=1)
    n = s.df.count()
    assert 100 < n < 320  # ~200 expected
    assert s.df.count() == n  # deterministic on recompute
    assert t.naive_coalesce(2).n_partitions == 2


def test_reservoir_and_downsample_and_fold(spark):
    from hail_spark.expr import aggregators as agg
    from hail_spark.table import Table

    t = Table.range(spark, 500)
    r = t.df.agg(agg.reservoir_sample(F.col("idx"), 10, seed=3).alias("s")).first()["s"]
    assert len(r) == 10 and len(set(r)) == 10
    assert all(0 <= v < 500 for v in r)
    r2 = t.df.agg(agg.reservoir_sample(F.col("idx"), 10, seed=3).alias("s")).first()["s"]
    assert r == r2  # deterministic
    d = t.df.agg(
        agg.downsample(F.col("idx") / 500.0, (F.col("idx") % 37) / 37.0, n_divisions=8).alias("d")
    ).first()["d"]
    assert 1 <= len(d) <= 64  # bounded by the 8x8 grid
    f = t.df.agg(
        agg.fold(F.col("idx"), F.lit(0).cast("bigint"), lambda a, x: a + x).alias("f")
    ).first()["f"]
    assert f == 499 * 500 // 2


def test_write_fanout(spark, tmp_path):
    root = str(tmp_path / "fan")
    t = Table.range(spark, 20).annotate(
        a=F.col("idx") * 2, b=F.col("idx") * 3, c=F.lit("x")
    )
    t.write_fanout(root, {"ab": ["a", "b"], "conly": ["c"]}, overwrite=True)
    ab = Table.read(spark, root + "/ab")
    conly = Table.read(spark, root + "/conly")
    assert sorted(ab.df.columns) == ["a", "b", "idx"]
    assert sorted(conly.df.columns) == ["c", "idx"]
    assert ab.count() == 20 and conly.count() == 20
    assert {r["a"] for r in ab.collect()} == {i * 2 for i in range(20)}
