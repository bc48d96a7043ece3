"""Second batch of semantics ports from the reference's table suite
(ref hail/python/test/hail/table/test_table.py — behaviors re-expressed
against this engine's API, not copied): the 4-way null-key join matrix,
group-by with missing keys, transmute field provenance, scan-then-filter
and scan-then-tail ordering, union(unify=True) promotion, take/head key
order, interval product joins, and joins with empty tables."""

import pyspark.sql.functions as F
import pytest

from hail_spark import Table
from hail_spark.operators import scans
from hail_spark.operators.interval_join import interval_join_binned


def _range_table(spark, n, parts=4):
    return Table(spark.range(0, n, numPartitions=parts).select(F.col("id").cast("int").alias("idx")), key=("idx",))


def test_null_joins_four_way(spark):
    # ref test_table.py:1278 — null keys never match but null-keyed rows
    # survive left/right/outer joins
    tr = _range_table(spark, 7, 1)
    t1 = (
        tr.annotate(
            new_key=F.when((F.col("idx") == 3) | (F.col("idx") == 5), F.lit(None).cast("int")).otherwise(F.col("idx")),
            key2=F.lit(1),
        )
        .key_by("new_key", "key2")
        .select(idx1=F.col("idx"))
    )
    t2 = (
        tr.annotate(
            new_key=F.when((F.col("idx") == 4) | (F.col("idx") == 6), F.lit(None).cast("int")).otherwise(F.col("idx")),
            key2=F.lit(1),
        )
        .key_by("new_key", "key2")
        .select(idx2=F.col("idx"))
    )

    def rows(t):
        return sorted(
            ((r["new_key"], r["key2"], r["idx1"], r["idx2"]) for r in t.df.collect()),
            key=lambda x: tuple((v is None, v if v is not None else 0) for v in x),
        )

    def exp(trps):
        return sorted(
            trps, key=lambda x: tuple((v is None, v if v is not None else 0) for v in x)
        )

    assert rows(t1.join(t2, how="left")) == exp(
        [(0, 1, 0, 0), (1, 1, 1, 1), (2, 1, 2, 2), (4, 1, 4, None), (6, 1, 6, None),
         (None, 1, 3, None), (None, 1, 5, None)]
    )
    assert rows(t1.join(t2, how="right")) == exp(
        [(0, 1, 0, 0), (1, 1, 1, 1), (2, 1, 2, 2), (3, 1, None, 3), (5, 1, None, 5),
         (None, 1, None, 4), (None, 1, None, 6)]
    )
    assert rows(t1.join(t2, how="inner")) == exp([(0, 1, 0, 0), (1, 1, 1, 1), (2, 1, 2, 2)])
    assert rows(t1.join(t2, how="outer")) == exp(
        [(0, 1, 0, 0), (1, 1, 1, 1), (2, 1, 2, 2), (3, 1, None, 3), (4, 1, 4, None),
         (5, 1, None, 5), (6, 1, 6, None), (None, 1, 3, None), (None, 1, 5, None),
         (None, 1, None, 4), (None, 1, None, 6)]
    )


def test_group_aggregate_na(spark):
    # ref test_table.py:315 — missing keys aggregate into one NA group
    ht = _range_table(spark, 100, 8).key_by()
    ht = ht.annotate(
        k=F.when(F.col("idx") % 10 == 0, F.col("idx") % 4).otherwise(F.lit(None).cast("int"))
    )
    got = {
        r["k"]: r["n"]
        for r in ht.group_by("k").aggregate(n=F.count(F.lit(1))).df.collect()
    }
    assert got == {0: 5, 2: 5, None: 90}


def test_transmute_drops_referenced_only(spark):
    # ref test_table.py:348/376 — transmute drops referenced non-key inputs
    ht = _range_table(spark, 10).annotate(a=F.col("idx") * 2, b=F.lit(3))
    out = ht.transmute(y=F.col("a") + 2)
    assert set(out.df.columns) == {"idx", "b", "y"}
    # key fields referenced by the expr survive
    out2 = ht.transmute(y=F.col("idx") + 2)
    assert "idx" in out2.df.columns


def test_scan_then_filter(spark):
    # ref test_table.py:434 — scan computed before the filter sees
    # pre-filter positions
    ht = _range_table(spark, 10, 10)
    ht = scans.scan_count(ht, "x")
    got = [r["x"] for r in ht.filter(F.col("idx") == 9).df.collect()]
    assert got == [9]


def test_scan_then_tail(spark):
    # ref test_table.py:440
    ht = _range_table(spark, 100, 16)
    ht = scans.scan_count(ht, "x")
    got = sorted(r["x"] for r in ht.tail(30).df.collect())
    assert got == list(range(70, 100))


def test_take_in_key_order(spark):
    # ref test_table.py:1163 — take follows the (descending-value) key
    ht = _range_table(spark, 20, 2).annotate(rev_idx=-F.col("idx")).key_by("rev_idx")
    got = [(r["idx"], r["rev_idx"]) for r in ht.take(10)]
    assert got == [(idx, -idx) for idx in range(19, 9, -1)]


def test_union_unify(spark):
    # ref test_table.py:1233 — padding, first-occurrence order, numeric
    # promotion int32+float64 → float64
    t1 = _range_table(spark, 2)
    t2 = t1.annotate(x=F.lit(1).cast("int"), y=F.lit("A"))
    t3 = t1.annotate(z=F.array(F.lit(1), F.lit(2), F.lit(3)), x=F.lit(1.5))
    t4 = t1.key_by().annotate(idx=F.col("idx") + 10).key_by("idx")

    u = t1.union(t2, t3, t4, unify=True)
    assert u.df.columns == ["idx", "x", "y", "z"]
    assert dict(u.df.dtypes)["x"] == "double"
    keyf = lambda t: tuple((v is None, str(v)) for v in t)  # noqa: E731
    got = sorted(
        ((r["idx"], r["x"], r["y"], tuple(r["z"]) if r["z"] is not None else None) for r in u.df.collect()),
        key=keyf,
    )
    assert got == sorted(
        [
            (0, None, None, None),
            (0, 1.0, "A", None),
            (0, 1.5, None, (1, 2, 3)),
            (1, None, None, None),
            (1, 1.0, "A", None),
            (1, 1.5, None, (1, 2, 3)),
            (10, None, None, None),
            (11, None, None, None),
        ],
        key=keyf,
    )


def test_union_unify_incompatible_raises(spark):
    t1 = _range_table(spark, 2).annotate(x=F.lit("s"))
    t2 = _range_table(spark, 2).annotate(x=F.lit(1))
    with pytest.raises(ValueError, match="incompatible"):
        t1.union(t2, unify=True)


def test_interval_product_join(spark):
    # ref test_table.py:555 — every point matches exactly the intervals
    # containing it; per-point match multiset is min(idx%10, 10-idx%10)
    left = _range_table(spark, 50, 8)
    iv = _range_table(spark, 25, 1).key_by()
    div5 = (F.col("idx") / 5).cast("int")
    iv = iv.annotate(
        start=1 + div5 * 10 + F.col("idx") % 5,
        end=(1 + div5) * 10 - F.col("idx") % 5,
        i=F.col("idx") % 5,
    ).drop("idx")
    joined = interval_join_binned(
        left, iv, F.col("idx"), bin_width=8, includes_start=True, includes_end=False
    )
    got = {
        r["idx"]: sorted(r["is"])
        for r in joined.df.groupBy("idx").agg(F.collect_list("i").alias("is")).collect()
    }
    for idx in range(50):
        expect = list(range(min(idx % 10, 10 - idx % 10)))
        assert got.get(idx, []) == expect, idx


def test_join_with_empty(spark):
    # ref test_table.py:594 — left join against head(0) keeps all rows
    kt = _range_table(spark, 10)
    kt2 = kt.head(0)
    out = kt.join(kt2.select(foo=F.lit(1)), how="left")
    assert out.count() == 10
    assert all(r["foo"] is None for r in out.df.collect())


def test_index_maintains_count(spark):
    # ref test_table.py:702 — a left join by key never changes row count
    t1 = _range_table(spark, 10, 3)
    t2 = _range_table(spark, 5, 2).annotate(v=F.col("idx") * 10)
    assert t1.join(t2, how="left").count() == t1.count()


def test_explode_on_sorted_set(spark):
    # ref test_table.py:1020 — set explodes to one row per element
    t = _range_table(spark, 1).annotate(
        a=F.array_sort(F.array_distinct(F.array(F.lit("c"), F.lit("a"), F.lit("b"), F.lit("a"))))
    )
    got = sorted((r["idx"], r["a"]) for r in t.explode("a").df.collect())
    assert got == [(0, "a"), (0, "b"), (0, "c")]
