"""Edge-case semantics ported from the reference's test_table.py
contract: missing keys never match in joins, filter drops missing
predicates, explode drops empty/missing arrays, scans on empty tables,
distinct determinism. (ref hail/python/test/hail/table/test_table.py)"""

from pyspark.sql import functions as F

from hail_spark import Table
from hail_spark.operators import scans


def _t(spark, rows, schema, key=()):
    return Table(spark.createDataFrame(rows, schema), key)


def test_join_missing_keys_never_match(spark):
    left = _t(spark, [(1, "a"), (None, "b"), (2, "c")], "k int, v string", ("k",))
    right = _t(spark, [(1, 10), (None, 99), (3, 30)], "k int, w int", ("k",))
    out = left.join(right, how="inner").df.collect()
    assert {(r["k"], r["w"]) for r in out} == {(1, 10)}  # null keys dropped
    louter = left.join(right, how="left").df.collect()
    # the null-key left row survives with missing right fields
    assert {(r["k"], r["w"]) for r in louter} == {(1, 10), (None, None), (2, None)}


def test_filter_missing_predicate_drops(spark):
    t = _t(spark, [(1, 5), (2, None), (3, 7)], "k int, x int", ("k",))
    kept = t.filter(F.col("x") > 4).df.collect()
    assert {r["k"] for r in kept} == {1, 3}  # row with null x dropped, not kept


def test_explode_drops_empty_and_missing(spark):
    t = _t(
        spark,
        [(1, ["a", "b"]), (2, []), (3, None)],
        "k int, xs array<string>",
        ("k",),
    )
    out = t.explode("xs").df.collect()
    assert sorted((r["k"], r["xs"]) for r in out) == [(1, "a"), (1, "b")]


def test_scan_on_empty_table(spark):
    t = _t(spark, [], "k int, x int", ("k",))
    assert scans.scan_sum(t, F.col("x"), "cum").df.count() == 0
    assert scans.add_index(t, "idx").df.count() == 0


def test_scan_sum_skips_missing_values(spark):
    t = _t(spark, [(1, 10), (2, None), (3, 5)], "k int, x int", ("k",))
    rows = {r["k"]: r["cum"] for r in scans.scan_sum(t, F.col("x"), "cum").df.collect()}
    # exclusive prefix; missing contributes nothing (Hail scan semantics)
    assert rows == {1: 0, 2: 10, 3: 10}


def test_semi_anti_with_nulls(spark):
    left = _t(spark, [(1,), (None,), (2,)], "k int", ("k",))
    right = _t(spark, [(1,), (None,)], "k int", ("k",))
    semi = {r["k"] for r in left.semi_join(right).df.collect()}
    anti = {r["k"] for r in left.anti_join(right).df.collect()}
    assert semi == {1}
    # null key is "not present" for matching purposes -> kept by anti
    assert anti == {None, 2}


def test_distinct_deterministic_first_key(spark):
    t = _t(
        spark,
        [(1, "z"), (1, "a"), (2, "m")],
        "k int, v string",
        ("k",),
    )
    out = {r["k"]: r["v"] for r in t.distinct().df.collect()}
    assert set(out) == {1, 2}
    # run twice: the representative must be stable
    out2 = {r["k"]: r["v"] for r in t.distinct().df.collect()}
    assert out == out2
