"""Round-7 fuzzy_join hardening: low-entropy guard + strip_pattern."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from hail_spark.operators.relational import fuzzy_join


def _ids(spark, n, prefix="Customer#"):
    rows = [(i, f"{prefix}{i:09d}") for i in range(n)]
    return spark.createDataFrame(rows, "id long, name string")


def test_fuzzy_join_diverse_keys_unaffected(spark):
    words = ["apple", "applx", "banana", "bananna", "cherry", "grape"]
    l = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "left_id long, w string"
    )
    r = spark.createDataFrame(
        [(100 + i, w) for i, w in enumerate(["apple", "banana", "pear"])],
        "right_id long, w string",
    )
    out = fuzzy_join(l, r, "w", max_dist=1)
    got = {(row["left_id"], row["right_id"]): row["dist"] for row in out.collect()}
    assert got == {(0, 100): 0, (1, 100): 1, (2, 101): 0, (3, 101): 1}


def test_fuzzy_join_low_entropy_raises_loudly(spark):
    df = _ids(spark, 400)
    l = df.withColumnRenamed("id", "left_id")
    r = df.withColumnRenamed("id", "right_id")
    with pytest.raises(Exception, match="strip_pattern"):
        fuzzy_join(
            l, r, "name", max_dist=1, max_candidates_per_segment=10_000
        ).count()


def test_fuzzy_join_strip_pattern_fixes_low_entropy(spark):
    df = _ids(spark, 400)
    l = df.withColumnRenamed("id", "left_id")
    r = df.withColumnRenamed("id", "right_id")
    out = fuzzy_join(
        l,
        r,
        "name",
        max_dist=1,
        strip_pattern="^Customer#",
        max_candidates_per_segment=200_000,
    )
    rows = out.collect()
    # every id matches itself at dist 0 on the stripped key
    self_pairs = {(x["left_id"], x["right_id"]) for x in rows if x["dist"] == 0}
    assert self_pairs == {(i, i) for i in range(400)}
    # and near-ids at dist 1 exist (e.g. ...001 vs ...002)
    assert any(x["dist"] == 1 for x in rows)


def test_fuzzy_join_guard_disabled_still_exact(spark):
    df = _ids(spark, 60)
    l = df.withColumnRenamed("id", "left_id")
    r = df.withColumnRenamed("id", "right_id")
    out = fuzzy_join(
        l, r, "name", max_dist=1, max_candidates_per_segment=None
    )
    dists = {(x["left_id"], x["right_id"]): x["dist"] for x in out.collect()}
    assert all(dists[(i, i)] == 0 for i in range(60))
