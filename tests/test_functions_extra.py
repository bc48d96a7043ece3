"""Column-function tests: lower_bound/binary_search, keyed set ops,
min_rep — pure-expression surfaces (ref functions.py:7107/5582/6291)."""

from pyspark.sql import functions as F

from hail_spark.expr.functions import (
    binary_search,
    keyed_intersection,
    keyed_union,
    lower_bound,
    min_rep,
)


def test_lower_bound_and_keyed_ops(spark):
    df = spark.createDataFrame(
        [{
            "arr": [1, 3, 5, 7],
            "a": [{"k": 1, "v": "a"}, {"k": 2, "v": "b"}],
            "b": [{"k": 2, "v": "x"}, {"k": 3, "v": "y"}],
        }],
        "arr array<int>, a array<struct<k:int,v:string>>, b array<struct<k:int,v:string>>",
    )
    r = df.select(
        lower_bound(F.col("arr"), F.lit(4)).alias("lb"),
        lower_bound(F.col("arr"), F.lit(0)).alias("lb0"),
        binary_search(F.col("arr"), F.lit(9)).alias("lb9"),
        keyed_intersection(F.col("a"), F.col("b"), "k").alias("ki"),
        keyed_union(F.col("a"), F.col("b"), "k").alias("ku"),
    ).first()
    assert (r["lb"], r["lb0"], r["lb9"]) == (2, 0, 4)
    assert [e["k"] for e in r["ki"]] == [2] and r["ki"][0]["v"] == "b"  # a-side wins
    assert [e["k"] for e in r["ku"]] == [1, 2, 3]


def test_min_rep(spark):
    cases = [
        # (pos, ref, alt) -> (position, ref, alt)
        (100, "TAA", "TA", 100, "TA", "T"),      # suffix trim
        (100, "ACTG", "ACT", 102, "TG", "T"),    # prefix trim + shift
        (100, "AATT", "AATAT", 102, "T", "TA"),  # both
        (100, "A", "G", 100, "A", "G"),          # SNP unchanged
        (100, "CAG", "CG", 100, "CA", "C"),
    ]
    out = spark.createDataFrame(
        [{"pos": p, "ref": r, "alt": a} for p, r, a, *_ in cases],
        "pos int, ref string, alt string",
    ).select(
        "pos", "ref", "alt",
        min_rep(F.col("pos"), F.col("ref"), F.col("alt")).alias("m"),
    ).collect()
    got = {(r["pos"], r["ref"], r["alt"]): (r["m"]["position"], r["m"]["ref"], r["m"]["alt"])
           for r in out}
    for p, r, a, ep, er, ea in cases:
        assert got[(p, r, a)] == (ep, er, ea)


def test_array_slice_python_semantics(spark):
    # ref test_expr.py:256 — full Python slice semantics including
    # negative indices/steps and out-of-range clamping
    from hail_spark.expr.functions import array_slice

    pa = list(range(100))
    cases = [
        (None, None, 1), (1, 2, 1), (-1, 4, 1), (None, 2, 1),
        (-20, 20, -2), (20, -20, 2), (-20, 20, 2), (20, -20, -2),
        (60, 1, -3), (None, None, 5), (None, None, -3), (None, -77, -3),
        (44, None, -7), (2, 59, 7), (4, 40, 2), (-400, -300, 2),
        (-300, -400, -2), (300, 400, 2), (400, 300, -2), (0, 0, 1),
    ]
    df = spark.createDataFrame([{"a": pa}], "a array<int>")
    sel = df.select(
        *[
            array_slice(F.col("a"), s, e, st).alias(f"x{i}")
            for i, (s, e, st) in enumerate(cases)
        ]
    ).collect()[0]
    for i, (s, e, st) in enumerate(cases):
        assert list(sel[f"x{i}"]) == pa[slice(s, e, st)], (s, e, st)
    # missing array propagates; step 0 raises
    null_row = (
        spark.createDataFrame([{"a": None}], "a array<int>")
        .select(array_slice(F.col("a"), 1, 3).alias("x"))
        .collect()[0]
    )
    assert null_row["x"] is None
    import pytest as _pytest

    with _pytest.raises(ValueError, match="step"):
        array_slice(F.col("a"), 0, 1, 0)


def test_divide_nan_numerator(spark):
    # ADVICE r2: divide(NaN, 0) returned +inf because NaN > 0 under
    # Spark's NaN-greatest ordering; must be NaN
    import math

    from hail_spark.expr import functions as hf

    df = spark.createDataFrame([(float("nan"), 0.0), (1.0, 0.0), (-1.0, 0.0)], ["a", "b"])
    out = [r["d"] for r in df.select(hf.divide(F.col("a"), F.col("b")).alias("d")).collect()]
    assert math.isnan(out[0])
    assert out[1] == float("inf") and out[2] == float("-inf")
