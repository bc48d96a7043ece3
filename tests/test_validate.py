"""Data-quality validation suite (operators/validate.py)."""

import pytest

from hail_spark.operators.validate import validate


def test_all_check_kinds(spark):
    df = spark.createDataFrame(
        [(1, "O", 10.0, "1-URGENT"),
         (2, "F", -5.0, "9-BAD"),
         (2, None, 3.0, "2-HIGH"),
         (4, "X", None, "3-MEDIUM")],
        "id long, status string, price double, prio string",
    )
    ref = spark.createDataFrame([(1,), (2,), (3,)], "rid long")
    out = {(r["check"], r["target"]): r for r in validate(df, [
        {"check": "not_null", "col": "status"},
        {"check": "range", "col": "price", "lo": 0.0},
        {"check": "in_set", "col": "status", "values": ["O", "F", "P"]},
        {"check": "matches", "col": "prio", "pattern": "^[1-5]-"},
        {"check": "unique", "cols": ["id"]},
        {"check": "foreign_key", "cols": ["id"], "ref": ref,
         "ref_cols": ["rid"]},
    ]).collect()}
    assert out[("not_null", "status")]["n_violations"] == 1
    # range: one negative + one NULL both violate
    assert out[("range", "price")]["n_violations"] == 2
    # in_set: NULL and 'X' violate
    assert out[("in_set", "status")]["n_violations"] == 2
    assert out[("matches", "prio")]["n_violations"] == 1
    # unique: the duplicated id=2 contributes BOTH its rows
    assert out[("unique", "id")]["n_violations"] == 2
    # fk: id=4 dangles
    assert out[("foreign_key", "id")]["n_violations"] == 1
    assert all(r["n_rows"] == 4 for r in out.values())
    assert not any(r["passed"] for r in out.values())


def test_passing_and_threshold(spark):
    df = spark.createDataFrame([(i, "ok") for i in range(100)]
                               + [(100, None)], "id long, s string")
    out = {r["check"]: r for r in validate(df, [
        {"check": "unique", "cols": ["id"]},
        {"check": "not_null", "col": "s"},
    ], max_violation_frac=0.02).collect()}
    assert out["unique"]["passed"]
    assert out["not_null"]["n_violations"] == 1 and out["not_null"]["passed"]


def test_validation_errors(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        validate(df, [])
    with pytest.raises(ValueError):
        validate(df, [{"check": "nope", "col": "id"}])


def test_profile_columns(spark):
    import math

    from hail_spark.operators.validate import profile_columns

    df = spark.createDataFrame(
        [(1.0, 10), (2.0, 20), (None, 30), (4.0, 30)], "a double, b long"
    )
    got = {r["column"]: r for r in profile_columns(df, ["a", "b"]).collect()}
    a = got["a"]
    assert (a["n_rows"], a["n_nulls"], a["min"], a["max"]) == (4, 1, 1.0, 4.0)
    assert math.isclose(a["mean"], 7 / 3, rel_tol=1e-8)
    import numpy as np

    assert math.isclose(a["std"], np.std([1.0, 2.0, 4.0]), rel_tol=1e-8)
    assert (a["q1"], a["q2"], a["q3"]) == (1.5, 2.0, 3.0)
    assert a["n_distinct"] == 3
    assert got["b"]["n_distinct"] == 3  # 30 duplicated

    import pytest as _pytest

    with _pytest.raises(ValueError):
        profile_columns(df, [])
