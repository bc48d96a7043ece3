"""Second batch of MatrixTable semantics ports (ref hail/python/test/
hail/matrixtable/test_matrix_table.py — behaviors re-expressed against
this engine's API): head/tail row+col slicing, explode_rows /
explode_cols, distinct_by_row / distinct_by_col, collect_cols_by_key,
and key-field explode errors."""

import pyspark.sql.functions as F
import pytest

from hail_spark.matrixtable import ENTRIES, MatrixTable, range_matrix_table


def _mt(spark, n_rows=4, n_cols=4):
    """range MT with entry e = row_idx*10 + col_idx (the reference
    tests' standard fixture)."""
    mt = range_matrix_table(spark, n_rows, n_cols)
    df = mt._df.withColumn(
        ENTRIES,
        F.transform(
            F.sequence(F.lit(0), F.lit(n_cols - 1)),
            lambda j: F.struct((F.col("row_idx") * 10 + j).cast("int").alias("e")),
        ),
    )
    return MatrixTable(df, mt.row_key, mt._cols, mt.col_key)


def test_range_mt_shape(spark):
    # ref test_matrix_table.py:35
    mt = range_matrix_table(spark, 10, 10)
    assert mt.count() == (10, 10)


def test_head_rows_and_cols(spark):
    # ref test_matrix_table.py:117-128
    mt = range_matrix_table(spark, 10, 10)
    assert mt.head(1, 2).count() == (1, 2)
    assert mt.head(1, None).count() == (1, 10)
    assert mt.head(None, 1).count() == (10, 1)


def test_tail_rows_and_cols(spark):
    mt = _mt(spark, 10, 10)
    t = mt.tail(3, 2)
    assert t.count() == (3, 2)
    assert sorted(r["row_idx"] for r in t._df.collect()) == [7, 8, 9]
    assert [c["col_idx"] for c in t._cols] == [8, 9]


def test_explode_rows(spark):
    # ref test_matrix_table.py:341 — [1] explodes to self; empty/missing
    # drop rows; range(0, row_idx) gives 0+1+2+3 = 6 rows
    mt = _mt(spark, 4, 4)
    same = mt.annotate_rows(x=F.array(F.lit(1))).explode_rows("x").drop("x")
    assert same.count() == mt.count()
    assert mt.annotate_rows(x=F.array().cast("array<int>")).explode_rows("x").count_rows() == 0
    assert (
        mt.annotate_rows(x=F.lit(None).cast("array<int>")).explode_rows("x").count_rows() == 0
    )
    exploded = mt.annotate_rows(
        x=F.when(F.col("row_idx") > 0, F.sequence(F.lit(0), F.col("row_idx") - 1)).otherwise(
            F.array().cast("array<bigint>")
        )
    ).explode_rows("x")
    assert exploded.count_rows() == 6
    # entries ride along unchanged
    r = exploded._df.filter((F.col("row_idx") == 2) & (F.col("x") == 1)).collect()[0]
    assert [e["e"] for e in r[ENTRIES]] == [20, 21, 22, 23]


def test_explode_rows_key_errors(spark):
    # ref test_matrix_table.py:363
    mt = _mt(spark, 2, 2)
    with pytest.raises(ValueError):
        mt.explode_rows("row_idx")


def test_explode_cols(spark):
    # ref test_matrix_table.py:353/434 — col field [1],[2,3],[4,5,6]
    # explodes 3 cols into 6; entries duplicate per source column
    mt = _mt(spark, 3, 3)
    col_vals = {0: [1], 1: [2, 3], 2: [4, 5, 6]}
    mt = mt.annotate_cols(lambda c: {**c, "foo": col_vals[c["col_idx"]]})
    ex = mt.explode_cols("foo")
    assert ex.count_cols() == 6
    assert [c["foo"] for c in ex._cols] == [1, 2, 3, 4, 5, 6]
    assert [c["col_idx"] for c in ex._cols] == [0, 1, 1, 2, 2, 2]
    r1 = ex._df.filter(F.col("row_idx") == 1).collect()[0]
    # entry e follows the SOURCE column: col 1 duplicated twice, col 2 thrice
    assert [e["e"] for e in r1[ENTRIES]] == [10, 11, 11, 12, 12, 12]
    # bar = row_idx * foo reproduces the reference's collect_cols_by_key
    # entry table
    ex2 = ex.annotate_entries_with_cols(
        lambda e, c: {"bar": (F.col("row_idx") * c["foo"]).cast("int")}
    )
    r2 = ex2._df.filter(F.col("row_idx") == 2).collect()[0]
    assert [e["bar"] for e in r2[ENTRIES]] == [2, 4, 6, 8, 10, 12]


def test_explode_cols_empty_drops_column(spark):
    mt = _mt(spark, 2, 3)
    col_vals = {0: [1], 1: [], 2: None}
    mt = mt.annotate_cols(lambda c: {**c, "foo": col_vals[c["col_idx"]]})
    ex = mt.explode_cols("foo")
    assert ex.count_cols() == 1
    r = ex._df.filter(F.col("row_idx") == 1).collect()[0]
    assert [e["e"] for e in r[ENTRIES]] == [10]


def test_distinct_by_row_counts(spark):
    # ref test_matrix_table.py:739
    mt = _mt(spark, 10, 10)
    halved = mt.annotate_rows(half=(F.col("row_idx") / 2).cast("int")).key_rows_by("half")
    assert halved.distinct_by_row().count_rows() == 5
    u = mt.union_rows(mt)
    assert u.distinct_by_row().count_rows() == 10


def test_distinct_by_col(spark):
    # ref test_matrix_table.py:746 — col key halved → 5 cols, first kept
    mt = _mt(spark, 4, 10)
    mt2 = MatrixTable(
        mt._df,
        mt.row_key,
        [{"col_idx": c["col_idx"] // 2, "orig": c["col_idx"]} for c in mt._cols],
        ("col_idx",),
    )
    d = mt2.distinct_by_col()
    assert d.count_cols() == 5
    assert [c["orig"] for c in d._cols] == [0, 2, 4, 6, 8]
    r = d._df.filter(F.col("row_idx") == 3).collect()[0]
    assert [e["e"] for e in r[ENTRIES]] == [30, 32, 34, 36, 38]


def test_collect_cols_by_key(spark):
    # ref test_matrix_table.py:434 — grouped cols gather entry values
    # into arrays per (row, col-key)
    mt = _mt(spark, 3, 3)
    col_vals = {0: [1], 1: [2, 3], 2: [4, 5, 6]}
    mt = mt.annotate_cols(lambda c: {**c, "foo": col_vals[c["col_idx"]]})
    ex = mt.explode_cols("foo")
    ex = ex.annotate_entries_with_cols(
        lambda e, c: {"bar": (F.col("row_idx") * c["foo"]).cast("int")}
    )
    grouped = ex.collect_cols_by_key()
    assert grouped.count_cols() == 3
    got_cols = {tuple(c[k] for k in grouped.col_key): c for c in grouped._cols}
    assert [got_cols[(j,)]["foo"] for j in range(3)] == [[1], [2, 3], [4, 5, 6]]
    rows = {r["row_idx"]: r for r in grouped._df.collect()}
    bars = {
        (i, j): list(rows[i][ENTRIES][j]["bar"]) for i in range(3) for j in range(3)
    }
    assert bars[(0, 0)] == [0] and bars[(0, 2)] == [0, 0, 0]
    assert bars[(1, 1)] == [2, 3] and bars[(2, 2)] == [8, 10, 12]
