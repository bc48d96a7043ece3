"""Distributed ordered scans (exclusive prefix aggregations).

Parity target: ``hl.scan.*`` (ref hail/python/hail/expr/aggregators/
aggregators.py:2049-2081; distributed two-pass lowering at
hail/hail/src/is/hail/expr/ir/lowering/LowerTableIR.scala:1284-1560 —
"table_scan_up_pass" / "table_scan_down_pass").

A naive Spark ``Window.orderBy(key)`` with no ``partitionBy`` collapses
to ONE partition — unusable at 100 TB. This module implements the same
two-pass shape Hail uses, entirely with DataFrame ops:

  pass 1 (up):   per-partition partial aggregate (tiny: one row per
                 partition, collected to the driver);
  driver:        exclusive prefix-combine over partition ids (cheap —
                 thousands of rows at most);
  pass 2 (down): broadcast-join the per-partition offsets back and run
                 the scan as a *within-partition* window — each window
                 covers one range-partition, so parallelism is preserved.

Requires the table to be key-sorted (range-partitioned + locally sorted),
which ``Table.key_by`` guarantees; ``spark_partition_id()`` then increases
with the key, exactly like Hail's RVDPartitioner partition index.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..table import Table

_PID = "__scan_pid"
_OFF = "__scan_off"


def _partition_offsets(df: DataFrame, partial: Column, out_type: str) -> DataFrame:
    """Return df + `_PID` column, and a small DataFrame (pid, exclusive
    prefix offset) ready to broadcast-join back."""
    spark = df.sparkSession
    partials = (
        df.groupBy(_PID).agg(partial.alias("p")).collect()
    )
    partials.sort(key=lambda r: r[_PID])
    rows, acc = [], None
    for r in partials:
        rows.append((r[_PID], acc))
        p = r["p"]
        if p is not None:
            acc = p if acc is None else acc + p
    return spark.createDataFrame(rows, schema=f"{_PID} int, {_OFF} {out_type}")


def scan_sum(t: Table, expr: Column, name: str) -> Table:
    """Exclusive running sum in key order (hl.scan.sum parity)."""
    tt = t._ensure_key_sorted()
    df = tt.df.withColumn(_PID, F.spark_partition_id())
    dtype = df.select(expr.alias("x")).schema["x"].dataType.simpleString()
    if dtype in ("int", "bigint", "smallint", "tinyint"):
        out_type = "bigint"
    elif dtype.startswith("decimal"):
        out_type = dtype  # keep exact decimal accumulation
    else:
        out_type = "double"
    off = _partition_offsets(df, F.sum(expr.cast(out_type)), out_type)
    w = (
        Window.partitionBy(_PID)
        .orderBy(*[F.col(k).asc_nulls_last() for k in tt.key])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.sum(expr.cast(out_type)).over(w)
    df = (
        df.join(F.broadcast(off), on=_PID, how="left")
        .withColumn(
            name,
            F.coalesce(
                F.coalesce(local, F.lit(0).cast(out_type))
                + F.coalesce(F.col(_OFF), F.lit(0).cast(out_type)),
                F.lit(0).cast(out_type),
            ),
        )
        .drop(_PID, _OFF)
    )
    return Table(df, tt.key, tt.globals, _sorted=True)


def scan_count(t: Table, name: str) -> Table:
    """Exclusive running count == dense row index (hl.scan.count)."""
    tt = t._ensure_key_sorted()
    df = tt.df.withColumn(_PID, F.spark_partition_id())
    off = _partition_offsets(df, F.count(F.lit(1)), "bigint")
    w = Window.partitionBy(_PID).orderBy(
        *[F.col(k).asc_nulls_last() for k in tt.key]
    )
    df = (
        df.join(F.broadcast(off), on=_PID, how="left")
        .withColumn(
            name,
            (F.row_number().over(w) - 1).cast("bigint")
            + F.coalesce(F.col(_OFF), F.lit(0)),
        )
        .drop(_PID, _OFF)
    )
    return Table(df, tt.key, tt.globals, _sorted=True)


def add_index(t: Table, name: str = "idx") -> Table:
    """Dense 0-based int64 index in key order (Table.add_index parity,
    ref table.py:2870). NOT monotonically_increasing_id (sparse)."""
    return scan_count(t, name)


def prev_nonnull(t: Table, expr: Column, name: str) -> Table:
    """Last non-missing value of `expr` at or before each row, in key
    order (hl.agg.prev_nonnull scan context; ref aggregators.py:1984,
    agg/PrevNonNullAggregator.scala).

    Two-pass: per-partition last non-null (small collect), exclusive
    prefix "last defined wins" on the driver, then a within-partition
    `last(ignorenulls)` window seeded with the broadcast offset.
    """
    tt = t._ensure_key_sorted()
    df = tt.df.withColumn(_PID, F.spark_partition_id())
    spark = df.sparkSession
    field_t = df.select(expr.alias("x")).schema["x"].dataType.simpleString()
    # last non-null *in key order*: max_by over the key struct, restricted
    # to rows where expr is defined (groupBy last() has no order guarantee)
    order_key = F.when(
        expr.isNotNull(), F.struct(*[F.col(k) for k in tt.key])
    )
    partials = df.groupBy(_PID).agg(F.max_by(expr, order_key).alias("p")).collect()
    partials.sort(key=lambda r: r[_PID])
    rows, carry = [], None
    for r in partials:
        rows.append((r[_PID], carry))
        if r["p"] is not None:
            carry = r["p"]
    off = spark.createDataFrame(rows, schema=f"{_PID} int, {_OFF} {field_t}")
    w = (
        Window.partitionBy(_PID)
        .orderBy(*[F.col(k).asc_nulls_last() for k in tt.key])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    df = (
        df.join(F.broadcast(off), on=_PID, how="left")
        .withColumn(name, F.coalesce(F.last(expr, ignorenulls=True).over(w), F.col(_OFF)))
        .drop(_PID, _OFF)
    )
    return Table(df, tt.key, tt.globals, _sorted=True)


def _scan_assoc(
    t: Table, expr: Column, name: str, aggf, py_combine, spark_combine
) -> Table:
    """Shared two-pass scaffold for associative scans (min/max/...):
    same up/down shape as scan_sum with pluggable combiners."""
    tt = t._ensure_key_sorted()
    df = tt.df.withColumn(_PID, F.spark_partition_id())
    spark = df.sparkSession
    out_type = df.select(expr.alias("x")).schema["x"].dataType.simpleString()
    partials = df.groupBy(_PID).agg(aggf(expr).alias("p")).collect()
    partials.sort(key=lambda r: r[_PID])
    rows, acc = [], None
    for r in partials:
        rows.append((r[_PID], acc))
        if r["p"] is not None:
            acc = r["p"] if acc is None else py_combine(acc, r["p"])
    off = spark.createDataFrame(rows, schema=f"{_PID} int, {_OFF} {out_type}")
    w = (
        Window.partitionBy(_PID)
        .orderBy(*[F.col(k).asc_nulls_last() for k in tt.key])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = aggf(expr).over(w)
    df = (
        df.join(F.broadcast(off), on=_PID, how="left")
        .withColumn(name, spark_combine(local, F.col(_OFF)))
        .drop(_PID, _OFF)
    )
    return Table(df, tt.key, tt.globals, _sorted=True)


def scan_min(t: Table, expr: Column, name: str) -> Table:
    """Exclusive running min in key order (hl.scan.min parity).
    `least` skips NULLs, so the first row's scan is missing — matching
    Hail's empty-prefix semantics."""
    return _scan_assoc(t, expr, name, F.min, min, F.least)


def scan_max(t: Table, expr: Column, name: str) -> Table:
    """Exclusive running max (hl.scan.max parity)."""
    return _scan_assoc(t, expr, name, F.max, max, F.greatest)


def scan_mean(t: Table, expr: Column, name: str) -> Table:
    """Exclusive running mean = running sum / running count over
    *defined* values (hl.scan.mean parity)."""
    tmp_s, tmp_n = f"__{name}_s", f"__{name}_n"
    t2 = scan_sum(t, F.when(expr.isNotNull(), expr.cast("double")).otherwise(F.lit(None)), tmp_s)
    t3 = _scan_assoc(
        t2,
        F.when(expr.isNotNull(), F.lit(1).cast("bigint")),
        tmp_n,
        F.sum,
        lambda a, b: a + b,
        lambda loc, off: F.coalesce(loc, F.lit(0)) + F.coalesce(off, F.lit(0)),
    )
    df = t3.df.withColumn(
        name, F.col(tmp_s) / F.nullif(F.col(tmp_n), F.lit(0))
    ).drop(tmp_s, tmp_n)
    return Table(df, t3.key, t3.globals, _sorted=True)
