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


# --------------------------------------------------------------------- #
# full hl.scan.* generality (ref aggregators.py:2049-2081: every
# aggregator has a scan form). Struct-/array-typed states use the same
# two-pass shape: bounded per-partition partials to the driver, python
# exclusive prefix-combine, broadcast back, within-partition window.
# --------------------------------------------------------------------- #
def _key_struct(tt: Table) -> Column:
    return F.struct(*[F.col(k) for k in tt.key])


def _excl_window(tt: Table):
    return (
        Window.partitionBy(_PID)
        .orderBy(*[F.col(k).asc_nulls_last() for k in tt.key])
        .rowsBetween(Window.unboundedPreceding, -1)
    )


def _scan_state(t: Table, partial: Column, py_combine, state_schema: str):
    """Common up-pass: returns (sorted table, df+_PID, offsets df).
    `partial` must be a per-partition aggregate Column whose collected
    value py_combine can fold left-to-right in partition order."""
    tt = t._ensure_key_sorted()
    df = tt.df.withColumn(_PID, F.spark_partition_id())
    spark = df.sparkSession
    partials = df.groupBy(_PID).agg(partial.alias("p")).collect()
    partials.sort(key=lambda r: r[_PID])
    rows, acc = [], None
    for r in partials:
        rows.append((r[_PID], acc))
        p = r["p"]
        if p is not None:
            acc = p if acc is None else py_combine(acc, p)
    off = spark.createDataFrame(rows, schema=f"{_PID} int, {_OFF} {state_schema}")
    return tt, df, off


def scan_collect(t: Table, expr: Column, name: str) -> Table:
    """hl.scan.collect: array of the non-missing prefix values in key
    order. Per-row state is O(prefix) by definition (same as Hail).

    DRIVER/BROADCAST COST — unlike the O(1)-state scans (scan_sum /
    scan_count / scan_min / windowed take), collect-type scans carry
    the per-partition COLLECTED ARRAYS through the driver in the
    up-pass and broadcast each partition's full prefix back down:
    driver memory and broadcast size are O(total collected values),
    i.e. the whole column for the last partition. This is inherent to
    `hl.scan.collect` semantics (Hail's own two-pass lowering,
    LowerTableIR.scala, carries the same state); at 100-TB scale use a
    bounded-state scan (scan_count/scan_sum/scan_take) or a windowed
    aggregation instead. Same applies to scan_collect_as_set,
    scan_counter (bounded by distinct values, not rows) and the
    collect/group_by kinds inside scan_multi."""
    tt = t._ensure_key_sorted()
    elem_t = tt.df.select(expr.alias("x")).schema["x"].dataType.simpleString()
    ks = _key_struct(tt)
    partial = F.filter(
        F.transform(
            F.array_sort(F.collect_list(F.struct(ks.alias("k"), expr.alias("v")))),
            lambda s: s["v"],
        ),
        lambda v: v.isNotNull(),
    )
    tt, df, off = _scan_state(tt, partial, lambda a, b: a + b, f"array<{elem_t}>")
    local = F.collect_list(expr).over(_excl_window(tt))
    empty = F.expr(f"cast(array() as array<{elem_t}>)")
    df = (
        df.join(F.broadcast(off), on=_PID, how="left")
        .withColumn(name, F.concat(F.coalesce(F.col(_OFF), empty), F.coalesce(local, empty)))
        .drop(_PID, _OFF)
    )
    return Table(df, tt.key, tt.globals, _sorted=True)


def scan_collect_as_set(t: Table, expr: Column, name: str) -> Table:
    """hl.scan.collect_as_set: sorted distinct prefix values."""
    t2 = scan_collect(t, expr, name)
    df = t2.df.withColumn(name, F.array_sort(F.array_distinct(F.col(name))))
    return Table(df, t2.key, t2.globals, _sorted=True)


def scan_counter(t: Table, expr: Column, name: str) -> Table:
    """hl.scan.counter: value→count map over the prefix. Built from the
    collect prefix via HOFs (cost O(distinct·prefix) per row — counter
    state is unbounded in Hail too)."""
    t2 = scan_collect(t, expr, name)
    arr = F.col(name)
    keys = F.array_sort(F.array_distinct(arr))
    counts = F.map_from_arrays(
        keys,
        F.transform(
            keys, lambda k: F.size(F.filter(arr, lambda e: e.eqNullSafe(k))).cast("bigint")
        ),
    )
    df = t2.df.withColumn(name, counts)
    return Table(df, t2.key, t2.globals, _sorted=True)


def scan_take(t: Table, expr: Column, name: str, n: int) -> Table:
    """hl.scan.take(n): first n non-missing prefix values in key order.
    BOUNDED: local window only collects rows whose in-partition rank is
    ≤ n, partials are sliced to n, so every state holds ≤ n elements."""
    tt = t._ensure_key_sorted()
    elem_t = tt.df.select(expr.alias("x")).schema["x"].dataType.simpleString()
    ks = _key_struct(tt)
    partial = F.slice(
        F.filter(
            F.transform(
                F.array_sort(F.collect_list(F.struct(ks.alias("k"), expr.alias("v")))),
                lambda s: s["v"],
            ),
            lambda v: v.isNotNull(),
        ),
        1,
        n,
    )
    tt, df, off = _scan_state(
        tt, partial, lambda a, b: (a + b)[:n], f"array<{elem_t}>"
    )
    # rank only NON-NULL values: count(expr) over the inclusive frame is
    # this row's 1-based non-null position (nulls never take a slot)
    w_incl = (
        Window.partitionBy(_PID)
        .orderBy(*[F.col(k).asc_nulls_last() for k in tt.key])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    df = df.withColumn("__rn", F.count(expr).over(w_incl))
    bounded = F.when(expr.isNotNull() & (F.col("__rn") <= n), expr)
    local = F.collect_list(bounded).over(_excl_window(tt))
    empty = F.expr(f"cast(array() as array<{elem_t}>)")
    df = (
        df.join(F.broadcast(off), on=_PID, how="left")
        .withColumn(
            name,
            F.slice(
                F.concat(F.coalesce(F.col(_OFF), empty), F.coalesce(local, empty)),
                1,
                n,
            ),
        )
        .drop(_PID, _OFF, "__rn")
    )
    return Table(df, tt.key, tt.globals, _sorted=True)


_STATS_SCHEMA = "struct<n:bigint,s:decimal(38,6),ss:decimal(38,6),mn:double,mx:double>"


def scan_stats(t: Table, expr: Column, name: str) -> Table:
    """hl.scan.stats: struct{mean, stdev, min, max, n, sum} over the
    prefix. Sums accumulate in decimal(38,6) so the two-pass association
    order can't perturb float results."""
    x0 = expr.cast("double")
    xd = x0.cast("decimal(38,6)")

    def comps():
        # raw aggregate calls only — .over(w) must wrap the aggregate
        # itself (count already yields bigint)
        return {
            "n": F.count(x0),
            "s": F.sum(xd),
            "ss": F.sum((x0 * x0).cast("decimal(38,6)")),
            "mn": F.min(x0),
            "mx": F.max(x0),
        }

    partial = F.struct(*[c.alias(k) for k, c in comps().items()])

    def py_combine(a, b):
        return {
            "n": a["n"] + b["n"],
            "s": (a["s"] or 0) + (b["s"] or 0),
            "ss": (a["ss"] or 0) + (b["ss"] or 0),
            "mn": min((v for v in (a["mn"], b["mn"]) if v is not None), default=None),
            "mx": max((v for v in (a["mx"], b["mx"]) if v is not None), default=None),
        }

    tt, df, off = _scan_state(t, partial, py_combine, _STATS_SCHEMA)
    w = _excl_window(tt)
    local = F.struct(*[c.over(w).alias(k) for k, c in comps().items()])
    o = F.col(_OFF)
    zero_d = F.lit(0).cast("decimal(38,6)")
    n = F.coalesce(local["n"], F.lit(0)) + F.coalesce(o["n"], F.lit(0))
    s = F.coalesce(local["s"], zero_d) + F.coalesce(o["s"], zero_d)
    ss = F.coalesce(local["ss"], zero_d) + F.coalesce(o["ss"], zero_d)
    mn = F.least(local["mn"], o["mn"])
    mx = F.greatest(local["mx"], o["mx"])
    mean = s.cast("double") / F.nullif(n.cast("double"), F.lit(0.0))
    var = ss.cast("double") / F.nullif(n.cast("double"), F.lit(0.0)) - mean * mean
    out = F.when(
        n > 0,
        F.struct(
            mean.alias("mean"),
            F.sqrt(F.greatest(var, F.lit(0.0))).alias("stdev"),
            mn.alias("min"),
            mx.alias("max"),
            n.alias("n"),
            s.cast("double").alias("sum"),
        ),
    )
    df = (
        df.join(F.broadcast(off), on=_PID, how="left")
        .withColumn(name, out)
        .drop(_PID, _OFF)
    )
    return Table(df, tt.key, tt.globals, _sorted=True)


def scan_fraction(t: Table, pred: Column, name: str) -> Table:
    """hl.scan.fraction: fraction of defined prefix rows where pred
    holds."""
    tmp_t, tmp_n = f"__{name}_t", f"__{name}_n"
    t2 = scan_sum(t, F.when(pred, 1).when(~pred, 0).cast("bigint"), tmp_t)
    t3 = scan_sum(t2, F.when(pred.isNotNull(), 1).cast("bigint"), tmp_n)
    df = t3.df.withColumn(
        name, F.col(tmp_t) / F.nullif(F.col(tmp_n).cast("double"), F.lit(0.0))
    ).drop(tmp_t, tmp_n)
    return Table(df, t3.key, t3.globals, _sorted=True)


def scan_any(t: Table, pred: Column, name: str) -> Table:
    """hl.scan.any: True once a prefix row satisfied pred (empty prefix
    → False)."""
    t2 = _scan_assoc(t, pred, name, F.max, max, F.greatest)
    df = t2.df.withColumn(name, F.coalesce(F.col(name), F.lit(False)))
    return Table(df, t2.key, t2.globals, _sorted=True)


def scan_all(t: Table, pred: Column, name: str) -> Table:
    """hl.scan.all: True while every prefix row satisfied pred (empty
    prefix → True)."""
    t2 = _scan_assoc(t, pred, name, F.min, min, F.least)
    df = t2.df.withColumn(name, F.coalesce(F.col(name), F.lit(True)))
    return Table(df, t2.key, t2.globals, _sorted=True)


def scan_multi(t: Table, specs: dict) -> Table:
    """EVERY requested scan in ONE up-pass + ONE down-pass — the shape
    Hail's lowering uses (LowerTableIR.scala:1284: all scan states ride
    one TableScanUpPass). Chaining k single scans costs k jobs that each
    re-execute the chain; this costs 2 regardless of k.

    specs: {out_name: (kind, expr[, n])} with kind in
    {sum, count, min, max, mean, any, all, fraction, product, collect,
    collect_as_set, take, stats, counter, collect_explode, group_by}.

    Combinators compose INTO the single pass: hl.scan.filter is an
    expression pre-transform (pass ``scan_filter(pred, expr)`` as the
    spec's expr), ``("collect_explode", arr)`` is the
    hl.scan.explode(collect) form, and ``("group_by", key, value)`` is
    hl.scan.group_by(key, hl.scan.collect(value)) — so a k-scan
    pipeline with combinators is still 1 up-pass + 1 down-pass (the
    LowerTableIR.scala:1284 shape) instead of k chained jobs.
    """
    tt = t._ensure_key_sorted()
    df = tt.df.withColumn(_PID, F.spark_partition_id())
    spark = df.sparkSession
    ks = _key_struct(tt)

    # ONE schema analysis for every spec's expression type instead of a
    # df.select(expr).schema round-trip per spec: each of those is a
    # full Catalyst analysis of the input plan (guide §7.3 — driver
    # planning is single-threaded work), so an 11-spec battery paid 11
    # analyses where one suffices. group_by types its (k, v) pair
    # struct; other kinds type the raw expr; unused slots are harmless.
    _probe = []
    for _n, _spec in specs.items():
        if _spec[0] == "group_by":
            _e = F.struct(_spec[1].alias("k"), _spec[2].alias("v"))
        else:
            _e = _spec[1]
        _probe.append(_e.alias(f"__t_{len(_probe)}"))
    _sch = df.select(*_probe).schema
    _dtypes = {
        name: _sch[f"__t_{i}"].dataType.simpleString()
        for i, name in enumerate(specs)
    }

    def num_out_t(d):
        if d in ("int", "bigint", "smallint", "tinyint"):
            return "bigint"
        if d.startswith("decimal"):
            return d
        return "double"

    # field registry: (field, partial_agg, fold_kind, schema_type, n)
    fields: list = []
    rank_specs: dict = {}  # field -> (expr, n) needing bounded local collect
    flat_fields: set = set()  # fields whose window-local collect flattens

    def sorted_vals(expr):
        return F.filter(
            F.transform(
                F.array_sort(F.collect_list(F.struct(ks.alias("k"), expr.alias("v")))),
                lambda s: s["v"],
            ),
            lambda v: v.isNotNull(),
        )

    for name, spec in specs.items():
        kind, expr = spec[0], spec[1]
        f = f"__{name}"
        def ones(e):
            # count == sum of 1-indicators, so partial and window-local
            # use the same sum aggregate
            return F.when(e.isNotNull(), F.lit(1)).cast("bigint")

        if kind == "sum":
            ot = num_out_t(_dtypes[name])
            x = expr.cast(ot)
            fields.append((f + "_s", F.sum(x), "add", ot, x))
        elif kind == "count":
            o1 = ones(expr)
            fields.append((f + "_n", F.sum(o1), "add", "bigint", o1))
        if kind == "min":
            ot = _dtypes[name]
            fields.append((f + "_m", F.min(expr), "min", ot, expr))
        elif kind == "max":
            ot = _dtypes[name]
            fields.append((f + "_m", F.max(expr), "max", ot, expr))
        elif kind == "mean":
            x = expr.cast("double")
            xd = x.cast("decimal(38,6)")
            fields.append((f + "_s", F.sum(xd), "add", "decimal(38,6)", xd))
            fields.append((f + "_n", F.sum(ones(x)), "add", "bigint", ones(x)))
        elif kind == "any":
            fields.append((f + "_b", F.max(expr), "max", "boolean", expr))
        elif kind == "all":
            fields.append((f + "_b", F.min(expr), "min", "boolean", expr))
        elif kind == "fraction":
            tcol = F.when(expr, 1).when(~expr, 0).cast("bigint")
            dcol = F.when(expr.isNotNull(), 1).cast("bigint")
            fields.append((f + "_t", F.sum(tcol), "add", "bigint", tcol))
            fields.append((f + "_d", F.sum(dcol), "add", "bigint", dcol))
        elif kind == "product":
            x = expr.cast("double")
            fields.append((f + "_p", F.product(x), "mul", "double", x))
        elif kind in ("collect", "collect_as_set", "counter"):
            et = _dtypes[name]
            fields.append((f + "_a", sorted_vals(expr), "concat", f"array<{et}>", expr))
        elif kind == "take":
            n = spec[2]
            et = _dtypes[name]
            fields.append(
                (f + "_a", F.slice(sorted_vals(expr), 1, n), ("concat_n", n), f"array<{et}>", expr)
            )
            rank_specs[f + "_a"] = (expr, n)
        elif kind == "stats":
            x = expr.cast("double")
            xd = x.cast("decimal(38,6)")
            qd = (x * x).cast("decimal(38,6)")
            fields.append((f + "_n", F.sum(ones(x)), "add", "bigint", ones(x)))
            fields.append((f + "_s", F.sum(xd), "add", "decimal(38,6)", xd))
            fields.append((f + "_q", F.sum(qd), "add", "decimal(38,6)", qd))
            fields.append((f + "_mn", F.min(x), "min", "double", x))
            fields.append((f + "_mx", F.max(x), "max", "double", x))
        elif kind == "collect_explode":
            at = _dtypes[name]  # array<T>
            empty_arr = F.expr(f"cast(array() as {at})")
            clean = F.filter(F.coalesce(expr, empty_arr), lambda v: v.isNotNull())
            partial = F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(ks.alias("k"), clean.alias("v")))
                    ),
                    lambda s: s["v"],
                )
            )
            fields.append((f + "_a", partial, "concat", at, clean))
            flat_fields.add(f + "_a")
        elif kind == "group_by":
            val = spec[2]
            pair = F.struct(expr.alias("k"), val.alias("v"))
            pt = _dtypes[name]
            fields.append((f + "_a", sorted_vals(pair), "concat", f"array<{pt}>", pair))

    # ---- up-pass: ONE job for every partial -------------------------- #
    partials = df.groupBy(_PID).agg(
        *[agg.alias(fname) for fname, agg, _, _, _ in fields]
    ).collect()
    partials.sort(key=lambda r: r[_PID])
    acc: dict = {fname: None for fname, *_ in fields}
    rows = []
    for r in partials:
        # positional tuple in field order (dict rows would be re-ordered
        # by Row's alphabetical keys and misalign with the schema)
        rows.append(tuple([r[_PID]] + [acc[fname] for fname, *_ in fields]))
        for fname, _, fold, _, _ in fields:
            p = r[fname]
            if p is None:
                continue
            a = acc[fname]
            if a is None:
                acc[fname] = p if not (isinstance(fold, tuple)) else p[: fold[1]]
            elif fold == "add":
                acc[fname] = a + p
            elif fold == "min":
                acc[fname] = min(a, p)
            elif fold == "max":
                acc[fname] = max(a, p)
            elif fold == "mul":
                acc[fname] = a * p
            elif fold == "concat":
                acc[fname] = a + p
            elif isinstance(fold, tuple):  # concat_n
                acc[fname] = (a + p)[: fold[1]]
    schema = f"{_PID} int, " + ", ".join(
        f"{fname} {ftype}" for fname, _, _, ftype, _ in fields
    )
    off = spark.createDataFrame(rows, schema=schema)
    off = off.select(
        F.col(_PID), *[F.col(fname).alias(f"{fname}_off") for fname, *_ in fields]
    )

    # ---- down-pass: rank columns, one window stage, final combine ---- #
    w_incl = (
        Window.partitionBy(_PID)
        .orderBy(*[F.col(k).asc_nulls_last() for k in tt.key])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for fname, (expr, n) in rank_specs.items():
        df = df.withColumn(f"{fname}_rn", F.count(expr).over(w_incl))
    w = _excl_window(tt)
    loc_cols = []
    for fname, _, fold, ftype, base in fields:
        if fname in rank_specs:
            expr, n = rank_specs[fname]
            bounded = F.when(expr.isNotNull() & (F.col(f"{fname}_rn") <= n), expr)
            loc_cols.append(F.collect_list(bounded).over(w).alias(f"{fname}_loc"))
        elif fold == "concat":
            # base here is the raw expr; window collect keeps row order
            loc = F.collect_list(base).over(w)
            if fname in flat_fields:
                loc = F.flatten(loc)
            loc_cols.append(loc.alias(f"{fname}_loc"))
        elif fold == "add":
            loc_cols.append(F.sum(base).over(w).alias(f"{fname}_loc"))
        elif fold == "min":
            loc_cols.append(F.min(base).over(w).alias(f"{fname}_loc"))
        elif fold == "max":
            loc_cols.append(F.max(base).over(w).alias(f"{fname}_loc"))
        elif fold == "mul":
            loc_cols.append(F.product(base).over(w).alias(f"{fname}_loc"))
    df = df.select("*", *loc_cols).join(F.broadcast(off), on=_PID, how="left")

    def comb(fname, fold, ftype):
        loc, o = F.col(f"{fname}_loc"), F.col(f"{fname}_off")
        if fold == "add":
            z = F.lit(0).cast(ftype)
            return F.coalesce(loc, z) + F.coalesce(o, z)
        if fold == "min":
            return F.least(loc, o)
        if fold == "max":
            return F.greatest(loc, o)
        if fold == "mul":
            return F.coalesce(loc, F.lit(1.0)) * F.coalesce(o, F.lit(1.0))
        empty = F.expr(f"cast(array() as {ftype})")
        cat = F.concat(F.coalesce(o, empty), F.coalesce(loc, empty))
        if isinstance(fold, tuple):
            return F.slice(cat, 1, fold[1])
        return cat

    meta = {fname: (fold, ftype) for fname, _, fold, ftype, _ in fields}
    out_cols = []
    for name, spec in specs.items():
        kind = spec[0]
        f = f"__{name}"

        def c(sub):
            fold, ftype = meta[f + sub]
            return comb(f + sub, fold, ftype)

        if kind == "sum":
            out = c("_s")
        elif kind == "count":
            out = c("_n")
        elif kind in ("min", "max"):
            out = c("_m")
        elif kind == "mean":
            out = c("_s").cast("double") / F.nullif(c("_n").cast("double"), F.lit(0.0))
        elif kind == "any":
            out = F.coalesce(c("_b"), F.lit(False))
        elif kind == "all":
            out = F.coalesce(c("_b"), F.lit(True))
        elif kind == "fraction":
            out = c("_t").cast("double") / F.nullif(c("_d").cast("double"), F.lit(0.0))
        elif kind == "product":
            out = c("_p")
        elif kind in ("collect", "collect_explode"):
            out = c("_a")
        elif kind == "group_by":
            arr = c("_a")
            # same null-key deviation as scan_group_by / agg.group_by:
            # Spark maps cannot hold a null key
            gkeys = F.array_distinct(
                F.transform(
                    F.filter(arr, lambda p: p["k"].isNotNull()), lambda p: p["k"]
                )
            )
            out = F.map_from_arrays(
                gkeys,
                F.transform(
                    gkeys,
                    lambda k: F.transform(
                        F.filter(
                            arr,
                            lambda p: p["k"].eqNullSafe(k) & p["v"].isNotNull(),
                        ),
                        lambda p: p["v"],
                    ),
                ),
            )
        elif kind == "collect_as_set":
            out = F.array_sort(F.array_distinct(c("_a")))
        elif kind == "take":
            out = c("_a")
        elif kind == "counter":
            arr = c("_a")
            keys = F.array_sort(F.array_distinct(arr))
            out = F.map_from_arrays(
                keys,
                F.transform(
                    keys,
                    lambda k: F.size(F.filter(arr, lambda e: e.eqNullSafe(k))).cast("bigint"),
                ),
            )
        elif kind == "stats":
            n_ = c("_n")
            s_ = c("_s").cast("double")
            q_ = c("_q").cast("double")
            mean = s_ / F.nullif(n_.cast("double"), F.lit(0.0))
            var = q_ / F.nullif(n_.cast("double"), F.lit(0.0)) - mean * mean
            out = F.when(
                n_ > 0,
                F.struct(
                    mean.alias("mean"),
                    F.sqrt(F.greatest(var, F.lit(0.0))).alias("stdev"),
                    c("_mn").alias("min"),
                    c("_mx").alias("max"),
                    n_.alias("n"),
                    s_.alias("sum"),
                ),
            )
        out_cols.append(out.alias(name))
    keep = [c for c in tt.df.columns]
    df = df.select(*keep, *out_cols)
    return Table(df, tt.key, tt.globals, _sorted=True)


def scan_product(t: Table, expr: Column, name: str) -> Table:
    """hl.scan.product (empty prefix → 1.0)."""
    tt, df, off = _scan_state(
        t,
        F.product(expr.cast("double")),
        lambda a, b: a * b,
        "double",
    )
    local = F.product(expr.cast("double")).over(_excl_window(tt))
    df = (
        df.join(F.broadcast(off), on=_PID, how="left")
        .withColumn(
            name,
            F.coalesce(local, F.lit(1.0)) * F.coalesce(F.col(_OFF), F.lit(1.0)),
        )
        .drop(_PID, _OFF)
    )
    return Table(df, tt.key, tt.globals, _sorted=True)


def scan_filter(pred: Column, expr: Column) -> Column:
    """hl.scan.filter(pred, <scan>(expr)) pre-transform (ref
    aggregators.py filter combinator; test_expr.py:1118): rows failing
    ``pred`` contribute missing, which every scan in this module
    skips — compose as ``scan_X(t, scan_filter(pred, expr), name)``."""
    return F.when(F.coalesce(pred, F.lit(False)), expr)


def scan_collect_explode(t: Table, arr: Column, name: str) -> Table:
    """hl.scan.explode(lambda e: hl.scan.collect(e), arr) (ref
    test_expr.py:1141): exclusive prefix of the FLATTENED array
    elements in key order; missing arrays and missing elements are
    skipped. Same two-pass shape as scan_collect with flatten folded
    into both passes."""
    tt = t._ensure_key_sorted()
    at = tt.df.select(arr.alias("x")).schema["x"].dataType.simpleString()
    empty = F.expr(f"cast(array() as {at})")
    clean = F.filter(F.coalesce(arr, empty), lambda v: v.isNotNull())
    ks = _key_struct(tt)
    partial = F.flatten(
        F.transform(
            F.array_sort(F.collect_list(F.struct(ks.alias("k"), clean.alias("v")))),
            lambda s: s["v"],
        )
    )
    tt, df, off = _scan_state(tt, partial, lambda a, b: a + b, at)
    local = F.flatten(F.collect_list(clean).over(_excl_window(tt)))
    df = (
        df.join(F.broadcast(off), on=_PID, how="left")
        .withColumn(
            name, F.concat(F.coalesce(F.col(_OFF), empty), F.coalesce(local, empty))
        )
        .drop(_PID, _OFF)
    )
    return Table(df, tt.key, tt.globals, _sorted=True)


def scan_group_by(t: Table, key: Column, value: Column, name: str) -> Table:
    """hl.scan.group_by(key, hl.scan.collect(value)) (ref
    test_expr.py:1178): exclusive-prefix map key → collected
    non-missing values. Keys register in the map even when every value
    for them was missing (matching the reference's filtered-inner-scan
    behavior). Map state is O(prefix) per row — unbounded in the
    reference too."""
    pair_name = f"__{name}_pairs"
    t2 = scan_collect(t, F.struct(key.alias("k"), value.alias("v")), pair_name)
    arr = F.col(pair_name)
    # DEVIATION (same as agg.group_by): Spark maps cannot hold a null
    # key, so rows with a missing key are dropped from the map instead
    # of registering a None key — without this filter map_from_arrays
    # raises NULL_MAP_KEY
    keys = F.array_distinct(
        F.transform(F.filter(arr, lambda p: p["k"].isNotNull()), lambda p: p["k"])
    )
    m = F.map_from_arrays(
        keys,
        F.transform(
            keys,
            lambda k: F.transform(
                F.filter(arr, lambda p: p["k"].eqNullSafe(k) & p["v"].isNotNull()),
                lambda p: p["v"],
            ),
        ),
    )
    df = t2.df.withColumn(name, m).drop(pair_name)
    return Table(df, t2.key, t2.globals, _sorted=True)


def scan_array_sum(t: Table, arr: Column, name: str) -> Table:
    """hl.scan.array_agg(lambda v: hl.agg.sum(v), arr) — elementwise
    exclusive prefix sums of a same-length array column (ref
    test_expr.py:1212; AggArrayPerElement in scan context). Missing
    arrays contribute nothing; missing elements add 0; an empty prefix
    is missing (as in the reference). The within-partition pass folds
    the collected prefix arrays per row — O(prefix·k), the same cost
    class as the collect scans."""
    tt = t._ensure_key_sorted()
    dtype = tt.df.select(arr.alias("x")).schema["x"].dataType
    elem = dtype.elementType.simpleString()
    out_elem = "bigint" if elem in ("int", "bigint", "smallint", "tinyint") else "double"
    at = f"array<{out_elem}>"
    a = F.when(
        arr.isNotNull(),
        F.transform(arr, lambda v: F.coalesce(v.cast(out_elem), F.lit(0).cast(out_elem))),
    )
    ew = lambda x, y: F.zip_with(x, y, lambda p, q: p + q)  # noqa: E731

    def fold(arrs):
        return F.aggregate(
            F.filter(arrs, lambda x: x.isNotNull()),
            F.lit(None).cast(at),
            lambda acc, nxt: F.when(acc.isNull(), nxt).otherwise(ew(acc, nxt)),
        )

    partial = fold(F.collect_list(a))

    def py_combine(x, y):
        return [p + q for p, q in zip(x, y)]

    tt, df, off = _scan_state(tt, partial, py_combine, at)
    local = fold(F.collect_list(a).over(_excl_window(tt)))
    combined = (
        F.when(F.col(_OFF).isNull(), local)
        .when(local.isNull(), F.col(_OFF))
        .otherwise(ew(F.col(_OFF), local))
    )
    df = (
        df.join(F.broadcast(off), on=_PID, how="left")
        .withColumn(name, combined)
        .drop(_PID, _OFF)
    )
    return Table(df, tt.key, tt.globals, _sorted=True)
