"""Time-series relational operators: as-of join, sessionization,
rolling-window aggregation, and exact heavy hitters.

These are the event-analytics operators a query engine needs that
Spark's DataFrame API lacks as primitives (the reference covers the
genomics analogues — ordered-key joins over loci — via its partitioner;
here the same merge-join shape is re-expressed for timestamped data).

Spark shapes, each sized for a 1000-executor / 100 TB corpus:

* ``asof_join`` — the union-merge trick: tag both sides, union, one
  hash shuffle on the join key, sort within partition, and carry the
  latest right payload forward with ``last(..., ignorenulls=True)``
  over a running window. Cost is exactly one sort-merge-join pass —
  no range explosion, no per-row probe, no broadcast requirement on
  either side (both sides can be 100 TB).
* ``sessionize`` / ``session_stats`` — per-key ordered windows
  (``lag`` + running ``sum``) partitioned by the entity key: one
  shuffle, arbitrarily many keys, never a global sort.
* ``rolling_aggregate`` — ``rangeBetween`` time-window frame per key;
  Spark evaluates it with a sliding frame over the per-key sort, O(n)
  per key, map-side after the one key shuffle.
* ``frequent_items`` — Misra-Gries candidate sketch per partition
  (bounded memory, mapInPandas) + an exact verification count of the
  candidate set only. The long tail never shuffles: only candidate
  tokens (≤ partitions × capacity rows) reach the groupBy. Output is
  EXACT (the sketch guarantees a candidate superset when
  ``capacity + 1 ≥ N / min_count``), so it oracle-checks against a
  plain GROUP BY ... HAVING.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------

def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str | None = None,
    direction: str = "backward",
    tolerance: int | float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Point-in-time ("as-of") join: for every left row, attach the
    single right row with the same key and the closest ``right_ts`` at
    or before (``backward``) / at or after (``forward``) ``left_ts``.

    Implementation is the union-merge plan (the classic merge-join
    formulation, e.g. kdb+ ``aj`` / pandas ``merge_asof`` semantics,
    re-expressed as one Spark window):

    1. tag right rows ``__side=0`` with their payload in a struct,
       left rows ``__side=1`` with a NULL payload;
    2. union and shuffle ONCE on the key; within each key partition
       sort by ``(ts, side)`` (right-before-left on ties so an
       equal-timestamp right row matches);
    3. ``last(payload, ignorenulls=True)`` over the running frame
       carries the most recent right payload onto each left row;
    4. keep left rows; optionally null out matches beyond
       ``tolerance`` (same units as the ts columns).

    Non-matching left rows keep NULL payload columns (left-join
    semantics). Right payload columns are renamed with ``suffix`` on
    collision.

    Scale: equivalent to one sort-merge join — no inequality-join
    range explosion, both sides may be arbitrarily large, skew on the
    key is handled by AQE like any other shuffle.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    rts = right_ts or left_ts

    payload_cols = [c for c in right.columns if c not in keys and c != rts]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in payload_cols
    }
    matched_ts = rts + suffix if rts in left.columns else rts
    struct_fields = [F.col(c).alias(out_names[c]) for c in payload_cols] + [
        F.col(rts).alias("__match_ts")
    ]

    left_cols = [c for c in left.columns]
    l2 = left.select(
        *left_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(
            right.select(F.struct(*struct_fields).alias("__p")).schema["__p"].dataType
        ).alias("__p"),
    )
    r2 = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            if c not in keys
            else F.col(c)
            for c in left_cols
        ],
        F.col(rts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*struct_fields).alias("__p"),
    )

    order = [F.col("__ts").asc(), F.col("__side").asc()]
    if direction == "forward":
        order = [F.col("__ts").desc(), F.col("__side").asc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = l2.unionByName(r2).withColumn(
        "__m", F.last("__p", ignorenulls=True).over(w)
    )
    out = u.filter(F.col("__side") == 1)
    if tolerance is not None:
        gap = (
            F.col("__ts") - F.col("__m.__match_ts")
            if direction == "backward"
            else F.col("__m.__match_ts") - F.col("__ts")
        )
        out = out.withColumn(
            "__m", F.when(gap <= F.lit(tolerance), F.col("__m"))
        )
    return out.select(
        *left_cols,
        *[F.col(f"__m.{out_names[c]}").alias(out_names[c]) for c in payload_cols],
        F.col("__m.__match_ts").alias(matched_ts),
    )


# ---------------------------------------------------------------------------
# sessionization
# ---------------------------------------------------------------------------

def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap: int | float,
    tiebreak: str | None = None,
    session_col: str = "session_idx",
) -> DataFrame:
    """Gap-based sessionization: within each ``key_col``, order events
    by ``ts_col`` (then ``tiebreak`` for determinism) and start a new
    session whenever the gap to the previous event exceeds ``gap``
    (same units as ``ts_col``). Adds a dense 0-based per-key
    ``session_col``.

    One shuffle on the key; the windows (``lag`` + running ``sum``)
    evaluate in a single per-key sorted pass. Never a global sort —
    scales to any number of keys.
    """
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak).asc()] if tiebreak else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    new_sess = (
        F.col(ts_col) - F.lag(ts_col).over(w) > F.lit(gap)
    ).cast("int")
    run = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("__new", F.coalesce(new_sess, F.lit(0))).withColumn(
        session_col, F.sum("__new").over(run)
    ).drop("__new")


def session_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap: int | float,
    value_col: str | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Sessionize then aggregate one row per (key, session): event
    count, start/end timestamp, duration, and (optionally) an exact
    decimal sum of ``value_col``. One shuffle for the windows, and the
    groupBy reuses the same key partitioning (Catalyst elides the
    second exchange)."""
    s = sessionize(df, key_col, ts_col, gap, tiebreak=tiebreak)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(ts_col) - F.min(ts_col)).alias("duration"),
    ]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(38,6)"))
            .cast("double")
            .alias("value_sum")
        )
    return s.groupBy(key_col, "session_idx").agg(*aggs)


# ---------------------------------------------------------------------------
# rolling (time-range) aggregation
# ---------------------------------------------------------------------------

def rolling_aggregate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window: int,
    aggs: tuple[str, ...] = ("sum", "count", "avg"),
) -> DataFrame:
    """Trailing time-window aggregate per key: for each row, aggregate
    ``value_col`` over rows of the same key with
    ``ts ∈ [row.ts - window, row.ts]`` (a RANGE frame, so simultaneous
    events all count). ``ts_col`` must be numeric (e.g. epoch nanos —
    the engine reads parquet TIMESTAMP(NANOS) as int64).

    Spark evaluates the RANGE frame with a two-pointer sliding pass
    over each key's sorted run — O(n) per key after the single key
    shuffle, no self-join, no per-row rescan.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc())
        .rangeBetween(-int(window), 0)
    )
    out = df
    dec = F.col(value_col).cast("decimal(38,6)")
    if "sum" in aggs:
        out = out.withColumn(
            "roll_sum", F.sum(dec).over(w).cast("double")
        )
    if "count" in aggs:
        out = out.withColumn("roll_n", F.count(F.lit(1)).over(w))
    if "avg" in aggs:
        out = out.withColumn(
            "roll_avg", (F.sum(dec).over(w) / F.count(F.lit(1)).over(w)).cast("double")
        )
    if "min" in aggs:
        out = out.withColumn("roll_min", F.min(value_col).over(w))
    if "max" in aggs:
        out = out.withColumn("roll_max", F.max(value_col).over(w))
    return out


# ---------------------------------------------------------------------------
# exact heavy hitters (Misra-Gries candidates + exact verify)
# ---------------------------------------------------------------------------

# frequent_items refuses to derive a sketch bigger than this (counters
# per executor; the candidate broadcast can reach partitions × this).
_CAPACITY_CAP = 4_000_000


def _misra_gries_partition(
    it: Iterator[pd.DataFrame], col: str, capacity: int
) -> Iterator[pd.DataFrame]:
    """Per-partition Misra-Gries summary, batch-merged: each Arrow
    chunk's exact ``value_counts`` is an error-0 summary, merged into
    the running counters with the mergeable-summaries rule (Agarwal et
    al. 2013): when over capacity, subtract the (capacity+1)-th largest
    count and drop non-positives. Total undercount stays ≤
    n_p/(capacity+1), so any item with partition count above that bound
    survives — the union of survivor sets is a superset of every item
    with global count > N/(capacity+1). Vectorized (pandas ops only,
    no per-token Python loop)."""
    counters = pd.Series(dtype="int64")
    for pdf in it:
        vc = pdf[col].value_counts()
        counters = counters.add(vc, fill_value=0)
        if len(counters) > capacity:
            kth = counters.nlargest(capacity + 1).iloc[-1]
            counters = counters[counters > kth] - kth
    # object dtype so empty partitions don't infer a numeric index
    # dtype that clashes with a string column schema
    yield pd.DataFrame({col: pd.Series(counters.index.tolist(), dtype=object)})


def frequent_items(
    df: DataFrame,
    col: str,
    min_count: int,
    total: int | None = None,
    capacity: int | None = None,
) -> DataFrame:
    """EXACT heavy hitters: all distinct values of ``col`` occurring at
    least ``min_count`` times, with their exact counts.

    Two-phase plan (Misra-Gries 1982; the mergeable-summaries
    formulation of Agarwal et al. 2013):

    1. **candidates** — one bounded-memory Misra-Gries sketch per
       partition (``mapInPandas``; ``capacity`` counters). With
       ``capacity + 1 ≥ N / min_count`` the union of survivors
       provably contains every global heavy hitter (pigeonhole on the
       per-partition undercount bound), so phase 2 never misses.
    2. **verify** — broadcast-semi-join the (tiny: ≤ partitions ×
       capacity rows) candidate set back onto the column and take
       exact counts, keeping those ≥ ``min_count``.

    Why not one big groupBy: at 100 TB the token column's long tail is
    billions of distinct singletons; a full groupBy shuffles ALL of
    them to count things that can never qualify. Here the tail dies
    map-side — only candidate rows reach the shuffle.

    ``total`` (= N, the row count of ``df``) sizes the sketch; if
    omitted it is computed with one cheap count job. ``capacity``
    overrides the derived size (must honor the guarantee yourself).

    MEMORY SCALES AS N / min_count: each executor holds ``capacity ≈
    N/min_count`` counters, and the candidate broadcast is up to
    partitions × capacity values. A small absolute ``min_count`` at
    large N silently explodes both, so a derived capacity above
    ``_CAPACITY_CAP`` (4M counters ≈ hundreds of MB with the broadcast)
    raises — pass a larger ``min_count``, an explicit ``capacity``
    (accepting a weaker guarantee), or use a plain groupBy, which at
    that selectivity is no longer wasteful.

    NULL values are never reported (pandas value_counts drops them in
    the sketch and the semi-join drops NULL keys in the verify — the
    two phases agree, so the exclusion is consistent, not a miss).
    """
    if min_count < 1:
        raise ValueError("frequent_items: min_count must be >= 1")
    if capacity is None:
        n = total if total is not None else df.count()
        capacity = max(64, int(math.ceil(n / min_count)))
        if capacity > _CAPACITY_CAP:
            raise ValueError(
                f"frequent_items: derived capacity {capacity} (= N/min_count "
                f"= {n}/{min_count}) exceeds the {_CAPACITY_CAP} sanity cap — "
                "executor memory and the candidate broadcast scale with it. "
                "Raise min_count, pass capacity= explicitly (weaker "
                "guarantee), or use a plain groupBy at this selectivity."
            )
    cands = df.select(col).mapInPandas(
        lambda it: _misra_gries_partition(it, col, capacity),
        schema=df.select(col).schema,
    ).distinct()
    return (
        df.join(F.broadcast(cands), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )


# ---------------------------------------------------------------------------
# salted skew join
# ---------------------------------------------------------------------------

def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join that survives pathological key skew: the left (big,
    skewed) side salts its shuffle key with a deterministic per-row
    component, the right side is replicated ``n_salts`` times, and the
    join runs on (key, salt) — a hot key's rows now spread over
    ``n_salts`` reducers instead of melting one.

    Result is row-identical to ``left.join(right, on, how)``.

    When to reach for this instead of the defaults: AQE's skew-join
    split handles most skew when the join is the last shuffle, and
    ``F.broadcast`` wins when the right side fits in memory. The salted
    form covers the remaining case — right side too big to broadcast
    AND the skewed exchange feeding something AQE won't split (e.g. a
    required child distribution). Cost: right side scanned once but
    shuffled ``n_salts``×; size n_salts to (hot-key rows / target
    partition rows), not higher. ``how`` supports inner and left.

    Caveat: the salt is a deterministic hash of the whole left row, so
    BYTE-IDENTICAL duplicate rows share a salt and do not spread — if
    the hot key's rows are exact duplicates, aggregate them to
    (row, count) first (or dedup) before joining.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join: how must be inner|left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    # deterministic salt from the whole left row's key-independent
    # identity would need a uid; a uniform pmod over xxhash64 of ALL
    # columns is deterministic per row content and spreads ties
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    l2 = left.withColumn("__salt", lsalt.cast("int"))
    r2 = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    out = l2.join(r2, keys + ["__salt"], how)
    return out.drop("__salt")


# ---------------------------------------------------------------------------
# funnel & cohort analytics
# ---------------------------------------------------------------------------

def funnel(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within: int | float | None = None,
) -> DataFrame:
    """Ordered-funnel analysis: per key, the earliest time each step
    was reached STRICTLY AFTER the previous step (first A, then first
    B after that A, ...). Returns (key, step_1_ts, ..., step_k_ts)
    with NULL from the first unreached step on. ``within`` bounds the
    whole funnel: step i counts only while ts - step_1_ts <= within.

    Plan: one conditional min-aggregate per step, each a hash agg on
    the key joined back on the same key — k tiny reuse-partitioned
    stages, never a per-user sort or UDF. (A sessionized sort-based
    funnel is O(events log events) per key; this is O(k · events).)
    """
    if not steps:
        raise ValueError("funnel: steps must be non-empty")
    out = None
    for i, step in enumerate(steps):
        col = f"step_{i + 1}_ts"
        ev = df.filter(F.col(type_col) == step)
        if i == 0:
            out = ev.groupBy(key_col).agg(F.min(ts_col).alias(col))
            continue
        prev = f"step_{i}_ts"
        cand = ev.join(out.select(key_col, prev, *([f"step_{1}_ts"] if i > 1 else [])), key_col)
        cond = F.col(ts_col) > F.col(prev)
        if within is not None:
            first = F.col("step_1_ts") if i > 1 else F.col(prev)
            cond = cond & (F.col(ts_col) - first <= F.lit(within))
        step_ts = (
            cand.filter(cond)
            .groupBy(key_col)
            .agg(F.min(ts_col).alias(col))
        )
        out = out.join(step_ts, key_col, "left")
    return out


def funnel_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within: int | float | None = None,
) -> DataFrame:
    """(step, step_name, n_keys) — how many keys reached each funnel
    depth. The standard conversion readout over `funnel`."""
    f = funnel(df, key_col, ts_col, type_col, steps, within)
    rows = [
        F.struct(
            F.lit(i + 1).alias("step"),
            F.lit(s).alias("step_name"),
            # coalesce: F.sum over an EMPTY funnel (no key reached step
            # 1) is NULL; the count semantics — and the SQL oracle — say 0
            F.coalesce(
                F.sum(F.col(f"step_{i + 1}_ts").isNotNull().cast("bigint")),
                F.lit(0).cast("bigint"),
            ).alias("n_keys"),
        )
        for i, s in enumerate(steps)
    ]
    packed = f.agg(F.array(*rows).alias("__a"))
    return packed.select(F.explode("__a").alias("r")).select(
        "r.step", "r.step_name", "r.n_keys"
    )


def cohort_retention(
    df: DataFrame,
    key_col: str,
    period_col,
    max_periods: int | None = None,
) -> DataFrame:
    """Cohort retention: cohort = each key's first period; for every
    (cohort, periods_since) the number of distinct keys active then —
    the classic retention triangle. ``period_col`` is a Column or name
    evaluating to an integer period (e.g. epoch-week).

    Plan: one min-agg for cohorts (hash agg on key), equi-joined back
    (the cohort table is ONE ROW PER KEY — not broadcastable at scale,
    so a plain shuffle join on the already-key-partitioned side), then
    one distinct-count hash agg — no window, no per-key sort."""
    p = F.col(period_col) if isinstance(period_col, str) else period_col
    base = df.select(F.col(key_col), p.alias("__period"))
    cohorts = base.groupBy(key_col).agg(F.min("__period").alias("cohort"))
    j = base.join(cohorts, key_col).withColumn(
        "periods_since", F.col("__period") - F.col("cohort")
    )
    if max_periods is not None:
        j = j.filter(F.col("periods_since") <= max_periods)
    return (
        j.groupBy("cohort", "periods_since")
        .agg(F.countDistinct(key_col).alias("n_active"))
    )


def collapse_bursts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    window: int | float,
    tiebreak: str | None = None,
) -> DataFrame:
    """Burst collapse (telemetry dedup): within each key, keep only the
    FIRST event of every burst — consecutive events less than
    ``window`` apart chain into one burst (exactly `sessionize` with
    gap=window), and the burst's earliest row survives. The standard
    debounce for duplicate-click / retry storms. One key shuffle; the
    keep decision is a lag comparison, not a self-join."""
    s = sessionize(df, key_col, ts_col, gap=window, tiebreak=tiebreak)
    order = [F.col(ts_col).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(key_col, "session_idx").orderBy(*order)
    return (
        s.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "session_idx")
    )


# ---------------------------------------------------------------------------
# key-skew diagnostics
# ---------------------------------------------------------------------------

def skew_report(
    df: DataFrame,
    key_cols: str | list[str],
    top_k: int = 10,
) -> DataFrame:
    """Pre-join/agg skew diagnostic: the ``top_k`` heaviest keys with
    their row share, annotated with the global profile (total rows,
    distinct keys, max/mean skew ratio) — the number that tells you
    whether to reach for broadcast, AQE skew-split, or `salted_join`.

    One hash agg for per-key counts; the global profile is a second
    agg OVER THE COUNTS table (not a rescan); top-k compiles to
    TakeOrderedAndProject. The 1-row profile attaches via a lit-key
    broadcast hash join (bounded by construction)."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
    stats = counts.agg(
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("__max"),
        (F.sum("cnt") / F.count(F.lit(1))).alias("__mean"),
    ).withColumn("__k", F.lit(1))
    top = (
        counts.orderBy(F.desc("cnt"), *[F.asc(k) for k in keys])
        .limit(top_k)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.desc("cnt"), *[F.asc(k) for k in keys])
            ),
        )
        .withColumn("__k", F.lit(1))
    )
    return (
        top.join(F.broadcast(stats), "__k")
        .select(
            "rank",
            *keys,
            "cnt",
            F.round(F.col("cnt") / F.col("n_rows"), 9).alias("share"),
            "n_rows",
            "n_keys",
            F.round(F.col("__max") / F.col("__mean"), 6).alias("skew_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# time-series resampling / gap filling
# ---------------------------------------------------------------------------

def resample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    interval: int,
    aggs: dict[str, Column],
    fill: str = "null",
) -> DataFrame:
    """Regularize an event stream onto a fixed time grid per key:
    bucket = floor(ts/interval)*interval, aggregate ``aggs`` per
    (key, bucket), then MATERIALIZE EMPTY BUCKETS between each key's
    first and last event (a per-key ``sequence`` explode — bounded by
    span/interval, never a global calendar). ``fill``: 'null' keeps
    gap rows NULL, 'zero' coalesces numerics to 0, 'ffill' carries the
    previous non-null value forward (last ignorenulls over the per-key
    bucket order).

    ``ts_col``/``interval`` are numeric (e.g. epoch micros) like the
    other relational ops. Plan: one hash agg on (key, bucket); the
    grid join and the ffill window reuse the same key partitioning —
    no global sort, no driver-side calendar."""
    if fill not in ("null", "zero", "ffill"):
        raise ValueError(f"resample: fill must be null|zero|ffill, got {fill!r}")
    # exact integer bucketing for integral ts (double floor(ts/interval)
    # can flip at exact-multiple boundaries); pmod keeps floor semantics
    # for negative timestamps
    if df.schema[ts_col].dataType.typeName() in ("long", "integer", "short", "byte"):
        bucket = (F.col(ts_col) - F.pmod(F.col(ts_col), F.lit(interval))).cast(
            "long"
        )
    else:
        bucket = (
            F.floor(F.col(ts_col) / F.lit(interval)) * F.lit(interval)
        ).cast("long")
    per = (
        df.withColumn("__bucket", bucket)
        .groupBy(key_col, "__bucket")
        .agg(*[c.alias(name) for name, c in aggs.items()])
    )
    grid = (
        per.groupBy(key_col)
        .agg(F.min("__bucket").alias("__lo"), F.max("__bucket").alias("__hi"))
        .select(
            key_col,
            F.explode(
                F.sequence(F.col("__lo"), F.col("__hi"), F.lit(interval))
            ).alias("__bucket"),
        )
    )
    out = grid.join(per, [key_col, "__bucket"], "left")
    names = list(aggs)
    if fill == "zero":
        out = out.select(
            key_col,
            "__bucket",
            *[F.coalesce(F.col(n), F.lit(0)).alias(n) for n in names],
        )
    elif fill == "ffill":
        w = (
            Window.partitionBy(key_col)
            .orderBy("__bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = out.select(
            key_col,
            "__bucket",
            *[F.last(n, ignorenulls=True).over(w).alias(n) for n in names],
        )
    return out.withColumnRenamed("__bucket", "bucket")


# ---------------------------------------------------------------------------
# edit-distance (fuzzy) join
# ---------------------------------------------------------------------------

def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str | None = None,
    max_dist: int = 1,
    left_id: str = "left_id",
    right_id: str = "right_id",
    strip_pattern: str | None = None,
    max_candidates_per_segment: int | None = 5_000_000,
) -> DataFrame:
    """EXACT edit-distance join: all (left, right) pairs with
    levenshtein <= ``max_dist`` — entity matching / key reconciliation.

    PassJoin-style candidate generation (Li, Deng & Feng 2011,
    pigeonhole form): a right string of length L >= d+1 splits into
    d+1 segments; <= d edits leave at least one segment untouched, and
    an untouched segment appears verbatim in the left string within
    +-d of its original position. So the candidate join key is
    (target length L, segment index, substring) — the right side emits
    d+1 segment rows, the left side O(d^2) substring probes per
    candidate length — and the (tiny) candidate set is verified with
    one exact ``levenshtein``. Strings shorter than d+1 can have empty
    segments (pigeonhole void), so they take a length-band fallback:
    right strings with L <= d join every left string within the length
    band — a bounded set (only near-empty strings) that keeps the
    result exact.

    Never an all-pairs cross join: the quadratic work collapses to an
    equi-join on segment content, the same shape at any corpus size.

    CAVEAT — segment entropy: the candidate count is the number of
    pairs sharing any (length, segment) value, so a LOW-ENTROPY segment
    degrades to all-pairs: ID-style strings with a long shared prefix
    ("Customer#000000…") put the constant prefix in segment 0 and every
    string pair becomes a candidate (measured: 15k such names at d=1 →
    225M candidates, 335 s; 3k diverse words → instant). Two built-in
    defenses:

    * ``strip_pattern``: a regex removed (``regexp_replace`` with '')
      from BOTH join keys before matching — normalize scaffolding
      (constant prefixes, zero-padding) off so segments carry the
      variable part. Output ids are the originals; ``dist`` is the
      edit distance of the STRIPPED keys (the normalized-matching
      contract, same as lowercasing first).
    * ``max_candidates_per_segment`` (default 5M): a plan-side guard
      that counts candidate pairs per (length, segment-index, segment)
      join key and ``raise_error``s — naming the offending segment and
      the strip_pattern remediation — before the wedge join can run an
      explosion. Cost: two extra hash-aggs over the probe/segment
      tables plus a small guard join (partial aggregation makes the
      shuffled agg buffers segment-cardinality-sized, far below the
      row tables); measured ~0.7 s on the gate's entity-resolution
      query — the price of failing in seconds instead of stalling for
      minutes. Set ``None`` to disable on keys known to be diverse.
    """
    if max_dist < 1:
        raise ValueError("fuzzy_join: max_dist must be >= 1")
    d = max_dist
    rc = right_col or left_col
    lk, rk = F.col(left_col), F.col(rc)
    if strip_pattern is not None:
        lk = F.regexp_replace(lk, strip_pattern, "")
        rk = F.regexp_replace(rk, strip_pattern, "")
    l2 = left.select(F.col(left_id), lk.alias("__lv"))
    r2 = right.select(F.col(right_id), rk.alias("__rv"))

    # --- right side: d+1 segments (only for L >= d+1) ------------------
    L = F.length("__rv")
    base, rem = (L / (d + 1)).cast("int"), L % (d + 1)
    seg_rows = []
    for i in range(d + 1):
        seg_len = base + F.when(F.lit(i) < rem, 1).otherwise(0)
        start = F.lit(i) * base + F.least(F.lit(i), rem) + 1  # 1-based
        seg_rows.append(
            F.struct(
                F.lit(i).alias("i"),
                start.alias("pos"),
                F.substring("__rv", start, seg_len).alias("seg"),
            )
        )
    r_seg = (
        r2.filter(L >= d + 1)
        .select(
            right_id,
            "__rv",
            L.alias("__L"),
            F.explode(F.array(*seg_rows)).alias("s"),
        )
        .select(right_id, "__rv", "__L", "s.i", "s.seg")
    )

    # --- left side: substring probes per candidate length --------------
    M = F.length("__lv")
    probe_rows = []
    for dl in range(-d, d + 1):  # target right length L = M + dl
        tl = M + dl
        tbase, trem = (tl / (d + 1)).cast("int"), tl % (d + 1)
        for i in range(d + 1):
            seg_len = tbase + F.when(F.lit(i) < trem, 1).otherwise(0)
            start = F.lit(i) * tbase + F.least(F.lit(i), trem) + 1
            for delta in range(-d, d + 1):
                pos = start + delta
                probe_rows.append(
                    F.struct(
                        tl.alias("__L"),
                        F.lit(i).alias("i"),
                        F.when(
                            (tl >= d + 1)
                            & (pos >= 1)
                            & (pos + seg_len - 1 <= M)
                            & (seg_len >= 1),
                            F.substring("__lv", pos, seg_len),
                        ).alias("seg"),
                    )
                )
    l_probe = (
        l2.select(left_id, "__lv", F.explode(F.array(*probe_rows)).alias("p"))
        .select(left_id, "__lv", "p.__L", "p.i", "p.seg")
        .filter(F.col("seg").isNotNull())
        .distinct()
    )
    if max_candidates_per_segment is not None:
        # candidate-explosion guard: pairs per segment key = n_left *
        # n_right; over-limit segments raise_error AT EXECUTION, before
        # the wedge join materializes the explosion. The count aggs
        # recompute the probe/segment lineage (their exchanges carry
        # partial-agg buffers, so ReuseExchange cannot share them with
        # the join's row exchanges), but map-side combine shrinks the
        # shuffled data to segment cardinality.
        keys = ["__L", "i", "seg"]
        cl = l_probe.groupBy(*keys).agg(F.count(F.lit(1)).alias("__nl"))
        cr = r_seg.groupBy(*keys).agg(F.count(F.lit(1)).alias("__nr"))
        guard = cl.join(cr, keys).select(
            *keys,
            F.when(
                F.col("__nl") * F.col("__nr")
                > F.lit(int(max_candidates_per_segment)),
                F.raise_error(
                    F.concat(
                        F.lit(
                            "fuzzy_join: candidate explosion — segment "
                        ),
                        F.col("seg"),
                        F.lit(" (target length "),
                        F.col("__L").cast("string"),
                        F.lit(", index "),
                        F.col("i").cast("string"),
                        F.lit(") is shared by "),
                        F.col("__nl").cast("string"),
                        F.lit(" left probes x "),
                        F.col("__nr").cast("string"),
                        F.lit(
                            " right strings. Low-entropy keys (shared "
                            "prefixes / zero-padding) degrade PassJoin "
                            "to all-pairs: pass strip_pattern= to "
                            "normalize the scaffolding off, or raise "
                            "max_candidates_per_segment if the volume "
                            "is intended."
                        ),
                    )
                ).cast("int"),
            )
            .otherwise(F.lit(1))
            .alias("__g"),
        )
        # inner join is lossless here: a segment absent from either
        # side produces no candidates anyway
        r_seg = r_seg.join(guard, keys).filter(F.col("__g") == 1).drop("__g")
    cand = l_probe.join(r_seg, ["__L", "i", "seg"]).select(
        left_id, "__lv", right_id, "__rv"
    )

    # --- short-string fallback (pigeonhole void when L <= d) ------------
    shorts = r2.filter(F.length("__rv") <= d)
    band = l2.join(
        F.broadcast(shorts),
        F.abs(F.length("__lv") - F.length("__rv")) <= d,
    ).select(left_id, "__lv", right_id, "__rv")

    return (
        cand.unionByName(band)
        .distinct()
        .withColumn("dist", F.levenshtein("__lv", "__rv"))
        .filter(F.col("dist") <= d)
        .select(left_id, right_id, "dist")
    )


def attribute_conversions(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    conversion_pred: Column,
    touch_pred: Column,
    horizon: int,
    touch_cols: list[str] | None = None,
) -> DataFrame:
    """Marketing-style conversion attribution: for every conversion
    event, find the FIRST-touch and LAST-touch qualifying event by the
    same key within ``horizon`` time units before the conversion
    (exclusive of the conversion instant itself: ``conv_ts - horizon
    <= touch_ts < conv_ts``). Returns the conversion rows with
    ``first_<c>`` / ``last_<c>`` columns for each requested touch
    column plus ``n_touches``.

    Scale shape: NOT a naive (key) self-join — per-key touch × conv
    pairing explodes on heavy users. Both sides are banded by
    ``floor(ts / horizon)`` and joined on (key, band) with each
    conversion probing exactly two bands (its own and the previous) —
    the binned big-big interval-join pattern, so the join fan-out per
    conversion is bounded by the touches inside a 2-horizon window,
    independent of total per-key history. One shuffle on (key, band),
    then a (conv) hash-agg takes min_by/max_by over touch timestamps —
    no window over the corpus."""
    if horizon <= 0:
        raise ValueError("attribute_conversions: horizon must be > 0")
    touch_cols = touch_cols or []
    k, ts = F.col(key_col), F.col(ts_col)
    conv = events.filter(conversion_pred).select(
        k.alias("__k"),
        ts.alias("__cts"),
        F.explode(
            F.array(
                F.floor(ts / horizon).cast("bigint"),
                (F.floor(ts / horizon) - 1).cast("bigint"),
            )
        ).alias("__band"),
        "*",
    )
    touch = events.filter(touch_pred).select(
        k.alias("__tk"),
        ts.alias("__tts"),
        F.floor(ts / horizon).cast("bigint").alias("__tband"),
        *[F.col(c).alias(f"__t_{c}") for c in touch_cols],
    )
    j = conv.join(
        touch,
        (F.col("__k") == F.col("__tk"))
        & (F.col("__band") == F.col("__tband"))
        & (F.col("__tts") < F.col("__cts"))
        & (F.col("__tts") >= F.col("__cts") - horizon),
        "left",
    )
    group_cols = [c for c in conv.columns if c != "__band"]
    aggs = [F.count(F.col("__tts")).alias("n_touches")]
    for c in touch_cols:
        aggs.append(
            F.min_by(F.col(f"__t_{c}"), F.col("__tts")).alias(f"first_{c}")
        )
        aggs.append(
            F.max_by(F.col(f"__t_{c}"), F.col("__tts")).alias(f"last_{c}")
        )
    # a conversion appears in 2 band rows; the (all conv cols) group
    # collapses them — touch rows matched via band are distinct per
    # (conv, touch) pair because a touch lives in exactly one band
    out = j.groupBy(*group_cols).agg(*aggs)
    return out.drop("__k", "__cts")


def transition_matrix(
    df: DataFrame,
    key_col: str,
    ts_col: str | list[str],
    state_col: str,
    include_terminal: bool = False,
) -> DataFrame:
    """First-order Markov transition estimates over per-key ordered
    event streams: for every (state, next_state) pair, the observed
    count and row-normalized probability P(next | current). With
    ``include_terminal`` each key's last event also emits a
    ``(state, NULL)`` terminal transition.

    Scale shape: one ``lead`` window per key (partition-bounded — the
    per-key event list, never the corpus) + one hash-agg on the pair +
    a second tiny agg for the row totals joined back (states², bounded).
    The classic funnel-exploration / next-action model as one plan."""
    from pyspark.sql import Window as W

    order_cols = [ts_col] if isinstance(ts_col, str) else list(ts_col)
    # pass a uniquifying tie-break column (e.g. event id) alongside the
    # timestamp — equal timestamps otherwise make `lead` order-dependent
    w = W.partitionBy(key_col).orderBy(*order_cols)
    pairs = df.select(
        F.col(state_col).alias("state"),
        F.lead(F.col(state_col)).over(w).alias("next_state"),
    )
    if not include_terminal:
        pairs = pairs.filter(F.col("next_state").isNotNull())
    counts = pairs.groupBy("state", "next_state").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("state").agg(F.sum("n").alias("__tot"))
    return (
        counts.join(totals, "state")
        .select(
            "state",
            "next_state",
            "n",
            (F.col("n") / F.col("__tot")).alias("p"),
        )
    )


def sequence_ngrams(
    df: DataFrame,
    key_col: str,
    ts_col: str | list[str],
    state_col: str,
    n: int = 3,
) -> DataFrame:
    """Sequential pattern counts: every length-``n`` run of consecutive
    states within a key's ordered event stream, with occurrence counts
    — the raw table behind next-action models and funnel discovery
    (the k-gram generalization of :func:`transition_matrix`). Returns
    (g1..gn, n_occurrences).

    Scale shape: n-1 ``lead`` columns over ONE per-key window (windows
    share the single sort), then one hash-agg on the n-gram — the
    stream never re-shuffles per gram position."""
    from pyspark.sql import Window as W

    if n < 2:
        raise ValueError("sequence_ngrams: n must be >= 2")
    order_cols = [ts_col] if isinstance(ts_col, str) else list(ts_col)
    w = W.partitionBy(key_col).orderBy(*order_cols)
    cols = [F.col(state_col).alias("g1")] + [
        F.lead(F.col(state_col), i).over(w).alias(f"g{i + 1}")
        for i in range(1, n)
    ]
    grams = df.select(*cols).filter(F.col(f"g{n}").isNotNull())
    return grams.groupBy(*[f"g{i + 1}" for i in range(n)]).agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )


def survival_curve(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    unit: int,
    horizon: int,
) -> DataFrame:
    """Kaplan-Meier retention/survival estimate over an event stream:
    each key's lifetime starts at its first event; a key is a CHURN
    (observed death) if its last event is more than ``horizon`` time
    units before the corpus end, with lifetime = last - first; keys
    still active near the corpus end are CENSORED at observation end.
    Durations are bucketed by ``unit`` (e.g. a day in the ts scale).
    Returns one row per distinct duration bucket t:
    (t, n_at_risk, n_churned, n_censored, survival) with
    ``S(t) = prod_{u<=t} (1 - d_u / n_u)`` — the product-limit
    estimator (Kaplan & Meier 1958) that handles censoring correctly
    where a naive "fraction retained" curve is biased.

    Scale shape: one per-key hash-agg (first/last), one duration
    hash-agg, then ONE ordered window over the distinct-duration table
    (bounded by the duration range, not keys); the product is
    exp(running-sum(ln)) with an exact-zero guard when every at-risk
    key churns in a bucket."""
    if unit <= 0 or horizon < 0:
        raise ValueError("survival_curve: unit must be > 0, horizon >= 0")
    per = df.groupBy(key_col).agg(
        F.min(ts_col).alias("__first"), F.max(ts_col).alias("__last")
    )
    tmax = per.agg(F.max("__last").alias("__tmax"))
    life = per.crossJoin(tmax).select(
        F.when(
            F.col("__last") <= F.col("__tmax") - horizon,
            ((F.col("__last") - F.col("__first")) / unit).cast("bigint"),
        )
        .otherwise(((F.col("__tmax") - F.col("__first")) / unit).cast("bigint"))
        .alias("t"),
        (F.col("__last") <= F.col("__tmax") - horizon).cast("int").alias("__d"),
    )
    buck = life.groupBy("t").agg(
        F.sum("__d").alias("n_churned"),
        F.sum(1 - F.col("__d")).alias("n_censored"),
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = buck.agg(
        F.sum(F.col("n_churned") + F.col("n_censored")).alias("__n")
    )
    r = buck.crossJoin(tot).withColumn(
        "n_at_risk",
        F.col("__n")
        - F.coalesce(
            F.sum(F.col("n_churned") + F.col("n_censored")).over(w), F.lit(0)
        ),
    )
    # S(t): running product of (1 - d/n); a bucket where d == n drives
    # S to exact 0 (ln would be -inf) — carry a running "hit zero" flag
    frac = F.col("n_churned") / F.col("n_at_risk")
    zero_hit = F.max((frac >= 1.0).cast("int")).over(wall)
    log_term = F.when(frac < 1.0, F.log(1.0 - frac)).otherwise(F.lit(0.0))
    s = F.when(zero_hit == 1, F.lit(0.0)).otherwise(
        F.exp(F.sum(log_term).over(wall))
    )
    return r.select(
        "t",
        "n_at_risk",
        "n_churned",
        "n_censored",
        s.alias("survival"),
    )


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support_count: int = 2,
    max_basket_size: int | None = 256,
) -> DataFrame:
    """Market-basket association rules (Agrawal & Srikant 1994 family,
    pairwise): for every DIRECTED item pair (a -> b) co-occurring in at
    least ``min_support_count`` baskets, emit
    ``support = n_ab / N``, ``confidence = n_ab / n_a`` and
    ``lift = confidence / (n_b / N)``. Returns (antecedent, consequent,
    n_pair, support, confidence, lift).

    Scale shape: ONE distinct (basket, item) hash-agg — the distinct
    result is ``localCheckpoint``-ed so the N-baskets count action and
    the main plan share it instead of re-running the tokenize/shuffle
    per consumer (the r05 persist-shared-plans lesson) — one
    item-support hash-agg, one basket self-join whose fan-out is
    bounded by the square of the basket size, one pair hash-agg, two
    item-cardinality joins AQE broadcasts unhinted.
    ``max_basket_size`` applies the cap discipline to the one unbounded
    input and is ON by default (256 — far above real carts/co-purchase
    sets, small enough to bound a degenerate all-items basket at ~32k
    pairs): baskets larger than the cap are DROPPED from pair
    generation (N and item supports keep counting them, so surviving
    metrics stay conservative; pass ``None`` to uncap). Quantify what a
    cap excluded with :func:`association_rules_overflow`."""
    if min_support_count < 1:
        raise ValueError("association_rules: min_support_count must be >= 1")
    bi = (
        df.select(F.col(basket_col).alias("__b"), F.col(item_col).alias("__i"))
        .distinct()
        .localCheckpoint()
    )
    n_baskets = bi.select("__b").distinct().count()
    item_n = bi.groupBy("__i").agg(F.count(F.lit(1)).alias("__ni"))
    pairs_src = bi
    if max_basket_size is not None:
        pairs_src = (
            bi.withColumn(
                "__bs", F.count(F.lit(1)).over(Window.partitionBy("__b"))
            )
            .filter(F.col("__bs") <= max_basket_size)
            .drop("__bs")
        )
    a = pairs_src.select(F.col("__b"), F.col("__i").alias("__ia"))
    b = pairs_src.select(F.col("__b"), F.col("__i").alias("__ib"))
    co = (
        a.join(b, "__b")
        .filter(F.col("__ia") < F.col("__ib"))
        .groupBy("__ia", "__ib")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_support_count)
    )
    directed = co.unionByName(
        co.select(
            F.col("__ib").alias("__ia"), F.col("__ia").alias("__ib"), "n_pair"
        )
    )
    out = (
        directed.join(
            item_n.select(F.col("__i").alias("__ia"), F.col("__ni").alias("__na")),
            "__ia",
        )
        .join(
            item_n.select(F.col("__i").alias("__ib"), F.col("__ni").alias("__nb")),
            "__ib",
        )
        .select(
            F.col("__ia").alias("antecedent"),
            F.col("__ib").alias("consequent"),
            "n_pair",
            (F.col("n_pair") / F.lit(float(n_baskets))).alias("support"),
            (F.col("n_pair") / F.col("__na")).alias("confidence"),
            (
                (F.col("n_pair") / F.col("__na"))
                / (F.col("__nb") / F.lit(float(n_baskets)))
            ).alias("lift"),
        )
    )
    return out


def association_rules_overflow(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket_size: int = 256,
) -> DataFrame:
    """Report the baskets :func:`association_rules` would DROP from pair
    generation under ``max_basket_size`` — one row per over-cap basket
    with its distinct-item count (the excluded pair mass is
    ``n_items * (n_items - 1) / 2`` per basket). Same distinct
    (basket, item) projection as the operator, so report and cap can
    never disagree. Empty result means the cap is inert at this
    corpus."""
    bi = df.select(
        F.col(basket_col).alias(basket_col), F.col(item_col).alias("__i")
    ).distinct()
    return (
        bi.groupBy(basket_col)
        .agg(F.count(F.lit(1)).alias("n_items"))
        .filter(F.col("n_items") > max_basket_size)
    )


def cusum_changepoints(
    df: DataFrame,
    order_col: str,
    value_col: str,
    key_cols: tuple = (),
    slack: float = 0.0,
    threshold: float | None = None,
) -> DataFrame:
    """Two-sided CUSUM change detection over an ordered series (Page
    1954): the textbook recurrences ``s+_i = max(0, s+_{i-1} + d_i)``
    and ``s-_i = max(0, s-_{i-1} - d_i)`` with ``d_i = x_i - mean -
    slack`` — rewritten as PLAIN PREFIX WINDOWS via the running-min
    identity ``s_i = c_i - min(0, min_{j<=i} c_j)`` (c = cumulative sum
    of d), so the whole detector is cumsum + running-min windows with
    no recursion, replayable on any SQL engine and shuffled once per
    key — WHEN ``key_cols`` is given. With no keys the prefix windows
    have no partition and move the ENTIRE input through one task: key
    the series or only call unkeyed on a provably bounded input (e.g.
    a per-day calendar aggregate, as the entry query does). Adds
    ``cusum_pos``, ``cusum_neg`` and (when ``threshold`` is given)
    ``is_change``. The per-key mean is the exact SUM/COUNT of the
    whole key group (one window), so integer-valued series replay
    bit-exactly across engines."""
    keys = [F.col(k) for k in key_cols]
    wall = Window.partitionBy(*keys) if key_cols else Window.partitionBy()
    word = (
        Window.partitionBy(*keys) if key_cols else Window.partitionBy()
    ).orderBy(order_col).rowsBetween(Window.unboundedPreceding, 0)
    x = F.col(value_col).cast("double")
    mean = F.sum(x).over(wall) / F.count(F.lit(1)).over(wall)
    d_pos = x - mean - F.lit(float(slack))
    d_neg = -(x - mean) - F.lit(float(slack))
    out = df.withColumn("__cp", F.sum(d_pos).over(word)).withColumn(
        "__cn", F.sum(d_neg).over(word)
    )
    out = out.withColumn(
        "cusum_pos",
        F.col("__cp") - F.least(F.lit(0.0), F.min("__cp").over(word)),
    ).withColumn(
        "cusum_neg",
        F.col("__cn") - F.least(F.lit(0.0), F.min("__cn").over(word)),
    ).drop("__cp", "__cn")
    if threshold is not None:
        out = out.withColumn(
            "is_change",
            (F.col("cusum_pos") > threshold) | (F.col("cusum_neg") > threshold),
        )
    return out


# ---------------------------------------------------------------------------
# customer/market analytics battery (round 9): RFM, Gini, HHI, TWAP,
# OHLC, DAU/MAU stickiness, day-of-week seasonality, percent change
# ---------------------------------------------------------------------------
def _ntile_2phase(
    df: DataFrame, n_bins: int, order_cols: list, out_col: str
) -> DataFrame:
    """Exact global ``ntile(n_bins)`` over a TOTAL order without a
    single-partition window (the §2 scale-killer an unpartitioned
    ``Window.orderBy`` compiles to): range-partition on the order,
    rank locally per partition (a pid-partitioned window — parallel),
    turn local ranks global with per-partition row-count offsets (the
    classic 2-phase global-index pattern), then apply Spark's ntile
    bucket arithmetic to the global rank. Bit-identical to
    ``F.ntile(n_bins).over(Window.orderBy(*order_cols))`` — asserted by
    a parity pytest — because the order is total (callers tie-break on
    a unique key) and ntile is pure arithmetic on (rank, N).

    The partition-count table is collected to the driver — bounded by
    the cluster's shuffle-partition count, the connected_components
    bounded-collect precedent. One localCheckpoint pins the sampled
    range boundaries so the count pass and the rank pass see the same
    partition assignment (a re-run range exchange may re-sample)."""
    spark = df.sparkSession
    try:
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        n_part = spark.sparkContext.defaultParallelism
    d = (
        df.repartitionByRange(n_part, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    cnts = sorted(
        (r["__pid"], r["cnt"])
        for r in d.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    total = sum(c for _, c in cnts)
    offsets, acc = {}, 0
    for pid, c in cnts:
        offsets[pid] = acc
        acc += c
    off = F.create_map(
        *[F.lit(x) for pc in offsets.items() for x in pc]
    ) if offsets else F.create_map()
    lrn = F.row_number().over(
        Window.partitionBy("__pid").orderBy(*order_cols)
    )
    rank = (off[F.col("__pid")] + lrn).alias("__rank")
    # Spark's NTile bucket arithmetic: the first (total % n_bins)
    # buckets hold one extra row
    q, rem = divmod(total, n_bins)
    r = F.col("__rank")
    head = (q + 1) * rem
    bucket = F.when(
        r <= F.lit(head), ((r - 1) / F.lit(q + 1)).cast("long")
    ).otherwise(
        # q == 0 implies head == total, so this branch never divides by 0
        F.lit(rem) + ((r - F.lit(head) - 1) / F.lit(max(q, 1))).cast("long")
    ) + 1
    return (
        d.select("*", rank)
        .withColumn(out_col, bucket.cast("int"))
        .drop("__pid", "__rank")
    )


def rfm_segments(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    amount_col: str,
    n_bins: int = 4,
    ref_ts=None,
    partitioned_rank: bool = False,
) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary quartiles —
    the classic customer-value grid): per entity, recency = ``ref_ts -
    max(ts)`` (default ref = the corpus max, so recency 0 is the most
    recent entity), frequency = row count, monetary = amount sum; each
    metric is then binned with ``ntile(n_bins)`` so that bin
    ``n_bins`` is the BEST (most recent / most frequent / highest
    spend), with ties broken by the entity id for engine-exact
    determinism. Returns (entity, recency, frequency, monetary,
    r, f, m, segment) with ``segment = r*100 + f*10 + m``.

    Scale shape: one per-entity hash-agg (map-side partials), then
    three ntile windows over the AGGREGATE table — one row per entity,
    a bounded reduction of the input; at 1e9+ entities swap the exact
    ntile for approx-quantile cuts (quantile_bins) — the aggregation
    pass is unchanged."""
    if n_bins < 2:
        raise ValueError("rfm_segments: n_bins must be >= 2")
    ent = F.col(entity_col)
    ref = ref_ts if ref_ts is not None else F.max(ts_col)
    agg = df.groupBy(entity_col).agg(
        F.max(ts_col).alias("__maxts"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(amount_col).alias("monetary"),
    )
    if ref_ts is None:
        refv = agg.agg(F.max("__maxts").alias("__ref"))
        agg = agg.crossJoin(refv)
    else:
        agg = agg.withColumn("__ref", F.lit(ref_ts))
    agg = agg.withColumn(
        "recency", F.col("__ref") - F.col("__maxts")
    ).drop("__maxts", "__ref")
    if partitioned_rank:
        # scale path (r10, verdict item 3): three 2-phase exact ntiles
        # instead of three unpartitioned windows — each global sort
        # otherwise funnels the whole per-entity aggregate through ONE
        # task. Bit-identical output (parity pytest drives both paths).
        out = _ntile_2phase(
            agg, n_bins, [F.col("recency").desc(), ent.asc()], "r"
        )
        out = _ntile_2phase(
            out, n_bins, [F.col("frequency").asc(), ent.asc()], "f"
        )
        out = _ntile_2phase(
            out, n_bins, [F.col("monetary").asc(), ent.asc()], "m"
        )
        return out.withColumn(
            "segment", F.col("r") * 100 + F.col("f") * 10 + F.col("m")
        )
    wr = Window.orderBy(F.col("recency").desc(), ent.asc())
    wf = Window.orderBy(F.col("frequency").asc(), ent.asc())
    wm = Window.orderBy(F.col("monetary").asc(), ent.asc())
    return (
        agg.withColumn("r", F.ntile(n_bins).over(wr))
        .withColumn("f", F.ntile(n_bins).over(wf))
        .withColumn("m", F.ntile(n_bins).over(wm))
        .withColumn(
            "segment",
            F.col("r") * 100 + F.col("f") * 10 + F.col("m"),
        )
    )


def gini_coefficient(
    df: DataFrame,
    value_col: str,
    group_cols: tuple = (),
) -> DataFrame:
    """Per-group Gini coefficient of a non-negative value column (the
    standard inequality index for spend/token/degree concentration):
    with the group's values sorted ascending,
    ``G = 2 * Σ i·x_i / (n · Σ x) − (n + 1) / n``. Returns one row per
    group: (group..., n, total, gini). Negative values raise (Gini is
    undefined); all-zero groups return gini = 0.

    Scale shape: one row_number window per group (ties broken by value
    then input order are irrelevant — the formula depends only on the
    sorted multiset) + one hash-agg; the window shuffles once on the
    group key. With NO group_cols the sort is global — call it on
    grouped data or bounded inputs (the benford/cusum caveat)."""
    keys = [F.col(c) for c in group_cols]
    x = F.col(value_col).cast("double")
    guarded = F.when(
        x < 0,
        F.raise_error(
            F.concat(
                F.lit("gini_coefficient: negative value "),
                x.cast("string"),
            )
        ),
    ).otherwise(x)
    w = (
        Window.partitionBy(*keys) if group_cols else Window.partitionBy()
    ).orderBy(F.col("__x").asc())
    ranked = df.select(*keys, guarded.alias("__x")).withColumn(
        "__i", F.row_number().over(w)
    )
    agg = ranked.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__x").alias("total"),
        F.sum(F.col("__i") * F.col("__x")).alias("__ix"),
    )
    gini = F.when(
        F.col("total") > 0,
        2.0 * F.col("__ix") / (F.col("n") * F.col("total"))
        - (F.col("n") + 1) / F.col("n"),
    ).otherwise(F.lit(0.0))
    return agg.select(*group_cols, "n", "total", gini.alias("gini"))


def hhi_concentration(
    df: DataFrame,
    entity_col: str,
    value_col: str,
    group_cols: tuple = (),
) -> DataFrame:
    """Herfindahl–Hirschman market-concentration index per group:
    entity shares ``s_i = x_i / Σx`` within the group,
    ``hhi = Σ s_i²`` (1/n_entities = perfectly even, 1 = monopoly).
    Returns (group..., n_entities, total, hhi). Two hash-aggs, no
    window, no sort — fully scalable at any group/entity cardinality."""
    keys = [F.col(c) for c in group_cols]
    per_ent = df.groupBy(*keys, F.col(entity_col)).agg(
        F.sum(F.col(value_col).cast("double")).alias("__x")
    )
    agg = per_ent.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_entities"),
        F.sum("__x").alias("total"),
        F.sum(F.col("__x") * F.col("__x")).alias("__x2"),
    )
    hhi = F.when(
        F.col("total") != 0,
        F.col("__x2") / (F.col("total") * F.col("total")),
    ).otherwise(F.lit(0.0))
    return agg.select(*group_cols, "n_entities", "total", hhi.alias("hhi"))


def twap(
    df: DataFrame,
    key_cols: tuple,
    order_col: str,
    price_col: str,
) -> DataFrame:
    """Time-weighted average price per key (the TWAP fill benchmark /
    sensor-average semantics): each observation holds until the next
    one, so ``twap = Σ price_i · (t_{i+1} − t_i) / (t_last − t_first)``
    — the piecewise-constant integral divided by the span. The final
    observation has zero holding time (it contributes only as the
    closing endpoint); single-observation keys return that price.
    Returns (key..., n_obs, t_first, t_last, twap).

    Scale shape: one lead window per key (single shuffle on the key,
    per-key sort) + one hash-agg. Duplicate timestamps within a key
    get zero weight except the last at that instant — deterministic
    because the window orders by (t, price)."""
    keys = [F.col(c) for c in key_cols]
    w = Window.partitionBy(*keys).orderBy(
        F.col(order_col).asc(), F.col(price_col).asc()
    )
    t = F.col(order_col).cast("double")
    nxt = F.lead(order_col).over(w).cast("double")
    stepped = df.select(
        *keys,
        F.col(order_col),
        F.col(price_col),
        ((F.coalesce(nxt, t) - t) * F.col(price_col).cast("double")).alias(
            "__area"
        ),
    )
    agg = stepped.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.min(order_col).alias("t_first"),
        F.max(order_col).alias("t_last"),
        F.sum("__area").alias("__area"),
        F.min_by(price_col, F.struct(order_col, price_col)).alias("__p0"),
    )
    span = F.col("t_last").cast("double") - F.col("t_first").cast("double")
    return agg.select(
        *key_cols,
        "n_obs",
        "t_first",
        "t_last",
        F.when(span > 0, F.col("__area") / span)
        .otherwise(F.col("__p0").cast("double"))
        .alias("twap"),
    )


def ohlc(
    df: DataFrame,
    key_cols: tuple,
    bucket_col: str,
    ts_col: str,
    price_col: str,
) -> DataFrame:
    """OHLC candlestick aggregation per (key, bucket): open/close are
    the first/last prices by (ts, price) order — the price tiebreak
    makes simultaneous observations deterministic on every engine —
    high/low are max/min, volume is the row count. One hash-agg with
    struct-ordered min_by/max_by (no window, no sort): the candlestick
    table is a pure reduction, scalable at any key cardinality."""
    keys = [F.col(c) for c in key_cols]
    ordkey = F.struct(F.col(ts_col), F.col(price_col))
    return df.groupBy(*keys, F.col(bucket_col)).agg(
        F.min_by(price_col, ordkey).alias("open"),
        F.max(price_col).alias("high"),
        F.min(price_col).alias("low"),
        F.max_by(price_col, ordkey).alias("close"),
        F.count(F.lit(1)).alias("volume"),
    )


def dau_mau(
    events: DataFrame,
    day_col: str,
    user_col: str,
    window_days: int = 30,
) -> DataFrame:
    """DAU/MAU stickiness per day: DAU = distinct users active that
    day, MAU = distinct users active in the trailing ``window_days``
    (day inclusive), stickiness = dau/mau — the standard engagement
    ratio. ``day_col`` must be an integer day index (e.g. epoch days).
    Returns (day, dau, mau, stickiness) for every day present.

    Scale shape: one (day, user) distinct hash-agg, then the trailing
    distinct is an equi-join of that table against the day list with a
    BOUNDED fan-out of ``window_days`` rows per (day, user) — never a
    corpus-wide window — followed by two hash-aggs. Exact (no sketch);
    for very long windows swap in the HLL rollup
    (hll_distinct_rollup) — same join shape."""
    if window_days < 1:
        raise ValueError("dau_mau: window_days must be >= 1")
    du = events.select(
        F.col(day_col).alias("__day"), F.col(user_col).alias("__u")
    ).distinct()
    days = du.select(F.col("__day").alias("__d")).distinct()
    dau = du.groupBy(F.col("__day").alias("__d")).agg(
        F.count(F.lit(1)).alias("dau")
    )
    mau = (
        du.join(
            days,
            (F.col("__d") >= F.col("__day"))
            & (F.col("__d") < F.col("__day") + window_days),
        )
        .select("__d", "__u")
        .distinct()
        .groupBy("__d")
        .agg(F.count(F.lit(1)).alias("mau"))
    )
    return (
        dau.join(mau, "__d")
        .select(
            F.col("__d").alias("day"),
            "dau",
            "mau",
            (F.col("dau") / F.col("mau")).alias("stickiness"),
        )
    )


def pct_change(
    df: DataFrame,
    key_cols: tuple,
    order_col: str,
    value_col: str,
    periods: int = 1,
) -> DataFrame:
    """Period-over-period percent change per key:
    ``(x − lag(x, periods)) / lag(x, periods)`` over the key's
    ``order_col`` order (NULL for the first ``periods`` rows and
    where the base is 0 — explicit, instead of an ANSI divide-by-zero
    error). One lag window per key: single shuffle, per-key sort."""
    if periods < 1:
        raise ValueError("pct_change: periods must be >= 1")
    keys = [F.col(c) for c in key_cols]
    w = (
        Window.partitionBy(*keys) if key_cols else Window.partitionBy()
    ).orderBy(F.col(order_col).asc())
    base = F.lag(F.col(value_col).cast("double"), periods).over(w)
    return df.withColumn(
        "pct_change",
        F.when(
            base.isNotNull() & (base != 0),
            (F.col(value_col).cast("double") - base) / base,
        ),
    )


def scd2_history(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    attr_col: str,
) -> DataFrame:
    """Build a slowly-changing-dimension TYPE-2 history from a change
    stream (Kimball SCD2): per key, collapse consecutive runs of equal
    ``attr_col`` (ordered by ``order_cols``) into validity intervals —
    one row per (key, run) with ``valid_from`` = the run's first order
    key, ``valid_to`` = the NEXT run's first order key (NULL while
    current, half-open [from, to)), the run's row count, and
    ``is_current``. NULL attr values are a real state (null-safe
    change comparison), and repeated identical observations extend the
    current interval instead of opening a new one — the property that
    distinguishes SCD2 from a raw snapshot log.

    Scale shape: three per-key ordered windows (lag → run-id prefix
    sum → lead), all partitioned by the key — ONE shuffle on the key,
    never a global sort; per-key history length bounds every frame.
    ``order_cols`` must be a deterministic total order within each key
    (include a tiebreaker id when timestamps can collide) — otherwise
    run boundaries are engine-dependent."""
    if not order_cols:
        raise ValueError("scd2_history: order_cols must be non-empty")
    worder = Window.partitionBy(key_col).orderBy(*order_cols)
    wrun = worder.rowsBetween(Window.unboundedPreceding, 0)
    attr = F.col(attr_col)
    # the first row of a key ALWAYS opens run 1 — without the
    # row_number branch a key whose first attr is NULL would start at
    # run 0 (NULL <=> NULL is true), shifting its version numbers
    changed = F.when(F.row_number().over(worder) == 1, 1).otherwise(
        (~attr.eqNullSafe(F.lag(attr_col, 1).over(worder))).cast("int")
    )
    runs = df.withColumn("__chg", changed).withColumn(
        "__run", F.sum("__chg").over(wrun)
    )
    first_order = order_cols[0]
    per_run = runs.groupBy(key_col, "__run").agg(
        F.first(attr_col).alias(attr_col),
        F.min(first_order).alias("valid_from"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    wnext = Window.partitionBy(key_col).orderBy("__run")
    return (
        per_run.withColumn(
            "valid_to", F.lead("valid_from", 1).over(wnext)
        )
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(
            key_col,
            F.col("__run").alias("version"),
            attr_col,
            "valid_from",
            "valid_to",
            "n_rows",
            "is_current",
        )
    )


def ewma(
    df: DataFrame,
    bucket_col: str,
    value_col: str,
    alpha: float = 0.3,
    span: int = 20,
    key_cols: tuple = (),
) -> DataFrame:
    """Exponentially-weighted moving average over an integer-bucketed
    series (e.g. day numbers): ``ewma_t = Σ_{k=0..span} (1−α)^k ·
    x_{t−k} / Σ (1−α)^k`` — the adjust-normalized pandas/ES form,
    TRUNCATED at ``span`` buckets back so the plan is bounded (at
    α = 0.3, span = 20 the dropped tail weighs < 0.08 % — pick span ≈
    ln(tol)/ln(1−α)). Weights decay by BUCKET distance, so calendar
    gaps decay through missing buckets rather than being ignored —
    the time-aware convention. Returns (keys…, bucket, value, ewma,
    n_terms).

    Scale shape: NO recursion and NO unbounded window — the truncated
    sum is a banded self-join: each QUERY row posts to 2 coarse bands
    of width ``span`` (its own and the previous — its ≤ span-back
    sources can live nowhere else, and each source matches via exactly
    ONE band, its own, so no pair double-counts), the join is an
    EQUI-join on (keys…, band) with the ≤ span bucket-distance filter
    on top, then one per-(keys…, bucket) hash-agg. Fan-out per row is
    bounded by 2 · span regardless of series length or key count."""
    if not 0 < alpha < 1:
        raise ValueError("ewma: alpha must be in (0, 1)")
    if span < 1:
        raise ValueError("ewma: span must be >= 1")
    keys = list(key_cols)
    base = df.select(
        *keys,
        F.col(bucket_col).cast("long").alias("__t"),
        F.col(value_col).cast("double").alias("__x"),
    )
    left = base.select(
        *keys,
        "__t",
        "__x",
        F.explode(
            F.array(
                F.floor(F.col("__t") / span),
                F.floor(F.col("__t") / span) - 1,
            )
        ).alias("__band"),
    ).select(*keys, "__band", F.col("__t").alias("__tq"),
             F.col("__x").alias("__xq"))
    right = base.select(
        *[F.col(k).alias(k) for k in keys],
        F.floor(F.col("__t") / span).alias("__band"),
        F.col("__t").alias("__ts"),
        F.col("__x").alias("__xs"),
    )
    joined = left.join(right, [*keys, "__band"]).filter(
        (F.col("__ts") <= F.col("__tq"))
        & (F.col("__ts") > F.col("__tq") - F.lit(span + 1))
    )
    wgt = F.pow(F.lit(1.0 - alpha), (F.col("__tq") - F.col("__ts")))
    out = joined.groupBy(*keys, "__tq").agg(
        F.sum(wgt * F.col("__xs")).alias("__num"),
        F.sum(wgt).alias("__den"),
        F.count(F.lit(1)).alias("n_terms"),
        F.max(F.when(F.col("__ts") == F.col("__tq"), F.col("__xs"))).alias(
            "__self"
        ),
    )
    return out.select(
        *keys,
        F.col("__tq").alias(bucket_col),
        F.col("__self").alias(value_col),
        (F.col("__num") / F.col("__den")).alias("ewma"),
        "n_terms",
    )


def seasonal_naive_backtest(
    df: DataFrame,
    bucket_col: str,
    value_col: str,
    season: int = 7,
    key_cols: tuple = (),
) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each bucket's value
    with the value ``season`` buckets earlier (the yhat every real
    forecaster must beat — M-competition baseline) and score the
    errors per key: MAE, RMSE, and SMAPE (the symmetric 0-200 % form,
    robust to near-zero actuals). Returns one row per key
    (keys…, n_scored, mae, rmse, smape) over the buckets that HAVE a
    season-back observation — gaps score nothing rather than
    fabricating a forecast.

    Scale shape: ONE self-equi-join on (keys…, bucket − season) + one
    per-key hash-agg — no window, no sort; at any corpus size the
    join fan-out is 1:1. Error moments sum per key (float sums —
    order-dependent in the last ulp; quantize upstream if bit-exact
    cross-engine replay is required, as the entry query does with
    integer cents)."""
    if season < 1:
        raise ValueError("seasonal_naive_backtest: season must be >= 1")
    keys = list(key_cols)
    base = df.select(
        *keys,
        F.col(bucket_col).cast("long").alias("__t"),
        F.col(value_col).cast("double").alias("__y"),
    )
    past = base.select(
        *[F.col(k).alias(k) for k in keys],
        (F.col("__t") + season).alias("__t"),
        F.col("__y").alias("__yhat"),
    )
    scored = base.join(past, [*keys, "__t"])
    err = F.col("__y") - F.col("__yhat")
    denom = F.abs(F.col("__y")) + F.abs(F.col("__yhat"))
    smape_term = F.when(
        denom > 0, F.lit(200.0) * F.abs(err) / denom
    ).otherwise(F.lit(0.0))
    agg = scored.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.sum(F.abs(err)).alias("__sae"),
        F.sum(err * err).alias("__sse"),
        F.sum(smape_term).alias("__ssm"),
    )
    n = F.col("n_scored").cast("double")
    return agg.select(
        *keys,
        "n_scored",
        (F.col("__sae") / n).alias("mae"),
        F.sqrt(F.col("__sse") / n).alias("rmse"),
        (F.col("__ssm") / n).alias("smape"),
    )


def vwap(
    df: DataFrame,
    bucket_col: str,
    price_col: str,
    volume_col: str,
    key_cols: tuple = (),
) -> DataFrame:
    """Volume-weighted average price per bucket: ``Σ p·v / Σ v`` —
    the execution-quality benchmark (TWAP's volume-aware sibling;
    :func:`twap` weights by time-in-state instead). One hash-agg with
    map-side partials; zero-volume buckets return NULL vwap rather
    than dividing by zero. Integer-quantized prices/volumes make the
    sums engine-exact (the entry query feeds cents)."""
    keys = list(key_cols)
    p = F.col(price_col).cast("double")
    v = F.col(volume_col).cast("double")
    agg = df.groupBy(*keys, bucket_col).agg(
        F.sum(p * v).alias("__pv"),
        F.sum(v).alias("__v"),
        F.count(F.lit(1)).alias("n_trades"),
    )
    return agg.select(
        *keys,
        bucket_col,
        F.when(F.col("__v") > 0, F.col("__pv") / F.col("__v")).alias(
            "vwap"
        ),
        F.col("__v").alias("volume"),
        "n_trades",
    )


def skyline2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """2-D skyline / Pareto front, BOTH dimensions minimized (negate
    a column upstream to maximize it): keep the rows no other row
    dominates (≤ in both dims, < in at least one). Duplicated (x, y)
    points survive together (equality never dominates — the standard
    skyline convention). Returns the input rows that are on the
    front.

    Scale shape: the 2-D case needs NO pairwise join — a point is
    dominated iff some strictly-smaller-x row has y ≤ its y, or an
    equal-x row has strictly smaller y. Both tests are running-MIN
    windows (one RANGE frame ordered by x, one equal-x partition),
    so the plan is one global sort of the CANDIDATE table + two
    window passes. Call it on bounded aggregate tables (the
    entity-level price/size table, not raw events) — the sort is by
    x over whatever you pass in. Higher dimensions need the
    partition-local + merge skyline algorithm; this operator is
    deliberately the exact 2-D fast path."""
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    wless = (
        Window.orderBy(x)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    weq = Window.partitionBy(x)
    staged = df.withColumn(
        "__minless", F.min(y).over(wless)
    ).withColumn("__mineq", F.min(y).over(weq))
    dominated = (
        F.col("__minless").isNotNull() & (F.col("__minless") <= y)
    ) | (F.col("__mineq") < y)
    return staged.filter(~dominated).drop("__minless", "__mineq")


def abc_analysis(
    df: DataFrame,
    entity_col: str,
    value_col: str,
    a_cut: float = 0.8,
    b_cut: float = 0.95,
) -> DataFrame:
    """ABC / Pareto classification (the inventory-management 80-15-5
    split): entities ranked by value descending, class A while the
    running value share ≤ ``a_cut``, B while ≤ ``b_cut``, else C —
    the "which 20 % of parts carry 80 % of revenue" read. Ties break
    by entity id for engine-exact determinism; the running share uses
    the row's OWN cumulative value (inclusive frame), so the first
    entity past a cut still belongs to the higher class iff its
    cumulative share is within the cut. Returns (entity, value,
    cum_share, abc_class).

    Scale shape: one per-entity hash-agg upstream of the call (the
    caller aggregates), then ONE global sort + running-sum window
    over the ENTITY table — a bounded reduction of the input — plus a
    1-row total via window. Feed integer-quantized values for
    bit-exact cross-engine replay."""
    if not 0 < a_cut < b_cut <= 1:
        raise ValueError("abc_analysis: need 0 < a_cut < b_cut <= 1")
    ent = F.col(entity_col)
    v = F.col(value_col).cast("double")
    wcum = Window.orderBy(F.col(value_col).desc(), ent.asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    staged = df.select(
        entity_col,
        value_col,
        (F.sum(v).over(wcum) / F.sum(v).over(wall)).alias("cum_share"),
    )
    return staged.withColumn(
        "abc_class",
        F.when(F.col("cum_share") <= a_cut, F.lit("A"))
        .when(F.col("cum_share") <= b_cut, F.lit("B"))
        .otherwise(F.lit("C")),
    )


def stl_lite(
    df: DataFrame,
    bucket_col: str,
    value_col: str,
    period: int = 7,
    anomaly_sigma: float = 3.0,
) -> DataFrame:
    """Additive seasonal decomposition, STL-lite (the classical
    decompose: Cleveland's STL without the loess robustness loop):
    ``trend`` = centered ``period``-bucket moving average, ``seasonal``
    = per-phase mean of the detrended series re-centered to sum to
    zero, ``resid`` = y − trend − seasonal, plus ``is_anomaly`` when
    |resid| exceeds ``anomaly_sigma`` residual standard deviations —
    the first-pass "is Tuesday always low, and was THIS Tuesday
    weird" read on any calendar series. Returns (bucket, value,
    trend, seasonal, resid, is_anomaly).

    Scale shape: one centered ROWS window (±period/2) + phase
    hash-aggs joined back + two 1-row aggregates via window — all
    over the SERIES table (bounded calendar aggregate, the
    theil_sen/kendall contract; key the series upstream for per-key
    decomposition by calling per key group). Engine-exact: phase and
    bucket arithmetic is integer; the detrended/residual sums are
    quantized to decimal(15,6) so phase means and the sigma replay
    order-independently."""
    if period < 2:
        raise ValueError("stl_lite: period must be >= 2")
    half = period // 2
    t = F.col(bucket_col).cast("long")
    y = F.col(value_col).cast("double")
    worder = Window.orderBy("__t").rowsBetween(-half, half)
    base = df.select(
        t.alias("__t"),
        y.alias("__y"),
        (F.pmod(t, F.lit(period))).alias("__phase"),
    ).withColumn("__trend", F.avg("__y").over(worder))
    det = base.withColumn("__d", F.col("__y") - F.col("__trend"))
    phase = det.groupBy("__phase").agg(
        (
            F.sum(F.col("__d").cast("decimal(15,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("__praw")
    )
    wall = Window.partitionBy()
    phase = phase.withColumn(
        "__seasonal",
        F.col("__praw")
        - F.sum(F.col("__praw").cast("decimal(15,6)")).over(wall).cast(
            "double"
        )
        / F.count(F.lit(1)).over(wall),
    ).drop("__praw")
    out = det.join(phase, "__phase").withColumn(
        "__resid", F.col("__d") - F.col("__seasonal")
    )
    n = F.count(F.lit(1)).over(wall)
    s1 = F.sum(F.col("__resid").cast("decimal(15,6)")).over(wall).cast(
        "double"
    )
    s2 = F.sum(
        (F.col("__resid") * F.col("__resid")).cast("decimal(25,12)")
    ).over(wall).cast("double")
    sigma = F.sqrt((s2 - s1 * s1 / n) / (n - 1))
    return out.select(
        F.col("__t").alias(bucket_col),
        F.col("__y").alias(value_col),
        F.col("__trend").alias("trend"),
        F.col("__seasonal").alias("seasonal"),
        F.col("__resid").alias("resid"),
        (F.abs(F.col("__resid")) > F.lit(float(anomaly_sigma)) * sigma)
        .alias("is_anomaly"),
    )


def growth_accounting(
    df: DataFrame,
    entity_col: str,
    bucket_col: str,
) -> DataFrame:
    """Growth accounting (the product-analytics user-state ledger):
    per bucket, count entities that are NEW (first-ever bucket),
    RETAINED (active this bucket and the previous), RESURRECTED
    (active this bucket, not the previous, seen before), and CHURNED
    (active the previous bucket, not this one — attributed to the
    bucket they went missing). Identity per bucket b:
    ``active(b) = new + retained + resurrected`` and
    ``churned(b) = active(b−1) − retained(b)``. The final bucket
    emits no churn row beyond the corpus (churn needs the next
    bucket's evidence), and a bucket with ZERO active entities emits
    no row at all — if your series can go fully dark for a bucket,
    resample the bucket spine upstream or the dark bucket's churn
    mass is unreported. Returns (bucket, n_active, n_new,
    n_retained, n_resurrected, n_churned).

    Scale shape: one distinct (entity, bucket) hash-agg, a per-entity
    MIN for first buckets, one self-equi-join on (entity, bucket−1)
    for the previous-bucket test, and a final per-bucket hash-agg —
    all equi-joins on the entity key, no window over raw events."""
    pres = df.select(
        F.col(entity_col).alias("__e"),
        F.col(bucket_col).cast("long").alias("__b"),
    ).distinct()
    first = pres.groupBy("__e").agg(F.min("__b").alias("__first"))
    prev = pres.select(
        "__e", (F.col("__b") + 1).alias("__b"), F.lit(1).alias("__had")
    )
    status = (
        pres.join(first, "__e")
        .join(prev, ["__e", "__b"], "left")
        .select(
            "__b",
            F.when(F.col("__b") == F.col("__first"), "new")
            .when(F.col("__had").isNotNull(), "retained")
            .otherwise("resurrected")
            .alias("__s"),
        )
    )
    act = status.groupBy("__b").agg(
        F.count(F.lit(1)).alias("n_active"),
        F.sum(F.when(F.col("__s") == "new", 1).otherwise(0)).alias(
            "n_new"
        ),
        F.sum(F.when(F.col("__s") == "retained", 1).otherwise(0)).alias(
            "n_retained"
        ),
        F.sum(
            F.when(F.col("__s") == "resurrected", 1).otherwise(0)
        ).alias("n_resurrected"),
    )
    last_b = pres.agg(F.max("__b").alias("__max"))
    prev_act = act.select(
        (F.col("__b") + 1).alias("__b"),
        F.col("n_active").alias("__prev_active"),
    )
    out = (
        act.join(prev_act, "__b", "left")
        .crossJoin(last_b)
        .withColumn(
            "n_churned",
            F.when(
                F.col("__b") <= F.col("__max"),
                F.coalesce(F.col("__prev_active"), F.lit(0))
                - F.col("n_retained"),
            ),
        )
        .drop("__prev_active", "__max")
    )
    return out.withColumnRenamed("__b", bucket_col)
