"""Data-quality validation (Deequ/Great-Expectations-style) as ONE
Spark pass per check class.

The 100-TB discipline: row-level constraints (null fraction, range,
set membership, regex) all fold into a SINGLE aggregate over one scan
— conditional sums, never one job per rule. Uniqueness adds one hash
agg on the checked key; referential integrity is a left-anti count
against the (usually much smaller, AQE-broadcast) dimension. Every
metric is a plain number, so validation reports are SQL-replayable
and diffable run-over-run.

Checks are plain dicts (declarative, serializable for configs):

    validate(df, [
        {"check": "not_null",   "col": "o_custkey"},
        {"check": "unique",     "cols": ["o_orderkey"]},
        {"check": "range",      "col": "o_totalprice", "lo": 0},
        {"check": "in_set",     "col": "o_orderstatus",
         "values": ["O", "F", "P"]},
        {"check": "matches",    "col": "o_orderpriority",
         "pattern": "^[1-5]-"},
        {"check": "foreign_key", "cols": ["o_custkey"],
         "ref": customer_df, "ref_cols": ["c_custkey"]},
    ], max_violation_frac=0.0)

Returns one row per check: (check, target, n_rows, n_violations,
violation_frac, passed).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ROW_CHECKS = ("not_null", "range", "in_set", "matches")


def _row_violation(rule: dict):
    kind = rule["check"]
    c = F.col(rule["col"])
    if kind == "not_null":
        return c.isNull()
    if kind == "range":
        v = F.lit(False)
        if "lo" in rule:
            v = v | (c < F.lit(rule["lo"]))
        if "hi" in rule:
            v = v | (c > F.lit(rule["hi"]))
        return c.isNull() | v
    if kind == "in_set":
        return c.isNull() | ~c.isin(list(rule["values"]))
    if kind == "matches":
        return c.isNull() | ~c.rlike(rule["pattern"])
    raise ValueError(f"unknown row check {kind!r}")


def _target(rule: dict) -> str:
    return rule.get("col") or ",".join(rule.get("cols", []))


def validate(
    df: DataFrame,
    rules: list[dict],
    max_violation_frac: float = 0.0,
) -> DataFrame:
    """Run every rule; see module docstring for the rule forms. All
    row-level rules share ONE aggregate job; each `unique` adds a
    count-vs-distinct agg and each `foreign_key` one anti-join count —
    still one scan of `df` per check class, never per rule."""
    if not rules:
        raise ValueError("validate: rules must be non-empty")
    row_rules = [r for r in rules if r["check"] in _ROW_CHECKS]
    other = [r for r in rules if r["check"] not in _ROW_CHECKS]

    parts: list[DataFrame] = []
    if row_rules:
        agg = df.agg(
            F.count(F.lit(1)).alias("__n"),
            *[
                F.sum(_row_violation(r).cast("long")).alias(f"__v{i}")
                for i, r in enumerate(row_rules)
            ],
        )
        rows = [
            F.struct(
                F.lit(r["check"]).alias("check"),
                F.lit(_target(r)).alias("target"),
                F.col("__n").alias("n_rows"),
                F.col(f"__v{i}").alias("n_violations"),
            )
            for i, r in enumerate(row_rules)
        ]
        parts.append(
            agg.select(F.explode(F.array(*rows)).alias("r")).select("r.*")
        )

    for r in other:
        if r["check"] == "unique":
            cols = r["cols"]
            per = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("__c"))
            parts.append(
                per.agg(
                    F.lit("unique").alias("check"),
                    F.lit(",".join(cols)).alias("target"),
                    F.coalesce(F.sum("__c"), F.lit(0)).alias("n_rows"),
                    F.coalesce(
                        F.sum(F.when(F.col("__c") > 1, F.col("__c"))), F.lit(0)
                    ).alias("n_violations"),
                )
            )
        elif r["check"] == "foreign_key":
            cols, ref, ref_cols = r["cols"], r["ref"], r["ref_cols"]
            keys = df.select(
                *[F.col(a).alias(b) for a, b in zip(cols, ref_cols)]
            )
            dangling = keys.join(
                ref.select(*ref_cols).distinct(), ref_cols, "left_anti"
            )
            n = df.agg(F.count(F.lit(1)).alias("n")).select(
                F.lit("foreign_key").alias("check"),
                F.lit(",".join(cols)).alias("target"),
                F.col("n").alias("n_rows"),
            )
            v = dangling.agg(F.count(F.lit(1)).alias("n_violations"))
            parts.append(n.withColumn("__k", F.lit(1)).join(
                F.broadcast(v.withColumn("__k", F.lit(1))), "__k"
            ).drop("__k"))
        else:
            raise ValueError(f"unknown check {r['check']!r}")

    out = reduce(lambda a, b: a.unionByName(b), parts)
    frac = F.when(
        F.col("n_rows") > 0, F.col("n_violations") / F.col("n_rows")
    ).otherwise(F.lit(0.0))
    return out.select(
        "check",
        "target",
        "n_rows",
        "n_violations",
        F.round(frac, 9).alias("violation_frac"),
        (frac <= F.lit(max_violation_frac)).alias("passed"),
    )


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Numeric dataset-card profile: one row per column with count,
    null count, min/max, exact-decimal mean, population std, exact
    quartiles, and distinct count — the describe()++ that feeds a
    data card or drift monitor.

    ALL metrics for ALL columns ride ONE aggregate pass (conditional
    agg slots, map-side partials) except distinct counts (one
    approx-free agg per column is wasteful at scale, so distincts use
    HLL sketches — exact in the sparse regime, ±0.8 % beyond; see
    operators/sketches.py). Quartiles use Spark's exact ``percentile``
    (O(distinct) buffer — for unbounded continuous columns at 100 TB
    swap in percentile_approx, same caveat as llmdata.features)."""
    if not cols:
        raise ValueError("profile_columns: cols must be non-empty")
    aggs = []
    for c in cols:
        x = F.col(c)
        dec = x.try_cast("decimal(15,6)")
        n = F.count(x)
        aggs.extend(
            [
                F.count(F.lit(1)).alias(f"{c}__rows"),
                (F.count(F.lit(1)) - n).alias(f"{c}__nulls"),
                F.min(x).cast("double").alias(f"{c}__min"),
                F.max(x).cast("double").alias(f"{c}__max"),
                (F.sum(dec).cast("double") / n).alias(f"{c}__mean"),
                (F.sum(dec * dec).cast("double") / n).alias(f"{c}__m2"),
                F.percentile(x, F.lit(0.25)).alias(f"{c}__q1"),
                F.percentile(x, F.lit(0.5)).alias(f"{c}__q2"),
                F.percentile(x, F.lit(0.75)).alias(f"{c}__q3"),
                # hll_sketch_agg takes int/bigint/string/binary only —
                # doubles count distinct by their canonical string form
                F.hll_sketch_estimate(
                    F.hll_sketch_agg(x.cast("string"), F.lit(14))
                ).alias(f"{c}__nd"),
            ]
        )
    one = df.agg(*aggs)
    rows = []
    for c in cols:
        var = F.col(f"{c}__m2") - F.col(f"{c}__mean") * F.col(f"{c}__mean")
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}__rows").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__min").alias("min"),
                F.col(f"{c}__max").alias("max"),
                F.round(F.col(f"{c}__mean"), 9).alias("mean"),
                F.round(F.sqrt(F.greatest(var, F.lit(0.0))), 9).alias("std"),
                F.round(F.col(f"{c}__q1"), 9).alias("q1"),
                F.round(F.col(f"{c}__q2"), 9).alias("q2"),
                F.round(F.col(f"{c}__q3"), 9).alias("q3"),
                F.col(f"{c}__nd").alias("n_distinct"),
            )
        )
    return one.select(F.explode(F.array(*rows)).alias("r")).select("r.*")
