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


# ---------------------------------------------------------------------- #
# distribution drift (training-data / model monitoring)
# ---------------------------------------------------------------------- #
def psi_report(
    df_ref: DataFrame,
    df_new: DataFrame,
    col: str,
    n_bins: int = 10,
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Population Stability Index between a reference snapshot and a
    new one: bin edges = the reference's ``n_bins`` equal-frequency
    quantiles, then ``PSI = sum (p_new - p_ref) * ln(p_new / p_ref)``
    over the bins (add-0.5 Haldane smoothing on counts so empty bins
    can't produce +-inf). Standard monitoring thresholds: < 0.1
    stable, 0.1-0.25 moderate shift, > 0.25 major shift.

    Returns one row: (psi, n_bins_used, n_ref, n_new). NULL values of
    ``col`` are EXCLUDED from both sides (they would otherwise pool
    into the lowest bin and skew PSI when null rates differ between
    snapshots); monitor null-rate drift separately via
    ``profile_columns``'s n_nulls.

    Scale shape: one percentile agg on the reference (exact, or
    GK-approx via ``exact=False`` for continuous 100-TB columns),
    edges joined on as a 1-row cross join, one conditional-count agg
    per side; the driver never sees data rows."""
    if n_bins < 2:
        raise ValueError("psi_report: n_bins must be >= 2")
    ps = [i / n_bins for i in range(1, n_bins)]
    if exact:
        edges_agg = F.array(
            *[F.percentile(F.col(col), F.lit(p)) for p in ps]
        )
    else:
        edges_agg = F.transform(
            F.percentile_approx(
                F.col(col), F.array(*[F.lit(p) for p in ps]), F.lit(accuracy)
            ),
            lambda t: t.cast("double"),
        )
    edges = df_ref.agg(edges_agg.alias("__edges"))

    def binned_counts(df: DataFrame, side: str) -> DataFrame:
        df = df.filter(F.col(col).isNotNull())
        b = df.crossJoin(edges).select(
            F.size(
                F.filter(F.col("__edges"), lambda e: e <= F.col(col))
            ).alias("__bin")
        )
        return b.groupBy("__bin").agg(
            F.count(F.lit(1)).alias(f"__n_{side}")
        )

    r = binned_counts(df_ref, "ref")
    n = binned_counts(df_new, "new")
    j = r.join(n, "__bin", "full").select(
        F.coalesce("__n_ref", F.lit(0)).alias("r"),
        F.coalesce("__n_new", F.lit(0)).alias("n"),
    )
    return j.crossJoin(
        j.agg(F.sum("r").alias("tr"), F.sum("n").alias("tn"))
    ).agg(
        F.sum(
            (
                (F.col("n") + 0.5) / (F.col("tn") + 0.5 * n_bins)
                - (F.col("r") + 0.5) / (F.col("tr") + 0.5 * n_bins)
            )
            * F.log(
                ((F.col("n") + 0.5) / (F.col("tn") + 0.5 * n_bins))
                / ((F.col("r") + 0.5) / (F.col("tr") + 0.5 * n_bins))
            )
        ).alias("psi"),
        F.count(F.lit(1)).alias("n_bins_used"),
        F.max("tr").alias("n_ref"),
        F.max("tn").alias("n_new"),
    )


def ks_statistic(
    df_a: DataFrame, df_b: DataFrame, col: str
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic: ``sup_x |F_a(x) -
    F_b(x)|`` computed exactly over the pooled value set. Returns one
    row (ks, n_a, n_b).

    Scale shape: tag-and-union both sides, ONE hash-agg per distinct
    value (per-value counts), one ordered running-sum window over the
    DISTINCT-value table (this is the only global sort, and it sorts
    distinct values, not rows), then a max agg. For continuous columns
    whose distinct count approaches the row count, bin/round upstream
    first."""
    a = df_a.select(F.col(col).alias("v")).withColumn("__s", F.lit(0))
    b = df_b.select(F.col(col).alias("v")).withColumn("__s", F.lit(1))
    u = a.unionByName(b).filter(F.col("v").isNotNull())
    per = u.groupBy("v").agg(
        F.sum(F.when(F.col("__s") == 0, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("__s") == 1, 1).otherwise(0)).alias("cb"),
    )
    from pyspark.sql import Window as W

    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    run = per.select(
        F.sum("ca").over(w).alias("ra"), F.sum("cb").over(w).alias("rb")
    )
    return run.crossJoin(
        per.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    ).agg(
        F.max(
            F.abs(
                F.col("ra") / F.col("na") - F.col("rb") / F.col("nb")
            )
        ).alias("ks"),
        F.max("na").alias("n_a"),
        F.max("nb").alias("n_b"),
    )


# ---------------------------------------------------------------------- #
# privacy / governance
# ---------------------------------------------------------------------- #
def k_anonymity_report(
    df: DataFrame, quasi_identifiers: list[str], k: int = 5
) -> DataFrame:
    """k-anonymity audit over a set of quasi-identifier columns: a
    dataset is k-anonymous iff every quasi-identifier combination
    occurs >= k times (Sweeney 2002). Returns one row: (k_anonymity =
    the actual minimum class size, n_classes, n_violating_classes,
    n_violating_rows, frac_violating_rows) — the release gate before
    sharing event/user data.

    One hash-agg on the quasi-identifier tuple + one agg over the
    class-size table (class-cardinality bounded). No sort, no driver
    data."""
    if not quasi_identifiers:
        raise ValueError("k_anonymity_report: quasi_identifiers is empty")
    classes = df.groupBy(*quasi_identifiers).agg(
        F.count(F.lit(1)).alias("__n")
    )
    return classes.agg(
        F.min("__n").alias("k_anonymity"),
        F.count(F.lit(1)).alias("n_classes"),
        F.sum(F.when(F.col("__n") < k, 1).otherwise(0)).alias(
            "n_violating_classes"
        ),
        F.sum(F.when(F.col("__n") < k, F.col("__n")).otherwise(0)).alias(
            "n_violating_rows"
        ),
        (
            F.sum(F.when(F.col("__n") < k, F.col("__n")).otherwise(0))
            / F.sum("__n")
        ).alias("frac_violating_rows"),
    )


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str] | str,
    epsilon: float = 1.0,
    secret_seed: str | None = None,
) -> DataFrame:
    """Epsilon-differentially-private group counts via the Laplace
    mechanism (Dwork et al. 2006): ``count + Lap(1/epsilon)`` per
    group (count queries have sensitivity 1).

    PRIVACY CONTRACT — the noise must be unpredictable to every
    consumer of the release, or the mechanism provides NO privacy
    (anyone who can recompute the noise subtracts it and recovers
    exact counts). Two modes:

    * ``secret_seed=None`` (default): real randomness — ``F.rand()``
      with a fresh Spark-chosen seed. Not reproducible, not
      SQL-replayable; this is the safe default for an actual release.
    * ``secret_seed=<high-entropy string>``: reproducible release via
      a KEYED construction — the uniform draw is derived from
      ``sha256(secret || group)``, so the noise is unpredictable
      without the key. The seed must (a) carry real entropy (>= 16
      chars enforced, use >= 128 random bits in practice), (b) stay
      secret forever — publishing or reusing it voids the epsilon
      guarantee, and (c) serve exactly ONE release: re-releasing the
      same stats with fresh seeds composes epsilon like any repeated
      DP query. There is deliberately NO default seed.

    One hash-agg + map-only noise arithmetic; group-cardinality
    bounded output."""
    keys = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    if epsilon <= 0:
        raise ValueError("dp_noisy_counts: epsilon must be > 0")
    g = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    if secret_seed is None:
        # fresh nondeterministic uniform in (-0.5, 0.5); F.rand() is
        # [0, 1) so floor the exact-0 endpoint away from log(0). The
        # floor must survive the -0.5 subtraction (ulp(0.5) ~ 1.1e-16,
        # so 1e-300 would be absorbed and log(0) would still occur)
        u = F.greatest(F.rand(), F.lit(1e-15)) - 0.5
    else:
        secret = str(secret_seed)
        if len(secret) < 16:
            raise ValueError(
                "dp_noisy_counts: secret_seed must be a high-entropy "
                "secret of >= 16 characters (use >= 128 random bits); "
                "it must stay secret and be used for exactly one "
                "release, or the release has no privacy"
            )
        key_str = F.concat_ws(
            "|", F.lit(secret), *[F.col(c).cast("string") for c in keys]
        )
        h = F.conv(
            F.substring(F.sha2(key_str, 256), 1, 15), 16, 10
        ).cast("bigint")
        u = (F.pmod(h, F.lit(1 << 30)) + 0.5) / float(1 << 30) - 0.5
    lap = -(1.0 / epsilon) * F.signum(u) * F.log(1 - 2 * F.abs(u))
    return g.select(
        *keys,
        "n",
        (F.col("n") + lap).alias("noisy_n"),
    )


def benford_report(
    df: DataFrame,
    value_col: str,
    group_cols: tuple = (),
) -> DataFrame:
    """Benford's-law first-digit audit — the classic fraud/synthetic-
    data screen for naturally-occurring positive magnitudes (amounts,
    populations, counts spanning several orders of magnitude): the
    observed share of each leading significant digit d (1..9) is
    compared against the Benford expectation ``log10(1 + 1/d)``, and a
    per-group chi-square statistic summarizes the deviation
    (``n * sum (obs_share - exp_share)^2 / exp_share``). Returns one
    row per (group, digit): n, observed share, expected share, and the
    group's chi2 repeated on each row for cheap filtering.

    First digit extracted arithmetically — ``floor(x / 10^floor(
    log10(x)))`` — not by string formatting, so it is exact for any
    positive double and replays identically in any SQL engine.
    Non-positive and null values are excluded (Benford is undefined
    there). Plan: one projection + one (group, digit) hash-agg + one
    bounded per-group window (<= 9 rows per group). With NO
    ``group_cols`` that window has no partition — harmless here only
    because the windowed input is the post-agg digit grid (<= 9 rows
    total), never the raw values; the raw-input scan stays a
    distributed hash-agg either way."""
    from pyspark.sql import Window

    keys = [F.col(c) for c in group_cols]
    x = F.col(value_col).cast("double")
    digit = F.floor(x / F.pow(F.lit(10.0), F.floor(F.log10(x)))).cast("int")
    base = df.filter(x > 0).select(*keys, digit.alias("digit"))
    counts = base.groupBy(*([*group_cols, "digit"])).agg(
        F.count(F.lit(1)).alias("n_digit")
    )
    # densify to ALL 9 digit cells per group: a digit with zero
    # observations still contributes (0 - exp)^2 / exp to chi2, so a
    # sparse left join would understate the statistic
    grid = (
        counts.select(*group_cols).distinct()
        if group_cols
        else counts.sparkSession.range(1).select()
    ).crossJoin(
        counts.sparkSession.range(1, 10).select(
            F.col("id").cast("int").alias("digit")
        )
    )
    dense = grid.join(counts, [*group_cols, "digit"], "left").select(
        *group_cols, "digit", F.coalesce("n_digit", F.lit(0)).alias("n_digit")
    )
    w = Window.partitionBy(*group_cols) if group_cols else Window.partitionBy()
    exp_share = F.log10(F.lit(1.0) + 1.0 / F.col("digit"))
    out = dense.withColumn("n_total", F.sum("n_digit").over(w)).select(
        *group_cols,
        "digit",
        "n_digit",
        (F.col("n_digit") / F.col("n_total")).alias("obs_share"),
        exp_share.alias("exp_share"),
        F.col("n_total"),
    )
    chi = (
        F.col("n_total")
        * (F.col("obs_share") - F.col("exp_share"))
        * (F.col("obs_share") - F.col("exp_share"))
        / F.col("exp_share")
    )
    return out.withColumn("chi2", F.sum(chi).over(w)).drop("n_total")
