"""Feature scaling for training pipelines — group-wise z-score and
min-max normalization.

Shape: one hash aggregate for the per-group moments (map-side
partials), broadcast-joined back onto the rows — two scans total, no
window over the corpus (a Window.partitionBy here would sort every
group; the agg+join form is pure hash work and the moments table is
tiny). Moments use decimal accumulation so the oracle replay is exact.

BROADCAST BOUNDEDNESS: every F.broadcast() below ships one row per
GROUP (a few fixed-width columns), i.e. it is bounded by group-key
cardinality, not data size. The hints are safe as long as callers key
by a bounded dimension (source, language, type-bucket...); a
million-group key still broadcasts ~tens of MB. Keying by a
row-unique column makes scaling meaningless anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# |values| must stay below this for the decimal(15,6) moment
# accumulators (9 integer digits); _moments enforces it loudly.
_MOMENTS_ABS_MAX = 1e9


def _group_join(
    df: DataFrame,
    per_group: DataFrame,
    key_col: str,
    hint_broadcast: bool = True,
) -> DataFrame:
    """Join per-group aggregates back onto rows WITHOUT dropping
    NULL-keyed rows: groupBy treats NULL as its own group, so the
    join-back uses null-safe equality (<=>, still a hash-join key for
    Catalyst) where a plain equi-join would silently drop every
    NULL-keyed input row. Left join so row count is always
    preserved."""
    right = per_group.withColumnRenamed(key_col, "__gj_key")
    if hint_broadcast:
        right = F.broadcast(right)
    return df.join(
        right, F.col(key_col).eqNullSafe(F.col("__gj_key")), "left"
    ).drop("__gj_key")


def _moments(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    # decimal(15,6) squares keep the product's full 12-decimal scale
    # inside Spark's 38-digit cap (decimal(38,6)² would silently round
    # the square back to scale 6 — a 1e-6 error the SQL oracle, whose
    # decimal rules differ, does not reproduce); sums stay exact, the
    # conversion to double happens once on the exact totals.
    #
    # SUPPORTED RANGE: |value| < 1e9, quantized to 1e-6 by the cast.
    # Out-of-range inputs would NULL the sum in non-ANSI mode and
    # silently skew the mean (null-skipping sum), so the same hash agg
    # carries max(abs(x)) and the moment columns raise_error at
    # execution time instead — loud, and free of an extra scan.
    # try_cast (not cast) so ANSI sessions reach the guard's uniform
    # message instead of dying inside the cast with a decimal error.
    dec = F.col(value_col).try_cast("decimal(15,6)")
    n = F.count(F.lit(1))
    guard = lambda c: F.when(  # noqa: E731
        F.col("__absmax") >= F.lit(_MOMENTS_ABS_MAX),
        F.raise_error(
            F.concat(
                F.lit(
                    f"_moments: |{value_col}| must be < 1e9 for exact "
                    "decimal(15,6) accumulation; got group "
                ),
                F.col(key_col).cast("string"),
                F.lit(" with max(abs)="),
                F.col("__absmax").cast("string"),
            )
        ).cast("double"),
    ).otherwise(c)
    raw = df.groupBy(key_col).agg(
        (F.sum(dec).cast("double") / n).alias("__mean0"),
        (F.sum(dec * dec).cast("double") / n).alias("__m20"),
        F.min(value_col).alias("__min"),
        F.max(value_col).alias("__max"),
        F.max(F.abs(F.col(value_col).cast("double"))).alias("__absmax"),
    )
    return raw.select(
        key_col,
        guard(F.col("__mean0")).alias("__mean"),
        guard(F.col("__m20")).alias("__m2"),
        "__min",
        "__max",
    )


def standardize_by_group(
    df: DataFrame, key_col: str, value_col: str, out_col: str | None = None
) -> DataFrame:
    """z-score per group: (x - mean) / population-std. Groups with zero
    variance (or a single row) standardize to 0.0 rather than dividing
    by zero (Spark 4 ANSI mode would raise on the bare division)."""
    out_col = out_col or f"{value_col}_z"
    m = _moments(df, key_col, value_col)
    var = F.col("__m2") - F.col("__mean") * F.col("__mean")
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    joined = _group_join(df, m, key_col)
    return joined.withColumn(
        out_col,
        F.when(std > 0, (F.col(value_col) - F.col("__mean")) / std).otherwise(0.0),
    ).drop("__mean", "__m2", "__min", "__max")


def minmax_by_group(
    df: DataFrame, key_col: str, value_col: str, out_col: str | None = None
) -> DataFrame:
    """[0, 1] min-max per group; constant groups map to 0.0."""
    out_col = out_col or f"{value_col}_mm"
    m = _moments(df, key_col, value_col)
    span = F.col("__max") - F.col("__min")
    joined = _group_join(df, m, key_col)
    return joined.withColumn(
        out_col,
        F.when(span > 0, (F.col(value_col) - F.col("__min")) / span).otherwise(0.0),
    ).drop("__mean", "__m2", "__min", "__max")


def winsorize_by_group(
    df: DataFrame,
    key_col: str,
    value_col: str,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
    out_col: str | None = None,
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Winsorize (clip) per group at quantiles: values below the p_lo
    quantile (or above p_hi) clamp to it — the outlier guard applied
    before z-scoring model features.

    ``exact=True`` uses Spark's exact ``percentile`` aggregate, whose
    DuckDB ``quantile_cont`` interpolation matches exactly (oracle-
    checkable) — but its aggregation buffer holds EVERY DISTINCT value
    per group, an executor-OOM risk for a high-cardinality continuous
    column at 100-TB scale. ``exact=False`` switches to
    ``percentile_approx`` (Greenwald-Khanna, O(accuracy) bounded buffer,
    rank error ≤ 1/accuracy) — the scale path; its thresholds are
    rank-quantized so they differ from quantile_cont by up to one
    1/accuracy rank step (no DuckDB parity). Either way the thresholds
    broadcast back like the moments join — no corpus sort."""
    out_col = out_col or f"{value_col}_w"
    if exact:
        q = df.groupBy(key_col).agg(
            F.percentile(F.col(value_col), F.lit(p_lo)).alias("__lo"),
            F.percentile(F.col(value_col), F.lit(p_hi)).alias("__hi"),
        )
    else:
        q = df.groupBy(key_col).agg(
            F.percentile_approx(F.col(value_col), F.lit(p_lo), F.lit(accuracy))
            .cast("double")
            .alias("__lo"),
            F.percentile_approx(F.col(value_col), F.lit(p_hi), F.lit(accuracy))
            .cast("double")
            .alias("__hi"),
        )
    return (
        _group_join(df, q, key_col)
        .withColumn(
            out_col,
            F.least(F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi")),
        )
        .drop("__lo", "__hi")
    )


def quantile_bins(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n_bins: int = 4,
    out_col: str | None = None,
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Equal-frequency binning per group: bin i (0-based) holds values
    between the i/n and (i+1)/n quantiles; a value's bin is the count
    of interior thresholds <= it. Unlike ``ntile`` (a per-group window
    SORT), this is one percentile agg broadcast back and a map-only
    array probe — the scalable form of quartile/decile features.
    Duplicate-heavy columns can leave some bins empty (the thresholds
    coincide); the boundary rule is deterministic on both engines.

    ``exact=True`` (DuckDB-parity interpolation) buffers every distinct
    value per group — fine for bounded domains, an OOM risk for
    continuous columns at scale; ``exact=False`` uses
    ``percentile_approx`` (bounded O(accuracy) buffer, rank error
    ≤ 1/accuracy) for the 100-TB path."""
    if n_bins < 2:
        raise ValueError("quantile_bins: n_bins must be >= 2")
    out_col = out_col or f"{value_col}_bin"
    ps = [i / n_bins for i in range(1, n_bins)]
    if exact:
        q = df.groupBy(key_col).agg(
            F.array(
                *[F.percentile(F.col(value_col), F.lit(p)) for p in ps]
            ).alias("__thr")
        )
    else:
        q = df.groupBy(key_col).agg(
            F.transform(
                F.percentile_approx(
                    F.col(value_col), F.array(*[F.lit(p) for p in ps]), F.lit(accuracy)
                ),
                lambda t: t.cast("double"),
            ).alias("__thr")
        )
    return (
        _group_join(df, q, key_col)
        .withColumn(
            out_col,
            F.size(F.filter(F.col("__thr"), lambda t: t <= F.col(value_col))),
        )
        .drop("__thr")
    )


def robust_outliers(
    df: DataFrame,
    key_col: str,
    value_col: str,
    threshold: float = 3.5,
    out_col: str | None = None,
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """MAD-based robust outlier flagging per group (Iglewicz-Hoaglin
    1993 modified z-score): ``z = 0.6745 * (x - median) / MAD`` where
    MAD = median(|x - median|); rows with |z| > ``threshold`` flag as
    outliers. Unlike mean/std z-scores, a few extreme values cannot
    mask themselves (the median and MAD are 50%-breakdown estimators).

    Adds ``out_col`` (default ``<value>_outlier``) boolean plus the
    modified z in ``<value>_rz`` (NULL when MAD = 0 — a degenerate
    group where >= half the values equal the median; such rows are
    never flagged). NULL group keys form their own group (null-safe
    join-back): the output always has exactly the input's rows.

    Scale shape: two grouped percentile aggs (group medians, then MAD
    over the residuals) each broadcast back by group key — bounded by
    group count, no window, no corpus sort. ``exact=True`` matches
    DuckDB's ``quantile_cont`` (oracle parity) but buffers every
    distinct value per group; ``exact=False`` switches both medians to
    ``percentile_approx`` (bounded buffer) for continuous columns at
    100-TB scale."""
    out_col = out_col or f"{value_col}_outlier"
    med = (
        F.percentile(F.col(value_col), F.lit(0.5))
        if exact
        else F.percentile_approx(
            F.col(value_col), F.lit(0.5), F.lit(accuracy)
        ).cast("double")
    )
    m = df.groupBy(key_col).agg(med.alias("__med"))
    with_med = _group_join(df, m, key_col)
    resid = F.abs(F.col(value_col) - F.col("__med"))
    mad_med = (
        F.percentile(resid, F.lit(0.5))
        if exact
        else F.percentile_approx(resid, F.lit(0.5), F.lit(accuracy)).cast(
            "double"
        )
    )
    mads = with_med.groupBy(key_col).agg(mad_med.alias("__mad"))
    rz = F.when(
        F.col("__mad") > 0,
        0.6745 * (F.col(value_col) - F.col("__med")) / F.col("__mad"),
    )
    return (
        _group_join(with_med, mads, key_col)
        .withColumn(f"{value_col}_rz", rz)
        .withColumn(
            out_col,
            F.coalesce(
                F.abs(F.col(f"{value_col}_rz")) > threshold, F.lit(False)
            ),
        )
        .drop("__med", "__mad")
    )


def target_encode(
    df: DataFrame,
    category_col: str,
    target_col: str,
    out_col: str | None = None,
    leave_one_out: bool = True,
    smoothing: float = 0.0,
    prior: float | None = None,
) -> DataFrame:
    """Target (mean) encoding of a categorical column: replace each
    category with the mean of ``target_col`` over its rows — the
    standard high-cardinality categorical feature. With
    ``leave_one_out=True`` each row's own target is excluded
    (``(sum - y) / (n - 1)``, Micci-Barreca 2001 §4's leakage guard;
    singleton categories fall back to the global prior). ``smoothing``
    m blends toward the global mean: ``(sum + m*prior) / (n + m)``.
    NULL categories form their own group (null-safe join-back, like
    mutual_information's sentinel): the output always has exactly the
    input's rows.

    Scale shape: one hash-agg over categories + a broadcast-eligible
    join back (category-count bounded — that boundedness is the
    assumption; no hint, AQE decides) + map-only arithmetic. Sums use
    the decimal(15,6) order-independent trick (inputs must be < 1e9
    in magnitude, the module's documented range)."""
    out_col = out_col or f"{category_col}_te"
    y = F.col(target_col).cast("decimal(15,6)")
    per = df.groupBy(category_col).agg(
        F.sum(y).cast("double").alias("__s"),
        F.count(target_col).alias("__n"),
    )
    g = per.agg(
        (F.sum("__s") / F.sum("__n")).alias("__prior")
    )
    joined = _group_join(df, per, category_col, hint_broadcast=False).crossJoin(
        g if prior is None else g.select(F.lit(float(prior)).alias("__prior"))
    )
    m = float(smoothing)
    if leave_one_out:
        enc = F.when(
            F.col("__n") + m > 1,
            (
                F.col("__s")
                - F.col(target_col)
                + m * F.col("__prior")
            )
            / (F.col("__n") - 1 + m),
        ).otherwise(F.col("__prior"))
    else:
        enc = F.when(
            F.col("__n") + m > 0,
            (F.col("__s") + m * F.col("__prior")) / (F.col("__n") + m),
        ).otherwise(F.col("__prior"))
    return joined.withColumn(out_col, enc).drop("__s", "__n", "__prior")


def mutual_information(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
) -> DataFrame:
    """Mutual information (nats) between each categorical feature and
    the label over the empirical joint distribution — the standard
    filter-method feature-relevance ranking:
    ``MI = Σ_{x,y} p(x,y) · ln(p(x,y) / (p(x)·p(y)))``. NULL feature/
    label values count as their own category (they may be predictive).
    Returns (feature, mi, n_values) — n_values = the feature's
    cardinality.

    Scale shape: one stack (explode of a column-name/value struct
    array — rows × n_features, map-only) → one (feature, value, label)
    hash-agg → marginal aggs joined back on bounded keys. MI of a
    high-cardinality feature is as cheap as its distinct count; no
    window, no driver state."""
    if not feature_cols:
        raise ValueError("mutual_information: feature_cols is empty")
    lbl = F.coalesce(F.col(label_col).cast("string"), F.lit("\0null"))
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("feature"),
                        F.coalesce(F.col(c).cast("string"), F.lit("\0null")).alias("value"),
                    )
                    for c in feature_cols
                ]
            )
        ).alias("fv"),
        lbl.alias("__y"),
    ).select("fv.feature", "fv.value", "__y")
    joint = stacked.groupBy("feature", "value", "__y").agg(
        F.count(F.lit(1)).alias("__nxy")
    )
    fx = joint.groupBy("feature", "value").agg(F.sum("__nxy").alias("__nx"))
    fy = joint.groupBy("feature", "__y").agg(F.sum("__nxy").alias("__ny"))
    ft = joint.groupBy("feature").agg(F.sum("__nxy").alias("__n"))
    return (
        joint.join(fx, ["feature", "value"])
        .join(fy, ["feature", "__y"])
        .join(ft, "feature")
        .groupBy("feature")
        .agg(
            F.sum(
                (F.col("__nxy") / F.col("__n"))
                * F.log(
                    (F.col("__nxy") * F.col("__n"))
                    / (F.col("__nx") * F.col("__ny")).cast("double")
                )
            ).alias("mi"),
            F.countDistinct("value").alias("n_values"),
        )
    )


def weighted_percentile_by_group(
    df: DataFrame,
    key_col: str,
    value_col: str,
    weight_col: str,
    percentiles: list[float],
) -> DataFrame:
    """Weight-aware percentiles per group (lower-weighted-quantile
    convention: the smallest value whose cumulative weight reaches
    p * total). The statistic importance-weighted corpora need —
    Spark's percentile/approx take integral frequencies only, and
    resampling by weight distorts tails.

    Returns one row per group: (key, p_<pct> ... ) columns.

    Scale shape: one (group, value) hash-agg summing weights (ties
    merge), then ONE ordered running-sum window per group over the
    DISTINCT-value table (bounded by distinct values, not rows), then
    a min-aggregate per requested percentile. Zero/negative weights
    are excluded (the estimator's domain)."""
    if not percentiles:
        raise ValueError("weighted_percentile_by_group: percentiles is empty")
    for p in percentiles:
        if not 0.0 < p <= 1.0:
            raise ValueError(
                f"weighted_percentile_by_group: percentile {p} outside (0, 1]"
            )
    from pyspark.sql import Window as W

    per = (
        df.filter(F.col(weight_col) > 0)
        .groupBy(key_col, F.col(value_col).alias("__v"))
        .agg(F.sum(weight_col).cast("double").alias("__w"))
    )
    w = (
        W.partitionBy(key_col)
        .orderBy("__v")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    r = per.withColumn("__cw", F.sum("__w").over(w))
    tot = per.groupBy(key_col).agg(F.sum("__w").alias("__tw"))
    j = _group_join(r, tot, key_col, hint_broadcast=False)
    aggs = []
    for p in percentiles:
        tag = str(p).replace(".", "_")
        aggs.append(
            F.min(
                F.when(F.col("__cw") >= p * F.col("__tw"), F.col("__v"))
            ).alias(f"p_{tag}")
        )
    return j.groupBy(key_col).agg(*aggs)


def quantile_normalize(
    df: DataFrame,
    sample_col: str,
    id_col: str,
    value_col: str,
) -> DataFrame:
    """Quantile normalization (Bolstad et al. 2003 — the expression-
    array / batch-correction classic): rank values WITHIN each sample,
    average values ACROSS samples at each rank, and replace every
    value by its rank mean — afterwards every sample has the identical
    empirical distribution. Deterministic variant: ties rank by
    ``id_col`` (the reference implementation averages tied quantiles;
    rank-by-id replays exactly on any engine). Samples with unequal
    sizes contribute to the rank means they reach (documented
    deviation; equal-sized samples are the method's contract).
    Returns (sample, id, value, normalized).

    Scale shape: one per-sample window (partition bounded by rows per
    sample), one rank-cardinality hash-agg, one equi-join on rank —
    no corpus-wide window, no driver state."""
    from pyspark.sql import Window

    w = Window.partitionBy(sample_col).orderBy(
        F.col(value_col).asc(), F.col(id_col).asc()
    )
    ranked = df.select(sample_col, id_col, value_col).withColumn(
        "__rk", F.row_number().over(w)
    )
    means = ranked.groupBy("__rk").agg(F.avg(value_col).alias("__qn"))
    return ranked.join(means, "__rk").select(
        sample_col, id_col, value_col, F.col("__qn").alias("normalized")
    )
