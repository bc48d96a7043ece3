"""Feature scaling for training pipelines — group-wise z-score and
min-max normalization.

Shape: one hash aggregate for the per-group moments (map-side
partials), broadcast-joined back onto the rows — two scans total, no
window over the corpus (a Window.partitionBy here would sort every
group; the agg+join form is pure hash work and the moments table is
tiny). Moments use decimal accumulation so the oracle replay is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _moments(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    # decimal(15,6) squares keep the product's full 12-decimal scale
    # inside Spark's 38-digit cap (decimal(38,6)² would silently round
    # the square back to scale 6 — a 1e-6 error the SQL oracle, whose
    # decimal rules differ, does not reproduce); sums stay exact, the
    # conversion to double happens once on the exact totals
    dec = F.col(value_col).cast("decimal(15,6)")
    n = F.count(F.lit(1))
    return df.groupBy(key_col).agg(
        (F.sum(dec).cast("double") / n).alias("__mean"),
        (F.sum(dec * dec).cast("double") / n).alias("__m2"),
        F.min(value_col).alias("__min"),
        F.max(value_col).alias("__max"),
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
    joined = df.join(F.broadcast(m), key_col)
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
    joined = df.join(F.broadcast(m), key_col)
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
) -> DataFrame:
    """Winsorize (clip) per group at exact quantiles: values below the
    p_lo quantile (or above p_hi) clamp to it — the outlier guard
    applied before z-scoring model features. Spark's ``percentile`` is
    the exact distributed aggregate (sorted-run merge per group, not a
    corpus sort); the two thresholds broadcast back like the moments
    join. DuckDB ``quantile_cont`` matches its interpolation exactly,
    so the op is oracle-checkable."""
    out_col = out_col or f"{value_col}_w"
    q = df.groupBy(key_col).agg(
        F.percentile(F.col(value_col), F.lit(p_lo)).alias("__lo"),
        F.percentile(F.col(value_col), F.lit(p_hi)).alias("__hi"),
    )
    return (
        df.join(F.broadcast(q), key_col)
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
) -> DataFrame:
    """Equal-frequency binning per group: bin i (0-based) holds values
    between the i/n and (i+1)/n exact quantiles; a value's bin is the
    count of interior thresholds <= it. Unlike ``ntile`` (a per-group
    window SORT), this is one exact-percentile agg broadcast back and
    a map-only array probe — the scalable form of quartile/decile
    features. Duplicate-heavy columns can leave some bins empty (the
    thresholds coincide); the boundary rule is deterministic on both
    engines."""
    if n_bins < 2:
        raise ValueError("quantile_bins: n_bins must be >= 2")
    out_col = out_col or f"{value_col}_bin"
    ps = [i / n_bins for i in range(1, n_bins)]
    q = df.groupBy(key_col).agg(
        F.array(
            *[F.percentile(F.col(value_col), F.lit(p)) for p in ps]
        ).alias("__thr")
    )
    return (
        df.join(F.broadcast(q), key_col)
        .withColumn(
            out_col,
            F.size(F.filter(F.col("__thr"), lambda t: t <= F.col(value_col))),
        )
        .drop("__thr")
    )
