"""A/B experiment analysis over event tables.

Classic online-experimentation readouts expressed as single hash-agg
plans: Welch's unequal-variance t-test (the default two-sample mean
test, Welch 1947) and the pooled two-proportion z-test, computed per
experiment/metric group in one pass.

Scale shape: everything reduces to conditional SUM/COUNT aggregates
per group — map-side partial aggregation, one shuffle on the group
key, no window, no collect. Sums run over ``decimal(15,6)``-quantized
inputs so the per-group moments are order-independent (bit-identical
across engines and retries — the established oracle-parity trick);
derived statistics are then deterministic double arithmetic. The
p-value columns need the regularized incomplete beta / error function,
which SQL lacks — they are computed by an Arrow-batched pandas UDF
over the AGGREGATED table (group-count rows, not data rows), so the
UDF cost is negligible and the heavy path stays JVM-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from ..expr.stats import pT, pnorm


def _exact_sum(c: Column) -> Column:
    """Order-independent SUM: quantize to decimal(15,6) (exact decimal
    addition), return double. Inputs must be < 1e9 in magnitude —
    the documented range of the decimal trick (see llmdata.features)."""
    return F.sum(c.cast("decimal(15,6)")).cast("double")


def _exact_sumsq(c: Column) -> Column:
    """Order-independent sum of squares: decimal(15,6)² has scale 12 /
    precision 30, well inside the 38-digit cap (no silent rounding)."""
    d = c.cast("decimal(15,6)")
    return F.sum(d * d).cast("double")


def welch_ttest(
    df: DataFrame,
    group_col: str,
    value_col: str,
    cohort_col: str,
    p_value: bool = True,
) -> DataFrame:
    """Welch's two-sample t-test per group: compares the mean of
    ``value_col`` between cohort A (``cohort_col`` truthy) and cohort B
    within each ``group_col``. Returns per group: n_a, n_b, mean_a,
    mean_b, t (Welch statistic) and dof (Welch-Satterthwaite degrees of
    freedom), plus two-sided ``p`` when ``p_value=True``. Groups where
    either cohort has < 2 rows or both variances are 0 yield NULL
    t/dof/p.
    """
    a = F.col(cohort_col).cast("boolean")
    v = F.col(value_col)
    agg = df.groupBy(group_col).agg(
        F.sum(F.when(a, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(a, 0).otherwise(1)).alias("n_b"),
        _exact_sum(F.when(a, v)).alias("__sa"),
        _exact_sum(F.when(~a, v)).alias("__sb"),
        _exact_sumsq(F.when(a, v)).alias("__qa"),
        _exact_sumsq(F.when(~a, v)).alias("__qb"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ma = F.col("__sa") / na
    mb = F.col("__sb") / nb
    va = (F.col("__qa") - F.col("__sa") * F.col("__sa") / na) / (na - 1)
    vb = (F.col("__qb") - F.col("__sb") * F.col("__sb") / nb) / (nb - 1)
    out = agg.select(
        group_col,
        "n_a",
        "n_b",
        ma.alias("mean_a"),
        mb.alias("mean_b"),
        F.when((na >= 2) & (nb >= 2), va).alias("var_a"),
        F.when((na >= 2) & (nb >= 2), vb).alias("var_b"),
    )
    se2 = F.col("var_a") / na + F.col("var_b") / nb
    t = F.when(se2 > 0, (F.col("mean_a") - F.col("mean_b")) / F.sqrt(se2))
    dof = F.when(
        se2 > 0,
        (se2 * se2)
        / (
            (F.col("var_a") / na) * (F.col("var_a") / na) / (na - 1)
            + (F.col("var_b") / nb) * (F.col("var_b") / nb) / (nb - 1)
        ),
    )
    out = out.withColumn("t", t).withColumn("dof", dof)
    if p_value:

        def _p_fn(t_s: pd.Series, d_s: pd.Series) -> pd.Series:
            tv = t_s.to_numpy(dtype=float)
            dv = d_s.to_numpy(dtype=float)
            ok = np.isfinite(tv) & np.isfinite(dv) & (dv > 0)
            p = np.full(len(tv), np.nan)
            if ok.any():
                # two-sided: 2 * P(T_dof > |t|)
                p[ok] = 2.0 * pT(np.abs(tv[ok]), dv[ok], lower_tail=False)
            return pd.Series(p)

        _p_fn.__annotations__ = {
            "t_s": pd.Series, "d_s": pd.Series, "return": pd.Series
        }
        p_udf = pandas_udf(_p_fn, "double")
        out = out.withColumn("p", p_udf(F.col("t"), F.col("dof")))
    return out


def two_proportion_ztest(
    df: DataFrame,
    group_col: str,
    success_col: str,
    cohort_col: str,
    p_value: bool = True,
) -> DataFrame:
    """Pooled two-proportion z-test per group: compares the rate of
    ``success_col`` (boolean) between cohorts. Returns n/successes per
    cohort, the rates, the pooled z statistic, and two-sided ``p`` when
    requested (NULL z/p when a cohort is empty or the pooled rate is
    degenerate 0/1)."""
    a = F.col(cohort_col).cast("boolean")
    s = F.col(success_col).cast("boolean")
    agg = df.groupBy(group_col).agg(
        F.sum(F.when(a, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(~a, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(a & s, 1).otherwise(0)).alias("k_a"),
        F.sum(F.when(~a & s, 1).otherwise(0)).alias("k_b"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ra = F.when(na > 0, F.col("k_a") / na)
    rb = F.when(nb > 0, F.col("k_b") / nb)
    pool = (F.col("k_a") + F.col("k_b")) / (na + nb)
    se2 = pool * (1 - pool) * (1 / na + 1 / nb)
    out = agg.select(
        group_col, "n_a", "n_b", "k_a", "k_b",
        ra.alias("rate_a"), rb.alias("rate_b"),
    ).withColumn(
        "z",
        F.when(
            (na > 0) & (nb > 0) & (se2 > 0),
            (F.col("rate_a") - F.col("rate_b")) / F.sqrt(se2),
        ),
    )
    if p_value:

        def _pz_fn(z_s: pd.Series) -> pd.Series:
            zv = z_s.to_numpy(dtype=float)
            ok = np.isfinite(zv)
            p = np.full(len(zv), np.nan)
            if ok.any():
                p[ok] = 2.0 * pnorm(np.abs(zv[ok]), lower_tail=False)
            return pd.Series(p)

        _pz_fn.__annotations__ = {"z_s": pd.Series, "return": pd.Series}
        pz_udf = pandas_udf(_pz_fn, "double")
        out = out.withColumn("p", pz_udf(F.col("z")))
    return out


def auc_by_group(
    df: DataFrame,
    group_col: str,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """ROC AUC per group via the Mann-Whitney U identity with midrank
    tie handling: ``AUC = P(score_pos > score_neg) + 0.5 * P(tie)`` =
    ``sum_s n_pos(s) * (cum_neg_below(s) + n_neg(s)/2) / (P * N)`` over
    DISTINCT scores s — the standard large-scale AUC that never sorts
    rows. Returns (group, auc, n_pos, n_neg); groups with an empty
    class yield NULL auc.

    Scale shape: one (group, score) hash-agg with conditional counts,
    one per-GROUP ordered running-sum window over the distinct-score
    table (partition = a group's distinct scores, not its rows), one
    final agg. Label is interpreted as boolean."""
    lbl = F.col(label_col).cast("boolean")
    per = df.groupBy(group_col, F.col(score_col).alias("__s")).agg(
        F.sum(F.when(lbl, 1).otherwise(0)).alias("__p"),
        F.sum(F.when(~lbl, 1).otherwise(0)).alias("__n"),
    )
    from pyspark.sql import Window as W

    w = (
        W.partitionBy(group_col)
        .orderBy("__s")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    ranked = per.withColumn(
        "__cum_n_below", F.coalesce(F.sum("__n").over(w), F.lit(0))
    )
    return ranked.groupBy(group_col).agg(
        F.when(
            (F.sum("__p") > 0) & (F.sum("__n") > 0),
            F.sum(
                F.col("__p")
                * (F.col("__cum_n_below") + F.col("__n") / 2.0)
            )
            / (F.sum("__p") * F.sum("__n")),
        ).alias("auc"),
        F.sum("__p").alias("n_pos"),
        F.sum("__n").alias("n_neg"),
    )


def bucketed_jackknife_ratio(
    df: DataFrame,
    group_col: str,
    num_col: str,
    den_col: str,
    n_buckets: int = 50,
    uid_col: str | None = None,
) -> DataFrame:
    """Ratio-metric estimate with a delete-one-bucket jackknife
    standard error — the standard way to put a CI on revenue-per-user
    style metrics at scale (ratios of sums have no per-row variance;
    the bucketed jackknife gets one without resampling). Rows are
    assigned to ``n_buckets`` deterministic md5 buckets (by ``uid_col``
    if given, so all of a unit's rows co-vary); the estimate is
    ``sum(num)/sum(den)``, and the SE is the jackknife over the B
    leave-one-bucket-out ratios:
    ``SE^2 = (B-1)/B * sum_b (r_b - r_mean)^2``.

    Returns (group, ratio, se, n_buckets_used, n_rows). Buckets with
    zero leave-out denominator are skipped (and counted out of B).

    Scale shape: ONE (group, bucket) hash-agg over decimal-exact sums
    (B-bounded table), then closed-form jackknife arithmetic over that
    tiny table — the corpus is scanned once, no resampling pass, no
    driver state."""
    if n_buckets < 2:
        raise ValueError("bucketed_jackknife_ratio: n_buckets must be >= 2")
    uid = F.col(uid_col) if uid_col else F.monotonically_increasing_id()
    h = F.conv(
        F.substring(F.md5(uid.cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    b = df.withColumn("__b", F.pmod(h, F.lit(n_buckets)))
    per = b.groupBy(group_col, "__b").agg(
        _exact_sum(F.col(num_col)).alias("__num"),
        _exact_sum(F.col(den_col)).alias("__den"),
        F.count(F.lit(1)).alias("__n"),
    )
    tot = per.groupBy(group_col).agg(
        F.sum("__num").alias("__tn"),
        F.sum("__den").alias("__td"),
        F.sum("__n").alias("n_rows"),
    )
    j = per.join(tot, group_col).withColumn(
        "__r_loo",
        F.when(
            (F.col("__td") - F.col("__den")) != 0,
            (F.col("__tn") - F.col("__num"))
            / (F.col("__td") - F.col("__den")),
        ),
    )
    agg = j.groupBy(group_col).agg(
        (F.max("__tn") / F.max("__td")).alias("ratio"),
        F.sum("__r_loo").alias("__sr"),
        F.sum(F.col("__r_loo") * F.col("__r_loo")).alias("__sr2"),
        F.count("__r_loo").alias("n_buckets_used"),
        F.max("n_rows").alias("n_rows"),
    )
    m = F.col("n_buckets_used").cast("double")
    # sum of squared deviations = sum r^2 - (sum r)^2 / m; guard the
    # float cancellation at 0 with greatest(, 0)
    ssd = F.greatest(
        F.col("__sr2") - F.col("__sr") * F.col("__sr") / m, F.lit(0.0)
    )
    return agg.select(
        group_col,
        "ratio",
        F.when(m >= 2, F.sqrt((m - 1) / m * ssd)).alias("se"),
        "n_buckets_used",
        "n_rows",
    )


def mann_whitney_u(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    p_value: bool = False,
) -> DataFrame:
    """Mann-Whitney U rank-sum test (Mann & Whitney 1947): the
    nonparametric two-sample location test — ``U_a = #{(a, b) :
    a > b} + ½ #{a = b}`` — with the normal approximation z-score
    under the tie-corrected variance. Returns one row
    (n_a, n_b, u_a, u_b, z [, p]). The pair count is computed WITHOUT
    pairing: per distinct pooled value, ``2·U_a`` accumulates
    ``ca · (2·cb_below + cb_eq)`` — an exact INTEGER, so u_a/u_b/z
    replay bit-for-bit on any engine from the same integer sums.

    Scale shape (the ks_statistic discipline): tag-and-union, ONE
    hash-agg per distinct value, one ordered running-sum window over
    the DISTINCT-value table (the only global sort, over distinct
    values, not rows), then a scalar agg. For continuous columns whose
    distinct count approaches the row count, bin/round upstream first.
    The optional two-sided normal ``p`` is an Arrow pandas-UDF over
    the single aggregate row (SQL lacks erf)."""
    from pyspark.sql import Window as W

    a = df_a.select(F.col(col).alias("v")).withColumn("__s", F.lit(0))
    b = df_b.select(F.col(col).alias("v")).withColumn("__s", F.lit(1))
    u = a.unionByName(b).filter(F.col("v").isNotNull())
    per = u.groupBy("v").agg(
        F.sum(F.when(F.col("__s") == 0, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("__s") == 1, 1).otherwise(0)).alias("cb"),
    )
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    t = F.col("ca") + F.col("cb")
    run = per.select(
        "ca",
        "cb",
        (F.sum("cb").over(w) - F.col("cb")).alias("__cb_below"),
        (t * t * t - t).alias("__tie"),
    )
    agg = run.agg(
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
        F.sum(
            F.col("ca") * (2 * F.col("__cb_below") + F.col("cb"))
        ).alias("__u2"),
        F.sum("__tie").alias("__ties"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    n = na + nb
    ua = F.col("__u2") / 2.0
    mu = na * nb / 2.0
    var = (
        na * nb / 12.0 * ((n + 1) - F.col("__ties") / (n * (n - 1)))
    )
    out = agg.select(
        "n_a",
        "n_b",
        ua.alias("u_a"),
        (na * nb - ua).alias("u_b"),
        F.when(var > 0, (ua - mu) / F.sqrt(var)).alias("z"),
    )
    if p_value:

        def _p_fn(z_s: pd.Series) -> pd.Series:
            zv = z_s.to_numpy(dtype=float)
            p = np.full(len(zv), np.nan)
            ok = np.isfinite(zv)
            if ok.any():
                p[ok] = 2.0 * pnorm(np.abs(zv[ok]), lower_tail=False)
            return pd.Series(p)

        p_udf = pandas_udf(_p_fn, "double")
        out = out.withColumn("p", p_udf(F.col("z")))
    return out


def chi2_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Pearson chi-squared test of independence between two
    categorical columns, with Cramér's V effect size. The statistic
    sums ``(o - e)² / e`` over the FULL contingency grid — including
    structurally-empty cells (o = 0 still contributes e), via a
    distinct(a) × distinct(b) grid left-joined with the observed
    counts. Returns one row (n, n_rows_a, n_cols_b, dof, chi2,
    cramers_v).

    Scale shape: one (a, b) hash-agg over the data, two margin
    hash-aggs over the CELL table (cell-cardinality bounded = product
    of category cardinalities), the dense grid from a cross join of
    the two margin tables (Catalyst broadcasts both — category-sized),
    and a scalar agg. No window, no sort, no driver data. Only
    meaningful for genuinely categorical columns — a continuous
    column's grid explodes; bin it upstream."""
    ab = F.col(col_a).alias("__a"), F.col(col_b).alias("__b")
    obs = df.select(*ab).groupBy("__a", "__b").agg(
        F.count(F.lit(1)).alias("__o")
    )
    ra = obs.groupBy("__a").agg(F.sum("__o").alias("__ma"))
    cb = obs.groupBy("__b").agg(F.sum("__o").alias("__mb"))
    tot = obs.agg(F.sum("__o").cast("double").alias("__n"))
    grid = (
        ra.crossJoin(cb)
        .join(obs, ["__a", "__b"], "left")
        .crossJoin(tot)
    )
    e = F.col("__ma") * F.col("__mb") / F.col("__n")
    o = F.coalesce(F.col("__o"), F.lit(0)).cast("double")
    cell = (o - e) * (o - e) / e
    out = grid.agg(
        F.max("__n").cast("long").alias("n"),
        F.countDistinct("__a").alias("n_rows_a"),
        F.countDistinct("__b").alias("n_cols_b"),
        F.sum(cell).alias("chi2"),
    )
    r = F.col("n_rows_a").cast("double")
    c = F.col("n_cols_b").cast("double")
    dof = (r - 1) * (c - 1)
    return out.select(
        "n",
        "n_rows_a",
        "n_cols_b",
        dof.cast("long").alias("dof"),
        "chi2",
        F.when(
            (dof > 0) & (F.col("n") > 0),
            F.sqrt(
                F.col("chi2")
                / (F.col("n") * F.least(r - 1, c - 1))
            ),
        ).otherwise(F.lit(0.0)).alias("cramers_v"),
    )


def calibration_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram / calibration bins for a probabilistic
    score in [0, 1] against a binary label: equal-WIDTH bins
    ``bin = min(floor(score·n_bins), n_bins − 1)``, per bin the count,
    mean score (confidence) and positive fraction (accuracy), plus
    each bin's contribution to Expected Calibration Error
    (``ece_term = (n_bin / n) · |frac_pos − mean_score|`` — sum the
    column for ECE). The first chart to read on any model score
    before thresholding it.

    Scale shape: one hash-agg on the bin key (map-side partials), then
    a window over the ≤ n_bins aggregate rows for the total — bounded
    by construction. Scores outside [0, 1] raise loudly rather than
    silently clamping into the edge bins."""
    if n_bins < 2:
        raise ValueError("calibration_report: n_bins must be >= 2")
    from pyspark.sql import Window as W

    s = F.col(score_col).cast("double")
    checked = F.when(
        (s < 0) | (s > 1),
        F.raise_error(
            F.concat(
                F.lit(
                    "calibration_report: score outside [0, 1]: "
                ),
                s.cast("string"),
            )
        ),
    ).otherwise(s)
    binned = df.select(
        F.least(
            F.floor(checked * n_bins), F.lit(n_bins - 1)
        ).cast("int").alias("bin"),
        s.alias("__score"),
        F.col(label_col).cast("double").alias("__y"),
    )
    agg = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__score").alias("__ss"),
        F.sum("__y").alias("__sy"),
    )
    tot = F.sum("n").over(W.partitionBy())
    conf = F.col("__ss") / F.col("n")
    acc = F.col("__sy") / F.col("n")
    return agg.select(
        "bin",
        "n",
        conf.alias("mean_score"),
        acc.alias("frac_positive"),
        (
            F.col("n").cast("double") / tot * F.abs(acc - conf)
        ).alias("ece_term"),
    )


def theil_sen(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Theil-Sen robust trend estimator (Theil 1950 / Sen 1968): the
    median of all pairwise slopes ``(y_j − y_i)/(x_j − x_i)`` over
    x_i < x_j, with the median-residual intercept — the trend line a
    single outlier day can't drag (OLS breaks down at one bad point;
    Theil-Sen tolerates ~29 %). Returns one row (n_points, n_pairs,
    slope, intercept).

    Scale shape: ONE self-equi-free pairwise join — this is O(n²) in
    the SERIES length by definition, so call it on bounded series only
    (per-day/week aggregates: 3 years ≈ 1100 points ≈ 600 k pairs,
    trivially distributed; never raw events). Medians are Spark's
    exact interpolating ``percentile`` (= DuckDB ``quantile_cont``),
    so the result replays across engines."""
    pts = df.select(
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
    ).filter(F.col("__x").isNotNull() & F.col("__y").isNotNull())
    a, b = pts.alias("a"), pts.alias("b")
    slopes = a.join(
        b, F.col("a.__x") < F.col("b.__x")
    ).select(
        (
            (F.col("b.__y") - F.col("a.__y"))
            / (F.col("b.__x") - F.col("a.__x"))
        ).alias("__slope")
    )
    sl = slopes.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.expr("percentile(__slope, 0.5)").alias("slope"),
    )
    resid = pts.crossJoin(sl).select(
        "n_pairs",
        "slope",
        (F.col("__y") - F.col("slope") * F.col("__x")).alias("__r"),
    )
    return resid.groupBy("n_pairs", "slope").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.expr("percentile(__r, 0.5)").alias("intercept"),
    ).select("n_points", "n_pairs", "slope", "intercept")


def kendall_tau(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Kendall's tau-b rank correlation (Kendall 1938, tie-corrected):
    over all point pairs, ``tau_b = (C − D) / sqrt((n0 − n1)(n0 − n2))``
    with C/D the concordant/discordant counts and n1/n2 the per-axis
    tie-pair counts — the rank-association measure robust to any
    monotone transform. Every count is an exact INTEGER (engine-exact
    replay); returns one row (n_points, concordant, discordant, tau_b).

    Scale shape: one pairwise self-join — O(n²) in the series length
    BY DEFINITION (same contract as theil_sen: bounded per-key series
    only, never raw events; the O(n log n) merge-sort formulation
    doesn't distribute, the pair join does)."""
    pts = df.select(
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
    ).filter(F.col("__x").isNotNull() & F.col("__y").isNotNull())
    a, b = pts.alias("a"), pts.alias("b")
    dx = F.col("b.__x") - F.col("a.__x")
    dy = F.col("b.__y") - F.col("a.__y")
    # pair each unordered point pair once: x order first, y breaks x ties
    cond = (F.col("a.__x") < F.col("b.__x")) | (
        (F.col("a.__x") == F.col("b.__x"))
        & (F.col("a.__y") < F.col("b.__y"))
    )
    pairs = a.join(b, cond).select(
        F.when(dx * dy > 0, 1).otherwise(0).alias("__c"),
        F.when(dx * dy < 0, 1).otherwise(0).alias("__d"),
        F.when((dx == 0) & (dy != 0), 1).otherwise(0).alias("__tx"),
        F.when((dy == 0) & (dx != 0), 1).otherwise(0).alias("__ty"),
        F.when((dx == 0) & (dy == 0), 1).otherwise(0).alias("__txy"),
    )
    n = pts.agg(F.count(F.lit(1)).alias("n_points"))
    agg = pairs.agg(
        F.sum("__c").alias("concordant"),
        F.sum("__d").alias("discordant"),
        F.sum("__tx").alias("__n1x"),
        F.sum("__ty").alias("__n1y"),
        F.sum("__txy").alias("__nxy"),
    ).crossJoin(n)
    c, d = F.col("concordant"), F.col("discordant")
    # ties on x only + ties on both = all x-tied pairs (n1); same for y
    n1 = (F.col("__n1x") + F.col("__nxy")).cast("double")
    n2 = (F.col("__n1y") + F.col("__nxy")).cast("double")
    npts = F.col("n_points").cast("double")
    n0 = npts * (npts - 1) / 2.0
    denom = F.sqrt((n0 - n1) * (n0 - n2))
    return agg.select(
        "n_points",
        "concordant",
        "discordant",
        F.when(denom > 0, (c - d) / denom).otherwise(F.lit(0.0)).alias(
            "tau_b"
        ),
    )


def spearman_rho(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Spearman rank correlation (Spearman 1904): Pearson correlation
    of the average (fractional) ranks — ties get the mean of their
    rank block, the textbook convention. Average ranks are half-
    integers, so the moment sums run over EXACT doubled-rank integers
    and the coefficient replays bit-for-bit across engines. Returns
    one row (n_points, rho).

    Scale shape: two rank windows ordered by value over the input —
    global sorts over the SERIES (same bounded-series contract as
    theil_sen/kendall_tau: per-day aggregates, not raw events) — then
    one scalar moment agg."""
    from pyspark.sql import Window as W

    pts = df.select(
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
    ).filter(F.col("__x").isNotNull() & F.col("__y").isNotNull())
    # average rank = rank() + (ties - 1)/2; doubled to stay integral
    rx = (
        2 * F.rank().over(W.orderBy("__x"))
        + F.count(F.lit(1)).over(W.partitionBy("__x"))
        - 1
    )
    ry = (
        2 * F.rank().over(W.orderBy("__y"))
        + F.count(F.lit(1)).over(W.partitionBy("__y"))
        - 1
    )
    ranked = pts.select(rx.alias("x"), ry.alias("y"))
    mo = ranked.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum("x").alias("__sx"),
        F.sum("y").alias("__sy"),
        F.sum(F.col("x") * F.col("y")).alias("__sxy"),
        F.sum(F.col("x") * F.col("x")).alias("__sxx"),
        F.sum(F.col("y") * F.col("y")).alias("__syy"),
    )
    nn = F.col("n_points").cast("double")
    cov = F.col("__sxy") - F.col("__sx") * F.col("__sy") / nn
    vx = F.col("__sxx") - F.col("__sx") * F.col("__sx") / nn
    vy = F.col("__syy") - F.col("__sy") * F.col("__sy") / nn
    return mo.select(
        "n_points",
        F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy))
        .otherwise(F.lit(0.0))
        .alias("rho"),
    )
