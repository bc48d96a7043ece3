"""Mergeable distinct-count sketches (Apache DataSketches HLL via
Spark's built-in ``hll_sketch_agg`` family).

The 100-TB story is MERGEABILITY, not just approximation: a daily
(or per-source) sketch table is a few KB per group, persists as a
plain ``binary`` parquet column, and any later rollup — 30-day
distinct users, cross-source vocabulary size — is a re-aggregation of
sketches, never a rescan of the raw corpus. All sketch work happens
JVM-side (map-side partial aggregation like any other agg; the shuffle
carries one sketch per group per partition, not the value stream).

Accuracy contract: DataSketches HLL_4 is EXACT while a group's
cardinality is small enough to stay in sparse (coupon) mode
(~0.75 * 2^lgk), then ±1.04/sqrt(2^lgk) relative standard error in
dense mode (~0.8 % at the lgk=14 default). The SQL-oracle pairing of
the gate query relies on the sparse-exact regime at gate scale; the
two-SF pytest guard fails loudly if a gate corpus ever outgrows it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_sketch_by_group(
    df: DataFrame,
    key_cols: list[str] | str,
    value_col: str | Column,
    lgk: int = 14,
    sketch_col: str = "sketch",
) -> DataFrame:
    """One HLL sketch per group over ``value_col`` — (keys...,
    ``sketch_col`` binary). The mergeable building block: persist this
    (e.g. partitioned by day) and later rollups union the sketches."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(val, F.lit(lgk)).alias(sketch_col)
    )


def hll_estimate(sketches: DataFrame, sketch_col: str = "sketch",
                 out_col: str = "n_distinct") -> DataFrame:
    """Point estimates from a sketch table (adds ``out_col`` bigint,
    drops the binary column)."""
    return sketches.withColumn(
        out_col, F.hll_sketch_estimate(F.col(sketch_col))
    ).drop(sketch_col)


def hll_rollup(
    sketches: DataFrame,
    key_cols: list[str] | str | None = None,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Union sketches up to a coarser key (or to one global row with
    ``key_cols=None``) — the rescan-free rollup. Sketch union is
    associative/commutative, so this is an ordinary two-phase hash
    aggregate."""
    agg = F.hll_union_agg(F.col(sketch_col)).alias(sketch_col)
    if key_cols is None:
        return sketches.agg(agg)
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    return sketches.groupBy(*keys).agg(agg)


def distinct_by_group_with_total(
    df: DataFrame,
    key_col: str,
    value_col: str,
    lgk: int = 14,
    total_key: str = "__all__",
) -> DataFrame:
    """(key, n_distinct) per group PLUS a ``total_key`` row holding the
    deduplicated distinct count across all groups — computed by
    UNIONING the per-group sketches (one pass over the data, two tiny
    agg stages), not by a second scan. The canonical demonstration that
    sketch mergeability replaces rescans."""
    sk = hll_sketch_by_group(df, key_col, value_col, lgk=lgk)
    per = hll_estimate(sk).select(
        F.col(key_col).cast("string").alias(key_col), "n_distinct"
    )
    tot = hll_estimate(hll_rollup(sk)).select(
        F.lit(total_key).alias(key_col), "n_distinct"
    )
    return per.unionByName(tot)


# ------------------------------------------------------------------ #
# Count-min sketch (Cormode & Muthukrishnan 2005) — mergeable
# frequency sketch as a PLAIN DataFrame: rows (row_idx, bucket, cnt).
# ------------------------------------------------------------------ #
#
# Same 100-TB story as the HLL table above, for FREQUENCIES instead of
# cardinalities: a daily/per-source sketch is depth × width counters
# (KBs), persists as ordinary parquet, merges by (row, bucket) SUM —
# "how often did token/URL/user X appear across 30 days" becomes a
# re-aggregation of sketch tables, never a corpus rescan. Estimates
# are biased UP only (est >= true; est <= true + eps*N with
# eps = e/width at failure prob delta = e^-depth).
#
# Hashing is the repo's md5→60-bit idiom (llmdata/dedup.md5_int), so a
# SQL oracle replays the sketch bit-for-bit — the estimate itself is
# deterministic arithmetic, collisions included.


def _cms_bucket(val: Column, row_idx: Column, width: int) -> Column:
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", row_idx.cast("string"), val)), 1, 15),
        16,
        10,
    ).cast("bigint")
    return (h % F.lit(width)).cast("int")


def cms_build(
    df: DataFrame,
    value_col: str | Column,
    width: int = 2048,
    depth: int = 4,
) -> DataFrame:
    """Count-min sketch over ``value_col`` as (row_idx int, bucket int,
    cnt bigint) — depth hash rows in ONE pass (explode by row index,
    one hash agg with map-side partials; shuffle carries ≤ depth×width
    rows per partition, never the value stream)."""
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    rows = df.select(
        val.cast("string").alias("__v"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row_idx"),
    )
    return (
        rows.select("row_idx", _cms_bucket(F.col("__v"), F.col("row_idx"), width).alias("bucket"))
        .groupBy("row_idx", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union CMS tables built with the SAME (width, depth): counters
    add — an ordinary two-phase hash aggregate."""
    if not sketches:
        raise ValueError("cms_merge: need at least one sketch")
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.groupBy("row_idx", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_query(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int = 2048,
    depth: int = 4,
    out_col: str = "est",
) -> DataFrame:
    """Point frequency estimates: min over the depth rows of the
    queried buckets. ``keys`` is the (small, broadcast) query set;
    missing buckets count 0. est >= true count, always."""
    probes = keys.select(
        F.col(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row_idx"),
    ).select(
        key_col,
        "row_idx",
        _cms_bucket(F.col(key_col).cast("string"), F.col("row_idx"), width).alias(
            "bucket"
        ),
    )
    # probes on the LEFT of a left join: the sketch (bounded at
    # depth×width rows) is the hashed build side — a broadcast hint on
    # the preserved side of an outer join is unsupported anyway
    j = probes.join(sketch, ["row_idx", "bucket"], "left")
    return (
        j.groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out_col))
    )
