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
