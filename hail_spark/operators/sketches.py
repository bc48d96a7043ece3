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


# ---------------------------------------------------------------------- #
# KMV (k-minimum-values) theta sketch — Bar-Yossef et al. 2002 /
# Beyer et al. 2007; from-scratch, engine-portable, SET-OPERABLE.
# Unlike HLL (union-only), KMV supports intersection estimates, and
# since the sketch is just "the k smallest md5 hashes of the distinct
# values", every step is deterministic and SQL-replayable — a KMV
# sketch built by any engine is bit-identical.
# ---------------------------------------------------------------------- #
_KMV_M = float(1 << 60)  # hash domain size (md5_int is 60-bit)


def _kmv_hash(value: Column) -> Column:
    """60-bit md5-derived hash (shared with the dedup family):
    uniform on [0, 2^60)."""
    return F.conv(
        F.substring(F.md5(value.cast("string")), 1, 15), 16, 10
    ).cast("bigint")


def kmv_build(
    df: DataFrame,
    key_cols: list[str] | str,
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-group KMV sketch: the ``k`` smallest distinct hash values of
    ``value_col``, as a sorted ``array<bigint>`` column ``kmv`` plus
    ``kmv_k``. Distinct estimate: exact n when the group holds < k
    distinct values (the array is simply all of them); otherwise
    ``(k-1) * M / h_(k)`` with h_(k) the k-th smallest hash (relative
    standard error ~ 1/sqrt(k-2), ~6 % at k=256).

    Scale shape: hash projection, (group, hash) distinct (one shuffle,
    map-side partial), then ``slice(sort_array(collect_list), 1, k)``
    per group. The collect buffer holds the group's distinct-hash set,
    so for billion-distinct groups pre-filter with
    ``hash < kmv_prefilter_threshold(k, n_lower_bound)`` — that bounds
    the buffer at ~``safety*k`` rows per group and provably preserves
    the exact bottom-k whenever the true k-th hash is under the
    threshold (it is, with overwhelming probability, by construction
    of the threshold)."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    h = (
        df.select(*keys, _kmv_hash(F.col(value_col)).alias("__h"))
        .distinct()
    )
    return h.groupBy(*keys).agg(
        F.slice(F.sort_array(F.collect_list("__h")), 1, k).alias("kmv"),
        F.lit(k).alias("kmv_k"),
    )


def kmv_prefilter_threshold(k: int, n_lower_bound: int, safety: float = 8.0) -> int:
    """Hash threshold that keeps the exact bottom-k with overwhelming
    probability when a group has at least ``n_lower_bound`` distinct
    values: expected k-th hash is ~ k*M/n; keep hashes under
    ``safety`` times that. Apply as a pre-filter before
    :func:`kmv_build` to bound the distinct+collect at
    ~``safety*k`` rows per group regardless of group size."""
    return int(min(_KMV_M, safety * k * _KMV_M / max(1, n_lower_bound)))


def kmv_estimate(sketch: Column, k_col: Column) -> Column:
    """Distinct-count estimate from a KMV array column (double):
    exact size when the group never filled the sketch, else
    (k-1)*M/h_(k)."""
    n = F.size(sketch)
    kth = F.element_at(sketch, n)  # largest retained = k-th smallest
    return F.when(n < k_col, n.cast("double")).otherwise(
        (k_col - 1).cast("double") * F.lit(_KMV_M) / kth.cast("double")
    )


def kmv_union(a: Column, b: Column, k: int) -> Column:
    """Union sketch: bottom-k of the merged hash sets (associative,
    commutative — the mergeability property)."""
    return F.slice(
        F.array_sort(F.array_union(a, b)), 1, k
    )


def kmv_intersect_estimate(a: Column, b: Column, k: int) -> Column:
    """Intersection estimate (theta-sketch rule): restrict both to the
    union sketch's threshold theta = h_(k) of the union, count common
    hashes under theta, scale by M/theta * |common|/(k-1) ...
    equivalently |A∩B∩U_k| / (k-1) * estimate(U). Returns a double
    estimate (exact when both groups fit their sketches)."""
    u = F.array_sort(F.array_union(a, b))
    nu = F.size(u)
    filled = nu > F.lit(k)
    theta = F.when(filled, F.element_at(F.slice(u, 1, k), k))
    common = F.array_intersect(a, b)
    # unfilled union -> both sketches are their full hash sets: exact
    exact = F.size(common).cast("double")
    est_u = (F.lit(float(k - 1)) * F.lit(_KMV_M)) / theta.cast("double")
    frac = (
        F.size(F.filter(common, lambda h: h <= theta)).cast("double")
        / F.lit(float(k - 1))
    )
    return F.when(~filled, exact).otherwise(frac * est_u)
