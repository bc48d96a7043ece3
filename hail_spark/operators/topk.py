"""Bounded per-group top-n — the hot-key-safe equivalent of the
reference's TakeByAggregator bounded heap (agg/TakeByAggregator.scala).

``agg.take_by`` as a Column expression necessarily buffers the whole
group inside collect_list before slicing; a hot key at scale OOMs that
buffer. This operator expresses the same semantics as a window
``row_number`` plan: rank within the group, keep ranks ≤ n, then
collect — per-group state after the filter is ≤ n rows no matter how
hot the key. The window shuffle and the follow-up groupBy share the
same partitioning, so Catalyst plans ONE exchange total.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_take_by(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    value: Column,
    n: int,
    out: str = "take_by",
) -> DataFrame:
    """One row per group with ``out`` = array of the ``value`` expression
    over the group's first ``n`` rows in ``order_by`` order."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    ranked = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
    )
    pair = F.struct(F.col("__rn").alias("rn"), value.alias("v"))
    return ranked.groupBy(*group_cols).agg(
        F.transform(F.array_sort(F.collect_list(pair)), lambda s: s["v"]).alias(out)
    )


def grouped_reservoir(
    df: DataFrame,
    group_cols: Sequence[str],
    value: Column,
    k: int,
    seed: int = 0,
    out: str = "sample",
    portable_hash: bool = False,
) -> DataFrame:
    """Bounded per-group uniform k-sample via the min-k-hash order (keep
    the k rows whose salted hashes rank smallest) — the hot-key-safe
    form of ``agg.reservoir_sample``.

    ``portable_hash=True`` salts with md5 instead of xxhash64 so any
    SQL dialect can replay the exact sample (the llmdata.sampling
    determinism contract); xxhash64 stays the default — it's
    codegen-cheap and sampling only needs engine-internal stability."""
    if portable_hash:
        h = F.conv(
            F.substring(F.md5(F.concat(value.cast("string"), F.lit(f":{seed}"))), 1, 15),
            16,
            10,
        ).cast("bigint")
    else:
        h = F.xxhash64(value.cast("string"), F.lit(seed))
    return grouped_take_by(df, group_cols, [h.asc()], value, k, out=out)
