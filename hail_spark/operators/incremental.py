"""Incremental aggregate maintenance (materialized-view merge).

The 100-TB pattern behind every "daily rollup" table: keep per-key
PARTIAL aggregates (sum / count / min / max / mergeable sketches) as a
plain table, and fold each new delta batch in by re-aggregating the
union of partials — never rescanning history. Correctness rests on the
aggregates being commutative monoids: sum/count merge by sum, min/max
by min/max, HLL sketches by sketch-union; avg and other derived
metrics must be stored as (sum, count) pairs and derived at read time.

Scale shape: one unionByName + one hash-agg on the keys, both sides
being aggregate tables (key-cardinality sized, not corpus sized). The
merge is associative, so daily -> monthly -> yearly rollups compose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_MERGE_FNS = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing partial counts
    "min": F.min,
    "max": F.max,
    "hll": lambda c: F.hll_union_agg(c, True),
}


def merge_aggregates(
    base: DataFrame,
    delta: DataFrame,
    keys: list[str],
    specs: dict[str, str],
) -> DataFrame:
    """Merge two partial-aggregate tables with identical schemas.
    ``specs`` maps each metric column to its monoid: ``sum`` |
    ``count`` | ``min`` | ``max`` | ``hll`` (binary DataSketches HLL
    column, merged with ``hll_union_agg``). Keys absent from one side
    pass through from the other (union semantics). Associative —
    chain it across arbitrarily many deltas."""
    unknown = {v for v in specs.values()} - set(_MERGE_FNS)
    if unknown:
        raise ValueError(f"merge_aggregates: unknown merge fns {sorted(unknown)}")
    missing = [c for c in list(specs) + keys if c not in base.columns]
    if missing or base.columns != delta.columns:
        raise ValueError(
            "merge_aggregates: base/delta schemas must match and contain "
            f"all keys+metrics (missing {missing})"
        )
    u = base.unionByName(delta)
    aggs = [
        _MERGE_FNS[fn](F.col(c)).alias(c) for c, fn in specs.items()
    ]
    return u.groupBy(*keys).agg(*aggs)


def aggregate_partial(
    df: DataFrame, keys: list[str], specs: dict[str, tuple[str, str]]
) -> DataFrame:
    """Build a partial-aggregate table from raw rows: ``specs`` maps
    output column -> (input column, monoid) with the monoids of
    :func:`merge_aggregates` (``count`` counts non-null inputs;
    ``hll`` builds an HLL sketch of the input). The result merges
    with any other partial over the same specs."""
    aggs = []
    for out, (src, fn) in specs.items():
        if fn == "count":
            aggs.append(F.count(F.col(src)).alias(out))
        elif fn == "sum":
            aggs.append(F.sum(F.col(src)).alias(out))
        elif fn == "min":
            aggs.append(F.min(F.col(src)).alias(out))
        elif fn == "max":
            aggs.append(F.max(F.col(src)).alias(out))
        elif fn == "hll":
            aggs.append(F.hll_sketch_agg(F.col(src), F.lit(12)).alias(out))
        else:
            raise ValueError(f"aggregate_partial: unknown monoid {fn!r}")
    return df.groupBy(*keys).agg(*aggs)
