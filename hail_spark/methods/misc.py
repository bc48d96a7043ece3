"""maximal_independent_set + ld_prune.

Parity targets (reference hail-is/hail):
* ``maximal_independent_set`` — methods/misc.py:16 (+ IR node
  ArrayMaximalIndependentSet): the reference also collects the edge
  list to the driver and solves there; we do the same with the
  classic greedy remove-max-degree heuristic (no networkx needed).
* ``ld_prune`` — statgen.py:4708: pairwise r² within a bp window →
  edges where r² > threshold → keep a maximal independent set.

Spark shape for ld_prune: variants are binned by position window;
candidate pairs come from a banded self-join (equi-join on
(contig, bin) — never all-pairs); r² per pair is a zip_with fold over
the two entries arrays in codegen. Only the thresholded EDGES are
collected (the reference collects the same), never genotypes.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..matrixtable import ENTRIES, MatrixTable


def maximal_independent_set(edges: list[tuple]) -> set:
    """Greedy MIS: repeatedly delete the highest-degree node (the
    reference's default tie-breaking strategy, misc.py:16)."""
    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    nodes = set(adj)
    removed = set()
    while True:
        live_deg = {
            n: len(adj[n] - removed) for n in nodes if n not in removed
        }
        live_deg = {n: d for n, d in live_deg.items() if d > 0}
        if not live_deg:
            break
        worst = max(sorted(live_deg), key=lambda n: live_deg[n])
        removed.add(worst)
    return nodes - removed


def _ld_pairs(mt: MatrixTable, bp_window_size: int, x_field: str) -> DataFrame:
    """Windowed variant-pair LD: banded self-join on position bins
    (window ⇒ two adjacent bins max), per-pair Pearson r via a single
    zip_with+aggregate fold over mean-imputed genotypes.  Returns
    DataFrame (la, lb, r, r2) for position-ordered pairs within
    ``bp_window_size`` on the same contig.  Shared engine of ld_prune
    and ld_matrix (ref statgen.py:4708 / :3836)."""
    df = mt._df.select(
        F.col("locus"),
        F.col("locus")["contig"].alias("__c"),
        F.col("locus")["position"].alias("__p"),
        F.col(ENTRIES).getField(x_field).alias("__g"),
    )
    # per-variant moments for r² (n, sum, sumsq) over defined entries
    stats = df.select(
        "*",
        F.aggregate(
            "__g",
            F.struct(
                F.lit(0).alias("n"), F.lit(0.0).alias("s"), F.lit(0.0).alias("ss")
            ),
            lambda acc, g: F.when(
                g.isNotNull(),
                F.struct(
                    (acc["n"] + 1).alias("n"),
                    (acc["s"] + g).alias("s"),
                    (acc["ss"] + g * g).alias("ss"),
                ),
            ).otherwise(acc),
        ).alias("__m"),
    )
    binned = stats.select(
        "*",
        F.explode(
            F.array(
                (F.col("__p") / bp_window_size).cast("bigint"),
                (F.col("__p") / bp_window_size + 1).cast("bigint"),
            )
        ).alias("__bin"),
    )
    a, b = binned.alias("a"), binned.alias("b")
    pairs = a.join(
        b,
        on=[
            F.col("a.__c") == F.col("b.__c"),
            F.col("a.__bin") == F.col("b.__bin"),
            F.col("a.__p") < F.col("b.__p"),
            F.col("b.__p") - F.col("a.__p") <= bp_window_size,
            # each pair lands in exactly one shared bin: the one that is
            # b's own bin (avoids double-count via the +1 ghost bin)
            F.col("b.__bin") == (F.col("b.__p") / bp_window_size).cast("bigint"),
        ],
    )
    # mean-imputed moments (the reference's normalization): imputation
    # preserves the mean, shrinks ss by filling (N-n) cells with mean²
    N = float(len(mt._cols))
    am, bm = F.col("a.__m"), F.col("b.__m")
    ma = am["s"] / F.nullif(am["n"], F.lit(0))
    mb = bm["s"] / F.nullif(bm["n"], F.lit(0))
    sxy = F.aggregate(
        F.zip_with(
            F.col("a.__g"),
            F.col("b.__g"),
            lambda x, y: F.coalesce(x.cast("double"), ma) * F.coalesce(y.cast("double"), mb),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    cov = sxy / N - ma * mb
    va = (am["ss"] + (N - am["n"]) * ma * ma) / N - ma * ma
    vb = (bm["ss"] + (N - bm["n"]) * mb * mb) / N - mb * mb
    # constant variants (zero variance) → NULL r², which fails the
    # threshold filter — they can never be in LD
    rc = cov / F.sqrt(F.nullif(va * vb, F.lit(0.0)))
    return pairs.select(
        F.col("a.locus").alias("la"),
        F.col("b.locus").alias("lb"),
        rc.alias("r"),
        (rc * rc).alias("r2"),
    )


def ld_matrix(
    mt: MatrixTable,
    bp_window_size: int = 1_000_000,
    x_field: str = "GT",
) -> DataFrame:
    """Windowed LD matrix as a sparse entries DataFrame (la, lb, r) —
    the scalable form of ref statgen.py:3836 `ld_matrix` (which
    materializes a BlockMatrix; beyond the window radius entries are 0
    by construction there too).  Null r (constant variant) pairs are
    dropped."""
    return _ld_pairs(mt, bp_window_size, x_field).select(
        "la", "lb", "r"
    ).where(F.col("r").isNotNull())


def ld_prune(
    mt: MatrixTable,
    r2: float = 0.2,
    bp_window_size: int = 1_000_000,
    x_field: str = "GT",
) -> DataFrame:
    """Return the pruned-IN variant keys (ref statgen.py:4708): windowed
    pairwise r² (_ld_pairs), greedy MIS on the conflict edges."""
    edges_df = _ld_pairs(mt, bp_window_size, x_field).where(F.col("r2") > r2)
    edges = [
        ((e["la"]["contig"], e["la"]["position"]), (e["lb"]["contig"], e["lb"]["position"]))
        for e in edges_df.collect()
    ]
    conflicted = set()
    for x, y in edges:
        conflicted.add(x)
        conflicted.add(y)
    keep_of_conflicted = maximal_independent_set(edges)
    drop = conflicted - keep_of_conflicted
    spark = mt._df.sparkSession
    if not drop:
        return mt._df.select("locus")
    drop_df = spark.createDataFrame(
        [{"contig": c, "position": p} for c, p in drop],
        "contig string, position int",
    )
    return (
        mt._df.select("locus")
        .join(
            drop_df,
            on=[
                F.col("locus")["contig"] == F.col("contig"),
                F.col("locus")["position"] == F.col("position"),
            ],
            how="left_anti",
        )
        .select("locus")
    )
