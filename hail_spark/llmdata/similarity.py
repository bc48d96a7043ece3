"""Approximate-nearest-neighbor search over embedding columns (LLM-data
extensions; SURVEY.md §7.2 M4).

Baseline: brute-force cosine top-k with the query set broadcast — one
scan of the corpus, no shuffle of the big side; exact.
Scale path: IVF (k-means-ish coarse quantizer via deterministic seed
points) — probe only the closest `nprobe` cells, shrinking the scanned
fraction to nprobe/nlist.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import cosine


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact cosine top-k per query.

    queries is broadcast (small); the corpus is scanned once. The
    per-query top-k uses a window over (query, cosine) — with Q queries
    the shuffle is Q·corpus rows, so keep Q bounded (classic re-ranker /
    eval shape). Ties broken by corpus id for determinism."""
    j = corpus.join(F.broadcast(queries))
    scored = j.select(
        F.col(q_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col(q_vec_col)).alias("cosine"),
    )
    w = Window.partitionBy(q_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, "rank", id_col, "cosine")
    )


def ivf_build(
    corpus: DataFrame,
    nlist: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, DataFrame]:
    """IVF index: pick `nlist` deterministic seed centroids (the rows
    whose id hashes smallest — cheap, reproducible), assign every vector
    to its nearest centroid. Returns (assigned_corpus, centroids).

    At 100 TB: centroids are tiny and broadcast; assignment is one scan;
    the assigned corpus would be written bucketed by `cell` so probes
    prune partitions."""
    cents = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(nlist)
        .withColumn("cell", F.monotonically_increasing_id())
        .select("cell", F.col(vec_col).alias("c_vec"))
    )
    j = corpus.join(F.broadcast(cents))
    sim = cosine(F.col(vec_col), F.col("c_vec"))
    w = Window.partitionBy(id_col).orderBy(F.col("__sim").desc(), F.col("cell"))
    assigned = (
        j.select(F.col(id_col), F.col(vec_col), F.col("cell"), sim.alias("__sim"))
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk", "__sim")
    )
    return assigned, cents


def ivf_topk(
    assigned: DataFrame,
    cents: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Probe the `nprobe` closest cells per query, then exact top-k
    within the probed subset. Scanned fraction ≈ nprobe/nlist."""
    qc = queries.join(F.broadcast(cents))
    w = Window.partitionBy(q_id_col).orderBy(
        cosine(F.col(q_vec_col), F.col("c_vec")).desc(), F.col("cell")
    )
    probes = (
        qc.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= nprobe)
        .select(q_id_col, q_vec_col, "cell")
    )
    j = assigned.join(F.broadcast(probes), on="cell")
    scored = j.select(
        F.col(q_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col(q_vec_col)).alias("cosine"),
    )
    w2 = Window.partitionBy(q_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(q_id_col, "rank", id_col, "cosine")
    )
