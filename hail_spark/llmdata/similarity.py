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
    whose md5(id) ranks smallest — cheap, reproducible on any engine),
    assign every vector to its nearest centroid. Returns
    (assigned_corpus, centroids).

    At 100 TB: the centroids are collected once (nlist rows — tiny) and
    inlined as an array literal, so assignment is a ZERO-SHUFFLE per-row
    argmax inside the corpus scan — no join row-blowup, no window
    shuffle. Write the assigned corpus bucketed by `cell`
    (``assigned.write.bucketBy(nlist, "cell")``) so probes prune
    partitions."""
    cents = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .withColumn("__h", F.md5(F.col(id_col).cast("string")))
        .orderBy("__h")
        .limit(nlist)
        .withColumn("cell", F.row_number().over(Window.orderBy("__h")) - 1)
        .select("cell", F.col(vec_col).alias("c_vec"))
    )
    rows = cents.collect()  # nlist rows: the quantizer codebook
    # Arrow-vectorized argmax over the broadcast codebook: one numpy
    # gemm per batch instead of nlist interpreted HOF cosine folds per
    # row (~10x at local scale, and still the zero-shuffle map-only
    # shape at 100 TB). np.argmax takes the FIRST max, so ties break
    # toward the smallest cell id like the struct-max plan did.
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.array([[float(x) for x in r["c_vec"]] for r in sorted(rows, key=lambda r: r["cell"])])
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)

    def _assign_fn(vecs):
        M = np.array(vecs.tolist(), dtype=np.float64)
        norms = np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
        sims = (M / norms) @ Cn.T
        return pd.Series(np.argmax(sims, axis=1).astype("int32"))

    # `from __future__ import annotations` stringifies hints, which
    # pandas_udf can't resolve — attach them as real objects instead
    _assign_fn.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    _assign = pandas_udf(_assign_fn, "int")

    assigned = corpus.select(
        F.col(id_col), F.col(vec_col), _assign(F.col(vec_col)).alias("cell")
    )
    return assigned, cents


def ivf_write(assigned: DataFrame, cents: DataFrame, path: str) -> None:
    """Persist the IVF index partitioned by cell so probes prune at the
    file level: reading with ``cell IN (probe set)`` touches only
    nprobe/nlist of the data, and the probe join gets dynamic partition
    pruning. This is the missing piece that turns the nprobe/nlist
    scan-fraction estimate into actual IO savings."""
    import os

    assigned.write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(path, "corpus")
    )
    cents.write.mode("overwrite").parquet(os.path.join(path, "centroids"))


def ivf_read(spark, path: str) -> tuple[DataFrame, DataFrame]:
    import os

    return (
        spark.read.parquet(os.path.join(path, "corpus")),
        spark.read.parquet(os.path.join(path, "centroids")),
    )


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
