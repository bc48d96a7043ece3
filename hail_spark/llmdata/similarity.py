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


def _norm(v: Column) -> Column:
    """sqrt(Σ x²) with the same left fold :func:`dedup.cosine` uses, so
    a precomputed norm is bit-identical to the per-pair one."""
    return F.sqrt(
        F.aggregate(
            v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def _dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ, the cosine numerator with dedup.cosine's fold order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


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
    eval shape). Ties broken by corpus id for determinism.

    Norms are precomputed ONCE per corpus row / per query row below the
    join (r10, guide §1.2 per-task work): the inline ``cosine`` fold
    recomputed both Σx² folds per (corpus × query) pair — 2 of the 3
    interpreted HOF folds per pair for values that only depend on one
    side. ``dot / (na * nb)`` is the same expression tree as ``cosine``
    evaluates, so scores are bit-identical (the projection sits below
    the join, which blocks CollapseProject from re-inlining it)."""
    c2 = corpus.select(
        F.col(id_col), F.col(vec_col), _norm(F.col(vec_col)).alias("__na")
    )
    q2 = queries.select(
        F.col(q_id_col), F.col(q_vec_col), _norm(F.col(q_vec_col)).alias("__nb")
    )
    j = c2.join(F.broadcast(q2))
    scored = j.select(
        F.col(q_id_col),
        F.col(id_col),
        (
            _dot(F.col(vec_col), F.col(q_vec_col))
            / (F.col("__na") * F.col("__nb"))
        ).alias("cosine"),
    )
    w = Window.partitionBy(q_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, "rank", id_col, "cosine")
    )


def _make_cell_assign(C):
    """Arrow-vectorized nearest-centroid argmax over a broadcast
    codebook: one numpy gemm per batch instead of nlist interpreted HOF
    cosine folds per row (~10x at local scale, and still the
    zero-shuffle map-only shape at 100 TB). np.argmax takes the FIRST
    max, so ties break toward the smallest cell id."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)

    def _assign_fn(vecs):
        M = np.array(vecs.tolist(), dtype=np.float64)
        norms = np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
        sims = (M / norms) @ Cn.T
        return pd.Series(np.argmax(sims, axis=1).astype("int32"))

    # `from __future__ import annotations` stringifies hints, which
    # pandas_udf can't resolve — attach them as real objects instead
    _assign_fn.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    return pandas_udf(_assign_fn, "int")


def ivf_build(
    corpus: DataFrame,
    nlist: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_iter: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """IVF index: pick `nlist` deterministic seed centroids (the rows
    whose md5(id) ranks smallest — cheap, reproducible on any engine),
    optionally refine with ``n_iter`` rounds of broadcast-Lloyd, and
    assign every vector to its nearest centroid. Returns
    (assigned_corpus, centroids).

    ``n_iter=0`` (default) keeps the raw seed points — fully
    SQL-replayable, but cell sizes skew with the data distribution,
    which erodes probe pruning (a probe that lands in one giant cell
    rescans a big corpus fraction). ``n_iter>0`` runs Lloyd rounds like
    pq_train's: each round is one zero-shuffle Arrow-batched assignment
    over the corpus scan plus a posexplode -> groupBy(cell, coord) mean
    whose shuffle traffic is O(partitions * nlist * d) — never O(rows).
    Empty cells keep their previous centroid. FAISS trains its coarse
    quantizer the same way (Jegou et al. 2011, §IVFADC).

    At 100 TB: the centroids are collected once (nlist rows — tiny) and
    inlined, so assignment is a ZERO-SHUFFLE per-row argmax inside the
    corpus scan — no join row-blowup, no window shuffle. Write the
    assigned corpus with ivf_write so probes prune files."""
    import numpy as np

    seed_cents = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .withColumn("__h", F.md5(F.col(id_col).cast("string")))
        .orderBy("__h")
        .limit(nlist)
        .withColumn("cell", F.row_number().over(Window.orderBy("__h")) - 1)
        .select("cell", F.col(vec_col).alias("c_vec"))
    )
    rows = seed_cents.collect()  # nlist rows: the quantizer codebook
    C = np.array(
        [[float(x) for x in r["c_vec"]] for r in sorted(rows, key=lambda r: r["cell"])]
    )
    base = corpus.select(F.col(id_col), F.col(vec_col))
    if n_iter > 0:
        base = base.localCheckpoint()
    for _ in range(n_iter):
        assign = _make_cell_assign(C)
        means = (
            base.select(
                assign(F.col(vec_col)).alias("cell"),
                F.posexplode(F.col(vec_col)).alias("i", "x"),
            )
            .groupBy("cell", "i")
            .agg(F.avg("x").alias("m"))
            .collect()
        )  # nlist * d rows — driver traffic is codebook-sized
        newC = C.copy()
        seen = set()
        for r in means:
            newC[r["cell"]][r["i"]] = r["m"]
            seen.add(r["cell"])
        C = newC  # cells absent from `means` keep their previous centroid
    spark = corpus.sparkSession
    cents = spark.createDataFrame(
        [(i, [float(x) for x in C[i]]) for i in range(C.shape[0])],
        "cell int, c_vec array<double>",
    )
    assign = _make_cell_assign(C)
    assigned = base.select(
        F.col(id_col), F.col(vec_col), assign(F.col(vec_col)).alias("cell")
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
    # query-side norm computed once per probe row (Q·nprobe rows) instead
    # of once per (corpus × probe) pair; corpus norm once per scanned row
    # — bit-identical to the inline cosine fold (see brute_force_topk)
    probes = (
        qc.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= nprobe)
        .select(
            q_id_col, q_vec_col, "cell", _norm(F.col(q_vec_col)).alias("__nb")
        )
    )
    a2 = assigned.select(
        "cell", F.col(id_col), F.col(vec_col), _norm(F.col(vec_col)).alias("__na")
    )
    j = a2.join(F.broadcast(probes), on="cell")
    scored = j.select(
        F.col(q_id_col),
        F.col(id_col),
        (
            _dot(F.col(vec_col), F.col(q_vec_col))
            / (F.col("__na") * F.col("__nb"))
        ).alias("cosine"),
    )
    w2 = Window.partitionBy(q_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(q_id_col, "rank", id_col, "cosine")
    )


# ------------------------------------------------------------------ #
# Product quantization (PQ) — the memory-bounded ANN path at 100 TB:
# a 64-dim float32 vector (256 B) compresses to m single-byte codes
# (8 B at m=8), so a corpus whose raw embeddings need a 25-TB scan fits
# the code table in cluster memory and queries scan only codes + a
# per-query m x k lookup table (asymmetric distance computation, ADC —
# Jegou et al., "Product Quantization for Nearest Neighbor Search").
# ------------------------------------------------------------------ #
def _pq_seed_codebooks(
    corpus: DataFrame, m: int, ncodes: int, vec_col: str, id_col: str
):
    """Deterministic seed codebooks: the `ncodes` rows with smallest
    md5(id) (same convention as ivf_build / kmeans_embeddings), each
    split into m subvectors; coordinates rounded to 6 decimals so any
    SQL engine replays them exactly."""
    import numpy as np

    rows = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .withColumn("__h", F.md5(F.col(id_col).cast("string")))
        .orderBy("__h")
        .limit(ncodes)
        .select(vec_col)
        .collect()
    )
    S = np.round(np.array([[float(x) for x in r[vec_col]] for r in rows]), 6)
    d = S.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    ds = d // m
    return [S[:, s * ds : (s + 1) * ds].copy() for s in range(m)]


def _pq_codes_udf(codebooks):
    """pandas_udf: vector -> array<int> of m subspace codes (argmin of
    squared L2 per subspace, distances rounded to 9 decimals before the
    argmin so gemm summation order can't diverge from a SQL replay;
    ties break toward the smaller code, np.argmin takes the first min)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cbs = [np.asarray(C, dtype=np.float64) for C in codebooks]
    ds = cbs[0].shape[1]

    def _codes_fn(vecs):
        M = np.array(vecs.tolist(), dtype=np.float64)
        out = np.empty((M.shape[0], len(cbs)), dtype=np.int32)
        for s, C in enumerate(cbs):
            X = M[:, s * ds : (s + 1) * ds]
            dist = (
                (X * X).sum(axis=1, keepdims=True)
                - 2.0 * (X @ C.T)
                + (C * C).sum(axis=1)
            )
            out[:, s] = np.argmin(np.round(dist, 9), axis=1)
        return pd.Series(list(out))

    _codes_fn.__annotations__ = {"vecs": __import__("pandas").Series,
                                 "return": __import__("pandas").Series}
    return pandas_udf(_codes_fn, "array<int>")


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    ncodes: int = 16,
    n_iter: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Train per-subspace codebooks (list of m arrays, each ncodes x
    d/m, plain Python floats rounded to 6 decimals).

    n_iter=0 returns the deterministic seed codebooks (fully
    SQL-replayable); n_iter>0 runs broadcast-Lloyd per subspace: each
    iteration is one zero-shuffle Arrow-batched code assignment over
    the corpus scan, then a posexplode -> groupBy(subspace, code,
    coord) mean whose shuffle traffic is O(partitions * m * ncodes *
    d/m) — never O(rows). Empty cells keep their previous centroid.
    """
    import numpy as np

    if ncodes > 256:
        raise ValueError(
            f"pq_train: ncodes={ncodes} > 256 — PQ codes are persisted as "
            "1 byte/subspace (pq_write tinyint packing); use m > 1 "
            "subspaces instead of a wider per-subspace codebook"
        )
    base = corpus.select(F.col(id_col), F.col(vec_col))
    if n_iter > 0:
        base = base.localCheckpoint()
    cbs = _pq_seed_codebooks(base, m, ncodes, vec_col, id_col)
    ds = cbs[0].shape[1]
    for _ in range(n_iter):
        enc = base.select(
            F.col(vec_col), _pq_codes_udf(cbs)(F.col(vec_col)).alias("__codes")
        )
        ex = (
            enc.select(F.col(vec_col), F.posexplode("__codes").alias("s", "code"))
            .select(
                "s",
                "code",
                F.posexplode(
                    F.slice(F.col(vec_col), F.col("s") * ds + 1, ds)
                ).alias("p", "val"),
            )
        )
        means = (
            ex.groupBy("s", "code", "p")
            .agg(F.avg(F.col("val").cast("double")).alias("mu"))
            .collect()
        )
        nxt = [C.copy() for C in cbs]
        for r in means:
            nxt[r["s"]][r["code"], r["p"]] = round(float(r["mu"]), 6)
        cbs = nxt
    return [[[float(x) for x in row] for row in C] for C in cbs]


def pq_encode(
    corpus: DataFrame,
    codebooks,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Attach `codes` (array<int>, length m) — zero-shuffle, one
    Arrow-batched pass inside the corpus scan. Drop `vec_col`
    downstream and the table is m*4 bytes/row (m bytes once written
    with a byte schema) — the PQ compression that makes a 100-TB
    embedding corpus memory-resident."""
    return corpus.select(
        F.col(id_col), _pq_codes_udf(codebooks)(F.col(vec_col)).alias("codes")
    )


def pq_topk(
    encoded: DataFrame,
    codebooks,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Asymmetric-distance top-k: per query, a m x ncodes lookup table
    of exact query-to-centroid subdistances is built driver-side (tiny)
    and broadcast inside an Arrow-batched UDF; each corpus row costs m
    table lookups — no decode, no gemm against raw vectors. One corpus
    scan + one per-query top-k window (Q bounded, re-ranker shape,
    same contract as brute_force_topk). Returns (q_id, rank, vec_id,
    adist) with adist the squared-L2 ADC estimate."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cbs = [np.asarray(C, dtype=np.float64) for C in codebooks]
    m, ds = len(cbs), cbs[0].shape[1]
    qrows = queries.select(F.col(q_id_col), F.col(q_vec_col)).collect()
    q_ids = [r[q_id_col] for r in qrows]
    Q = np.array([[float(x) for x in r[q_vec_col]] for r in qrows])
    # LUT[qi, s, c] = ||q_sub - c_sub||^2
    lut = np.stack(
        [
            np.stack(
                [
                    ((Q[:, s * ds : (s + 1) * ds] - C[c]) ** 2).sum(axis=1)
                    for c in range(C.shape[0])
                ],
                axis=1,
            )
            for s, C in enumerate(cbs)
        ],
        axis=1,
    )  # (n_q, m, ncodes)

    def _adist_fn(codes):
        CC = np.array(codes.tolist(), dtype=np.int64)  # (n, m)
        # sum_s LUT[:, s, code_s] -> (n_q, n)
        d = np.zeros((lut.shape[0], CC.shape[0]))
        for s in range(m):
            d += lut[:, s, CC[:, s]]
        return pd.Series(list(d.T))

    _adist_fn.__annotations__ = {"codes": pd.Series, "return": pd.Series}
    adist_udf = pandas_udf(_adist_fn, "array<double>")

    qid_arr = F.array(*[F.lit(q) for q in q_ids])
    scored = (
        encoded.select(F.col(id_col), adist_udf(F.col("codes")).alias("__d"))
        .select(F.col(id_col), F.posexplode("__d").alias("__qi", "adist"))
        .select(
            F.element_at(qid_arr, F.col("__qi") + 1).alias(q_id_col),
            F.col(id_col),
            F.col("adist"),
        )
    )
    w = Window.partitionBy(q_id_col).orderBy(
        F.round(F.col("adist"), 9).asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, "rank", id_col, "adist")
    )


def pq_rerank_topk(
    encoded: DataFrame,
    codebooks,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    shortlist: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Two-stage retrieval — the standard production shape that lifts
    the raw-PQ recall ceiling (SCALE.md round-5 table: m=8/ncodes=32
    plateaus ~0.5 because near-ties collide onto the same codes): ADC
    over the compressed code table produces a ``shortlist`` (k' >> k)
    of candidates, then ONLY those Q*k' rows join back to their raw
    vectors for an exact cosine re-rank to ``k``.

    Scale shape: stage 1 is pq_topk's single code-table scan (the
    memory-resident path); stage 2 broadcasts the Q*k'-row shortlist
    into an equi-join against the corpus — the raw-vector scan touches
    one pass but ships only shortlist rows into the window, so the
    exact math never sees more than Q*k' rows. Returns
    (q_id, rank, vec_id, cosine) like brute_force_topk."""
    short = pq_topk(
        encoded, codebooks, queries, k=shortlist,
        id_col=id_col, q_id_col=q_id_col, q_vec_col=q_vec_col,
    ).select(q_id_col, id_col)
    cand = corpus.select(
        F.col(id_col), F.col(vec_col), _norm(F.col(vec_col)).alias("__na")
    ).join(F.broadcast(short), id_col)
    scored = cand.join(
        F.broadcast(
            queries.select(
                q_id_col, q_vec_col, _norm(F.col(q_vec_col)).alias("__nb")
            )
        ),
        q_id_col,
    ).select(
        F.col(q_id_col),
        F.col(id_col),
        (
            _dot(F.col(vec_col), F.col(q_vec_col))
            / (F.col("__na") * F.col("__nb"))
        ).alias("cosine"),
    )
    w = Window.partitionBy(q_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, "rank", id_col, "cosine")
    )


# ------------------------------------------------------------------ #
# IVF + PQ composition (FAISS IVFADC layout): coarse quantizer prunes
# the scan to ~nprobe/nlist, PQ codes of the RESIDUAL (v - centroid)
# keep the scanned part memory-resident. ||q - (c + r̂)||² =
# ||(q - c) - r̂||², so per (query, probed cell) one m x ncodes LUT of
# residual subdistances prices every row in that cell at m lookups.
# ------------------------------------------------------------------ #
def ivfpq_build(
    corpus: DataFrame,
    nlist: int = 16,
    m: int = 8,
    ncodes: int = 16,
    n_iter: int = 0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    coarse_n_iter: int = 0,
):
    """Returns (codes_df, cents, codebooks): codes_df is the compressed
    index (id, cell, codes array<int>) — m ints per row instead of the
    raw vector; cents the coarse centroids (list, ordered by cell);
    codebooks the residual PQ codebooks (pq_train convention:
    n_iter=0 -> deterministic seed codebooks, SQL-replayable).

    Scale shape: ivf_build's zero-shuffle Arrow argmax assigns cells,
    the residual is a codegen zip_with against the plan-literal
    centroid table, pq encoding is one more Arrow-batched map — the
    whole build is a single corpus scan with no shuffle. Persist with
    codes_df.write.partitionBy("cell") (ivf_write convention) so probes
    prune files."""
    assigned, cents_df = ivf_build(
        corpus, nlist, vec_col, id_col, n_iter=coarse_n_iter
    )
    crows = sorted(cents_df.collect(), key=lambda r: r["cell"])
    cents = [[float(x) for x in r["c_vec"]] for r in crows]
    cent_lit = F.array(*[F.array(*[F.lit(x) for x in c]) for c in cents])
    with_res = assigned.select(
        F.col(id_col),
        F.col("cell"),
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            F.element_at(cent_lit, F.col("cell") + 1),
            lambda a, b: a - b,
        ).alias("__res"),
    )
    if n_iter > 0:
        with_res = with_res.localCheckpoint()
    codebooks = pq_train(
        with_res, m=m, ncodes=ncodes, n_iter=n_iter, vec_col="__res", id_col=id_col
    )
    codes_df = with_res.select(
        F.col(id_col),
        F.col("cell"),
        _pq_codes_udf(codebooks)(F.col("__res")).alias("codes"),
    )
    return codes_df, cents, codebooks


def ivfpq_topk(
    codes_df: DataFrame,
    cents,
    codebooks,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """ADC top-k over the probed cells only. Probe selection follows
    ivf_topk (cosine to the coarse centroid, ties toward the smaller
    cell); ranking is squared-L2 ADC on the residual codes. One scan of
    the code table (file-pruned to nprobe/nlist when written
    partitioned by cell) + one bounded per-query top-k window."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(cents, dtype=np.float64)  # (nlist, d)
    cbs = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
    m, ds = len(cbs), cbs[0].shape[1]
    ncodes = cbs[0].shape[0]
    qrows = queries.select(F.col(q_id_col), F.col(q_vec_col)).collect()
    q_ids = [r[q_id_col] for r in qrows]
    Q = np.array([[float(x) for x in r[q_vec_col]] for r in qrows])
    nq, nlist = Q.shape[0], C.shape[0]

    # probe selection: top-nprobe cells per query by cosine
    qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-300)
    cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)
    sims = qn @ cn.T  # (nq, nlist)
    order = np.lexsort((np.arange(nlist)[None, :].repeat(nq, 0), -sims), axis=1)
    probed = order[:, :nprobe]  # (nq, nprobe)
    probing = np.zeros((nq, nlist), dtype=bool)
    for qi in range(nq):
        probing[qi, probed[qi]] = True

    # LUT[qi, cell, s, c] = ||(q - cent_cell)_s - cb[s][c]||^2
    lut = np.zeros((nq, nlist, m, ncodes))
    for qi in range(nq):
        R = Q[qi] - C  # (nlist, d) residual of q against every centroid
        for s in range(m):
            Rs = R[:, s * ds : (s + 1) * ds]  # (nlist, ds)
            # (nlist, ncodes)
            lut[qi, :, s, :] = (
                (Rs[:, None, :] - cbs[s][None, :, :]) ** 2
            ).sum(axis=2)

    def _adist_fn(cells, codes):
        cc = cells.to_numpy()
        K = np.array(codes.tolist(), dtype=np.int64)  # (n, m)
        out = np.full((cc.shape[0], nq), np.nan)
        for cell in np.unique(cc):
            mask = cc == cell
            Kc = K[mask]
            for qi in range(nq):
                if probing[qi, cell]:
                    d = np.zeros(Kc.shape[0])
                    for s in range(m):
                        d += lut[qi, cell, s, Kc[:, s]]
                    out[mask, qi] = d
        return pd.Series([
            [None if np.isnan(x) else float(x) for x in row] for row in out
        ])

    _adist_fn.__annotations__ = {
        "cells": pd.Series, "codes": pd.Series, "return": pd.Series,
    }
    adist_udf = pandas_udf(_adist_fn, "array<double>")

    qid_arr = F.array(*[F.lit(q) for q in q_ids])
    probe_cells = sorted({int(c) for qi in range(nq) for c in probed[qi]})
    scored = (
        codes_df.filter(F.col("cell").isin(probe_cells))
        .select(F.col(id_col), adist_udf(F.col("cell"), F.col("codes")).alias("__d"))
        .select(F.col(id_col), F.posexplode("__d").alias("__qi", "adist"))
        .filter(F.col("adist").isNotNull())
        .select(
            F.element_at(qid_arr, F.col("__qi") + 1).alias(q_id_col),
            F.col(id_col),
            F.col("adist"),
        )
    )
    w = Window.partitionBy(q_id_col).orderBy(
        F.round(F.col("adist"), 9).asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, "rank", id_col, "adist")
    )


def pq_write(codes_df: DataFrame, codebooks, path: str, cents=None) -> None:
    """Persist a PQ (or IVFPQ) index: codes byte-packed to
    array<tinyint> (1 B/subspace — the whole point of PQ at 100 TB) and,
    when cell-assigned, partitioned by cell so probes prune files
    (ivf_write convention). Codebooks (+ optional coarse centroids) go
    to a JSON sidecar — kilobytes."""
    import json as _json
    import os

    for cb in codebooks:
        if len(cb) > 256:
            raise ValueError(
                f"pq_write: codebook has {len(cb)} codes; the tinyint "
                "byte-packing holds at most 256 — train with ncodes <= 256"
            )
    packed = codes_df.withColumn(
        "codes",
        F.transform(F.col("codes"), lambda c: (c - 128).cast("tinyint")),
    )
    w = packed.write.mode("overwrite")
    if "cell" in codes_df.columns:
        w = w.partitionBy("cell")
    w.parquet(os.path.join(path, "codes"))
    meta = {"codebooks": [[list(map(float, r)) for r in cb] for cb in codebooks]}
    if cents is not None:
        meta["cents"] = [list(map(float, c)) for c in cents]
    with open(os.path.join(path, "pq_meta.json"), "w") as fh:
        _json.dump(meta, fh)


def pq_read(spark, path: str):
    """Read back (codes_df, codebooks, cents_or_None); codes unpacked to
    int. Reading with a ``cell IN (probes)`` filter prunes partitions."""
    import json as _json
    import os

    with open(os.path.join(path, "pq_meta.json")) as fh:
        meta = _json.load(fh)
    codes_df = spark.read.parquet(os.path.join(path, "codes")).withColumn(
        "codes", F.transform(F.col("codes"), lambda c: c.cast("int") + 128)
    )
    return codes_df, meta["codebooks"], meta.get("cents")


def bm25_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    q_id_col: str = "q_id",
    q_terms_col: str = "terms",
) -> DataFrame:
    """BM25 sparse retrieval — the lexical counterpart to the dense ANN
    stack. ``queries``: (q_id, terms array<string>); scores use the
    standard Robertson idf ln((N - df + 0.5)/(df + 0.5) + 1) and tf
    saturation with length normalization (k1, b).

    Plan: one tokenize pass builds the (doc, term, tf) postings and the
    doc-length table; the df table is one hash-agg over postings; the
    query terms (small) broadcast against the postings — an equi-join
    keyed on the term, NOT a scan per query — then one groupBy(q, doc)
    sum and a bounded top-k window. At 100 TB this is the standard
    inverted-index shape: everything partitions by term, and only
    postings of query terms flow past the join.
    """
    from .dedup import _spread, tokens

    tok = _spread(corpus.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    )
    # The postings table is the inverted index every other table derives
    # from; uncheckpointed, the corpus re-tokenizes once per consumer
    # (the avgdl collect, the score join, dfreq, and the separate
    # doc-length pass — 4 tokenize passes). Materialize it once and
    # derive dl = sum(tf) (identical to the token count by definition).
    postings = (
        tok.groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()
    )
    dl = postings.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = float(stats["n"]), float(stats["avgdl"])
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    qt = queries.select(
        F.col(q_id_col), F.explode(F.col(q_terms_col)).alias("term")
    ).distinct()
    idf = F.log(
        (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    scored = (
        postings.join(F.broadcast(qt), "term")
        .join(dfreq, "term")
        .join(dl, id_col)
        .select(
            F.col(q_id_col),
            F.col(id_col),
            (
                idf
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
                )
            ).alias("__s"),
        )
        .groupBy(q_id_col, id_col)
        .agg(F.sum("__s").alias("score"))
    )
    w = Window.partitionBy(q_id_col).orderBy(
        F.round(F.col("score"), 9).desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, "rank", id_col, "score")
    )


def rrf_fuse(
    rankings,
    k: int = 10,
    c: float = 60.0,
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al.) over any number of
    (q_id, id, rank) frames — the standard hybrid-retrieval combiner
    (dense + sparse, or exact + compressed as in the PQ re-rank).
    score(q, d) = Σ_lists 1/(c + rank); absent entries contribute 0.

    Plan: union the (small) per-query top-k lists, one groupBy(q, id)
    sum, one bounded top-k window — all post-retrieval, so the cost is
    O(Q·k·n_lists) regardless of corpus size."""
    from functools import reduce

    parts = [
        r.select(
            F.col(q_id_col),
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(c)) + F.col("rank"))).alias("__s"),
        )
        for r in rankings
    ]
    u = reduce(lambda a, b: a.unionByName(b), parts)
    fused = u.groupBy(q_id_col, id_col).agg(F.sum("__s").alias("rrf_score"))
    w = Window.partitionBy(q_id_col).orderBy(
        F.round(F.col("rrf_score"), 9).desc(), F.col(id_col).asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, "rank", id_col, "rrf_score")
    )


def pool_embeddings(
    chunks: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
    mode: str = "mean",
) -> DataFrame:
    """Pool chunk-level embeddings to one vector per ``group_col``
    (document) — the standard bridge between chunk_documents-style
    encoders and document-level retrieval/dedup. ``mode``: 'mean'
    (centroid; the sentence-transformers default) or 'max'
    (per-coordinate max-pool).

    Scale shape: posexplode -> one hash-aggregate keyed
    (group, coord) -> array_agg ordered rebuild; shuffle traffic is
    rows x d scalars with map-side partials — no vector-as-blob
    groupBy (which would ship whole arrays through an O(group)
    collect_list buffer)."""
    if mode not in ("mean", "max"):
        raise ValueError(f"unknown pool mode {mode!r}")
    agg = F.avg("__x") if mode == "mean" else F.max("__x")
    per_coord = (
        chunks.select(
            F.col(group_col), F.posexplode(F.col(vec_col)).alias("__i", "__x")
        )
        .groupBy(group_col, "__i")
        .agg(agg.alias("__v"), F.count(F.lit(1)).alias("__n"))
    )
    return (
        per_coord.groupBy(group_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__i"), F.col("__v")))
            ).alias("__pairs"),
            F.max("__n").alias("n_chunks"),
        )
        .select(
            F.col(group_col),
            F.transform(F.col("__pairs"), lambda p: p["__v"]).alias(vec_col),
            F.col("n_chunks"),
        )
    )


def quantize_embeddings_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "q",
    scale_col: str = "scale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the standard 4× storage
    / memory-bandwidth reduction for ANN indexes and embedding lakes:
    ``scale = max(|x|)/127``, ``q_i = floor(x_i/scale + 0.5)`` clamped
    to [-127, 127] (half-up via floor, NOT round(): Spark's double
    round and banker's-rounding variants disagree across engines;
    floor(x+0.5) is bit-reproducible everywhere). Zero vectors get
    scale 0 and all-zero codes. Dequantize as ``q_i * scale``.

    Map-only (one projection, no shuffle); the array stays JVM-side as
    array<tinyint> (1 B/dim + the scale double per row)."""
    x = F.col(vec_col)
    # element cast to double BEFORE abs/max: float inputs otherwise
    # take engine-specific promotion paths (float-max/double-divide vs
    # double-max) that differ in the last ulp of the scale
    scale = F.array_max(
        F.transform(x, lambda v: F.abs(v.cast("double")))
    ) / F.lit(127.0)
    qexpr = F.when(
        F.col(scale_col) > 0,
        F.transform(
            x,
            lambda v: F.greatest(
                F.lit(-127),
                F.least(
                    F.lit(127),
                    F.floor(v / F.col(scale_col) + F.lit(0.5)).cast("int"),
                ),
            ).cast("tinyint"),
        ),
    ).otherwise(F.transform(x, lambda v: F.lit(0).cast("tinyint")))
    return df.withColumn(scale_col, scale).withColumn(out_col, qexpr)


def binarize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "bits",
    word_bits: int = 60,
) -> DataFrame:
    """Sign-bit binary codes packed into an ``array<bigint>`` — the
    32× compression tier below int8: bit j of word w is set iff
    ``x[w*word_bits + j] >= 0``. 60 bits per word (not 64) so the
    packed value never touches the sign bit and replays exactly in
    engines without unsigned 64-bit shifts (DuckDB oracle uses the
    same `1::BIGINT << j` arithmetic).

    Map-only projection (HOF fold per word over a ≤word_bits slice; no
    shuffle, no UDF). Pairs with `hamming_topk` for popcount search."""
    x = F.col(vec_col)
    n_words = F.ceil(F.size(x) / F.lit(word_bits)).cast("int")
    wb = F.lit(word_bits)

    def _word(w):
        last = F.least(wb - 1, F.size(x) - w * wb - 1)
        return F.aggregate(
            F.sequence(F.lit(0), last),
            F.lit(0).cast("long"),
            lambda acc, j: acc
            # call_function: the F.shiftleft wrapper only takes a
            # Python-int shift; the SQL function accepts a column
            + F.when(
                F.element_at(x, (w * wb + j + 1).cast("int")) >= 0,
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), j.cast("int")
                ),
            ).otherwise(F.lit(0).cast("long")),
        )

    return df.withColumn(
        out_col,
        F.transform(F.sequence(F.lit(0), n_words - 1), _word),
    )


def hamming_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    bits_col: str = "bits",
) -> DataFrame:
    """Brute-force Hamming top-k over packed binary codes: distance =
    Σ popcount(xor(word_a, word_b)) via JVM-side ``bit_count`` — the
    memory-bandwidth-bound scan that makes binary codes useful (32×
    less data read than float32 brute force, no multiplies). Bounded
    query set joins by a literal key (queries are the small side —
    broadcast), per-query top-k is a TakeOrdered-style window with a
    deterministic (distance, id) tie-break."""
    from pyspark.sql import Window as W

    q = queries.select(
        F.col(q_id_col), F.col(bits_col).alias("__qbits")
    )
    pairs = corpus.select(id_col, bits_col).crossJoin(F.broadcast(q))
    dist = F.aggregate(
        F.zip_with(
            F.col(bits_col),
            F.col("__qbits"),
            lambda a, b: F.bit_count(a.bitwiseXOR(b)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    w = W.partitionBy(q_id_col).orderBy(F.asc("hamming"), F.asc(id_col))
    return (
        pairs.withColumn("hamming", dist)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, "rank", id_col, "hamming")
    )


def mine_hard_negatives(
    corpus: "DataFrame",
    queries: "DataFrame",
    positives: "DataFrame",
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> "DataFrame":
    """Hard-negative mining for retrieval/embedding training: per
    query, the top-``k`` most similar corpus items that are NOT its
    known positives — the standard way contrastive training sets are
    built (the near-misses are the informative negatives).

    ``positives``: (q_id, pos_id) pairs to exclude. Shape: one corpus
    scan scored against the broadcast query set (brute_force_topk
    contract — Q bounded), a broadcast anti-join against the positive
    pairs, then the per-query top-k window. Swap the scorer for
    pq_topk/ivf_topk at 100 TB; the exclusion + window are identical.
    """
    j = corpus.withColumn("__na", _norm(F.col(vec_col))).join(
        F.broadcast(queries.withColumn("__nb", _norm(F.col(q_vec_col))))
    )
    scored = j.select(
        F.col(q_id_col),
        F.col(id_col),
        (
            _dot(F.col(vec_col), F.col(q_vec_col))
            / (F.col("__na") * F.col("__nb"))
        ).alias("cosine"),
    )
    pos = positives.select(
        F.col(q_id_col), F.col("pos_id").alias(id_col)
    )
    neg = scored.join(F.broadcast(pos), [q_id_col, id_col], "left_anti")
    w = Window.partitionBy(q_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        neg.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= k)
        .select(q_id_col, "neg_rank", F.col(id_col).alias("neg_id"), "cosine")
    )


def _band_structs(bits_col: str, n_bits: int, max_hamming: int, word_bits: int):
    """Banded-pigeonhole band extraction shared by
    hamming_near_dup_pairs and hamming_band_overflow — one source of
    truth so the cap and its report can never desynchronize. Returns
    the list of (band index, band value) struct Columns."""
    n_bands = max_hamming + 1
    bands = []
    for i in range(n_bands):
        lo = i * n_bits // n_bands
        hi = (i + 1) * n_bits // n_bands
        expr = F.lit(0).cast("long")
        for p in range(lo, hi):
            word = F.element_at(F.col(bits_col), p // word_bits + 1)
            bit = F.shiftright(word, p % word_bits).bitwiseAND(F.lit(1))
            expr = expr + F.shiftleft(bit.cast("long"), p - lo)
        bands.append(F.struct(F.lit(i).alias("b"), expr.alias("v")))
    return bands


def _validate_packing(
    df: DataFrame, id_col: str, bits_col: str, n_bits: int, word_bits: int
) -> DataFrame:
    """Per-row (word_bits, n_bits) packing-contract validation shared
    by the banded-Hamming family: a row with too few words raises with
    the offending id at EXECUTION, instead of silently losing pairs
    (or reporting clean) through NULL band values."""
    need_words = (n_bits + word_bits - 1) // word_bits
    return df.withColumn(
        bits_col,
        F.when(F.size(F.col(bits_col)) >= need_words, F.col(bits_col)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "hamming banded join: packing contract violated — "
                        "row id "
                    ),
                    F.col(id_col).cast("string"),
                    F.lit(f" has size({bits_col})="),
                    F.size(F.col(bits_col)).cast("string"),
                    F.lit(
                        f" words but n_bits={n_bits} at word_bits={word_bits} "
                        f"needs >= {need_words}; pass the word_bits the "
                        "producer packed with (32 for image_dhash/"
                        "audio_fingerprint, 60 for binarize_embeddings)"
                    ),
                )
            )
        ),
    )


def hamming_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    bits_col: str = "bits",
    n_bits: int = 64,
    max_hamming: int = 6,
    word_bits: int = 32,
    max_postings_per_band: int | None = None,
) -> DataFrame:
    """All pairs within Hamming distance ``max_hamming`` over packed
    binary codes (sign-safe words of ``word_bits`` logical bits each
    in ``bits_col``; ``word_bits`` MUST match the producer's packing —
    32 for image_dhash/audio_fingerprint, 60 for binarize_embeddings;
    a mismatch silently mis-addresses band bits and loses pairs), via
    the banded pigeonhole join: split the ``n_bits`` code into
    ``max_hamming + 1`` contiguous bands — <= ``max_hamming``
    differing bits leave at least one band IDENTICAL, so the
    equi-join on (band index, band bits) is a complete candidate
    generator; candidates are then verified exactly with JVM-side
    ``bit_count(xor)``. Returns (id_a, id_b, hamming), id_a < id_b.

    Scale shape: one explode to B band rows per code (band extraction
    is a literal shift/mask projection, whole-stage codegen), one
    hash equi-join on the band key, one bounded verify projection —
    the MinHash-LSH plan shape, never all-pairs. Skew caveat: a band
    value shared by m codes contributes m^2 candidates (constant
    regions / zeroed codes) — exact-dedup first when codes repeat
    heavily, or set ``max_postings_per_band`` to DROP band keys
    shared by more codes than that (bounds the blow-up; the pigeonhole
    guarantee only finds a pair through bands where the two codes
    AGREE, so a pair is lost only when EVERY band in which the two
    codes agree is over the cap — in practice near-constant content
    that exact dedup should have removed first).

    The (word_bits, n_bits) packing contract is VALIDATED per row at
    execution time: a row whose ``bits_col`` holds fewer than
    ``ceil(n_bits / word_bits)`` words raises with the offending id,
    instead of silently losing pairs through NULL band values (the
    failure mode when word_bits doesn't match the producer's
    packing)."""
    if max_hamming < 0:
        raise ValueError("hamming_near_dup_pairs: max_hamming must be >= 0")
    if word_bits < 1 or word_bits > 62:
        raise ValueError("hamming_near_dup_pairs: word_bits must be in 1..62")
    if max_postings_per_band is not None and max_postings_per_band < 2:
        raise ValueError(
            "hamming_near_dup_pairs: max_postings_per_band must be >= 2"
        )
    df = _validate_packing(df, id_col, bits_col, n_bits, word_bits)
    bands = _band_structs(bits_col, n_bits, max_hamming, word_bits)
    t = df.select(
        F.col(id_col).alias("__id"),
        F.col(bits_col).alias("__bits"),
        F.explode(F.array(*bands)).alias("bd"),
    ).select("__id", "__bits", F.col("bd.b").alias("b"), F.col("bd.v").alias("v"))
    if max_postings_per_band is not None:
        from pyspark.sql import Window as _W

        t = (
            t.withColumn(
                "__p", F.count(F.lit(1)).over(_W.partitionBy("b", "v"))
            )
            .filter(F.col("__p") <= max_postings_per_band)
            .drop("__p")
        )
    a = t.select(
        F.col("__id").alias("id_a"), F.col("__bits").alias("__ba"), "b", "v"
    )
    bt = t.select(
        F.col("__id").alias("id_b"), F.col("__bits").alias("__bb"), "b", "v"
    )
    cand = (
        a.join(bt, ["b", "v"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__ba", "__bb")
        .distinct()
    )
    dist = F.aggregate(
        F.zip_with(
            F.col("__ba"),
            F.col("__bb"),
            lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return (
        cand.withColumn("hamming", dist)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def hamming_band_overflow(
    df: DataFrame,
    id_col: str = "vec_id",
    bits_col: str = "bits",
    n_bits: int = 64,
    max_hamming: int = 6,
    word_bits: int = 32,
    max_postings_per_band: int = 10_000,
) -> DataFrame:
    """Report the band keys :func:`hamming_near_dup_pairs` would DROP
    under ``max_postings_per_band`` — one row per over-cap (band,
    value) key with the number of codes sharing it (the dropped
    posting mass). SHARED band extraction and packing validation with
    the pair join (_band_structs / _validate_packing), so the report
    and the cap can never disagree — and a mis-packed input raises
    here exactly like the pair join instead of reporting clean on
    NULL bands. Run alongside a capped dedup to quantify what the cap
    excluded; empty means inert."""
    df = _validate_packing(df, id_col, bits_col, n_bits, word_bits)
    bands = _band_structs(bits_col, n_bits, max_hamming, word_bits)
    t = df.select(
        F.col(id_col).alias("__id"), F.explode(F.array(*bands)).alias("bd")
    ).select("__id", F.col("bd.b").alias("b"), F.col("bd.v").alias("v"))
    return (
        t.groupBy("b", "v")
        .agg(F.count(F.lit(1)).alias("n_codes"))
        .filter(F.col("n_codes") > max_postings_per_band)
    )


def sparse_cosine_topk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    max_df: int | None = 10_000,
) -> DataFrame:
    """Lexical document-similarity top-k: TF-IDF bag-of-words cosine
    between every document pair that SHARES a term, via the classic
    posting-list self-join (the sparse counterpart of the embedding
    ANN family — catches paraphrase/boilerplate overlap that exact and
    MinHash dedup miss while needing no embeddings). Returns
    (doc_id, rank, other_id, cosine) — each document's k most similar
    neighbors, cosine rounded to 6 places BEFORE ranking so the
    ordering is reproducible across engines (ties break on other_id).

    Weights: ``tfidf = tf * ln(N / df)`` where ``N`` counts the
    documents with at least one token (a token-less document has no
    TF-IDF vector and can never be a neighbor, so it does not dilute
    IDF); norms are computed over ALL terms. ``max_df`` drops terms
    appearing in more than that many documents from the JOIN numerator
    only (stop words contribute least per pair but dominate the
    posting-list m^2 cost — the same drop-and-stay-conservative cap
    discipline as video_near_dup: capped cosines can only shrink,
    never inflate). The cap is ON by default (10_000 — far above any
    discriminative term's df, small enough to bound a stop word's m^2
    at 1e8 comparisons spread over the cluster; pass ``None`` to
    uncap). Quantify what a cap excluded with
    :func:`sparse_cosine_overflow`.

    Scale shape: ONE corpus scan — tokenize explode -> (doc, term)
    hash-agg, ``localCheckpoint``-ed so the N-docs count action and
    the main plan share it (the r05 persist-shared-plans lesson) ->
    df hash-agg join -> per-doc norm window (bounded by doc length) ->
    posting equi-join on term (bounded by max_df per term) -> pair
    hash-agg -> per-doc top-k window. Never all-pairs; the one
    unbounded risk (high-df terms) is exactly what max_df bounds."""
    if k < 1:
        raise ValueError("sparse_cosine_topk: k must be >= 1")
    from .dedup import _spread, tokens

    base = _spread(df.select(id_col, text_col))
    tf = (
        base.select(
            F.col(id_col).alias("__id"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
        )
        .groupBy("__id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()
    )
    n_docs = tf.select("__id").distinct().count()
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
    w = tf.join(dfreq, "term").select(
        "__id",
        "term",
        "__df",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("__df"))).alias("wt"),
    )
    w = w.withColumn(
        "norm",
        F.sqrt(F.sum(F.col("wt") * F.col("wt")).over(Window.partitionBy("__id"))),
    )
    posting = w if max_df is None else w.filter(F.col("__df") <= max_df)
    a = posting.select(
        F.col("__id").alias("id_a"), "term",
        F.col("wt").alias("__wa"), F.col("norm").alias("__na"),
    )
    b = posting.select(
        F.col("__id").alias("id_b"), "term",
        F.col("wt").alias("__wb"), F.col("norm").alias("__nb"),
    )
    pairs = (
        a.join(b, "term")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(F.col("__wa") * F.col("__wb")).alias("__dot"),
            F.first("__na").alias("__na"),
            F.first("__nb").alias("__nb"),
        )
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("__dot") / (F.col("__na") * F.col("__nb")), 6
            ).alias("cosine"),
        )
    )
    mirrored = pairs.unionByName(
        pairs.select(
            F.col("id_b").alias("id_a"),
            F.col("id_a").alias("id_b"),
            "cosine",
        )
    )
    rw = Window.partitionBy("id_a").orderBy(
        F.col("cosine").desc(), F.col("id_b").asc()
    )
    return (
        mirrored.withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= k)
        .select(
            F.col("id_a").alias(id_col),
            "rank",
            F.col("id_b").alias("other_id"),
            "cosine",
        )
    )


def sparse_cosine_overflow(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int = 10_000,
) -> DataFrame:
    """Report the terms :func:`sparse_cosine_topk` would DROP from the
    posting join under ``max_df`` — one row per over-cap term with its
    document frequency (each contributes ``df^2`` candidate
    comparisons if uncapped). Same tokenize/tf projection as the
    operator, so report and cap can never disagree. Empty result means
    the cap is inert at this corpus."""
    from .dedup import _spread, tokens

    base = _spread(df.select(id_col, text_col))
    return (
        base.select(
            F.col(id_col).alias("__id"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
        )
        .groupBy("__id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > max_df)
    )


def knn_label_eval(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    q_label_col: str = "q_label",
) -> DataFrame:
    """kNN label-agreement evaluation — the standard embedding-quality
    gate for training-data curation (an embedding space is useful for
    semantic dedup / clustering exactly to the degree that nearest
    neighbors share labels): for each query vector, take its ``k``
    nearest corpus neighbors by cosine (SELF excluded by id), majority-
    vote their labels (ties -> smallest label), and score agreement
    with the query's own label. Returns per-true-label
    (label, n_queries, n_correct, accuracy).

    Shape: :func:`brute_force_topk` over the broadcast query sample
    (k+1 then drop self — the eval is always run on a bounded query
    sample, the corpus side scans once), one (query, label) hash-agg
    vote, one min_by argmax, one label hash-agg. Swap the scorer for
    ivf_topk/pq_topk at 100 TB; vote and scoring are unchanged."""
    if k < 1:
        raise ValueError("knn_label_eval: k must be >= 1")
    nb = brute_force_topk(
        corpus, queries.select(q_id_col, q_vec_col), k + 1,
        vec_col=vec_col, id_col=id_col,
        q_id_col=q_id_col, q_vec_col=q_vec_col,
    )
    nb = (
        nb.filter(F.col(id_col) != F.col(q_id_col))
        .withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy(q_id_col).orderBy(
                    F.col("cosine").desc(), F.col(id_col).asc()
                )
            ),
        )
        .filter(F.col("__rk") <= k)
    )
    lab = corpus.select(F.col(id_col), F.col(label_col).alias("__nl"))
    votes = (
        nb.join(lab, id_col)
        .groupBy(q_id_col, "__nl")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    pred = votes.groupBy(q_id_col).agg(
        F.min_by(
            "__nl", F.struct((-F.col("__n")).alias("a"), F.col("__nl").alias("b"))
        ).alias("__pred")
    )
    truth = queries.select(q_id_col, F.col(q_label_col).alias("__true"))
    scored = pred.join(truth, q_id_col)
    return (
        scored.groupBy(F.col("__true").alias(label_col))
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.sum(
                F.when(F.col("__pred") == F.col("__true"), 1).otherwise(0)
            ).alias("n_correct"),
        )
        .withColumn(
            "accuracy", F.round(F.col("n_correct") / F.col("n_queries"), 6)
        )
    )
