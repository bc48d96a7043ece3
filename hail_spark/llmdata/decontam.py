"""Benchmark decontamination — flag training documents that contain
evaluation-set n-grams.

The standard recipe (GPT-3 appendix C / Brown et al. 2020; Lee et al.
2022 "Deduplicating Training Data..."): normalize text, slide an
n-gram window (n = 13 tokens is the convention), and mark any training
document sharing at least ``min_hits`` n-grams with the benchmark
corpus as contaminated.

Spark shape, sized for 100 TB of documents vs a (comparatively tiny)
benchmark set:

* both sides tokenize and hash their n-grams JVM-side (``xxhash64`` on
  the joined token window — one codegen projection, no UDF);
* the benchmark side reduces to DISTINCT gram hashes — typically a few
  million rows, so the contaminating-gram join is a BROADCAST
  hash-semi-join against the exploded document grams (no shuffle of
  the document corpus at all; AQE falls back to a shuffle join
  automatically if the benchmark side is too big to broadcast);
* hit counts aggregate per document with map-side partial counts.

Everything is explode → equi-join → groupBy: linear in corpus size,
and the document corpus is read exactly once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm_tokens(text: Column) -> Column:
    """Lowercase, strip punctuation to spaces, whitespace-split — the
    usual decontamination normalization so cosmetic differences don't
    hide an overlap."""
    cleaned = F.regexp_replace(F.lower(text), r"[^a-z0-9\s]", " ")
    return F.filter(F.split(F.trim(cleaned), r"\s+"), lambda t: t != "")


def _gram_hashes_of_tokens(toks: Column, n: int) -> Column:
    """array<bigint> of xxhash64 over each n-token window.

    ``toks`` MUST be a materialized column (its own projection), not an
    inline tokenize expression: the transform lambda references it once
    per POSITION on Spark's interpreted HOF path, so an inlined
    regex+split would recompute per position — O(tokens²) per document
    (the round-3 CollapseProject class; 29 s → 1.5 s at sf0.1)."""
    m = F.size(toks)
    return F.when(
        m >= n,
        F.transform(
            F.sequence(F.lit(1), m - n + 1),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, n))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def benchmark_grams(
    bench: DataFrame, text_col: str = "text", n: int = 13
) -> DataFrame:
    """Distinct n-gram hashes of the benchmark corpus: DataFrame(gram
    bigint). Compute once, reuse across decontamination runs."""
    return (
        bench.select(_norm_tokens(F.col(text_col)).alias("__toks"))
        .select(F.explode(_gram_hashes_of_tokens(F.col("__toks"), n)).alias("gram"))
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    min_hits: int = 1,
) -> DataFrame:
    """Annotate each training document with its benchmark overlap.

    Returns DataFrame(id_col, n_grams bigint, n_hits bigint,
    contaminated boolean): ``n_grams`` is the document's n-gram count,
    ``n_hits`` how many of those occur in the benchmark (counting
    repeated occurrences), ``contaminated`` = n_hits >= min_hits.
    Documents shorter than n tokens have 0 grams and are clean.
    """
    from .dedup import _spread

    grams = benchmark_grams(bench, bench_text_col, n)
    # spread the RAW columns before the gram projection: a single-file
    # source arrives as one partition and the windowed hashing is the
    # CPU-heavy stage (same reason as dedup.py's minhash _spread)
    doc_grams = (
        _spread(docs.select(id_col, text_col))
        .select(F.col(id_col), _norm_tokens(F.col(text_col)).alias("__toks"))
        .select(
            F.col(id_col), _gram_hashes_of_tokens(F.col("__toks"), n).alias("__grams")
        )
    )
    exploded = doc_grams.select(
        id_col, F.size("__grams").alias("__n"), F.explode_outer("__grams").alias("gram")
    )
    # one pass: the exploded rows already carry the per-doc gram count,
    # so a broadcast left join with a hit flag + one aggregate replaces
    # the old two-consumer shape (hit count + separate size projection),
    # which recomputed the CPU-heavy gram hashing twice. benchmark_grams
    # is DISTINCT, so sum(hit) counts occurrences exactly like the old
    # left-semi + count; explode_outer keeps 0-gram docs as one
    # null-gram row (max(__n) = 0, no hit).
    hit = F.lit(1).alias("__hit")
    out = (
        exploded.join(F.broadcast(grams.select("gram", hit)), on="gram", how="left")
        .groupBy(id_col)
        .agg(
            F.max("__n").cast("bigint").alias("n_grams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("bigint").alias("n_hits"),
        )
    )
    return out.select(
        id_col,
        "n_grams",
        "n_hits",
        (F.col("n_hits") >= min_hits).alias("contaminated"),
    )


# ---------------------------------------------------------------------------
# Bloom-screened decontamination (very large benchmark suites)
# ---------------------------------------------------------------------------
#
# `decontaminate` broadcasts the DISTINCT benchmark gram hashes as a
# hash relation (~40 B/entry in the JVM build side). For a very large
# eval union (hundreds of millions of grams) that broadcast stops
# fitting; a Bloom filter at ~1 byte/gram (k=4-6, ~2-3 % FP) is 30-40×
# smaller, and false positives cost nothing because a second EXACT pass
# runs only over the (tiny) candidate subset. Standard two-phase
# membership screen:
#
#   1. build  — gram hashes -> k bit positions (double hashing,
#      Kirsch-Mitzenmacher 2006) -> per-partition byte arrays
#      (vectorized numpy bitwise_or.at) -> OR'd on the driver
#      (bounded: partitions × n_bits/8 bytes) -> ONE broadcast value.
#   2. screen — map-only Arrow-batched pass over the corpus: count
#      grams whose k bits are all set. No shuffle, no join.
#   3. verify — explode ONLY docs whose screened count reaches
#      min_hits (true hits ≤ bloom hits, so nothing real is missed)
#      and take exact counts against the benchmark grams.
#
# Output = exactly the contaminated rows of `decontaminate` (the
# production "what do I drop" contract), so it oracle-checks against
# the same SQL with a HAVING clause.


def _bloom_positions(hashes, n_bits: int, k: int):
    """(n, k) int array of bit positions for int64 gram hashes —
    double hashing h1 + i*h2 with an odd stride, vectorized."""
    import numpy as np

    h = np.asarray(hashes, dtype=np.int64).view(np.uint64)
    h1 = h & np.uint64(n_bits - 1)
    h2 = ((h >> np.uint64(33)) | np.uint64(1)) & np.uint64(n_bits - 1)
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) & np.uint64(n_bits - 1)).astype(
        np.int64
    )


def _or_merge_rounds(rdd, fanin: int = 16):
    """OR-reduce an RDD of equal-length byte buffers IN THE CLUSTER:
    repeated (repartition → per-partition OR) rounds until one partition
    holds the single merged buffer. `repartition` (not narrow coalesce)
    on purpose — a narrow coalesce would collapse the upstream gram-hash
    stage onto the reduced task count; shuffling the ≤1-per-partition
    partials keeps build parallelism intact and moves the buffer traffic
    executor-to-executor instead of through the driver. Returns the
    1-partition RDD (callers collect ≤1 row from it)."""

    def _or_parts(it):
        import numpy as np

        acc = None
        for b in it:
            a = np.frombuffer(b, dtype=np.uint8)
            acc = a.copy() if acc is None else (acc | a)
        return [acc.tobytes()] if acc is not None else []

    while rdd.getNumPartitions() > 1:
        n_next = max(1, rdd.getNumPartitions() // fanin)
        rdd = rdd.repartition(n_next).mapPartitions(_or_parts)
    return rdd.mapPartitions(_or_parts)


def bloom_build(grams: DataFrame, n_bits: int = 1 << 23, k: int = 4) -> bytes:
    """Bloom filter (as bytes, little-endian bit order) over a
    DataFrame(gram bigint) — e.g. `benchmark_grams` output. ``n_bits``
    must be a power of two. Distributed build: each partition sets its
    grams' bits into a local byte array (one numpy pass); the per-
    partition partials are OR-reduced cluster-side in log-fan-in rounds
    (`_or_merge_rounds`), so the driver receives exactly ONE n_bits/8-
    byte buffer regardless of partition count (a 2^30-bit filter over
    10k partitions ships 128 MiB once, not 1.25 TB of partials)."""
    import numpy as np

    if n_bits & (n_bits - 1):
        raise ValueError("bloom_build: n_bits must be a power of two")

    def _part(it):
        import pandas as pd

        arr = np.zeros(n_bits // 8, dtype=np.uint8)
        any_rows = False
        for pdf in it:
            if len(pdf):
                any_rows = True
                pos = _bloom_positions(pdf["gram"].to_numpy(), n_bits, k).ravel()
                np.bitwise_or.at(arr, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        yield pd.DataFrame({"b": [arr.tobytes()] if any_rows else []})

    parts = grams.select("gram").mapInPandas(_part, schema="b binary")
    merged = _or_merge_rounds(parts.rdd.map(lambda r: bytes(r["b"]))).collect()
    if not merged:
        return np.zeros(n_bits // 8, dtype=np.uint8).tobytes()
    assert len(merged) == 1, "cluster OR-reduce must yield one buffer"
    return merged[0]


def bloom_decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    min_hits: int = 1,
    n_bits: int = 1 << 23,
    k: int = 4,
) -> DataFrame:
    """Contaminated documents only — (id_col, n_grams, n_hits), the
    rows `decontaminate` would flag — using the Bloom screen above so
    the benchmark broadcast is ~1 byte/gram instead of a hash relation.
    EXACT output: the screen can only over-select (no false
    negatives); the verify join recomputes true counts for candidates
    and re-applies ``min_hits``."""
    import numpy as np

    from .dedup import _spread

    grams = benchmark_grams(bench, bench_text_col, n)
    bloom = bloom_build(grams, n_bits=n_bits, k=k)
    sc = docs.sparkSession.sparkContext
    b_bloom = sc.broadcast(bloom)

    doc_grams = (
        _spread(docs.select(id_col, text_col))
        .select(F.col(id_col), _norm_tokens(F.col(text_col)).alias("__toks"))
        .select(
            F.col(id_col),
            _gram_hashes_of_tokens(F.col("__toks"), n).alias("__grams"),
        )
    )

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _screen_fn(grams_col):
        # ONE numpy pass per Arrow batch: concatenate every doc's gram
        # hashes, test all bloom bits at once, recover per-doc hit
        # counts from cumsum differences at the segment boundaries
        # (a per-doc Python loop here cost 33 s at sf0.1; this is <1 s)
        bits = np.frombuffer(b_bloom.value, dtype=np.uint8)
        arrs = [
            np.asarray(g, dtype=np.int64)
            if g is not None and len(g)
            else np.empty(0, dtype=np.int64)
            for g in grams_col
        ]
        lens = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=len(arrs))
        if lens.sum() == 0:
            return pd.Series(np.zeros(len(arrs), dtype=np.int32))
        pos = _bloom_positions(np.concatenate(arrs), n_bits, k)
        ok = (
            (bits[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
        ).all(axis=1)
        csum = np.concatenate([[0], np.cumsum(ok)])
        bounds = np.concatenate([[0], np.cumsum(lens)])
        per = csum[bounds[1:]] - csum[bounds[:-1]]
        return pd.Series(per.astype(np.int32))

    # future-annotations module: attach real type objects (pandas_udf
    # can't resolve stringified hints)
    _screen_fn.__annotations__ = {"grams_col": pd.Series, "return": pd.Series}
    # asNondeterministic: the screen IS deterministic, but the marker
    # stops Catalyst pushing the candidate filter (and the downstream
    # explode's isnotnull guard, with the whole tokenize+hash tree
    # inlined into it) below the _spread Exchange onto the single-file
    # scan partition — that pushdown ran the gram chain single-threaded
    # 3x and cost 33 s at sf0.1 (vs ~2 s parallel)
    _screen = pandas_udf(_screen_fn, "int").asNondeterministic()

    screened = doc_grams.withColumn("__bloom_hits", _screen("__grams"))
    cands = screened.filter(F.col("__bloom_hits") >= min_hits)
    exact = (
        cands.select(
            id_col,
            F.size("__grams").cast("bigint").alias("n_grams"),
            F.explode("__grams").alias("gram"),
        )
        # no broadcast hint: in the regime this op exists for, the
        # benchmark gram set is too big to broadcast — AQE picks
        # broadcast when it does fit, shuffle join otherwise (both
        # sides are small: candidates only vs bench grams)
        .join(grams, on="gram", how="left_semi")
        .groupBy(id_col, "n_grams")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .filter(F.col("n_hits") >= min_hits)
    )
    return exact.select(id_col, "n_grams", F.col("n_hits").cast("bigint").alias("n_hits"))
