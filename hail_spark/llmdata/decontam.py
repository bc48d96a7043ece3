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
    hits = (
        exploded.join(F.broadcast(grams), on="gram", how="left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    base = doc_grams.select(
        id_col, F.size("__grams").cast("bigint").alias("n_grams")
    )
    out = base.join(hits, on=id_col, how="left").na.fill({"n_hits": 0})
    return out.select(
        id_col,
        "n_grams",
        F.col("n_hits").cast("bigint").alias("n_hits"),
        (F.col("n_hits") >= min_hits).alias("contaminated"),
    )
