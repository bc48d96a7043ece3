"""Denoising-objective pair generation for encoder-decoder training.

Span corruption (T5, Raffel et al. 2020 §3.1.4): mask token spans and
emit (input, target) pairs — the input keeps unmasked text with one
sentinel per masked span, the target lists each sentinel followed by
the span it replaced. This implementation is a deterministic variant:
tokens mask independently at ``noise_density`` via an md5-derived
uniform (so consecutive masked tokens merge into natural spans rather
than drawing an explicit span-length distribution), and every draw is
a pure function of (doc id, position, seed) — stable across retries,
partitioning, and engines, and therefore SQL-replayable end to end.

Scale shape: posexplode to (doc, pos, token), one per-DOC window
(lag + running sum — partition-bounded by document length, never the
corpus), one per-doc hash-agg rebuilding the two strings via
sort_array(collect_list). Map-only otherwise; no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import Window as W

from .dedup import md5_int

_DENOM = 1 << 30


def span_corruption(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    noise_density: float = 0.15,
    seed: int = 0,
    sentinel_prefix: str = "<extra_id_",
) -> DataFrame:
    """Build (input, target) denoising pairs per document. Returns
    (id, input, target, n_spans, n_masked). Sentinels are numbered
    per document from 0 in span order (``<extra_id_0>`` …). Documents
    whose text yields no tokens come back with empty strings and
    zero spans."""
    if not 0.0 < noise_density < 1.0:
        raise ValueError("span_corruption: noise_density must be in (0, 1)")
    base = df.select(
        F.col(id_col).alias("__id"),
        F.filter(
            F.split(F.trim(F.col(text_col)), r"\s+"), lambda w: w != ""
        ).alias("__toks"),
    )
    tok = base.select(
        "__id", F.posexplode("__toks").alias("pos", "tok")
    ).withColumn(
        "m",
        F.pmod(
            md5_int(
                F.concat(
                    F.col("__id").cast("string"),
                    F.lit(":"),
                    F.col("pos").cast("string"),
                    F.lit(f":{seed}"),
                )
            ),
            F.lit(_DENOM),
        )
        / float(_DENOM)
        < noise_density,
    )
    w = W.partitionBy("__id").orderBy("pos")
    run = tok.withColumn(
        "start", F.col("m") & ~F.coalesce(F.lag("m").over(w), F.lit(False))
    ).withColumn(
        # span ordinal (1-based on start rows); running sum of starts
        "span",
        F.sum(F.col("start").cast("int")).over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    sent = F.concat(
        F.lit(sentinel_prefix), (F.col("span") - 1).cast("string"), F.lit(">")
    )
    pieces = run.select(
        "__id",
        "pos",
        "m",
        "start",
        F.when(~F.col("m"), F.col("tok"))
        .when(F.col("start"), sent)
        .alias("in_piece"),
        F.when(F.col("m") & F.col("start"), F.concat(sent, F.lit(" "), F.col("tok")))
        .when(F.col("m"), F.col("tok"))
        .alias("tgt_piece"),
    )
    agg = pieces.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("in_piece").isNotNull(),
                            F.struct(F.col("pos").alias("p"), F.col("in_piece").alias("s")),
                        )
                    )
                ),
                lambda x: x["s"],
            ),
            " ",
        ).alias("input"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("tgt_piece").isNotNull(),
                            F.struct(F.col("pos").alias("p"), F.col("tgt_piece").alias("s")),
                        )
                    )
                ),
                lambda x: x["s"],
            ),
            " ",
        ).alias("target"),
        F.sum(F.col("start").cast("int")).alias("n_spans"),
        F.sum(F.col("m").cast("int")).alias("n_masked"),
    )
    return (
        base.select("__id")
        .join(agg, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("input", F.lit("")).alias("input"),
            F.coalesce("target", F.lit("")).alias("target"),
            F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
            F.coalesce("n_masked", F.lit(0)).cast("bigint").alias("n_masked"),
        )
    )
