"""Corpus version diffing — what changed between two snapshots of a
document table.

The pipeline-ops counterpart of a dataset card: before retraining on
corpus v(N+1), report exactly which documents were added, removed, or
content-changed vs v(N). One full-outer hash equi-join on the id — the
content comparison rides 60-bit md5 content hashes (computed JVM-side,
no text shuffled: only (id, hash) pairs move), so the shuffle payload
is ~16 B/row regardless of document size. At 100 TB both snapshots
scan once; everything downstream of the scans is the narrow hash
projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import md5_int


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document diff status: (id_col, status) with status in
    added | removed | changed | unchanged. Only (id, content-hash)
    pairs are joined — document text never shuffles."""
    # coalesce so a NULL text hashes to a sentinel instead of a NULL
    # hash (a NULL hash would misread a present-but-empty doc as
    # added/removed); the sentinel can't collide with real text output
    # of a parquet string column (lone surrogate)
    h = lambda c: md5_int(F.coalesce(c, F.lit("\x00__null__")))
    o = old.select(F.col(id_col), h(F.col(text_col)).alias("__old_h"))
    n = new.select(F.col(id_col), h(F.col(text_col)).alias("__new_h"))
    j = o.join(n, on=id_col, how="full_outer")
    status = (
        F.when(F.col("__old_h").isNull(), F.lit("added"))
        .when(F.col("__new_h").isNull(), F.lit("removed"))
        .when(F.col("__old_h") != F.col("__new_h"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(F.col(id_col), status.alias("status"))


def corpus_diff_summary(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(status, n_docs) rollup of `corpus_diff` — the four-line release
    note for a corpus bump."""
    return (
        corpus_diff(old, new, id_col, text_col)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
