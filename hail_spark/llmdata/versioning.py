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


def latest_by_key(
    df: DataFrame,
    id_col: str,
    version_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """CDC compaction: one row per id — the one with the highest
    ``version_col`` (ties broken by ``tiebreak`` descending, so the
    result is deterministic). One hash aggregate (max_by over a
    version struct), NO window over the corpus — at 100 TB a
    row_number window would sort every partition; max_by is a
    map-side-combining agg."""
    ver = (
        F.struct(F.col(version_col), F.col(tiebreak))
        if tiebreak
        else F.struct(F.col(version_col))
    )
    others = [c for c in df.columns if c != id_col]
    packed = df.groupBy(id_col).agg(
        F.max_by(F.struct(*[F.col(c) for c in others]), ver).alias("__r")
    )
    return packed.select(id_col, *[F.col(f"__r.{c}").alias(c) for c in others])


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    id_col: str = "doc_id",
    deleted_col: str | None = None,
) -> DataFrame:
    """SCD-1 merge: apply an update batch onto a base snapshot —
    updates overwrite matching ids, new ids insert, and (optionally)
    rows where ``updates[deleted_col]`` is true are tombstones that
    DELETE the id. Column-for-column the MERGE INTO of the lakehouse
    formats, expressed as one full-outer join (both sides scan once;
    only the id + payload move through the one shuffle; with the base
    bucketed by id — io/bucketed.py — even that shuffle disappears on
    the base side).

    ``updates`` must be unique per ``id_col`` (MERGE INTO's own
    precondition — duplicate update ids would duplicate base rows
    through the join); compact a CDC stream with ``latest_by_key``
    first."""
    upd_cols = [c for c in updates.columns if c != id_col and c != deleted_col]
    if set(upd_cols) - set(base.columns):
        raise ValueError(
            f"merge_upsert: update columns {sorted(set(upd_cols) - set(base.columns))} "
            "not in base"
        )
    u = updates
    if deleted_col is None:
        u = u.withColumn("__del", F.lit(False))
    else:
        u = u.withColumnRenamed(deleted_col, "__del").withColumn(
            "__del", F.coalesce(F.col("__del"), F.lit(False))
        )
    u = u.select(
        F.col(id_col).alias("__uid"),
        "__del",
        F.struct(*[F.col(c) for c in upd_cols]).alias("__u"),
    )
    j = base.join(u, base[id_col] == u["__uid"], "full_outer")
    kept = j.filter(~F.coalesce(F.col("__del"), F.lit(False)))
    out_id = F.coalesce(F.col(id_col), F.col("__uid")).alias(id_col)
    cols = []
    for c in base.columns:
        if c == id_col:
            continue
        if c in upd_cols:
            # updated/inserted rows take the update value; base-only
            # rows keep theirs
            cols.append(
                F.when(F.col("__uid").isNotNull(), F.col(f"__u.{c}"))
                .otherwise(F.col(c))
                .alias(c)
            )
        else:
            cols.append(F.col(c).alias(c))
    return kept.select(out_id, *cols)


def as_of(
    log: DataFrame,
    key_cols: str | list[str],
    version_col: str,
    version,
    op_col: str | None = None,
    delete_op: str = "d",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Time travel over an append-only upsert/delete log: reconstruct
    the table AS OF ``version`` — for each key, the latest log row with
    ``version_col <= version`` wins; rows whose ``op_col`` equals
    ``delete_op`` mark the key absent at that version.

    Plan: filter (pushed to the log scan) + ONE max_by hash agg keyed
    by the log key — the same no-window shape as `latest_by_key`, so
    reconstructing any historical version costs one pass over the
    pruned log (with the log parquet partitioned by a version bucket,
    the filter prunes whole partitions). ``tiebreak_col`` breaks
    equal-version rows deterministically (required when versions can
    tie)."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    payload = [
        c for c in log.columns if c not in keys and c != version_col
    ]
    pruned = log.filter(F.col(version_col) <= F.lit(version))
    ord_key = (
        F.struct(F.col(version_col), F.col(tiebreak_col))
        if tiebreak_col
        else F.col(version_col)
    )
    picked = pruned.groupBy(*keys).agg(
        *[F.max_by(F.col(c), ord_key).alias(c) for c in payload],
        F.max(F.col(version_col)).alias(version_col),
    )
    if op_col is not None:
        picked = picked.filter(F.col(op_col) != delete_op).drop(op_col)
    return picked
