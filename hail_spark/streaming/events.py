"""Structured Streaming extensions over the events stream.

The reference has NO streaming surface at all (SURVEY.md §2.10 — its
"streams" are intra-partition iterators), so nothing here is parity
work. These are the training-data-pipeline extensions a large-scale
deployment needs: incremental ingestion of an append-only event log
with event-time windowing, late-data handling, and stateful
sessionization — expressed as standard Structured Streaming so the
same code runs on a file source locally and Kafka/queue sources in
production (swap ``readStream.format``).

Scale notes: windowed counts use watermark + tumbling window (state
bounded by the watermark horizon); sessionization uses
``applyInPandasWithState`` with per-user state and processing-time
timeouts — the canonical custom-stateful-operator shape.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """Incremental file-source reader over an events directory (same
    schema as testdata events.parquet)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time tumbling-window counts + value sums per event_type,
    tolerating late data up to the watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w")["start"].alias("window_start"),
            F.col("w")["end"].alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
            "approx_users",
        )
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    horizon: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream INNER join with an event-time interval condition:
    right rows match left rows of the same ``key`` with ``right_ts``
    in ``[left_ts, left_ts + horizon]`` — the canonical two-stream
    stateful operator (click->purchase attribution, request->response
    pairing).

    Both sides are watermarked and the join condition bounds BOTH
    buffers, which is what makes the state finite: Spark evicts a
    buffered left row once the right watermark passes
    ``left_ts + horizon``, and a buffered right row once the left
    watermark passes ``right_ts`` (an equi-join without a time bound
    would buffer both streams forever). Inner-join matches emit as
    they arrive, so an append sink receives every pair exactly once.

    Scale shape: state is partitioned by the join key like any
    stream-stream join; per-key state size is (events within the
    watermark + horizon window), independent of stream length."""
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {horizon}")
        )
    )
    return l.join(r, cond, "inner")


_SESSION_STATE = "n bigint, total double, first_ts timestamp, last_ts timestamp"
_SESSION_OUT = (
    "user_id bigint, n_events bigint, total_value double, "
    "session_start timestamp, session_end timestamp, closed boolean"
)


def _session_fn(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        n, total, first_ts, last_ts = state.get
        state.remove()
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "n_events": n,
                    "total_value": total,
                    "session_start": first_ts,
                    "session_end": last_ts,
                    "closed": True,
                }
            ]
        )
        return
    n, total, first_ts, last_ts = (state.get if state.exists else (0, 0.0, None, None))
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
        lo, hi = pdf["ts"].min(), pdf["ts"].max()
        first_ts = lo if first_ts is None or lo < first_ts else first_ts
        last_ts = hi if last_ts is None or hi > last_ts else last_ts
    state.update((n, total, first_ts, last_ts))
    state.setTimeoutDuration(30_000)  # close session after 30 s idle
    yield pd.DataFrame(
        [
            {
                "user_id": user_id,
                "n_events": n,
                "total_value": total,
                "session_start": first_ts,
                "session_end": last_ts,
                "closed": False,
            }
        ]
    )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Per-user running sessions via applyInPandasWithState (custom
    stateful operator; processing-time timeout closes idle sessions)."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=_SESSION_OUT,
            stateStructType=_SESSION_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


DOCS_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def read_documents_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """Incremental file-source reader over a documents directory (same
    schema as testdata documents.parquet); swap ``format`` for Kafka in
    production — the downstream operators are source-agnostic."""
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_exact_dedup(
    docs: DataFrame,
    ingest_ts_col: str = "__ingest_ts",
    watermark: str = "1 hour",
    text_col: str = "text",
) -> DataFrame:
    """Streaming exact deduplication of a document feed: keep the first
    arrival of each content hash, drop later copies that arrive within
    the watermark horizon — ``dropDuplicatesWithinWatermark`` so the
    dedup state is BOUNDED (evicted once the watermark passes), unlike
    a plain dropDuplicates whose state grows without limit on an
    unbounded stream. This is the streaming complement of
    llmdata.dedup.exact_dedup: at 100 TB/day the batch job dedups the
    historical corpus while this operator gates the live feed.

    If the source has no event-time column, an ingest processing-time
    timestamp is stamped on (``current_timestamp`` at micro-batch
    planning) — exactly-once file sources make this deterministic per
    file within a run.
    """
    synthesized = ingest_ts_col not in docs.columns
    if synthesized:
        docs = docs.withColumn(ingest_ts_col, F.current_timestamp())
    hashed = docs.withColumn("__content_hash", F.md5(F.col(text_col)))
    out = hashed.withWatermark(
        ingest_ts_col, watermark
    ).dropDuplicatesWithinWatermark(["__content_hash"])
    # only drop the timestamp we stamped on ourselves — a caller-provided
    # event-time column must survive for downstream windowed operators
    drop_cols = ["__content_hash"] + ([ingest_ts_col] if synthesized else [])
    return out.drop(*drop_cols)


def stream_quality_filter(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stateless streaming quality gate: the batch textstats signals
    (token count, mean word length, symbol ratio) are pure projections,
    so they apply to a stream unchanged — the same Column expressions
    power both paths (no separate streaming implementation to drift)."""
    from ..llmdata.textstats import mean_word_length, quality_score, token_count

    t = F.col(text_col)
    return (
        docs.withColumn("n_tokens", token_count(t))
        .withColumn("mean_word_len", mean_word_length(t))
        .withColumn("quality", quality_score(t))
        .filter(F.col("quality") >= 0.5)
    )


def minhash_index_append(
    batch: "DataFrame",
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> None:
    """Append a batch's band/hash rows to an existing persisted index
    (minhash_index_write layout) — the write half of the
    batch-over-batch incremental dedup loop. Same partitioning (bands
    partitioned by band), append mode."""
    import os

    from ..llmdata.dedup import md5_int, minhash_bands, minhash_signatures
    from pyspark.sql import functions as F

    sigs = minhash_signatures(batch, text_col, id_col, k, shingle_n)
    minhash_bands(sigs, k=k, bands=bands, id_col=id_col).write.mode(
        "append"
    ).partitionBy("band").parquet(os.path.join(path, "bands"))
    batch.select(
        F.col(id_col), md5_int(F.col(text_col)).alias("content_hash")
    ).write.mode("append").parquet(os.path.join(path, "hashes"))


def stream_dedup_with_index(
    docs: "DataFrame",
    index_path: str,
    accepted_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    accept_near_dups: bool = False,
):
    """Streaming ingest with a PERSISTED dedup index (the production
    live-feed shape): each micro-batch is screened against the on-disk
    band/hash index (llmdata.dedup.dedup_against_index — two
    partition-pruned equi-joins, zero corpus rescan), accepted
    documents are appended to ``accepted_path`` AND their bands/hashes
    appended to the index, so later batches — and later runs — dedup
    against everything ever accepted. Exact dups are always dropped;
    near-dup candidates (shared LSH band) are dropped unless
    ``accept_near_dups``.

    Returns the DataStreamWriter (call .start() / .trigger(...) on
    it). Unlike stream_exact_dedup's watermark-bounded state, the
    state here is the index itself: unbounded history at
    disk-not-memory cost, exactly-once via the streaming checkpoint.
    """
    import os

    from ..llmdata.dedup import dedup_against_index, md5_int, minhash_bands, minhash_signatures
    from pyspark.sql import functions as F

    def _process(batch_df, batch_id):
        spark = batch_df.sparkSession
        batch_df = batch_df.localCheckpoint()
        if os.path.exists(os.path.join(index_path, "bands")):
            ib = spark.read.parquet(os.path.join(index_path, "bands"))
            ih = spark.read.parquet(os.path.join(index_path, "hashes"))
            screened = dedup_against_index(
                batch_df, ib, ih, text_col=text_col, id_col=id_col
            )
            keep_pred = ~F.col("is_exact_dup")
            if not accept_near_dups:
                keep_pred = keep_pred & (F.col("n_index_candidates") == 0)
            keep_ids = screened.filter(keep_pred).select(id_col)
            accepted = batch_df.join(keep_ids, id_col)
        else:
            accepted = batch_df
        # batch-internal exact dedup (first id wins) before accepting
        w_first = (
            accepted.select(
                F.col(id_col), md5_int(F.col(text_col)).alias("__ch")
            )
            .groupBy("__ch")
            .agg(F.min(id_col).alias(id_col))
            .select(id_col)
        )
        accepted = accepted.join(w_first, id_col).localCheckpoint()
        accepted.write.mode("append").parquet(accepted_path)
        minhash_index_append(
            accepted, index_path, text_col=text_col, id_col=id_col
        )

    return docs.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
