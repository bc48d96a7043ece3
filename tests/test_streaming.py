"""Structured Streaming extensions: windowed counts match the batch
aggregation of the same data; sessionization state machine runs."""

import shutil
import time

import pytest
from pyspark.sql import functions as F

from hail_spark.streaming import sessionize_stream, stream_windowed_counts
from hail_spark.streaming.events import read_events_stream


@pytest.fixture()
def events_dir(spark, sf_dir, tmp_path):
    # stage events as several files for incremental triggers; the source
    # uses ns timestamps (Spark's reader rejects TIMESTAMP(NANOS)) so
    # re-encode to µs with pyarrow first
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/events.parquet")
    ts_us = t.column("ts").cast(
        pa.timestamp("us"), safe=False
    )  # truncate sub-µs (Spark can't represent ns anyway)
    t = t.set_column(t.schema.get_field_index("ts"), "ts", ts_us)
    out = tmp_path / "events_stream"
    out.mkdir()
    n = max(1, t.num_rows // 5)
    for i, lo in enumerate(range(0, t.num_rows, n)):
        pq.write_table(t.slice(lo, n), str(out / f"part-{i}.parquet"))
    return str(out)


def test_windowed_counts_match_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=2)
    windowed = stream_windowed_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        windowed.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")  # finalized windows only
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"] or 0, 6))
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    )
    want = {
        (r["w"]["start"], r["event_type"]): (r["n"], round(r["s"] or 0, 6)) for r in batch
    }
    # append mode emits only watermark-closed windows: every emitted window
    # must match batch exactly, and most windows should have been emitted
    assert got, "stream produced no finalized windows"
    for k, v in got.items():
        assert want[k] == v, k
    assert len(got) >= len(want) * 0.5


def test_sessionize_stream_runs(spark, events_dir):
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=5)
    sess = sessionize_stream(stream)
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    # a stateful query with ProcessingTimeTimeout never self-terminates
    # under availableNow (it keeps scheduling timeout batches), so a
    # plain awaitTermination(120) just burns its full timeout — poll
    # until every source row is accounted for, then stop (the
    # stream_sessionize_replay drain pattern; was 120 s of sleep)
    import time as _time

    total_rows = spark.read.parquet(events_dir).count()
    deadline = _time.time() + 120
    while _time.time() < deadline:
        if q.awaitTermination(2):
            break
        drained = (
            spark.table("sessions")
            .groupBy("user_id")
            .agg(F.max("n_events").alias("__n"))
            .agg(F.sum("__n"))
            .head()[0]
        )
        if drained == total_rows:
            break
    q.stop()
    rows = spark.sql("SELECT * FROM sessions").collect()
    assert rows, "no session updates emitted"
    by_user = {r["user_id"]: r for r in rows}
    batch = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .collect()
    )
    want = {r["user_id"]: r for r in batch}
    # availableNow drains everything in order, so final updates carry
    # the complete per-user totals
    sample = list(want)[:20]
    for u in sample:
        assert by_user[u]["n_events"] == want[u]["n"], u
        assert by_user[u]["session_start"] == want[u]["lo"], u
        assert by_user[u]["session_end"] == want[u]["hi"], u


@pytest.fixture()
def docs_dir(spark, sf_dir, tmp_path):
    # stage documents as several files, duplicating some docs across
    # batches so the streaming dedup has real cross-batch duplicates
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet")
    out = tmp_path / "docs_stream"
    out.mkdir()
    n = max(1, t.num_rows // 4)
    for i, lo in enumerate(range(0, t.num_rows, n)):
        pq.write_table(t.slice(lo, n), str(out / f"part-{i}.parquet"))
    # re-write the first slice under new ids: later-arriving exact copies
    import pyarrow as pa
    import pyarrow.compute as pc

    dup = t.slice(0, n)
    dup = dup.set_column(
        dup.schema.get_field_index("doc_id"),
        "doc_id",
        pc.add(dup.column("doc_id"), pa.scalar(10_000_000, type=pa.int64())),
    )
    pq.write_table(dup, str(out / "part-dup.parquet"))
    return str(out), t.num_rows, n


def test_stream_exact_dedup_drops_cross_batch_copies(spark, docs_dir):
    from hail_spark.streaming import read_documents_stream, stream_exact_dedup

    path, n_rows, n_dup = docs_dir
    stream = read_documents_stream(spark, path, max_files_per_trigger=1)
    deduped = stream_exact_dedup(stream)
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_docs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM dedup_docs").collect()
    texts = [r["text"] for r in got]
    # every surviving text unique; the planted duplicate batch fully dropped
    assert len(texts) == len(set(texts))
    n_distinct_texts = (
        spark.read.parquet(path).select("text").distinct().count()
    )
    assert len(texts) == n_distinct_texts


def test_stream_quality_filter_matches_batch(spark, docs_dir):
    from hail_spark.streaming import read_documents_stream, stream_quality_filter

    path, _, _ = docs_dir
    stream = stream_quality_filter(read_documents_stream(spark, path))
    q = (
        stream.writeStream.format("memory")
        .queryName("q_docs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"]: r["quality"] for r in spark.sql("SELECT * FROM q_docs").collect()}
    from hail_spark.llmdata.textstats import quality_score

    batch = {
        r["doc_id"]: r["q"]
        for r in spark.read.parquet(path)
        .select("doc_id", quality_score(F.col("text")).alias("q"))
        .filter(F.col("q") >= 0.5)
        .collect()
    }
    assert got == batch and len(got) > 0


def test_stream_dedup_with_index_two_waves(spark, tmp_path):
    """The production live-feed shape: wave 1 populates the persisted
    index; a SECOND streaming run over wave 2 (containing exact copies
    of wave-1 docs plus fresh ones) must accept only the fresh docs —
    history survives across runs because the state IS the on-disk
    index, not in-memory streaming state."""
    import os

    from hail_spark.streaming import read_documents_stream, stream_dedup_with_index

    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    acc = str(tmp_path / "accepted")
    ck = str(tmp_path / "ck")
    os.makedirs(src)
    cols = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    wave1 = spark.createDataFrame(
        [(i, f"unique document number {i} with words {i * 7}", "en", "s", 10)
         for i in range(20)],
        cols,
    )
    wave1.write.mode("append").parquet(src)
    q = stream_dedup_with_index(
        read_documents_stream(spark, src), idx, acc, ck
    ).trigger(availableNow=True).start()
    q.awaitTermination(180)
    first = spark.read.parquet(acc)
    assert first.count() == 20
    # wave 2: 5 exact copies of wave-1 texts (new ids) + 5 fresh
    wave2 = spark.createDataFrame(
        [(100 + i, f"unique document number {i} with words {i * 7}", "en", "s", 10)
         for i in range(5)]
        + [(200 + i, f"brand new second wave doc {i} zzz {i * 13}", "en", "s", 10)
           for i in range(5)],
        cols,
    )
    wave2.write.mode("append").parquet(src)
    q2 = stream_dedup_with_index(
        read_documents_stream(spark, src), idx, acc, ck
    ).trigger(availableNow=True).start()
    q2.awaitTermination(180)
    acc_df = spark.read.parquet(acc)
    ids = {r["doc_id"] for r in acc_df.collect()}
    assert {200 + i for i in range(5)} <= ids
    assert not any(100 <= i < 200 for i in ids)  # exact copies rejected
    assert acc_df.count() == 25
    # the index grew to cover the accepted set
    hashes = spark.read.parquet(os.path.join(idx, "hashes"))
    assert hashes.select("content_hash").distinct().count() == 25


def test_stream_session_window_matches_batch(spark, events_dir):
    """Built-in event-time session windows (F.session_window) with a
    watermark: every append-mode-finalized session must match the batch
    session_window aggregation exactly."""
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=2)
    sess = (
        stream.withWatermark("ts", "2 hours")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("ws"), "n_events")
    )
    q = (
        sess.writeStream.format("memory")
        .queryName("sess_win")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["ws"]): r["n_events"]
        for r in spark.sql("SELECT * FROM sess_win").collect()
    }
    want = {
        (r["user_id"], r["w"]["start"]): r["n"]
        for r in spark.read.parquet(events_dir)
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got, "stream produced no finalized sessions"
    for k, v in got.items():
        assert want[k] == v, k
    assert len(got) >= len(want) * 0.5


def test_stream_static_broadcast_enrich(spark, events_dir):
    """Stream-static join: a streaming fact enriched with a broadcast
    static dim — every output row must carry the right dim value and
    totals must match batch."""
    dim = spark.createDataFrame(
        [(t, f"team_{t}") for t in ("click", "view", "purchase", "signup", "error")],
        "event_type string, team string",
    )
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=3)
    enriched = stream.join(F.broadcast(dim), "event_type").groupBy("team").agg(
        F.count(F.lit(1)).alias("n")
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("enrich")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["team"]: r["n"] for r in spark.sql("SELECT * FROM enrich").collect()}
    want = {
        f"team_{r['event_type']}": r["n"]
        for r in spark.read.parquet(events_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_checkpoint_restart_processes_each_file_exactly_once(
    spark, events_dir, tmp_path
):
    """Stop/restart with the SAME checkpointLocation resumes from the
    source offset log: files ingested before the stop are never
    reprocessed, later files are picked up — exactly-once ingestion
    accounting across restarts (the property a 100-TB incremental
    pipeline leans on)."""
    import glob
    import json
    import shutil

    ckpt = str(tmp_path / "ckpt")
    out_log = tmp_path / "batches.jsonl"

    src = str(tmp_path / "src")
    shutil.copytree(events_dir, src)
    first_files = sorted(glob.glob(f"{src}/*.parquet"))
    # hold back the last two files for the second run
    held = first_files[-2:]
    for i, f in enumerate(held):
        shutil.move(f, str(tmp_path / f"held-{i}.parquet"))

    def run_once():
        counts = []

        def sink(batch_df, batch_id):
            counts.append(batch_df.count())

        q = (
            read_events_stream(spark, src, max_files_per_trigger=2)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        with open(out_log, "a") as fh:
            fh.write(json.dumps(counts) + "\n")
        return sum(counts)

    n_first = run_once()
    n_src_first = spark.read.parquet(src).count()
    assert n_first == n_src_first  # everything available, once

    # no new files: restart does nothing
    assert run_once() == 0

    # add the held-back files: restart processes ONLY them
    for i, f in enumerate(held):
        shutil.move(str(tmp_path / f"held-{i}.parquet"), f)
    n_second = run_once()
    n_total = spark.read.parquet(src).count()
    assert n_second == n_total - n_src_first
    assert n_first + n_second == n_total  # exactly once overall
