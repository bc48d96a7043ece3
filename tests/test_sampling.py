"""Deterministic sampling / shuffle primitives (llmdata.sampling):
partition-invariance and rate sanity — the properties that make the ops
reproducible on a real cluster."""

import hashlib

from pyspark.sql import functions as F

from hail_spark.llmdata import sampling
from tests.conftest import load


def _py_uniform(uid, seed):
    h = hashlib.md5(f"{uid}:{seed}".encode()).hexdigest()[:15]
    return (int(h, 16) % (1 << 30)) / float(1 << 30)


def test_bernoulli_partition_invariant(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    a = sampling.bernoulli_sample(ev, 0.3, "event_id", seed=11)
    b = sampling.bernoulli_sample(ev.repartition(17), 0.3, "event_id", seed=11)
    ids_a = {r["event_id"] for r in a.select("event_id").collect()}
    ids_b = {r["event_id"] for r in b.select("event_id").collect()}
    assert ids_a == ids_b
    # matches the python md5 replay exactly
    some = sorted(ids_a)[:50]
    for uid in some:
        assert _py_uniform(uid, 11) < 0.3
    n = ev.count()
    assert 0.2 * n < len(ids_a) < 0.4 * n


def test_stratified_rates(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    rates = {"click": 1.0, "view": 0.0}
    s = sampling.stratified_sample(ev, "event_type", rates, "event_id")
    got = {r["event_type"] for r in s.select("event_type").distinct().collect()}
    assert got == {"click"}  # rate-0 and unlisted strata dropped
    n_click = ev.filter(F.col("event_type") == "click").count()
    assert s.count() == n_click  # rate-1 keeps everything


def test_deterministic_shuffle_stable(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    o1 = [r["doc_id"] for r in sampling.deterministic_shuffle(docs, "doc_id", 3).select("doc_id").collect()]
    o2 = [
        r["doc_id"]
        for r in sampling.deterministic_shuffle(docs.repartition(13), "doc_id", 3)
        .select("doc_id")
        .collect()
    ]
    assert o1 == o2
    assert sorted(o1) != o1  # it actually permutes
    expect = sorted(o1, key=lambda d: (_py_uniform(d, 3), d))
    assert o1 == expect


def test_assign_shards_deterministic_partition(spark, sf_dir):
    from hail_spark.llmdata import sampling

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    a = sampling.assign_shards(d, 50, "doc_id", seed=4).collect()
    b = sampling.assign_shards(d, 50, "doc_id", seed=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    by_shard = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["shard_pos"])
    n = len(a)
    full, last = divmod(n, 50)
    for s, poss in by_shard.items():
        expected = 50 if s < full else last
        assert len(poss) == expected
        assert sorted(poss) == list(range(len(poss)))  # dense within shard


def test_write_training_shards_round_trip(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from hail_spark.llmdata import sampling, textstats

    d = load(spark, sf_dir, "documents").select(
        "doc_id", "text", textstats.token_count(F.col("text")).alias("n_tokens")
    )
    manifest = sampling.write_training_shards(
        d, str(tmp_path / "shards"), 64, "doc_id", count_col="n_tokens", seed=9
    ).collect()
    data = spark.read.parquet(str(tmp_path / "shards" / "data"))
    assert data.count() == d.count()
    got = {
        (r["shard"], r["n"], r["t"])
        for r in data.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("t"))
        .collect()
    }
    want = {(r["shard"], r["n_docs"], r["n_tokens"]) for r in manifest}
    assert got == want
    m2 = spark.read.parquet(str(tmp_path / "shards" / "manifest.parquet"))
    assert sorted(map(tuple, m2.collect())) == sorted(map(tuple, manifest))


def test_weighted_mix_replication_and_determinism(spark):
    from hail_spark.llmdata.sampling import uniform, weighted_mix
    from pyspark.sql import functions as F

    rows = [(i, "a" if i < 20 else ("b" if i < 40 else "c")) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = weighted_mix(df, {"a": 2.0, "b": 0.5}, "source", "doc_id", seed=3)
    got = out.groupBy("source", "doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.collect_set("copy_idx").alias("idx"),
    ).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], []).append(r)
        # copy_idx is exactly 0..n-1
        assert sorted(r["idx"]) == list(range(r["n"]))
    # integer weight: every 'a' doc exactly twice
    assert len(by_src["a"]) == 20 and all(r["n"] == 2 for r in by_src["a"])
    # zero/absent weight: 'c' dropped entirely
    assert "c" not in by_src
    # fractional weight matches the uniform predicate doc-by-doc
    kept_b = {r["doc_id"] for r in by_src.get("b", [])}
    expect_b = {
        r["doc_id"]
        for r in df.filter("source = 'b'")
        .withColumn("u", uniform(F.col("doc_id"), 3))
        .collect()
        if r["u"] < 0.5
    }
    assert kept_b == expect_b
    # deterministic across runs
    assert out.count() == weighted_mix(
        df, {"a": 2.0, "b": 0.5}, "source", "doc_id", seed=3
    ).count()


def test_chunk_documents(spark):
    from hail_spark.llmdata.sampling import chunk_documents

    words = lambda n: " ".join(f"w{i}" for i in range(n))
    rows = [(1, words(10)), (2, words(4)), (3, ""), (4, None), (5, words(5))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, window=4, stride=3)
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], {})[r["chunk_idx"]] = (r["n_tokens"], r["chunk_text"])
    # 10 tokens, window 4, stride 3 -> 1 + ceil(6/3) = 3 chunks
    assert len(got[1]) == 3
    assert got[1][0] == (4, "w0 w1 w2 w3")
    assert got[1][1] == (4, "w3 w4 w5 w6")
    assert got[1][2] == (4, "w6 w7 w8 w9")
    # n <= window -> single whole-doc chunk
    assert got[2] == {0: (4, "w0 w1 w2 w3")}
    # empty / null docs yield no rows
    assert 3 not in got and 4 not in got
    # last chunk short: 5 tokens -> chunks at 0 (4 toks) and 3 (2 toks)
    assert got[5][1] == (2, "w3 w4")
    # every token covered: union of chunk tokens == doc tokens
    toks = {t for _, txt in got[1].values() for t in txt.split()}
    assert toks == set(words(10).split())


def test_split_assign_deterministic_and_disjoint(spark):
    import pytest as _pytest

    from hail_spark.llmdata.sampling import split_assign

    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    out = split_assign(df, {"train": 0.8, "val": 0.1, "test": 0.1}, "doc_id", seed=1)
    rows = out.collect()
    assert len(rows) == 2000  # fractions sum to 1 -> nothing dropped
    counts = {}
    for r in rows:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    # roughly proportional
    assert abs(counts["train"] / 2000 - 0.8) < 0.05
    assert abs(counts["val"] / 2000 - 0.1) < 0.03
    # determinism: same assignment on rerun
    again = {r["doc_id"]: r["split"] for r in split_assign(
        df, {"train": 0.8, "val": 0.1, "test": 0.1}, "doc_id", seed=1).collect()}
    assert all(again[r["doc_id"]] == r["split"] for r in rows)
    # partial fractions drop the remainder
    part = split_assign(df, {"train": 0.5}, "doc_id", seed=1)
    assert 0.45 < part.count() / 2000 < 0.55
    with _pytest.raises(ValueError):
        split_assign(df, {"a": 0.9, "b": 0.2}, "doc_id")


def test_modern_pipeline_composition(spark, sf_dir):
    """Round-4 pipeline end-to-end on real testdata: line dedup -> span
    removal -> quality gate (hashed linear score) -> split assignment ->
    chunking -> shard assignment. Asserts conservation/sanity at each
    stage; every stage stays a DataFrame (one lazy plan per action)."""
    from pyspark.sql import functions as F

    from hail_spark.llmdata.dedup import dedup_lines, remove_duplicated_spans
    from hail_spark.llmdata.sampling import (
        assign_shards,
        chunk_documents,
        split_assign,
    )
    from hail_spark.llmdata.textstats import hashed_linear_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. corpus line dedup (8-word windows as lines)
    ld = dedup_lines(docs, words_per_line=8)
    assert ld.count() == n0  # every doc survives
    cleaned = ld.select("doc_id", F.col("text_clean").alias("text"))

    # 2. span removal on the cleaned text
    sr = remove_duplicated_spans(cleaned, n=8)
    assert sr.count() == n0
    cleaned2 = sr.filter(F.col("n_kept") > 0).select(
        "doc_id", F.col("text_clean").alias("text")
    )

    # 3. quality gate: keep score >= 0.5 under a synthetic weight table
    weights = spark.range(4096).select(
        F.col("id").alias("bucket"),
        (((F.col("id") * 97) % 200) / 100.0 - 1.0).alias("weight"),
    )
    scored = hashed_linear_score(cleaned2, weights, n_buckets=4096)
    gated = cleaned2.join(
        scored.filter(F.col("score") >= 0.5).select("doc_id"), "doc_id"
    )
    n_gated = gated.count()
    assert 0 < n_gated <= n0

    # 4. deterministic split, then chunk only the train split
    split = split_assign(gated, {"train": 0.9, "val": 0.1}, "doc_id", seed=2)
    train = split.filter("split = 'train'")
    chunks = chunk_documents(train, window=24, stride=16)
    # chunk token conservation: every train doc with tokens yields chunks
    assert chunks.select("doc_id").distinct().count() == train.filter(
        F.length(F.trim("text")) > 0
    ).count()

    # 5. shard the chunks deterministically; shards are dense 0..K-1
    sharded = assign_shards(
        chunks.withColumn("uid", F.concat_ws(":", "doc_id", "chunk_idx")),
        docs_per_shard=64,
        uid_col="uid",
    )
    shards = sorted(r["shard"] for r in sharded.select("shard").distinct().collect())
    assert shards == list(range(len(shards)))
    counts = {r["shard"]: r["count"] for r in sharded.groupBy("shard").count().collect()}
    assert all(v == 64 for s, v in counts.items() if s < len(shards) - 1)


def test_select_to_token_budget(spark):
    from hail_spark.llmdata.sampling import select_to_token_budget

    rows = [(i, float(10 - i), 100) for i in range(10)]  # q: 10,9,...,1
    df = spark.createDataFrame(rows, "doc_id long, q double, n long")
    out = {r["doc_id"]: r for r in
           select_to_token_budget(df, 350, "q", "n", "doc_id").collect()}
    # greedy by quality desc: docs 0,1,2 fit fully; doc 3's first token
    # still lands under 350 (tokens_before=300) -> straddles, kept;
    # doc 4 (tokens_before=400) dropped.
    assert {d for d, r in out.items() if r["keep"]} == {0, 1, 2, 3}
    assert out[3]["tokens_before"] == 300 and out[4]["tokens_before"] == 400
    # budget 0 keeps nothing; budget bigger than the corpus keeps all
    none = select_to_token_budget(df, 0, "q", "n", "doc_id")
    assert none.filter("keep").count() == 0
    allk = select_to_token_budget(df, 10_000, "q", "n", "doc_id")
    assert allk.filter("keep").count() == 10


def test_cap_per_group(spark):
    from hail_spark.llmdata.sampling import cap_per_group

    rows = [(i, i % 3) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, grp long")
    out = cap_per_group(df, "grp", 5, "doc_id", seed=0)
    rows_out = out.collect()
    from collections import Counter
    per = Counter(r["grp"] for r in rows_out)
    assert all(v == 5 for v in per.values()) and len(per) == 3
    assert all(1 <= r["group_rank"] <= 5 for r in rows_out)
    # deterministic across runs
    again = {(r["doc_id"], r["group_rank"])
             for r in cap_per_group(df, "grp", 5, "doc_id", seed=0).collect()}
    assert {(r["doc_id"], r["group_rank"]) for r in rows_out} == again
    # different seed -> (almost surely) different subset
    other = {r["doc_id"]
             for r in cap_per_group(df, "grp", 5, "doc_id", seed=9).collect()}
    assert other != {r["doc_id"] for r in rows_out}


class TestWeightedSample:
    def test_k_rows_no_duplicates(self, spark, sf_dir):
        from hail_spark.llmdata.sampling import weighted_sample

        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        out = weighted_sample(d, k=40, weight_col="n_chars", uid_col="doc_id", seed=1)
        ids = [r["doc_id"] for r in out.collect()]
        assert len(ids) == 40 and len(set(ids)) == 40

    def test_weight_bias(self, spark):
        # a row with 50x the weight should be selected far more often
        # across seeds than a unit-weight row
        from pyspark.sql import functions as F

        from hail_spark.llmdata.sampling import weighted_sample

        rows = [(i, 50.0 if i == 0 else 1.0) for i in range(200)]
        df = spark.createDataFrame(rows, "uid long, w double")
        hits = sum(
            1
            for s in range(30)
            if 0 in {r["uid"] for r in weighted_sample(df, 10, "w", "uid", seed=s).collect()}
        )
        assert hits >= 20  # P(select) ~ 1 - (1-50/249)^10 >> 0.67

    def test_nonpositive_weights_excluded_and_validation(self, spark):
        import pytest as _pytest

        from hail_spark.llmdata.sampling import weighted_sample

        df = spark.createDataFrame([(1, 0.0), (2, -1.0), (3, 5.0)], "uid long, w double")
        out = weighted_sample(df, k=3, weight_col="w", uid_col="uid")
        assert [r["uid"] for r in out.collect()] == [3]
        with _pytest.raises(ValueError):
            weighted_sample(df, k=0, weight_col="w", uid_col="uid")


class TestCorpusDiff:
    def test_statuses(self, spark):
        from hail_spark.llmdata.versioning import corpus_diff

        old = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
        )
        new = spark.createDataFrame(
            [(2, "b"), (3, "C!"), (4, "d")], "doc_id long, text string"
        )
        got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
        assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}

    def test_null_text_is_not_added_or_removed(self, spark):
        from hail_spark.llmdata.versioning import corpus_diff

        old = spark.createDataFrame([(1, None), (2, "b")], "doc_id long, text string")
        new = spark.createDataFrame([(1, None), (2, None)], "doc_id long, text string")
        got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
        assert got == {1: "unchanged", 2: "changed"}


class TestCdcOps:
    def test_latest_by_key(self, spark):
        from hail_spark.llmdata.versioning import latest_by_key

        df = spark.createDataFrame(
            [(1, 10, "a"), (1, 20, "b"), (2, 5, "c"), (1, 20, "z")],
            "id long, v long, payload string",
        )
        got = {r["id"]: (r["v"], r["payload"])
               for r in latest_by_key(df, "id", "v", tiebreak="payload").collect()}
        assert got == {1: (20, "z"), 2: (5, "c")}  # tie at v=20 -> max payload

    def test_merge_upsert_insert_update_delete(self, spark):
        from hail_spark.llmdata.versioning import merge_upsert

        base = spark.createDataFrame(
            [(1, "old1", "s1"), (2, "old2", "s2"), (3, "old3", "s3")],
            "doc_id long, text string, source string",
        )
        upd = spark.createDataFrame(
            [(2, "new2", False), (3, None, True), (4, "ins4", False)],
            "doc_id long, text string, is_deleted boolean",
        )
        got = {
            r["doc_id"]: (r["text"], r["source"])
            for r in merge_upsert(base, upd, "doc_id", "is_deleted").collect()
        }
        # 1 untouched, 2 updated (source kept), 3 deleted, 4 inserted
        assert got == {1: ("old1", "s1"), 2: ("new2", "s2"), 4: ("ins4", None)}

    def test_merge_upsert_rejects_unknown_columns(self, spark):
        import pytest as _pytest

        from hail_spark.llmdata.versioning import merge_upsert

        base = spark.createDataFrame([(1, "t")], "doc_id long, text string")
        upd = spark.createDataFrame([(1, 2.0)], "doc_id long, bogus double")
        with _pytest.raises(ValueError):
            merge_upsert(base, upd, "doc_id")
