"""ANN similarity search: brute-force exactness vs numpy, IVF recall,
and the partitioned on-disk index (probe-side partition pruning)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hail_spark.llmdata.similarity import (
    brute_force_topk,
    ivf_build,
    ivf_read,
    ivf_topk,
    ivf_write,
)


@pytest.fixture(scope="module")
def corpus(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    return emb.select("vec_id", "embedding").limit(400).cache()


@pytest.fixture(scope="module")
def queries(spark, corpus):
    rows = corpus.limit(3).collect()
    return spark.createDataFrame(
        [
            {"q_id": i, "q_vec": list(r["embedding"])}
            for i, r in enumerate(rows)
        ]
    )


def test_brute_force_matches_numpy(corpus, queries):
    res = brute_force_topk(corpus, queries, k=5).collect()
    C = {r["vec_id"]: np.array(r["embedding"]) for r in corpus.collect()}
    ids = sorted(C)
    M = np.stack([C[i] for i in ids])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    for q in queries.collect():
        qv = np.array(q["q_vec"])
        sims = Mn @ (qv / np.linalg.norm(qv))
        order = sorted(zip(-sims, ids))[:5]
        want = [i for _, i in order]
        got = [
            r["vec_id"]
            for r in sorted(
                (r for r in res if r["q_id"] == q["q_id"]), key=lambda r: r["rank"]
            )
        ]
        assert got == want


def test_ivf_recall_and_self_hit(corpus, queries):
    assigned, cents = ivf_build(corpus, nlist=8)
    res = ivf_topk(assigned, cents, queries, k=5, nprobe=4)
    by_q = {}
    for r in res.collect():
        by_q.setdefault(r["q_id"], []).append((r["rank"], r["vec_id"], r["cosine"]))
    # queries ARE corpus vectors: the self vector must be rank 1
    qrows = queries.collect()
    crows = corpus.limit(3).collect()
    for q, c in zip(qrows, crows):
        top = sorted(by_q[q["q_id"]])[0]
        assert top[1] == c["vec_id"] and top[2] == pytest.approx(1.0, abs=1e-9)


def test_ivf_write_read_prunes(corpus, queries, tmp_path, spark):
    assigned, cents = ivf_build(corpus, nlist=8)
    path = str(tmp_path / "ivf")
    ivf_write(assigned, cents, path)
    a2, c2 = ivf_read(spark, path)
    mem = {
        (r["q_id"], r["rank"]): r["vec_id"]
        for r in ivf_topk(assigned, cents, queries, k=5, nprobe=4).collect()
    }
    disk = {
        (r["q_id"], r["rank"]): r["vec_id"]
        for r in ivf_topk(a2, c2, queries, k=5, nprobe=4).collect()
    }
    assert mem == disk
    # static probe filter prunes partitions at the source
    pruned = a2.filter(F.col("cell").isin([0, 1]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cell" in plan


def test_pq_train_deterministic_and_improves(spark, sf_dir):
    import numpy as np

    from hail_spark.llmdata import similarity as sim

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cbs0 = sim.pq_train(e, m=8, ncodes=16, n_iter=0)
    cbs2 = sim.pq_train(e, m=8, ncodes=16, n_iter=2)
    assert cbs2 == sim.pq_train(e, m=8, ncodes=16, n_iter=2)  # reproducible

    def recon_err(cbs):
        C = [np.asarray(c) for c in cbs]
        rows = sim.pq_encode(e, cbs).join(e, "vec_id").collect()
        errs = [
            (
                (
                    np.array([float(x) for x in r["embedding"]])
                    - np.concatenate([C[s][r["codes"][s]] for s in range(8)])
                )
                ** 2
            ).sum()
            for r in rows
        ]
        return float(np.mean(errs))

    assert recon_err(cbs2) < recon_err(cbs0)  # Lloyd reduces distortion


def test_pq_topk_matches_numpy_adc_and_beats_chance(spark, sf_dir):
    import numpy as np

    from pyspark.sql import functions as F

    from hail_spark.llmdata import similarity as sim

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    cbs = sim.pq_train(e, m=8, ncodes=16, n_iter=1)
    enc = sim.pq_encode(e, cbs)
    got = {
        (r["q_id"], r["vec_id"]): (r["rank"], r["adist"])
        for r in sim.pq_topk(enc, cbs, q, k=5).collect()
    }

    # numpy replay of ADC over the same codes
    C = [np.asarray(c) for c in cbs]
    codes = {r["vec_id"]: r["codes"] for r in enc.collect()}
    vecs = {r["vec_id"]: np.array([float(x) for x in r["embedding"]])
            for r in e.collect()}
    n_rows = len(vecs)
    overlap = 0
    for qid in (0, 1, 2):
        qv = vecs[qid]
        lut = [((qv[s * 8:(s + 1) * 8] - C[s]) ** 2).sum(axis=1) for s in range(8)]
        ad = {
            v: sum(lut[s][c[s]] for s in range(8)) for v, c in codes.items()
        }
        top5 = sorted(ad, key=lambda v: (round(ad[v], 9), v))[:5]
        for rk, v in enumerate(top5, 1):
            assert got[(qid, v)][0] == rk
            assert abs(got[(qid, v)][1] - ad[v]) < 1e-6
        exact5 = sorted(
            vecs, key=lambda v: (((vecs[v] - qv) ** 2).sum(), v)
        )[:5]
        overlap += len(set(top5) & set(exact5))
    # recall across 3 queries far above chance (5/n_rows per slot)
    assert overlap >= 3, f"PQ recall too low: {overlap}/15 at n={n_rows}"


def test_ivfpq_composition(spark, sf_dir):
    import numpy as np

    from pyspark.sql import functions as F

    from hail_spark.llmdata import similarity as sim

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    codes_df, cents, cbs = sim.ivfpq_build(e, nlist=8, m=8, ncodes=16, n_iter=1)
    out = sim.ivfpq_topk(codes_df, cents, cbs, q, k=5, nprobe=8).collect()
    got = {}
    for r in out:
        got.setdefault(r["q_id"], []).append((r["rank"], r["vec_id"], r["adist"]))

    # with nprobe = nlist (no pruning), ADC ranks must match a full
    # numpy replay over the same codes and codebooks
    C = np.asarray(cents)
    CB = [np.asarray(cb) for cb in cbs]
    codes = {r["vec_id"]: (r["cell"], r["codes"]) for r in codes_df.collect()}
    vecs = {r["vec_id"]: np.array([float(x) for x in r["embedding"]])
            for r in e.collect()}
    for qid in (0, 1, 2):
        qv = vecs[qid]
        ad = {}
        for v, (cell, cd) in codes.items():
            rq = qv - C[cell]
            ad[v] = sum(
                ((rq[s * 8:(s + 1) * 8] - CB[s][cd[s]]) ** 2).sum()
                for s in range(8)
            )
        top5 = sorted(ad, key=lambda v: (round(ad[v], 9), v))[:5]
        assert [x[1] for x in sorted(got[qid])] == top5
        for rk, v, adist in got[qid]:
            assert abs(adist - ad[v]) < 1e-6

    # pruning really prunes: nprobe=2 scans a subset, still returns k
    out2 = sim.ivfpq_topk(codes_df, cents, cbs, q, k=5, nprobe=2).collect()
    assert len(out2) == 15


def test_pq_write_read_round_trip(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from hail_spark.llmdata import similarity as sim

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    codes_df, cents, cbs = sim.ivfpq_build(e, nlist=8, m=8, ncodes=16)
    before = sorted(map(tuple, sim.ivfpq_topk(codes_df, cents, cbs, q, k=5).collect()))

    path = str(tmp_path / "pqidx")
    sim.pq_write(codes_df, cbs, path, cents=cents)
    codes2, cbs2, cents2 = sim.pq_read(spark, path)
    # byte-packed storage: tinyint on disk, identical codes back
    a = {r["vec_id"]: r["codes"] for r in codes_df.collect()}
    b = {r["vec_id"]: r["codes"] for r in codes2.collect()}
    assert a == b
    after = sorted(map(tuple, sim.ivfpq_topk(codes2, cents2, cbs2, q, k=5).collect()))
    assert before == after


def test_bm25_ranks_relevant_docs_first(spark):
    from pyspark.sql import functions as F

    from hail_spark.llmdata import similarity as sim

    docs = [
        (1, "spark shuffle partitions tuning guide"),
        (2, "spark shuffle deep dive shuffle shuffle internals"),
        (3, "cooking pasta with tomato sauce recipe"),
        (4, "gardening tips for spring flowers and soil"),
    ]
    q = spark.createDataFrame(
        [(100, ["spark", "shuffle"])], "q_id long, terms array<string>"
    )
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = sim.bm25_topk(df, q, k=4).orderBy("rank").collect()
    # docs mentioning the query terms outrank the rest; tf saturation
    # favors doc 2's repeated 'shuffle'
    ranked_ids = [r["doc_id"] for r in out]
    assert set(ranked_ids[:2]) == {1, 2}
    assert out[0]["score"] > out[-1]["score"]
    # docs without any query term score 0 via no postings -> absent
    assert 3 not in ranked_ids and 4 not in ranked_ids


def test_rrf_fuse(spark):
    from hail_spark.llmdata import similarity as sim

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], "q_id long, vec_id long, rank int"
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2), (1, 10, 3)], "q_id long, vec_id long, rank int"
    )
    out = sim.rrf_fuse([a, b], k=4).orderBy("rank").collect()
    # 11 appears at ranks 2+1, 10 at 1+3 -> 11 first (1/62+1/61 > 1/61+1/63)
    # 13 (rank 2 in one list, 1/62) beats 12 (rank 3, 1/63)
    assert [r["vec_id"] for r in out] == [11, 10, 13, 12]
    assert abs(out[0]["rrf_score"] - (1/62 + 1/61)) < 1e-12
    # docs in only one list still score
    assert abs(out[2]["rrf_score"] - 1/62) < 1e-12
    assert abs(out[3]["rrf_score"] - 1/63) < 1e-12


def test_pool_embeddings_mean_and_max(spark):
    from hail_spark.llmdata.similarity import pool_embeddings

    rows = [
        ("a", [1.0, 2.0, 3.0]),
        ("a", [3.0, 0.0, -1.0]),
        ("b", [5.0, 5.0, 5.0]),
    ]
    df = spark.createDataFrame(rows, "doc string, embedding array<double>")
    mean = {r["doc"]: (list(r["embedding"]), r["n_chunks"])
            for r in pool_embeddings(df, "doc", mode="mean").collect()}
    assert mean["a"] == ([2.0, 1.0, 1.0], 2)
    assert mean["b"] == ([5.0, 5.0, 5.0], 1)
    mx = {r["doc"]: list(r["embedding"])
          for r in pool_embeddings(df, "doc", mode="max").collect()}
    assert mx["a"] == [3.0, 2.0, 3.0]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        pool_embeddings(df, "doc", mode="median")


def test_pq_rerank_topk_exact_on_shortlist(spark):
    import numpy as np

    from hail_spark.llmdata import similarity as sim

    rng = np.random.RandomState(3)
    vecs = rng.normal(0, 1, (200, 8))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    q = spark.createDataFrame(
        [(0, [float(x) for x in vecs[7]])], "q_id long, q_vec array<double>"
    )
    cbs = sim.pq_train(corpus, m=4, ncodes=16, n_iter=1)
    enc = sim.pq_encode(corpus, cbs)
    # with a corpus-sized shortlist the re-rank IS brute force
    rr = sim.pq_rerank_topk(enc, cbs, corpus, q, k=5, shortlist=200)
    bf = sim.brute_force_topk(corpus, q, k=5)
    assert [r["vec_id"] for r in rr.orderBy("rank").collect()] == \
           [r["vec_id"] for r in bf.orderBy("rank").collect()]
    # the query's own vector is its top hit
    assert rr.orderBy("rank").first()["vec_id"] == 7


def test_mine_hard_negatives_excludes_positives(spark):
    import numpy as np

    from hail_spark.llmdata.similarity import mine_hard_negatives

    rng = np.random.RandomState(5)
    vecs = rng.normal(0, 1, (50, 6))
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    q = spark.createDataFrame(
        [(0, [float(x) for x in vecs[3]])], "q_id long, q_vec array<double>"
    )
    # positives: the self-match AND its true nearest neighbor
    from hail_spark.llmdata.similarity import brute_force_topk

    top2 = [r["vec_id"] for r in
            brute_force_topk(corpus, q, k=2).orderBy("rank").collect()]
    pos = spark.createDataFrame(
        [(0, int(t)) for t in top2], "q_id long, pos_id long"
    )
    negs = mine_hard_negatives(corpus, q, pos, k=3).orderBy("neg_rank").collect()
    neg_ids = [r["neg_id"] for r in negs]
    assert len(neg_ids) == 3
    assert not (set(neg_ids) & set(top2))
    # negatives are the NEXT most similar items after the positives
    top5 = [r["vec_id"] for r in
            brute_force_topk(corpus, q, k=5).orderBy("rank").collect()]
    assert neg_ids == [t for t in top5 if t not in top2]
