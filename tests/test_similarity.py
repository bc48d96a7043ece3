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
