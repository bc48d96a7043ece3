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
