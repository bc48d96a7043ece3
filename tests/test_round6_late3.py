"""Round-6 late-wave batch 3: transition matrix, bigram LM scoring,
span corruption."""

import math

import pytest
from pyspark.sql import functions as F

from hail_spark.llmdata.denoise import span_corruption
from hail_spark.llmdata.textstats import bigram_logprob
from hail_spark.operators.relational import transition_matrix


def test_transition_matrix_hand_counts(spark):
    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"),
        (2, 1, "a"), (2, 2, "b"),
    ]
    df = spark.createDataFrame(rows, "k long, ts long, s string")
    out = transition_matrix(df, "k", "ts", "s").collect()
    got = {(r["state"], r["next_state"]): (r["n"], r["p"]) for r in out}
    assert got[("a", "b")] == (2, 1.0)
    assert got[("b", "a")] == (1, 1.0)
    assert len(got) == 2


def test_transition_matrix_terminal_and_ties(spark):
    # equal timestamps break ties on the second order column
    rows = [(1, 5, 1, "x"), (1, 5, 2, "y")]
    df = spark.createDataFrame(rows, "k long, ts long, eid long, s string")
    out = transition_matrix(
        df, "k", ["ts", "eid"], "s", include_terminal=True
    ).collect()
    got = {(r["state"], r["next_state"]) for r in out}
    assert ("x", "y") in got and ("y", None) in got


def test_bigram_logprob_hand_value(spark):
    # corpus: "a b" and "a b c": bigrams (a,b)x2, (b,c)x1; V=3
    # left marginals: a=2, b=1
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in bigram_logprob(df, add_k=1.0).collect()}
    lp_ab = math.log((2 + 1) / (2 + 3))
    lp_bc = math.log((1 + 1) / (1 + 3))
    assert out[1]["logprob"] == pytest.approx(lp_ab)
    assert out[2]["logprob"] == pytest.approx((lp_ab + lp_bc) / 2)
    assert out[1]["n_bigrams"] == 1 and out[2]["n_bigrams"] == 2


def test_bigram_logprob_short_doc_null(spark):
    df = spark.createDataFrame(
        [(1, "solo"), (2, "a b")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in bigram_logprob(df).collect()}
    assert out[1]["logprob"] is None and out[1]["n_bigrams"] is None
    assert out[2]["logprob"] is not None


def test_span_corruption_reconstruction(spark):
    # input and target together must reconstruct the document: replace
    # each sentinel in the input by its span from the target
    docs = [
        (i, " ".join(f"w{i}_{j}" for j in range(30))) for i in range(5)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for r in span_corruption(df, noise_density=0.3, seed=9).collect():
        # parse target into span lists
        spans = {}
        cur = None
        for t in r["target"].split():
            if t.startswith("<extra_id_"):
                cur = t
                spans[cur] = []
            else:
                spans[cur].append(t)
        rebuilt = []
        for t in r["input"].split():
            if t.startswith("<extra_id_"):
                rebuilt.extend(spans[t])
            else:
                rebuilt.append(t)
        original = dict(docs)[r["doc_id"]].split()
        assert rebuilt == original
        assert r["n_spans"] == len(spans)
        assert r["n_masked"] == sum(len(v) for v in spans.values())
        # sentinels numbered 0..n-1 in order
        assert sorted(spans) == [f"<extra_id_{i}>" for i in range(len(spans))]


def test_span_corruption_deterministic_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "   ")], "doc_id long, text string"
    )
    a = sorted(map(tuple, span_corruption(df, seed=4).collect()))
    b = sorted(map(tuple, span_corruption(df, seed=4).collect()))
    assert a == b
    got = {r[0]: r for r in a}
    assert got[2][1] == "" and got[2][3] == 0  # empty doc -> empty pair
    c = sorted(map(tuple, span_corruption(df, seed=5).collect()))
    assert a != c  # seed changes the mask


def test_span_corruption_rate_validation(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        span_corruption(df, noise_density=0.0)


def test_sequence_ngrams_hand_counts(spark):
    from hail_spark.operators.relational import sequence_ngrams

    rows = [(1, t, s) for t, s in enumerate(["a", "b", "c", "a", "b", "c"])]
    df = spark.createDataFrame(rows, "k long, ts long, s string")
    out = sequence_ngrams(df, "k", "ts", "s", n=3).collect()
    got = {(r["g1"], r["g2"], r["g3"]): r["n_occurrences"] for r in out}
    assert got == {
        ("a", "b", "c"): 2, ("b", "c", "a"): 1, ("c", "a", "b"): 1,
    }
    # bigrams reduce to the transition-matrix counts
    bi = sequence_ngrams(df, "k", "ts", "s", n=2).collect()
    assert sum(r["n_occurrences"] for r in bi) == 5


def test_sequence_ngrams_respects_key_boundary(spark):
    from hail_spark.operators.relational import sequence_ngrams

    rows = [(1, 1, "a"), (1, 2, "b"), (2, 3, "c"), (2, 4, "d")]
    df = spark.createDataFrame(rows, "k long, ts long, s string")
    out = sequence_ngrams(df, "k", "ts", "s", n=2).collect()
    got = {(r["g1"], r["g2"]) for r in out}
    assert got == {("a", "b"), ("c", "d")}  # no cross-user (b,c) gram


def test_mutual_information_known_values(spark):
    import math

    from hail_spark.llmdata.features import mutual_information

    # perfectly predictive feature: MI = H(Y) = ln 2 for a 50/50 label;
    # constant feature: MI = 0; independent feature: MI = 0
    rows = []
    for i in range(100):
        y = "p" if i < 50 else "q"
        rows.append((y, y, "const", "i" + str(i % 2), i))
    df = spark.createDataFrame(rows, "y string, same string, c string, ind string, i long")
    out = {r["feature"]: r for r in mutual_information(df, ["same", "c", "ind"], "y").collect()}
    assert out["same"]["mi"] == pytest.approx(math.log(2), rel=1e-12)
    assert out["c"]["mi"] == pytest.approx(0.0, abs=1e-12)
    assert out["ind"]["mi"] == pytest.approx(0.0, abs=1e-12)
    assert out["same"]["n_values"] == 2 and out["c"]["n_values"] == 1


def test_mutual_information_null_category(spark):
    from hail_spark.llmdata.features import mutual_information

    # NULLs form their own (here perfectly predictive) category
    rows = [(None, "p")] * 10 + [("x", "q")] * 10
    df = spark.createDataFrame(rows, "f string, y string")
    out = mutual_information(df, ["f"], "y").head()
    import math

    assert out["mi"] == pytest.approx(math.log(2), rel=1e-12)
    assert out["n_values"] == 2
