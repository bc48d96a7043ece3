"""Round-7 unigram-LM tokenizer: trainer EM, Viterbi determinism,
encode/decode round trip."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from hail_spark.llmdata.tokenizer import (
    _uni_viterbi,
    unigram_decode_ids,
    unigram_encode_ids,
    unigram_train,
)


def _corpus(spark):
    rows = [(i, "the thing sings a song " * 3) for i in range(20)]
    rows += [(100 + i, "another ring brings things") for i in range(5)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_unigram_train_learns_frequent_pieces(spark):
    pieces = unigram_train(_corpus(spark), vocab_size=40, n_em_iters=3)
    got = {r["piece"]: r for r in pieces.collect()}
    # the dominant whole word and the productive suffix both survive
    assert "the" in got
    assert any(len(p) >= 3 and "ing" in p for p in got)
    # single chars are never pruned
    for c in "thesingao":
        assert c in got
    assert pieces.count() <= 40
    # ids dense from 0
    ids = sorted(r["piece_id"] for r in got.values())
    assert ids == list(range(len(ids)))


def test_unigram_train_deterministic(spark):
    a = sorted(map(tuple, unigram_train(_corpus(spark), vocab_size=30).collect()))
    b = sorted(map(tuple, unigram_train(_corpus(spark), vocab_size=30).collect()))
    assert a == b


def test_viterbi_prefers_higher_prob_and_longer_tie(spark):
    logp = {"ab": -1.0, "a": -1.0, "b": -1.0, "abc": -3.0, "c": -1.0}
    # 'abc': ab+c = -2.0 beats abc = -3.0 and a+b+c = -3.0
    assert _uni_viterbi("abc", logp, 3) == (["ab", "c"], -2.0)
    # exact tie in score -> longer last piece wins
    logp2 = {"ab": -2.0, "a": -1.0, "b": -1.0}
    assert _uni_viterbi("ab", logp2, 2)[0] == ["ab"]


def test_viterbi_unknown_char_fallback(spark):
    pieces, score = _uni_viterbi("axa", {"a": -1.0}, 1)
    assert pieces == ["a", "x", "a"]
    assert score == pytest.approx(-22.0)


def test_unigram_encode_decode_round_trip(spark):
    df = _corpus(spark)
    trained = unigram_train(df, vocab_size=40)
    pieces = [
        (r["piece"], r["log_prob"], r["piece_id"]) for r in trained.collect()
    ]
    enc = unigram_encode_ids(df, pieces)
    dec = unigram_decode_ids(enc, pieces)
    for r in dec.select("text", "decoded").collect():
        squashed = "".join(r["text"].lower().split())
        assert r["decoded"] == squashed


def test_unigram_logprob_is_path_sum(spark):
    df = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    pieces = [("ab", -1.5, 0), ("a", -4.0, 1), ("b", -4.0625, 2)]
    row = unigram_encode_ids(df, pieces).head()
    assert row["uni_ids"] == [0, 0]
    assert row["uni_logprob"] == pytest.approx(-3.0)


def test_unigram_train_rejects_bad_vocab(spark):
    with pytest.raises(ValueError):
        unigram_train(_corpus(spark), vocab_size=0)


def test_unigram_save_load_round_trip(spark, tmp_path):
    from hail_spark.llmdata.tokenizer import (
        unigram_encode_ids,
        unigram_load,
        unigram_save,
        unigram_train,
    )

    df = _corpus(spark)
    trained = unigram_train(df, vocab_size=30)
    pieces = [
        (r["piece"], r["log_prob"], r["piece_id"]) for r in trained.collect()
    ]
    p = str(tmp_path / "uni.json")
    unigram_save(p, pieces)
    back = unigram_load(p)
    assert back == pieces
    a = unigram_encode_ids(df, pieces).select("uni_ids").collect()
    b = unigram_encode_ids(df, back).select("uni_ids").collect()
    assert [r["uni_ids"] for r in a] == [r["uni_ids"] for r in b]
