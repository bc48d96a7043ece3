"""Gopher-style repetition/quality signal tests (Rae et al. 2021 A1.1
rules over the documents table shape)."""

import pytest
from pyspark.sql import functions as F

from hail_spark.llmdata import textstats as ts


def _one(spark, text, expr):
    return spark.createDataFrame([(text,)], "text string").select(
        expr(F.col("text")).alias("v")
    ).first()["v"]


def test_duplicate_line_fraction(spark):
    assert _one(spark, "a\nb\nc", ts.duplicate_line_fraction) == 0.0
    assert abs(_one(spark, "a\na\nb\nb", ts.duplicate_line_fraction) - 0.5) < 1e-12
    # blank lines ignored
    assert abs(_one(spark, "a\n\n\na", ts.duplicate_line_fraction) - 0.5) < 1e-12
    assert _one(spark, "", ts.duplicate_line_fraction) == 0.0


def test_top_ngram_char_fraction(spark):
    # "x y" bigram appears 3 times out of 5 bigrams; doc length 11 chars
    v = _one(spark, "x y x y x y", lambda t: ts.top_ngram_char_fraction(t, 2))
    assert abs(v - 3 * 3 / 11) < 1e-9
    assert _one(spark, "one", lambda t: ts.top_ngram_char_fraction(t, 2)) == 0.0


def test_duplicate_ngram_char_fraction(spark):
    # all 3-grams distinct -> 0
    assert _one(
        spark, "a b c d e", lambda t: ts.duplicate_ngram_char_fraction(t, 3)
    ) == 0.0
    # heavily repeated text -> high fraction
    v = _one(
        spark, "spam ham " * 30, lambda t: ts.duplicate_ngram_char_fraction(t, 3)
    )
    assert v > 0.5


def test_symbol_word_ratio(spark):
    assert _one(spark, "plain words here", ts.symbol_word_ratio) == 0.0
    v = _one(spark, "x # y #", ts.symbol_word_ratio)
    assert abs(v - 2 / 4) < 1e-12


def test_bullet_ellipsis_fractions(spark):
    v = _one(spark, "- a\n- b\nplain\ntrailing...", ts.bullet_ellipsis_fractions)
    assert abs(v["bullet_frac"] - 0.5) < 1e-12
    assert abs(v["ellipsis_frac"] - 0.25) < 1e-12


def test_gopher_quality_filter(spark):
    good = ("the quick brown fox jumps over the lazy dog and keeps going with "
            "plenty of normal words to be sure that we clear the minimum word "
            "count threshold for the gopher rules easily today because this "
            "sentence keeps adding more and more perfectly ordinary words "
            "until we are comfortably past fifty tokens in total here now")
    spam = "buy now " * 60
    rows = spark.createDataFrame(
        [("g", good), ("s", spam)], "id string, text string"
    ).select("id", ts.gopher_quality_filter(F.col("text")).alias("keep")).collect()
    got = {r["id"]: r["keep"] for r in rows}
    assert got["g"] is True
    assert got["s"] is False  # no stopword hits


def test_signals_on_documents_table(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    out = docs.select(
        "doc_id",
        ts.duplicate_line_fraction(F.col("text")).alias("dlf"),
        ts.top_ngram_char_fraction(F.col("text"), 2).alias("top2"),
        ts.symbol_word_ratio(F.col("text")).alias("swr"),
        ts.gopher_quality_filter(F.col("text")).alias("keep"),
    ).collect()
    assert len(out) == 100
    for r in out:
        assert 0.0 <= r["dlf"] <= 1.0
        assert 0.0 <= r["top2"] <= 1.0
        assert r["swr"] >= 0.0
