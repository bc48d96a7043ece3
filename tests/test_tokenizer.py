"""BPE tokenizer training: learned merges match a reference Python
implementation; encode length shrinks as merges apply."""

from pyspark.sql import functions as F

from hail_spark.llmdata import tokenizer
from tests.conftest import load


def _py_bpe(word_freqs, n_merges):
    """Reference BPE with the same conventions: space-joined symbols,
    leftmost non-overlapping replace, ties to smaller pair."""
    vocab = {f" {' '.join(w)} ": f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for sym, f in vocab.items():
            a = sym.split()
            for i in range(len(a) - 1):
                p = (a[i], a[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), f = best
        merges.append((l, r, f))
        vocab = {
            s.replace(f" {l} {r} ", f" {l}{r} "): fr for s, fr in vocab.items()
        }
    return merges


def test_bpe_train_matches_python_reference(spark):
    rows = [("low low low lower lowest newest newest wider",)] * 3 + [
        ("new newer newest wide wider widest",)
    ]
    df = spark.createDataFrame(rows, "text string")
    got = [
        (r["merge_left"], r["merge_right"], r["freq"])
        for r in tokenizer.bpe_train(df, n_merges=5).orderBy("rank").collect()
    ]
    freqs = {}
    for (t,) in rows:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    assert got == _py_bpe(freqs, 5)


def test_bpe_train_deterministic_on_corpus(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    a = tokenizer.bpe_train(d, n_merges=3).collect()
    b = tokenizer.bpe_train(d, n_merges=3).collect()
    assert a == b and len(a) == 3


def test_bpe_encode_len_shrinks_with_merges(spark):
    df = spark.createDataFrame([("banana bandana",)], "text string")
    base = df.select(F.length(F.regexp_replace("text", r"\s", "")).alias("n")).first()["n"]
    no_merge = tokenizer.bpe_encode_len(df, []).first()["n_bpe_tokens"]
    assert no_merge == base  # chars = symbols before any merge
    merged = tokenizer.bpe_encode_len(
        df, [("a", "n"), ("b", "an")]
    ).first()["n_bpe_tokens"]
    assert merged < no_merge
    # leftmost non-overlapping replace consumes the boundary space, so
    # adjacent occurrences don't chain: banana -> ' b an a n a ' (one
    # a+n merge) -> ban,a,n,a = 4; bandana -> ' b an d an a ' -> b+an
    # -> ban,d,an,a = 4 (matches Python str.replace exactly)
    assert merged == 8


def test_bpe_encode_ids_round_trip(spark):
    from hail_spark.llmdata.tokenizer import (
        bpe_encode_ids,
        bpe_encode_len,
        bpe_train,
        bpe_vocab,
    )

    rows = [(i, "the cat sat on the mat " * 3 + "dog " * i) for i in range(1, 6)]
    rows.append((9, ""))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = [
        (r["merge_left"], r["merge_right"])
        for r in bpe_train(df, n_merges=4).orderBy("rank").collect()
    ]
    vocab = bpe_vocab(df, merges)
    enc = {r["doc_id"]: r["bpe_ids"]
           for r in bpe_encode_ids(df, merges, vocab).collect()}
    lens = {r["doc_id"]: r["n_bpe_tokens"]
            for r in bpe_encode_len(df, merges).collect()}
    inv = {i: s for s, i in vocab.items()}
    for did, ids in enc.items():
        # id count matches the independent length operator
        assert len(ids) == lens[did]
        assert all(i >= 0 for i in ids)
        # decode: concatenating symbols reproduces the lowercased
        # whitespace-normalized text
        decoded = "".join(inv[i] for i in ids)
        want = "".join(df.filter(f"doc_id = {did}").first()["text"].lower().split())
        assert decoded == want
    assert enc[9] == []
