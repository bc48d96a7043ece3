"""Tokenizer-training operators (BPE) for training-data pipelines.

Not part of the Hail reference surface — LLM-data extension (SURVEY.md
§7.2 M4 family). Byte-pair encoding (Sennrich et al. 2016,
arXiv:1508.07909) learned over a distributed corpus: the corpus-scale
work (word counting, per-merge pair counting) runs as Spark
aggregations; only the argmax pair (one row) and the learned merge
table (n_merges rows) ever reach the driver.

Engine-portability: symbol sequences are space-joined strings padded
with one leading/trailing space, and a merge is a plain leftmost
non-overlapping string replace of ``" a b "`` with ``" ab "`` — Spark
``replace``, DuckDB ``replace`` and Python ``str.replace`` were
verified to agree bit-for-bit on this form (including the
boundary-space overlap cases), so a SQL oracle can replay training
exactly. Ties on pair frequency break toward the lexicographically
smaller pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# bpe_train auto-plan cutoff: below this many DISTINCT words the merge
# loop runs driver-side over the collected (word, freq, sym) table —
# identical algorithm and tie-breaks, but without 2 Spark jobs per merge
# (round overhead dominates tiny vocabularies; measured 2.9 s -> ~0.4 s
# for 6 merges on the 50-word synthetic corpus). Above it the loop runs
# distributed: per-merge pair-count hash aggregates over the vocab
# table, which is the shape that holds for web-scale vocabularies.
SMALL_VOCAB_CUTOFF = 1 << 16


def _word_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq, sym) — sym is the space-joined character sequence
    with sentinel spaces, e.g. 'cat' -> ' c a t '."""
    from .dedup import _spread, tokens

    words = (
        _spread(df.select(text_col))
        .select(F.explode(tokens(F.lower(F.col(text_col)))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    sym = F.concat(F.lit(" "), F.regexp_replace(F.col("w"), "(.)", "$1 "))
    return words.select("w", "freq", sym.alias("sym"))


def _top_pair(vocab: DataFrame):
    """Most frequent adjacent symbol pair, weighted by word frequency.
    Distributed: explode positions (not a HOF-built pair array — the
    Generate re-evaluation trap), hash-aggregate by pair with map-side
    partials, TakeOrdered(1) to the driver."""
    arr = F.split(F.trim("sym"), " ")
    pos = vocab.select(
        F.col("freq"),
        arr.alias("__a"),
        F.explode(
            F.when(
                F.size(arr) >= 2, F.sequence(F.lit(1), F.size(arr) - 1)
            ).otherwise(F.array().cast("array<int>"))
        ).alias("__i"),
    )
    pair = F.concat_ws(
        " ", F.element_at("__a", F.col("__i")), F.element_at("__a", F.col("__i") + 1)
    )
    top = (
        pos.select(pair.alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").alias("pair_freq"))
        .orderBy(F.col("pair_freq").desc(), F.col("pair").asc())
        .limit(1)
        .collect()
    )
    return (top[0]["pair"], int(top[0]["pair_freq"])) if top else None


def bpe_train(
    df: DataFrame, n_merges: int = 8, text_col: str = "text"
) -> DataFrame:
    """Learn ``n_merges`` BPE merges over the corpus. Returns a
    DataFrame (rank int, merge_left string, merge_right string, freq bigint) —
    the merge table, in learned order.

    Scale shape: per merge one pair-count hash-aggregate over the
    VOCAB table (O(distinct words), not O(corpus)) plus a vocab-sized
    string replace; the corpus itself is read once for the word count.
    The vocab localCheckpoints per round to truncate the iterative
    lineage (the connected-components lesson). Driver traffic is one
    row per merge.
    """
    spark = df.sparkSession
    vocab = _word_vocab(df, text_col).localCheckpoint()
    merges = []
    if vocab.count() <= SMALL_VOCAB_CUTOFF:
        # driver-side merge loop over the collected vocab table: same
        # pair counting, same (freq DESC, pair ASC) tie-break, same
        # leftmost non-overlapping ' l r ' -> ' lr ' replace (Python
        # str.replace agrees bit-for-bit with Spark/DuckDB replace on
        # this sentinel-padded form — see module docstring)
        data = [(r["freq"], r["sym"]) for r in vocab.collect()]
        for rank in range(n_merges):
            counts: dict = {}
            for freq, sym in data:
                parts = sym.strip().split(" ")
                for i in range(len(parts) - 1):
                    p = f"{parts[i]} {parts[i + 1]}"
                    counts[p] = counts.get(p, 0) + freq
            if not counts:
                break
            pair = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            left, right = pair[0].split(" ")
            merges.append((rank, left, right, pair[1]))
            old, new = f" {left} {right} ", f" {left}{right} "
            data = [(freq, sym.replace(old, new)) for freq, sym in data]
    else:
        for rank in range(n_merges):
            top = _top_pair(vocab)
            if top is None:
                break
            pair, freq = top
            left, right = pair.split(" ")
            merges.append((rank, left, right, freq))
            vocab = vocab.withColumn(
                "sym",
                F.replace(
                    F.col("sym"), F.lit(f" {left} {right} "), F.lit(f" {left}{right} ")
                ),
            ).localCheckpoint()
    return spark.createDataFrame(
        merges, "rank int, merge_left string, merge_right string, freq bigint"
    )


def bpe_encode_len(
    df: DataFrame, merges: list, text_col: str = "text"
) -> DataFrame:
    """Token count per document under a learned merge list: apply the
    merges in order to each word's symbol string and count remaining
    symbols — the 'how many tokens is my corpus under this tokenizer'
    question asked before every training run. Merge application is the
    same portable string replace; one projection, no shuffle."""
    from .dedup import tokens

    words = F.transform(
        tokens(F.lower(F.col(text_col))),
        lambda w: F.concat(F.lit(" "), F.regexp_replace(w, "(.)", "$1 ")),
    )
    doc_sym = F.concat_ws("", words)  # word boundaries stay: ' c a t  d o g '
    for left, right in merges:
        doc_sym = F.replace(
            doc_sym, F.lit(f" {left} {right} "), F.lit(f" {left}{right} ")
        )
    n = F.size(F.filter(F.split(doc_sym, " "), lambda s: s != ""))
    return df.withColumn("n_bpe_tokens", n)


def bpe_vocab(df: DataFrame, merges: list, text_col: str = "text") -> dict:
    """symbol -> id map: raw vocab list = sorted distinct base
    characters (of the lowercased whitespace-tokenized corpus) followed
    by merge products in merge order; a symbol's id is the FIRST index
    where it appears (so a merge product that collides with an earlier
    entry keeps the earlier id — replayable as min(raw_id) in SQL).
    One distinct-chars aggregation over the corpus; the map itself is
    vocabulary-sized (driver literal)."""
    from .dedup import _spread, tokens

    rows = (
        _spread(df.select(text_col))
        .select(F.explode(tokens(F.lower(F.col(text_col)))).alias("__w"))
        .select(F.explode(F.split(F.col("__w"), "")).alias("__c"))
        .filter(F.col("__c") != "")
        .distinct()
        .collect()
    )
    raw = sorted(r["__c"] for r in rows) + [l + r for l, r in merges]
    out: dict = {}
    for i, s in enumerate(raw):
        out.setdefault(s, i)
    return out


def bpe_encode_ids(
    df: DataFrame, merges: list, vocab: dict, text_col: str = "text"
) -> DataFrame:
    """Token-id encoding per document: apply the merge list in order
    (same portable string-replace as bpe_encode_len), split to symbols,
    map each through the vocab literal (-1 for unseen symbols — cannot
    happen when the vocab was built on the same corpus). Adds
    ``bpe_ids array<int>``. One codegen projection, no shuffle — the
    final tokenize step before write_training_shards."""
    from .dedup import tokens

    words = F.transform(
        tokens(F.lower(F.col(text_col))),
        lambda w: F.concat(F.lit(" "), F.regexp_replace(w, "(.)", "$1 ")),
    )
    doc_sym = F.concat_ws("", words)
    for left, right in merges:
        doc_sym = F.replace(
            doc_sym, F.lit(f" {left} {right} "), F.lit(f" {left}{right} ")
        )
    syms = F.filter(F.split(doc_sym, " "), lambda s: s != "")
    pairs = []
    for s, i in sorted(vocab.items()):
        pairs.extend([F.lit(s), F.lit(i)])
    id_map = F.create_map(*pairs)
    ids = F.transform(
        syms, lambda s: F.coalesce(F.try_element_at(id_map, s), F.lit(-1))
    )
    return df.withColumn("bpe_ids", ids)
