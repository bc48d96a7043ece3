"""Text analysis operators for training-data pipelines (LLM-data
extensions; SURVEY.md §7.2 M4).

Everything is built from Spark string/array builtins — per-row, inside
whole-stage codegen, no UDFs — so throughput is scan-bound at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_int, tokens

# tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic (public common function words)
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "fr": ["le", "la", "de", "et", "un", "en", "est", "que", "pour", "dans"],
    "de": ["der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish token estimate: alphanumeric runs + individual
    punctuation marks (cheap GPT-ish token proxy; RE2-safe regex)."""
    return F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), 0))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    clean = F.regexp_replace(text, r"[A-Za-z0-9\s]", "")
    return F.when(F.length(text) > 0, F.length(clean) / F.length(text)).otherwise(0.0)


def mean_word_length(text: Column) -> Column:
    ws = tokens(text)
    total = F.aggregate(ws, F.lit(0).cast("bigint"), lambda acc, w: acc + F.length(w))
    return F.when(F.size(ws) > 0, total.cast("double") / F.size(ws))


def stopword_fraction(text: Column, lang: str = "en") -> Column:
    ws = tokens(F.lower(text))
    sw = F.array(*[F.lit(w) for w in _STOPWORDS[lang]])
    hits = F.size(F.filter(ws, lambda w: F.array_contains(sw, w)))
    return F.when(F.size(ws) > 0, hits.cast("double") / F.size(ws)).otherwise(0.0)


def quality_score(text: Column) -> Column:
    """Composite heuristic quality score in [0,1]: length band +
    low punctuation + stopword presence (the usual cheap pre-filters
    before model-based scoring)."""
    n_tok = token_count(text)
    len_ok = F.when((n_tok >= 10) & (n_tok <= 10000), 1.0).otherwise(0.3)
    punct_ok = F.when(punct_ratio(text) < 0.3, 1.0).otherwise(0.5)
    sw_ok = F.when(stopword_fraction(text) > 0.01, 1.0).otherwise(0.6)
    return (len_ok * 0.4 + punct_ok * 0.3 + sw_ok * 0.3).cast("double")


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: float = 0.5,
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram LM — the cheap perplexity-style quality filter that sits
    before model-based scoring in a training-data pipeline.

    Two passes, both distributed: (1) token explode + count → the
    unigram table (vocab-sized, shuffled by token); (2) re-join tokens
    against it and average log p(w) per doc, with add-k smoothing over
    the observed vocab. No driver-side model: the LM IS the token-count
    table, joined by token hash — at web scale both sides partition by
    token, and the per-doc mean is one more hash-agg by id.

    Returns (id, n_tokens, mean_logprob).
    """
    from .dedup import _spread

    toks = (
        _spread(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("__w"))
    )
    # The unigram table feeds BOTH the totals collect and the per-token
    # join; without a checkpoint each consumer re-tokenizes the corpus
    # (3 full explode passes total). The table is vocab-sized (bounded),
    # so materializing it once is safe at any corpus scale; the blocks
    # are ContextCleaner-reclaimed when the returned plan is dropped.
    counts = toks.groupBy("__w").agg(F.count(F.lit(1)).alias("__c")).localCheckpoint()
    totals = counts.agg(
        F.sum("__c").alias("__n"), F.count(F.lit(1)).alias("__v")
    ).collect()[0]
    n_total, vocab = float(totals["__n"]), float(totals["__v"])
    denom = n_total + add_k * vocab
    lp = F.log((F.col("__c") + F.lit(add_k)) / F.lit(denom))
    return (
        toks.join(counts, "__w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg(lp).alias("mean_logprob"),
        )
    )


def langid(text: Column) -> Column:
    """Stopword-vote language ID: argmax over per-language stopword hit
    counts; 'und' when nothing matches."""
    ws = tokens(F.lower(text))

    def _hits(sw_list):
        sw_arr = F.array(*[F.lit(x) for x in sw_list])
        return F.size(F.filter(ws, lambda w: F.array_contains(sw_arr, w)))

    scores = [(lang, _hits(sw)) for lang, sw in _STOPWORDS.items()]
    best_score = F.greatest(*[s for _, s in scores])
    out = F.lit("und")
    # first language reaching the max wins (stable order)
    for lang, s in reversed(scores):
        out = F.when((s == best_score) & (best_score > 0), F.lit(lang)).otherwise(out)
    return out


def fingerprint(text: Column) -> Column:
    """Document fingerprint: 60-bit hash of whitespace-normalized,
    lowercased text (exact-dup key robust to spacing)."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return md5_int(norm)


def text_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-pass text profile: all stats as a wide projection (input
    spread first — the regex stats are CPU-bound and a single-file
    source arrives as one partition)."""
    from .dedup import _spread

    df = _spread(df.select(F.col(id_col), F.col(text_col)))
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_bpe_tokens"),
        punct_ratio(t).alias("punct_ratio"),
        mean_word_length(t).alias("mean_word_len"),
        stopword_fraction(t).alias("stopword_frac"),
        quality_score(t).alias("quality"),
        langid(t).alias("lang_pred"),
        fingerprint(t).alias("fingerprint"),
    )


# ---------------------------------------------------------------------- #
# Gopher-style repetition signals (Rae et al. 2021 §A1.1 quality rules;
# standard training-data pre-filters beyond the reference's scope)
# ---------------------------------------------------------------------- #
def _nonempty_lines(text: Column) -> Column:
    return F.filter(F.split(text, "\n"), lambda l: F.length(F.trim(l)) > 0)


def _gram_array(toks: Column, n: int) -> Column:
    """Word n-gram array (space-joined) from a token array column."""
    k = F.size(toks) - (n - 1)
    return F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def duplicate_line_fraction(text: Column, lines: Column | None = None) -> Column:
    """Fraction of lines that are duplicates of an earlier line.
    Pure HOF: split on newlines, count distinct vs total."""
    if lines is None:
        lines = _nonempty_lines(text)
    n = F.size(lines)
    return F.when(
        n > 0, (n - F.size(F.array_distinct(lines))).cast("double") / n
    ).otherwise(F.lit(0.0))


def duplicate_ngram_char_fraction(
    text: Column, n: int = 3, grams: Column | None = None
) -> Column:
    """Fraction of characters inside word n-grams that occur more than
    once in the document (the Gopher dup-ngram rule, word-level).
    Codegen shape: tokenize once, build the n-gram array with
    transform+slice, diff distinct counts, weight by mean gram length."""
    if grams is None:
        grams = _gram_array(tokens(text), n)
    total = F.size(grams)
    n_dup_grams = total - F.size(F.array_distinct(grams))
    # char-weighted approximation: dup grams share the doc's mean gram length
    mean_len = F.when(
        total > 0,
        F.aggregate(grams, F.lit(0).cast("bigint"), lambda a, g: a + F.length(g))
        / total.cast("double"),
    )
    doc_chars = F.length(text).cast("double")
    return F.when(
        (total > 0) & (doc_chars > 0),
        F.least(n_dup_grams.cast("double") * mean_len / doc_chars, F.lit(1.0)),
    ).otherwise(F.lit(0.0))


def top_ngram_char_fraction(
    text: Column, n: int = 2, grams: Column | None = None
) -> Column:
    """Fraction of characters covered by the single most frequent word
    n-gram (Gopher top-ngram rule)."""
    if grams is None:
        grams = _gram_array(tokens(text), n)
    sorted_g = F.array_sort(grams)
    # most frequent gram via a single fold over the SORTED grams
    best = F.aggregate(
        sorted_g,
        F.struct(
            F.lit("").alias("cur"), F.lit(0).alias("run"),
            F.lit("").alias("best"), F.lit(0).alias("best_n"),
        ),
        lambda acc, g: F.when(
            g == acc["cur"],
            F.struct(
                acc["cur"].alias("cur"), (acc["run"] + 1).alias("run"),
                F.when(acc["run"] + 1 > acc["best_n"], acc["cur"]).otherwise(acc["best"]).alias("best"),
                F.greatest(acc["run"] + 1, acc["best_n"]).alias("best_n"),
            ),
        ).otherwise(
            F.struct(
                g.alias("cur"), F.lit(1).alias("run"),
                F.when(acc["best_n"] >= 1, acc["best"]).otherwise(g).alias("best"),
                F.greatest(acc["best_n"], F.lit(1)).alias("best_n"),
            )
        ),
    )
    doc_chars = F.length(text).cast("double")
    return F.when(
        (F.size(grams) > 0) & (doc_chars > 0),
        F.least(
            best["best_n"].cast("double") * F.length(best["best"]) / doc_chars,
            F.lit(1.0),
        ),
    ).otherwise(F.lit(0.0))


def symbol_word_ratio(text: Column, toks: Column | None = None) -> Column:
    """#/… symbol count per word (Gopher symbol-to-word rule)."""
    syms = (
        F.length(text)
        - F.length(F.regexp_replace(text, r"[#`\*\|<>{}\[\]\\~^=_]|\.\.\.", ""))
    ).cast("double")
    nw = F.size(tokens(text) if toks is None else toks)
    return F.when(nw > 0, syms / nw).otherwise(F.lit(0.0))


def bullet_ellipsis_fractions(text: Column, lines: Column | None = None) -> Column:
    """struct(bullet_frac, ellipsis_frac): fraction of lines starting
    with a bullet / ending with an ellipsis (Gopher rules)."""
    if lines is None:
        lines = _nonempty_lines(text)
    n = F.size(lines)
    bullets = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"^([-\*•●▪]|\d+[\.\)])\s"))
    )
    ell = F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"(\.\.\.|…)$")))
    return F.struct(
        F.when(n > 0, bullets.cast("double") / n).otherwise(0.0).alias("bullet_frac"),
        F.when(n > 0, ell.cast("double") / n).otherwise(0.0).alias("ellipsis_frac"),
    )


def gopher_quality_filter(
    text: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    max_dup_line_frac: float = 0.3,
    min_stopword_hits: int = 2,
    toks: Column | None = None,
    lines: Column | None = None,
) -> Column:
    """Composite Gopher rule set -> boolean keep flag.  All inputs are
    single-pass Column expressions; the filter costs one projection."""
    if toks is None:
        toks = tokens(text)
    nw = F.size(toks)
    be = bullet_ellipsis_fractions(text, lines=lines)
    sw_hits = F.size(
        F.filter(toks, lambda t: F.lower(t).isin("the", "be", "to", "of", "and", "that", "have", "with"))
    )
    return (
        (nw >= min_words)
        & (nw <= max_words)
        & (symbol_word_ratio(text, toks=toks) <= max_symbol_word_ratio)
        & (be["bullet_frac"] <= max_bullet_frac)
        & (be["ellipsis_frac"] <= max_ellipsis_frac)
        & (duplicate_line_fraction(text, lines=lines) <= max_dup_line_frac)
        & (sw_hits >= min_stopword_hits)
    )


def gopher_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """All Gopher repetition/quality signals in ONE projection with the
    token / line / n-gram arrays computed once and shared (they are
    multi-referenced projection columns, so CollapseProject keeps them
    materialized instead of re-evaluating the HOFs per feature).
    `_spread` first: a single small parquet split otherwise serializes
    the whole CPU-bound pass onto one task."""
    from .dedup import _spread

    t = F.col(text_col)
    d = _spread(df.select(F.col(id_col), t))
    d = d.withColumns(
        {"__toks": tokens(t), "__lines": _nonempty_lines(t)}
    ).withColumns(
        {
            "__g2": _gram_array(F.col("__toks"), 2),
            "__g3": _gram_array(F.col("__toks"), 3),
        }
    )
    toks, lines = F.col("__toks"), F.col("__lines")
    be = bullet_ellipsis_fractions(t, lines=lines)
    return d.select(
        id_col,
        F.size(toks).alias("n_words"),
        duplicate_line_fraction(t, lines=lines).alias("dup_line_frac"),
        top_ngram_char_fraction(t, 2, grams=F.col("__g2")).alias("top2_frac"),
        duplicate_ngram_char_fraction(t, 3, grams=F.col("__g3")).alias("dup3_frac"),
        symbol_word_ratio(t, toks=toks).alias("sym_ratio"),
        be["bullet_frac"].alias("bullet_frac"),
        be["ellipsis_frac"].alias("ellipsis_frac"),
        gopher_quality_filter(t, toks=toks, lines=lines).alias("keep"),
    )


# ---------------------------------------------------------------------- #
# winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003 — the
# MOSS local document fingerprinting scheme; rolling k-gram hashes +
# per-window minima give partial-overlap detection that whole-document
# hashes cannot)
# ---------------------------------------------------------------------- #
def winnowing_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """(id, fingerprint) rows: k-gram hashes of the whitespace-normalized
    lowercased text, winnowed to the minimum of each sliding window of
    ``window`` consecutive hashes, distinct per document.

    Guarantee (the winnowing theorem): any shared substring of length
    >= k + window - 1 between two documents yields a shared
    fingerprint, while only ~2/(window+1) of all k-gram hashes are
    kept.  Everything is one narrow Column-HOF projection per row —
    hashes are computed once per k-gram (never loop-invariant work
    inside the lambda) and the output explodes to the distinct
    fingerprint set; no shuffle until the caller aggregates."""
    from .dedup import _spread, md5_int

    t = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    base = _spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), t.alias("__norm")
    )
    n = F.length("__norm") - k + 1
    hashes = F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: md5_int(F.col("__norm").substr(i, F.lit(k))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    # materialize the hash array in its own projection: the window pass
    # references it m+1 times, and CollapseProject would otherwise
    # inline (= recompute) the full O(n) md5 array per window, turning
    # the scheme O(n^2 k)
    hashed = base.select(F.col(id_col), hashes.alias("__h"))
    h = F.col("__h")
    m = F.size(h) - window + 1
    wins = F.when(
        m >= 1,
        F.transform(
            F.sequence(F.lit(1), m),
            lambda j: F.array_min(F.slice(h, j, window)),
        ),
    ).otherwise(
        # shorter than a full window: keep the global min (standard
        # winnowing edge case so short docs still fingerprint)
        F.when(F.size(h) > 0, F.array(F.array_min(h))).otherwise(
            F.array().cast("array<bigint>")
        )
    )
    return (
        hashed.select(F.col(id_col), F.explode(F.array_distinct(wins)).alias("fingerprint"))
        .distinct()
    )


def winnowing_overlap_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
    min_shared: int = 2,
) -> DataFrame:
    """Document pairs sharing >= min_shared winnowed fingerprints
    (partial-overlap candidates).  The fingerprint posting-list
    self-join touches ~2/(window+1) of the k-gram mass, so the df² head
    that makes raw shingle joins quadratic is winnowed away before the
    join; AQE handles residual hot fingerprints."""
    fp = winnowing_fingerprints(df, text_col, id_col, k, window)
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.fingerprint") == F.col("b.fingerprint"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def hashed_linear_score(
    df: DataFrame,
    weights: DataFrame,
    n_buckets: int = 1 << 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    bias: float = 0.0,
) -> DataFrame:
    """fastText-style linear text classifier scoring: tokens hash into
    ``n_buckets`` feature buckets, the model is a (bucket, weight)
    table, and a document's score is sigmoid(bias + mean of its
    buckets' weights) — the standard shape for model-based quality
    filtering (train offline, score the corpus distributedly).

    Plan: token explode -> md5-hash bucket -> equi-join the weight
    table (broadcast when it fits, hash join keyed on bucket
    otherwise — Spark decides via AQE) -> one mean per doc + the
    sigmoid. Absent buckets contribute weight 0. Returns
    (id_col, n_tokens, score).
    """
    from .dedup import _spread, md5_int, tokens

    tok = _spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("__w"),
    )
    bucketed = tok.select(
        F.col(id_col), (md5_int(F.col("__w")) % F.lit(n_buckets)).alias("bucket")
    )
    w = weights.select(F.col("bucket"), F.col("weight"))
    joined = bucketed.join(w, "bucket", "left")
    agg = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.avg(F.coalesce("weight", F.lit(0.0))).alias("__mu"),
    )
    z = F.lit(float(bias)) + F.col("__mu")
    return agg.select(
        F.col(id_col),
        "n_tokens",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias("score"),
    )


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """zlib compression ratio per document (compressed/raw bytes) — the
    classic cheap redundancy detector (highly repetitive or templated
    text compresses far below prose; near-random noise compresses
    above it). Used as a quality gate band, e.g. keep 0.3 < ratio < 0.9.

    No JVM builtin computes zlib, so this is an Arrow-batched pandas
    UDF (one deflate per doc, C speed) — map-only, no shuffle, scales
    linearly. Returns (id_col, n_bytes, ratio); empty/null docs get
    ratio NULL. zlib is deterministic for a fixed level, so results
    are stable across runs and machines (pytest-verified against
    direct zlib; no SQL oracle — DuckDB has no deflate function).
    """
    import zlib

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    lvl = int(level)

    def _ratio_fn(texts):
        out = []
        for t in texts:
            if t is None or t == "":
                out.append(None)
                continue
            raw = t.encode("utf-8")
            out.append(len(zlib.compress(raw, lvl)) / len(raw))
        return pd.Series(out, dtype="float64")

    _ratio_fn.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    ratio_udf = pandas_udf(_ratio_fn, "double")

    from .dedup import _spread

    base = _spread(df.select(F.col(id_col), F.col(text_col)))
    return base.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("bigint").alias("n_bytes"),
        ratio_udf(F.col(text_col)).alias("ratio"),
    )


def corpus_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One-row dataset card: the corpus-level numbers a training run's
    data section reports — document/token counts, token-length exact
    percentiles (p50/p90/p99), language count, exact-duplicate
    fraction, mean heuristic quality. ONE aggregation pass over the
    corpus (every input is a per-row expression feeding codegen
    hash-agg buffers; the percentiles are Spark's exact percentile
    aggregate), so the report costs a single scan + one 1-row reduce.
    """
    from .dedup import md5_int, tokens

    n_tok = F.size(tokens(F.col(text_col)))
    return df.select(
        F.col(id_col),
        n_tok.alias("__nt"),
        md5_int(F.col(text_col)).alias("__h"),
        quality_score(F.col(text_col)).alias("__q"),
        langid(F.col(text_col)).alias("__lang"),
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__nt").cast("bigint").alias("total_tokens"),
        F.round(F.avg("__nt"), 6).alias("mean_doc_tokens"),
        F.round(F.expr("percentile(__nt, 0.5)"), 6).alias("p50_tokens"),
        F.round(F.expr("percentile(__nt, 0.9)"), 6).alias("p90_tokens"),
        F.round(F.expr("percentile(__nt, 0.99)"), 6).alias("p99_tokens"),
        F.countDistinct("__lang").alias("n_langs"),
        F.round(
            F.lit(1.0) - F.countDistinct("__h") / F.count(F.lit(1)), 9
        ).alias("exact_dup_fraction"),
        F.round(F.avg("__q"), 9).alias("mean_quality"),
    )


def c4_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """C4 cleaning signals (Raffel et al. 2020 §2.2, the rule set behind
    the C4 corpus), all codegen-side regex/HOFs — no UDF:

    * ``n_sentences`` — terminal-punctuation splits; C4 drops pages
      with fewer than 3 sentences.
    * ``frac_lines_terminal`` — fraction of lines ending in . ! ? or
      closing quote (C4 keeps only such lines).
    * ``has_lorem`` / ``has_curly`` — "lorem ipsum" and ``{`` page
      drops (code/boilerplate tells).
    * ``mean_words_per_line`` — short-line navigation chrome signal.
    * ``c4_keep`` — the composed page-level verdict (>=3 sentences, no
      lorem/curly).
    """
    text = F.col(text_col)
    lines = _nonempty_lines(text)
    # sentence count = non-empty segments between terminal marks (a
    # page with no terminal punctuation counts as one segment)
    n_sent = F.size(
        F.filter(
            F.split(text, r"[.!?]"),
            lambda s: F.length(F.trim(s)) > 0,
        )
    )
    terminal = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"""[.!?"']$"""))
    )
    n_lines = F.greatest(F.size(lines), F.lit(1))
    words_per_line = F.transform(
        lines, lambda l: F.size(F.filter(F.split(F.trim(l), r"\s+"), lambda w: w != ""))
    )
    has_lorem = F.lower(text).contains("lorem ipsum")
    has_curly = text.contains("{")
    sig = df.select(
        F.col(id_col),
        F.coalesce(n_sent, F.lit(0)).cast("int").alias("n_sentences"),
        F.round(terminal / n_lines, 6).alias("frac_lines_terminal"),
        has_lorem.alias("has_lorem"),
        has_curly.alias("has_curly"),
        F.round(
            F.aggregate(words_per_line, F.lit(0), lambda a, x: a + x)
            / n_lines,
            6,
        ).alias("mean_words_per_line"),
    )
    return sig.withColumn(
        "c4_keep",
        (F.col("n_sentences") >= 3) & ~F.col("has_lorem") & ~F.col("has_curly"),
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 50,
    lowercase: bool = True,
) -> DataFrame:
    """Corpus-level collocation mining by pointwise mutual information
    (Church & Hanks 1990): for each adjacent word pair,
    ``pmi = ln(c(w1,w2) * N / (c(w1) * c(w2)))`` with N = total bigram
    occurrences and unigram counts taken over bigram slots (w1 over
    left slots, w2 over right) so the marginals are proper bigram-table
    marginals. Returns the ``top_k`` pairs with ``count >= min_count``
    ordered by (pmi desc, w1, w2): (w1, w2, n_pair, pmi).

    Scale shape: one tokenize projection, one explode, three hash-aggs
    (pair, left-unigram, right-unigram) joined on the word — the
    unigram tables are vocabulary-sized (no broadcast hint; AQE decides)
    — and a TakeOrderedAndProject top-k. No window over the corpus, no
    driver state."""
    txt = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    toks = df.select(
        F.filter(F.split(F.trim(txt), r"\s+"), lambda w: w != "").alias("__toks")
    )
    pairs = toks.select(
        F.explode(
            F.when(
                F.size("__toks") >= 2,
                F.transform(
                    F.sequence(F.lit(2), F.size("__toks")),
                    lambda i: F.struct(
                        F.element_at(F.col("__toks"), i - 1).alias("w1"),
                        F.element_at(F.col("__toks"), i).alias("w2"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("p")
    ).select("p.w1", "p.w2")
    pc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    lc = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("__n1"))
    rc = pairs.groupBy("w2").agg(F.count(F.lit(1)).alias("__n2"))
    tot = pairs.agg(F.count(F.lit(1)).alias("__n"))
    out = (
        pc.filter(F.col("n_pair") >= min_count)
        .join(lc, "w1")
        .join(rc, "w2")
        .crossJoin(tot)
        .select(
            "w1",
            "w2",
            "n_pair",
            F.log(
                F.col("n_pair")
                * F.col("__n")
                / (F.col("__n1") * F.col("__n2")).cast("double")
            ).alias("pmi"),
        )
    )
    return out.orderBy(F.desc("pmi"), "w1", "w2").limit(top_k)


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: float = 1.0,
    lowercase: bool = True,
) -> DataFrame:
    """Per-document mean log-probability under an add-k-smoothed
    BIGRAM language model fit on the corpus itself — the in-domain
    upgrade of :func:`unigram_logprob` for perplexity-style quality
    filtering: ``mean over positions i>=2 of
    ln((c(w_{i-1}, w_i) + k) / (c(w_{i-1}) + k*V))`` with V the corpus
    unigram vocabulary size and c(w) the LEFT-slot marginal (so the
    conditional sums to 1 over the vocab). Docs with < 2 tokens score
    NULL. Returns (id, n_bigrams, logprob).

    Scale shape: tokenize projection shared via one explode, two
    hash-aggs (bigram and left-unigram counts), equi-joins back on the
    gram (vocabulary-sized sides, no broadcast hint), one per-doc
    hash-agg. No window, no driver state."""
    txt = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.filter(F.split(F.trim(txt), r"\s+"), lambda w: w != "").alias("__toks"),
    )
    pairs = toks.select(
        "__id",
        F.explode(
            F.when(
                F.size("__toks") >= 2,
                F.transform(
                    F.sequence(F.lit(2), F.size("__toks")),
                    lambda i: F.struct(
                        F.element_at(F.col("__toks"), i - 1).alias("w1"),
                        F.element_at(F.col("__toks"), i).alias("w2"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("p"),
    ).select("__id", "p.w1", "p.w2")
    bc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__nb"))
    lc = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("__nl"))
    vocab = (
        toks.select(F.explode("__toks").alias("w"))
        .agg(F.countDistinct("w").alias("__v"))
    )
    scored = (
        pairs.join(bc, ["w1", "w2"])
        .join(lc, "w1")
        .crossJoin(vocab)
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.avg(
                F.log(
                    (F.col("__nb") + add_k)
                    / (F.col("__nl") + add_k * F.col("__v"))
                )
            ).alias("logprob"),
        )
    )
    return toks.select("__id").join(scored, "__id", "left").select(
        F.col("__id").alias(id_col), "n_bigrams", "logprob"
    )


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    top_n: int = 1000,
) -> DataFrame:
    """Zipf's-law fit over the corpus token frequencies: OLS of
    ``ln(freq)`` on ``ln(rank)`` across the ``top_n`` most frequent
    tokens (rank 1 = most frequent, frequency-then-token tie-break for
    engine-exact determinism). A healthy natural-language corpus slopes
    ≈ −1; a flat slope flags boilerplate/template floods, a cliff
    flags a truncated vocabulary — one of the cheapest corpus-level
    quality reads. Returns one row (n_terms, slope, intercept, r2).

    Scale shape: one token hash-agg over the corpus (map-side
    partials), a TakeOrdered head of ``top_n`` rows to the rank
    window — the ONLY sort, over the bounded head table — then the
    JVM ``regr_*`` aggregates. No collect, no UDF."""
    if top_n < 2:
        raise ValueError("zipf_fit: top_n must be >= 2")
    tf = (
        df.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    head = tf.orderBy(F.col("freq").desc(), F.col("term").asc()).limit(top_n)
    from pyspark.sql import Window as W

    rank = F.row_number().over(
        W.orderBy(F.col("freq").desc(), F.col("term").asc())
    )
    xy = head.select(
        F.log(rank.cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    return xy.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.expr("regr_slope(y, x)").alias("slope"),
        F.expr("regr_intercept(y, x)").alias("intercept"),
        F.expr("regr_r2(y, x)").alias("r2"),
    )


def readability(text: Column) -> tuple[Column, Column, Column, Column]:
    """Flesch readability signals as pure-builtin columns: (n_words,
    n_sentences, n_syllables, flesch_reading_ease). Syllables use the
    standard vowel-group heuristic — runs of ``[aeiouy]+`` per
    lowercased word; since whitespace never lands inside a vowel run,
    counting the runs over the WHOLE text equals the per-word sum in
    one regexp pass. Sentences = runs of ``[.!?]+`` (min 1, so
    unpunctuated text counts as a single sentence). All three counts
    are engine-exact integers; the Flesch score (Flesch 1948:
    ``206.835 − 1.015·w/s − 84.6·syl/w``) is deterministic double
    arithmetic over them."""
    words = F.greatest(token_count(text), F.lit(1))
    sentences = F.greatest(
        F.size(F.regexp_extract_all(text, F.lit(r"[.!?]+"), 0)), F.lit(1)
    )
    syllables = F.size(
        F.regexp_extract_all(F.lower(text), F.lit(r"[aeiouy]+"), 0)
    )
    w = words.cast("double")
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (w / sentences.cast("double"))
        - F.lit(84.6) * (syllables.cast("double") / w)
    )
    return words, sentences, syllables, flesch


def readability_report(
    df: DataFrame,
    text_col: str = "text",
    group_col: str | None = None,
) -> DataFrame:
    """Per-group readability rollup: mean Flesch reading ease plus the
    Flesch-Kincaid grade level (``0.39·w/s + 11.8·syl/w − 15.59``)
    computed from the GROUP-TOTAL word/sentence/syllable counts (the
    corpus-level convention — integer sums, engine-exact), with doc
    and token counts. One regexp projection + one hash-agg; the
    corpus-quality read for "is this source too hard/too boilerplate
    for the training mix". The per-doc Flesch scores are quantized to
    ``decimal(15,6)`` before summing so the group mean is
    order-independent (bit-identical across engines and retries — the
    established oracle-parity trick)."""
    words, sentences, syllables, flesch = readability(F.col(text_col))
    proj = df.select(
        *([group_col] if group_col else []),
        words.alias("__w"),
        sentences.alias("__s"),
        syllables.alias("__y"),
        flesch.alias("__f"),
    )
    keys = [group_col] if group_col else []
    agg = proj.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__w").alias("n_words"),
        F.sum("__s").alias("n_sentences"),
        F.sum("__y").alias("n_syllables"),
        F.sum(F.col("__f").cast("decimal(15,6)")).alias("__sf"),
    )
    w = F.col("n_words").cast("double")
    fk = (
        F.lit(0.39) * (w / F.col("n_sentences").cast("double"))
        + F.lit(11.8) * (F.col("n_syllables").cast("double") / w)
        - F.lit(15.59)
    )
    return agg.select(
        *keys,
        "n_docs",
        "n_words",
        "n_sentences",
        "n_syllables",
        (F.col("__sf").cast("double") / F.col("n_docs")).alias(
            "mean_flesch"
        ),
        fk.alias("fk_grade"),
    )
