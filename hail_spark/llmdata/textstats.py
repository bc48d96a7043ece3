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
    counts = toks.groupBy("__w").agg(F.count(F.lit(1)).alias("__c"))
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
