"""PII scrubbing and URL/domain filtering — standard pre-training
cleanup stages (the C4/RefinedWeb-style pipeline steps that run right
after dedup and quality filtering).

Everything here is JVM-side regex/column work — ``regexp_replace`` /
``regexp_extract_all`` inside whole-stage codegen, no UDFs, no
shuffle for the per-document stages; the blocklist join broadcasts.
At 100 TB these are pure map stages that scale linearly with executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# conservative, high-precision patterns (the convention is to prefer
# false negatives over mangling prose: match clearly-formatted PII)
_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE = r"(?<![0-9])(?:\+?[0-9]{1,3}[-. ])?(?:\([0-9]{3}\)[-. ]?|[0-9]{3}[-. ])[0-9]{3}[-. ][0-9]{4}(?![0-9])"
_IPV4 = r"(?<![0-9.])(?:(?:25[0-5]|2[0-4][0-9]|1?[0-9]{1,2})\.){3}(?:25[0-5]|2[0-4][0-9]|1?[0-9]{1,2})(?![0-9.])"
_SSN = r"(?<![0-9-])[0-9]{3}-[0-9]{2}-[0-9]{4}(?![0-9-])"
_URL = r"https?://[^\s<>\"']+"

_DEFAULT_TOKENS = {
    "email": "<EMAIL>",
    "phone": "<PHONE>",
    "ip": "<IP>",
    "ssn": "<SSN>",
}


def redact_pii(
    text: Column,
    kinds: tuple[str, ...] = ("email", "phone", "ip", "ssn"),
    tokens: dict | None = None,
) -> Column:
    """Replace formatted PII spans with placeholder tokens. Order
    matters: emails first so their digits never half-match phone
    patterns. One codegen regexp_replace per kind."""
    pats = {"email": _EMAIL, "phone": _PHONE, "ip": _IPV4, "ssn": _SSN}
    toks = {**_DEFAULT_TOKENS, **(tokens or {})}
    out = text
    for k in kinds:
        out = F.regexp_replace(out, pats[k], toks[k])
    return out


def pii_counts(text: Column) -> Column:
    """struct<n_email,n_phone,n_ip,n_ssn int> — audit counts without
    modifying the text (size of regexp_extract_all per kind)."""
    return F.struct(
        F.size(F.regexp_extract_all(text, F.lit(_EMAIL), F.lit(0))).alias("n_email"),
        F.size(F.regexp_extract_all(text, F.lit(_PHONE), F.lit(0))).alias("n_phone"),
        F.size(F.regexp_extract_all(text, F.lit(_IPV4), F.lit(0))).alias("n_ip"),
        F.size(F.regexp_extract_all(text, F.lit(_SSN), F.lit(0))).alias("n_ssn"),
    )


def extract_urls(text: Column) -> Column:
    """array<string> of http(s) URLs in the text."""
    return F.regexp_extract_all(text, F.lit(_URL), F.lit(0))


def url_domain(url: Column) -> Column:
    """Registrable host of a URL, lowercased, port stripped."""
    host = F.regexp_extract(url, r"https?://([^/:\s]+)", 1)
    return F.lower(host)


def filter_by_domain_blocklist(
    docs: DataFrame,
    blocklist: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    domain_col: str = "domain",
    keep_clean: bool = True,
) -> DataFrame:
    """Drop (or flag) documents whose text links to any blocklisted
    domain. A subdomain matches its blocklisted parent
    (``a.b.example.com`` is blocked by ``example.com``).

    Plan: explode the documents' URL domains, derive each domain's
    parent-suffix set JVM-side (an array of dot-suffixes, bounded by
    label count), broadcast-join the blocklist against the exploded
    suffixes, then left-anti join the hit ids back — the corpus itself
    is never shuffled."""
    doms = docs.select(
        F.col(id_col),
        F.explode_outer(extract_urls(F.col(text_col))).alias("__u"),
    ).select(F.col(id_col), url_domain(F.col("__u")).alias("__d"))
    # suffix expansion: a.b.c -> [a.b.c, b.c, c]
    labels = F.split(F.col("__d"), r"\.")
    suffixes = F.transform(
        F.sequence(F.lit(1), F.size(labels)),
        lambda i: F.concat_ws(".", F.slice(labels, i, F.size(labels) - i + 1)),
    )
    hit_ids = (
        doms.filter(F.col("__d").isNotNull() & (F.col("__d") != ""))
        .select(F.col(id_col), F.explode(suffixes).alias("__sfx"))
        .join(
            F.broadcast(
                blocklist.select(F.lower(F.col(domain_col)).alias("__sfx")).distinct()
            ),
            on="__sfx",
            how="left_semi",
        )
        .select(id_col)
        .distinct()
    )
    how = "left_anti" if keep_clean else "left_semi"
    return docs.join(hit_ids, on=id_col, how=how)


def url_normalize(url: Column) -> Column:
    """Canonical URL form for URL-level dedup (the first dedup stage of
    a crawl pipeline — cheaper than any content hash):

    * scheme + host lowercased, ``www.`` prefix dropped
    * default ports stripped (``:80`` http, ``:443`` https)
    * fragment (``#...``) dropped
    * tracking query params dropped (utm_*, gclid, fbclid, ref); the
      query separator is dropped too when nothing survives
    * single trailing ``/`` dropped

    Pure codegen string/regex expressions — map-only at any scale, and
    replayable in SQL (every step is a regexp_replace).
    """
    u = F.trim(url)
    # lowercase scheme+host only: split at the end of the authority
    head = F.lower(F.regexp_extract(u, r"^(https?://[^/?#]+)", 1))
    rest = F.regexp_replace(u, r"^https?://[^/?#]+", "")
    head = F.regexp_replace(head, r"^(https?://)www\.", r"$1")
    head = F.regexp_replace(head, r"^(http://[^/:]+):80$", r"$1")
    head = F.regexp_replace(head, r"^(https://[^/:]+):443$", r"$1")
    full = F.concat(head, rest)
    full = F.regexp_replace(full, r"#.*$", "")
    # drop tracking params (leading or mid-query), then dangling ?/&
    full = F.regexp_replace(full, r"([?&])(utm_[^=&#]*|gclid|fbclid|ref)=[^&#]*", r"$1")
    full = F.regexp_replace(full, r"\?&+", "?")
    full = F.regexp_replace(full, r"&&+", "&")
    full = F.regexp_replace(full, r"[?&]+$", "")
    full = F.regexp_replace(full, r"(.)/$", r"$1")
    return full


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the smallest id per canonical URL. One hash-groupBy on the
    normalized URL — the cheapest dedup pass, run before any content
    hashing. Returns (canonical_url, keep_id, n_copies)."""
    cu = url_normalize(F.col(url_col))
    return (
        df.select(F.col(id_col), cu.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def text_normalize(text: Column, lowercase: bool = False) -> Column:
    """Standard pre-dedup text normalization (the cleanup every corpus
    pipeline runs before hashing so near-identical bytes dedup as
    identical): strip zero-width/control characters, fold typographic
    quotes/dashes/ellipsis to ASCII, collapse runs of whitespace to one
    space, trim. Pure codegen regex chain — map-only at any scale, and
    every rule is a plain regexp_replace replayable in the SQL oracle.
    """
    t = text
    # zero-width chars + BOM + soft hyphen
    t = F.regexp_replace(t, "[\u200b\u200c\u200d\u2060\ufeff\u00ad]", "")
    # C0/C1 control chars except tab/newline/CR (whitespace-folded next)
    t = F.regexp_replace(
        t, "[\u0000-\u0008\u000b\u000c\u000e-\u001f\u007f-\u009f]", ""
    )
    # typographic quotes/dashes/ellipsis -> ASCII
    t = F.regexp_replace(t, "[\u2018\u2019\u201a\u201b]", "'")
    t = F.regexp_replace(t, "[\u201c\u201d\u201e\u201f]", "\"")
    t = F.regexp_replace(t, "[\u2010-\u2015\u2212]", "-")
    t = F.regexp_replace(t, "\u2026", "...")
    # non-breaking / unicode spaces -> plain space, collapse, trim
    t = F.regexp_replace(t, "[\u00a0\u1680\u2000-\u200a\u202f\u205f\u3000]", " ")
    t = F.trim(F.regexp_replace(t, "\\s+", " "))
    if lowercase:
        t = F.lower(t)
    return t
