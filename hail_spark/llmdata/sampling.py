"""Deterministic sampling / ordering for training-data pipelines.

Every primitive derives its randomness from md5 of a caller-chosen uid
column, so results are stable across retries, repartitioning, and
engines (any SQL dialect can replay them) — the property Hail's
threefry-seeded rand family provides (ref Random.scala), delivered here
with a portable hash. The sampling/split/mix ops are single-pass Column
expressions (no shuffle); shuffle/pack/shard each cost exactly one
range-partitioned sort plus the two-pass scan primitive.

Ops: uniform / bernoulli_sample / stratified_sample / weighted_mix
(epochs with replacement) / split_assign (train-val-test) /
deterministic_shuffle / pack_sequences / chunk_documents (sliding token
windows) / assign_shards / write_training_shards (+ manifest).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import md5_int

_DENOM = 1 << 30


def uniform(uid: Column, seed: int = 0) -> Column:
    """Deterministic uniform in [0, 1) from md5(uid ':' seed)."""
    h = md5_int(F.concat(uid.cast("string"), F.lit(f":{seed}")))
    return F.pmod(h, F.lit(_DENOM)) / float(_DENOM)


def bernoulli_sample(
    df: DataFrame, p: float, uid_col: str, seed: int = 0
) -> DataFrame:
    """Keep each row independently with probability ``p`` (exact subset
    determined by the uid, not the partitioning)."""
    return df.filter(uniform(F.col(uid_col), seed) < p)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict,
    uid_col: str,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum Bernoulli rates — the domain-mixing step of a
    training-data pipeline (downsample boilerplate sources, keep rare
    ones). ``rates``: stratum value → keep probability; strata absent
    from the map are dropped. The rate map is a plan literal
    (broadcast-free, no join)."""
    rate = F.coalesce(
        F.create_map(
            *[x for kv in sorted(rates.items()) for x in (F.lit(kv[0]), F.lit(float(kv[1])))]
        )[F.col(strata_col)],
        F.lit(0.0),
    )
    return df.filter(uniform(F.col(uid_col), seed) < rate)


def pack_sequences(
    df: DataFrame,
    count_col: str,
    budget: int,
    uid_col: str,
    seed: int = 0,
) -> DataFrame:
    """Concat-and-chunk sequence packing: lay documents end-to-end in
    deterministic-shuffle order and cut the token stream every
    ``budget`` tokens — the standard packing step that turns a document
    corpus into fixed-length training sequences.

    Returns (uid, pack_start, bin): each doc's exclusive token offset in
    the global stream and the bin index of its first token. Distributed
    shape: one sort (the shuffle) + the two-pass exclusive scan from
    operators.scans — per-partition partials, driver prefix-combine over
    partition ids, broadcast back; no second global shuffle.
    """
    from ..table import Table
    from ..operators import scans

    u = uniform(F.col(uid_col), seed).alias("__u")
    t = Table(df.select(F.col(uid_col), F.col(count_col), u), ("__u", uid_col))
    s = scans.scan_sum(t, F.col(count_col).cast("bigint"), "pack_start")
    return s.df.select(
        F.col(uid_col),
        F.col("pack_start"),
        F.floor(F.col("pack_start") / budget).cast("bigint").alias("bin"),
    )


def deterministic_shuffle(df: DataFrame, uid_col: str, seed: int = 0) -> DataFrame:
    """Reproducible global shuffle: order by the uid's derived uniform
    (uid itself breaks md5 ties). One range-partitioned sort — the
    standard 'shuffle once, stream in order' layout step before
    sharded training-data export."""
    u = uniform(F.col(uid_col), seed)
    return df.orderBy(u, F.col(uid_col))


def assign_shards(
    df: DataFrame,
    docs_per_shard: int,
    uid_col: str,
    seed: int = 0,
) -> DataFrame:
    """Deterministic shard assignment for training export: lay rows in
    deterministic-shuffle order and cut every ``docs_per_shard`` rows.
    Returns the input plus (shard bigint, shard_pos bigint). One
    range-partitioned sort + the two-pass scan (add_index) — no second
    global shuffle; the shard id is a pure function of (uid, seed), so
    re-runs and retries produce identical shards on any engine."""
    from ..operators import scans
    from ..table import Table

    u = uniform(F.col(uid_col), seed).alias("__u")
    t = Table(df.select("*", u), ("__u", uid_col))
    idx = scans.add_index(t, "__pos")
    return idx.df.select(
        *[c for c in df.columns],
        F.floor(F.col("__pos") / docs_per_shard).cast("bigint").alias("shard"),
        (F.col("__pos") % docs_per_shard).cast("bigint").alias("shard_pos"),
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    docs_per_shard: int,
    uid_col: str,
    count_col: str | None = None,
    seed: int = 0,
) -> DataFrame:
    """Export a corpus as size-bounded training shards + a manifest.

    Writes ``path/data/`` parquet partitioned by ``shard`` (each shard
    is its own directory a data loader can stream independently) and
    ``path/manifest.parquet`` with per-shard (shard, n_docs[, n_tokens])
    — the index a trainer reads to plan epochs. Returns the manifest.

    Scale shape: shard assignment is the one sort + two-pass scan of
    assign_shards; the partitioned write is parallel per shard file;
    the manifest is one hash-aggregate over the files just written — a
    column-pruned read of (shard[, count_col]) only, so the sort+index
    lineage runs ONCE and no text bytes move a second time. ``shard``
    comes back as the partition-directory value and is cast to bigint
    so the manifest schema matches the assignment's. No driver-side
    row handling.
    """
    import os

    assigned = assign_shards(df, docs_per_shard, uid_col, seed)
    data_path = os.path.join(path, "data")
    assigned.write.mode("overwrite").partitionBy("shard").parquet(data_path)
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if count_col is not None:
        aggs.append(F.sum(count_col).cast("bigint").alias("n_tokens"))
    try:
        src = (
            df.sparkSession.read.parquet(data_path)
            .select(F.col("shard").cast("bigint").alias("shard"),
                    *([count_col] if count_col is not None else []))
        )
    except Exception:  # empty input writes no files → schema inference fails
        src = assigned
    manifest = src.groupBy("shard").agg(*aggs).orderBy("shard")
    manifest_path = os.path.join(path, "manifest.parquet")
    manifest.write.mode("overwrite").parquet(manifest_path)
    # return the WRITTEN manifest, not the aggregate's lineage: a caller
    # that materializes the result again (noop sink, collect, a second
    # join) would otherwise re-read every shard file and re-run the agg
    # — the same recompute class as the r10 manifest fix itself (guide
    # §6: never re-derive what the query just wrote). One tiny-file scan
    # instead, column order preserved by select.
    return (
        df.sparkSession.read.parquet(manifest_path)
        .select(*[c.name for c in manifest.schema])
        .orderBy("shard")
    )


def weighted_mix(
    df: DataFrame,
    weights: dict,
    strata_col: str,
    uid_col: str,
    seed: int = 0,
) -> DataFrame:
    """Epoch-style mixture resampling WITH replacement: every row of
    stratum ``s`` is emitted ``floor(w_s)`` times plus one more with
    probability ``frac(w_s)`` (deterministic md5 uniform on the uid).
    This is the standard corpus-mixing step when domain weights exceed
    1 (books x2.5, web x0.3, ...) — e.g. the Pile / LLaMA-style
    per-source epoch counts; strata absent from the map are dropped.

    Output = input columns + ``copy_idx`` (0-based replica index), so
    downstream shuffling (deterministic_shuffle keyed on
    (uid, copy_idx)) spreads the replicas instead of co-locating them.

    Scale shape: a plan-literal weight map, one per-row uniform, one
    explode of a 0..n_i-1 sequence — map-only, no shuffle, no driver
    state; expected blowup is exactly sum_s w_s * |s|.
    """
    w = F.coalesce(
        F.create_map(
            *[
                x
                for kv in sorted(weights.items())
                for x in (F.lit(kv[0]), F.lit(float(kv[1])))
            ]
        )[F.col(strata_col)],
        F.lit(0.0),
    )
    base = F.floor(w).cast("int")
    extra = (uniform(F.col(uid_col), seed) < (w - F.floor(w))).cast("int")
    n = (base + extra).alias("__n")
    return (
        df.withColumn("__n", n)
        .filter(F.col("__n") > 0)
        .withColumn("copy_idx", F.explode(F.sequence(F.lit(0), F.col("__n") - 1)))
        .drop("__n")
    )


def temperature_weights(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.3,
) -> dict:
    """Unigram-LM temperature-sampling weights (the mT5/XLM-R mixing
    rule): sampling probability q_s ∝ p_s^alpha where p_s is stratum
    s's share of rows; returned as the per-row replication weight
    ``w_s = q_s / p_s`` normalized so the expected output size equals
    the input size. alpha < 1 up-weights small sources (alpha=0 →
    uniform over sources, alpha=1 → no change). Feed the dict straight
    into `weighted_mix` — the two compose into one map-only plan.

    Driver-side ONLY per-stratum counts (bounded by source cardinality,
    a dimension, never rows) — the same boundedness contract as the
    weight map weighted_mix broadcasts as a plan literal."""
    counts = {
        r[strata_col]: r["n"]
        for r in df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    total = sum(counts.values())
    if not total:
        return {}
    q = {s: (c / total) ** alpha for s, c in counts.items()}
    z = sum(q.values())
    # E[out] = Σ_s w_s · c_s = total  ⇔  w_s = (q_s/z) · total / c_s
    return {s: (q[s] / z) * total / counts[s] for s in counts}


def chunk_documents(
    df: DataFrame,
    window: int = 128,
    stride: int = 96,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window chunking: cut each document into token windows of
    ``window`` words advancing by ``stride`` (overlap = window - stride)
    — the split-long-documents step that runs before pack_sequences in
    a training pipeline. A document of n tokens yields
    1 + ceil((n - window) / stride) chunks (1 if n <= window); the last
    chunk may be short. Documents with zero tokens yield no rows.

    Output: (id_col, chunk_idx, n_tokens, chunk_text). Map-only — one
    tokenize, one sequence/explode; no shuffle, no state.
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    if stride > window:
        # stride > window would skip tokens AND the chunk-count formula
        # would emit an empty trailing chunk (hypothesis-found edge)
        raise ValueError("stride must be <= window (overlap chunking)")
    from .dedup import _spread, tokens

    base = _spread(df.select(F.col(id_col), F.col(text_col)))
    # token array in its own projection (CollapseProject: referenced
    # from the count and every chunk slice)
    tok = base.select(F.col(id_col), tokens(F.col(text_col)).alias("__ws"))
    n = F.size("__ws")
    n_chunks = F.when(n <= 0, F.lit(0)).when(n <= window, F.lit(1)).otherwise(
        F.ceil((n - F.lit(window)) / F.lit(stride)).cast("int") + 1
    )
    chunked = tok.select(
        F.col(id_col),
        F.col("__ws"),
        # sequence(1, 0) DESCENDS in Spark — empty docs need an
        # explicit empty array so posexplode yields no rows
        F.posexplode(
            F.when(n_chunks >= 1, F.sequence(F.lit(1), n_chunks)).otherwise(
                F.array().cast("array<int>")
            )
        ).alias("chunk_idx", "__unused"),
    ).select(
        F.col(id_col),
        "chunk_idx",
        F.slice(F.col("__ws"), F.col("chunk_idx") * stride + 1, window).alias("__c"),
    )
    return chunked.select(
        F.col(id_col),
        "chunk_idx",
        F.size("__c").alias("n_tokens"),
        F.array_join("__c", " ").alias("chunk_text"),
    )


def stratified_split(
    df: DataFrame,
    strata_col: str,
    uid_col: str,
    val_frac: float = 0.1,
    seed: int = 0,
    val_name: str = "val",
    train_name: str = "train",
) -> DataFrame:
    """Stratified train/val split with a PER-STRATUM exact-count
    guarantee: every stratum contributes exactly
    ``floor(n_stratum * val_frac)`` rows to the val split — the
    contract row-wise Bernoulli splits (:func:`split_assign`) cannot
    make, where a small stratum can land entirely in train (or val)
    by chance and skew per-domain eval. Selection within a stratum is
    by md5-uniform order, a pure function of (uid, seed): stable
    across retries, partitioning, and engines, and the val set is
    NESTED under larger ``val_frac`` values (the md5 order prefix
    property), so growing the eval set never discards prior rows.
    Adds a ``split`` column; returns all input rows.

    Scale shape: one per-stratum count hash-agg joined back (one row
    per stratum — AQE broadcasts it) + one row_number window per
    stratum ordered by (md5 u, uid): a single shuffle on the stratum
    key. Strata must each fit a task's sort (the stratified_fixed_k
    caveat); pre-split giant strata or use split_assign when exact
    counts don't matter."""
    if not (0.0 <= val_frac <= 1.0):
        raise ValueError("stratified_split: val_frac must be in [0, 1]")
    from pyspark.sql import Window as W

    u = uniform(F.col(uid_col), seed)
    w = W.partitionBy(strata_col).orderBy(u.asc(), F.col(uid_col).asc())
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__ns"))
    quota = F.floor(F.col("__ns") * F.lit(float(val_frac)))
    return (
        df.join(counts, strata_col)
        .withColumn("__rk", F.row_number().over(w))
        .withColumn(
            "split",
            F.when(F.col("__rk") <= quota, F.lit(val_name)).otherwise(
                F.lit(train_name)
            ),
        )
        .drop("__rk", "__ns")
    )


def split_assign(
    df: DataFrame,
    fractions: dict,
    uid_col: str,
    seed: int = 0,
) -> DataFrame:
    """Deterministic train/val/test split: each row's md5-uniform maps
    into cumulative fraction bands, so membership depends ONLY on the
    uid (stable across reruns, repartitioning, engines — no leakage
    when upstream filters change row order). ``fractions``: name ->
    fraction, processed in sorted-name order; must sum to <= 1, rows
    beyond the total are dropped (useful for subsampled splits).

    Adds a ``split`` column; map-only, no shuffle.
    """
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    u = uniform(F.col(uid_col), seed)
    expr = None
    acc = 0.0
    for name in sorted(fractions):
        acc += float(fractions[name])
        cond = u < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    out = df.withColumn("split", expr)
    return out.filter(F.col("split").isNotNull())


def select_to_token_budget(
    df: DataFrame,
    budget_tokens: int,
    quality_col: str,
    count_col: str,
    uid_col: str,
) -> DataFrame:
    """Budgeted subset selection: keep the highest-quality documents
    whose cumulative token count fits ``budget_tokens`` — the 'we can
    afford N tokens this run, take the best corpus slice' step between
    scoring and export. Greedy by quality (ties to smaller uid for
    determinism), a document is kept iff the budget still has room for
    its FIRST token (so exactly one document may straddle the cut, the
    usual pack-then-truncate convention).

    Distributed shape: one range-partitioned sort on (-quality, uid) +
    the two-pass exclusive scan (per-partition partials, driver
    prefix-combine over partition ids) — no O(rows) driver traffic, no
    second shuffle. Returns the input columns + (tokens_before, keep).
    """
    from ..operators import scans
    from ..table import Table

    neg_q = (-F.col(quality_col)).alias("__negq")
    t = Table(df.withColumn("__negq", neg_q), ("__negq", uid_col))
    s = scans.scan_sum(t, F.col(count_col).cast("bigint"), "tokens_before")
    return s.df.drop("__negq").withColumn(
        "keep", F.col("tokens_before") < F.lit(int(budget_tokens))
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    uid_col: str,
    seed: int = 0,
) -> DataFrame:
    """Cap each group's contribution at ``n`` rows (e.g. at most N
    documents per domain — the standard guard against one crawl host
    dominating the mixture). Deterministic: rows are ranked inside the
    group by their md5 uniform (ties to uid), so the kept subset is a
    reproducible random sample, stable under retries/repartitioning.

    One window over (group), shuffle keyed by group — the same shape
    as any per-group top-k; AQE splits skewed hosts. Adds
    ``group_rank``; rows with group_rank <= n survive the returned
    filter."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        uniform(F.col(uid_col), seed), F.col(uid_col)
    )
    return df.withColumn("group_rank", F.row_number().over(w)).filter(
        F.col("group_rank") <= n
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    uid_col: str,
    seed: int = 0,
) -> DataFrame:
    """Weighted random sample WITHOUT replacement of exactly ``k`` rows
    (Efraimidis-Spirakis 2006 A-ES): each row draws a deterministic
    md5-uniform u and keys on ln(u)/w (a monotone transform of the
    paper's u^(1/w)); the global top-k by key is a weighted sample
    without replacement. Fully deterministic given (uid, seed), so the
    SQL oracle replays it arithmetically.

    Distributed shape: orderBy+limit compiles to TakeOrderedAndProject
    — per-partition top-k heaps merged on the driver, NO global sort,
    no shuffle of the corpus. Rows with weight <= 0 are excluded (the
    A-ES domain)."""
    if k < 1:
        raise ValueError("weighted_sample: k must be >= 1")
    u = uniform(F.col(uid_col), seed)
    # ln(u)/w preserves the u^(1/w) ordering (ln u < 0, w > 0); the
    # epsilon guards ln(0) from the (probability-0 under md5) u == 0
    key = F.log(u + F.lit(1e-12)) / F.col(weight_col)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__wkey", key)
        .orderBy(F.desc("__wkey"), F.col(uid_col))
        .limit(k)
        .drop("__wkey")
    )


def hashed_gram_buckets(
    text: Column, n_buckets: int = 4096, include_bigrams: bool = True
) -> Column:
    """Hashed bag-of-n-grams featurization: lowercase whitespace
    tokens (unigrams + adjacent bigrams) hashed into ``n_buckets``
    md5-derived buckets — the feature map of DSIR (Xie et al. 2023,
    arXiv:2302.03169). Returns ``array<bigint>`` of bucket ids, one
    per gram occurrence (multiplicity preserved). Portable: any SQL
    engine with md5 replays the buckets exactly.

    NOTE (scale): the md5 here runs inside an F.transform lambda —
    Spark's INTERPRETED expression path, ~70x slower than codegen at
    corpus scale. This Column form is fine for small/medium tables;
    corpus-scale callers should explode the gram STRINGS first and
    hash in a plain projection, as :func:`dsir_select` does
    internally (140 s -> 9 s cold at ~sf1).
    """
    toks = F.filter(F.split(F.lower(text), r"\s+"), lambda x: x != "")
    if include_bigrams:
        # sequence(2, size) is empty-guarded: sequence(2, n<2) DESCENDS,
        # so gate on size >= 2 (the round-4 phantom-row gotcha)
        bigrams = F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(2), F.size(toks)),
                lambda i: F.concat_ws(
                    " ", F.element_at(toks, i - 1), F.element_at(toks, i)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        grams = F.concat(toks, bigrams)
    else:
        grams = toks
    return F.transform(grams, lambda g: F.pmod(md5_int(g), F.lit(n_buckets)))


def dsir_select(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target_col: str,
    k: int,
    n_buckets: int = 4096,
    seed: int = 0,
    smoothing: float = 1.0,
    eager: bool = True,
) -> DataFrame:
    """DSIR — Data Selection with Importance Resampling (Xie et al.
    2023, arXiv:2302.03169): pick ``k`` rows from the raw pool
    (``target_col`` false) that look most like the target distribution
    (``target_col`` true) under hashed-n-gram bag-of-words models.

    1. Featurize every doc into hashed gram buckets
       (:func:`hashed_gram_buckets`).
    2. Fit add-``smoothing`` bucket models for target and raw:
       ``p[b] = (count[b] + a) / (total + a*B)``.
    3. Per raw doc, importance log-weight
       ``log w = sum_grams (ln p_target[b] - ln p_raw[b])``.
    4. Gumbel-top-k resampling: key = log w + Gumbel noise derived
       from md5(uid:seed) — a without-replacement sample proportional
       to the importance weights (deterministic, SQL-replayable).

    Returns (id, logw, __key) rows of the ``k`` selected docs.

    Scale shape: one explode + hash-agg builds the bucket table
    (EXACTLY ``n_buckets`` rows — bounded by construction, so the
    score join's small side always fits a broadcast, which AQE applies
    unhinted); scoring is one hash-agg by doc id; selection is
    orderBy+limit = TakeOrderedAndProject (per-partition heaps, no
    global sort). No driver-side state, no collect.

    Resource contract: the exploded gram table is ``persist()``-shared
    between the bucket-model agg and the scoring join (one tokenize+
    hash pass instead of two). ``eager=True`` (default) materializes
    the k-row selection via ``localCheckpoint`` and unpersists the
    gram cache before returning, so no executor storage outlives the
    call. ``eager=False`` returns an explicit ``(selection, cache)``
    PAIR — the lazy plan plus the pinned gram-cache DataFrame (Spark's
    CacheManager does not GC caches); the caller must run
    ``cache.unpersist()`` once the selection (and any plans derived
    from it) have been materialized.
    """
    if k < 1:
        raise ValueError("dsir_select: k must be >= 1")
    a = float(smoothing)
    from .dedup import _spread, tokens

    # spread the RAW columns first (single-file sources arrive as one
    # partition; the heavy projection must come after the repartition
    # or it runs single-threaded — the minhash lesson), and hash AFTER
    # the explode as a plain projection: md5 inside an F.transform
    # lambda runs on the interpreted expression path, measured ~70x
    # slower at ~sf1 (140 s first iteration vs 2 s)
    base = _spread(
        df.select(
            F.col(id_col).alias("__id"),
            F.col(target_col).cast("boolean").alias("__tgt"),
            F.col(text_col).alias("__text"),
        )
    )
    toks = base.select(
        "__id", "__tgt", tokens(F.lower(F.col("__text"))).alias("__toks")
    )
    bigrams = F.when(
        F.size("__toks") >= 2,
        F.transform(
            F.sequence(F.lit(2), F.size("__toks")),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("__toks"), i - 1),
                F.element_at(F.col("__toks"), i),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # the exploded gram table feeds BOTH the bucket-model agg and the
    # scoring join — lazy persist() shares the tokenize+hash pass
    # instead of recomputing it (persist beats localCheckpoint: no
    # eager extra job)
    g = (
        toks.select(
            "__id",
            "__tgt",
            F.explode(F.concat(F.col("__toks"), bigrams)).alias("__gram"),
        )
        .select(
            "__id",
            "__tgt",
            F.pmod(md5_int(F.col("__gram")), F.lit(n_buckets)).alias("bucket"),
        )
        .persist()
    )
    bc = g.groupBy("bucket").agg(
        F.sum(F.when(F.col("__tgt"), 1).otherwise(0)).alias("__ct"),
        F.sum(F.when(F.col("__tgt"), 0).otherwise(1)).alias("__cr"),
    )
    tot = bc.agg(
        F.sum("__ct").alias("__tt"), F.sum("__cr").alias("__tr")
    )
    lr = bc.crossJoin(tot).select(
        "bucket",
        (
            F.log((F.col("__ct") + a) / (F.col("__tt") + a * n_buckets))
            - F.log((F.col("__cr") + a) / (F.col("__tr") + a * n_buckets))
        ).alias("__lr"),
    )
    scored = (
        g.filter(~F.col("__tgt"))
        .join(lr, "bucket")
        .groupBy("__id")
        .agg(F.sum("__lr").alias("logw"))
    )
    # Gumbel noise from the md5 uniform, offset to (0, 1) so both ln
    # calls stay in-domain under ANSI (u = 0 or 1 would hit ln(0))
    denom = float(_DENOM)
    u = (
        F.pmod(
            md5_int(F.concat(F.col("__id").cast("string"), F.lit(f":{seed}"))),
            F.lit(_DENOM),
        )
        + 0.5
    ) / denom
    key = F.col("logw") - F.log(-F.log(u))
    sel = (
        scored.withColumn("__key", key)
        .orderBy(F.desc("__key"), F.col("__id"))
        .limit(k)
        .select(F.col("__id").alias(id_col), "logw", "__key")
    )
    if eager:
        # materialize the k-row selection executor-side, then free the
        # gram cache: persist()ed DataFrames are NOT GC-cleaned (the
        # CacheManager pins them by plan), so without this unpersist
        # repeated dsir_select calls would accumulate executor storage
        # for the life of the session. localCheckpoint blocks ARE
        # ContextCleaner-managed, so nothing outlives the result.
        out = sel.localCheckpoint(eager=True)
        g.unpersist()
        return out
    # lazy mode: the caller controls execution, so the caller must
    # also free the shared gram cache once the selection (and any
    # derived plans) have been materialized. The handle is returned
    # EXPLICITLY as (selection, cache) — an attribute monkey-patched
    # onto the DataFrame would silently vanish on the first
    # select/filter (every transformation returns a NEW DataFrame),
    # leaking the executor cache for the session.
    return sel, g


def stratified_fixed_k(
    df: DataFrame,
    strata_col: str,
    k: int,
    uid_col: str,
    seed: int = 0,
) -> DataFrame:
    """EXACTLY ``k`` rows per stratum (or the whole stratum when it is
    smaller), chosen by md5 order — the deterministic counterpart of
    :func:`stratified_sample` when per-stratum counts must be exact
    (balanced eval sets, per-language quotas). Selection is a pure
    function of (uid, seed): stable across partitioning and engines.

    Scale shape: one row_number window per stratum ordered by
    (md5-uniform, uid) — a single shuffle on the stratum key; the
    within-stratum sort is per-partition. For strata large enough that
    a full sort hurts, pre-filter with a Bernoulli pass at a few times
    the target rate first (same md5 stream, so the top-k subset is
    preserved with overwhelming probability)."""
    if k < 1:
        raise ValueError("stratified_fixed_k: k must be >= 1")
    from pyspark.sql import Window as W

    u = uniform(F.col(uid_col), seed)
    w = W.partitionBy(strata_col).orderBy(u.asc(), F.col(uid_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )
