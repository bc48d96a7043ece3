"""Graph algorithms over edge-list DataFrames.

Connected components (large-star/small-star) already powers
llmdata.dedup.dedup_clusters; this module adds PageRank — the other
iterative-DataFrame workhorse (domain authority for crawl
prioritization, citation weighting for document quality).

Scale shape: the per-iteration plan is (ranks ⋈ edges on src) →
hash-agg on dst — two shuffles per iteration, both on graph keys, no
driver-side state. Lineage is cut with ``localCheckpoint`` every
``checkpoint_every`` iterations (an iterative loop otherwise re-plans
the whole history each action — the dedup_clusters lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _lc_release(df: DataFrame | None) -> None:
    """Eagerly free the storage blocks behind a ``localCheckpoint``-ed
    DataFrame. ContextCleaner frees them only after a DRIVER GC notices
    the RDD is unreachable — in a long-lived session running iterative
    ops repeatedly, superseded checkpoint blocks of big rank/edge
    tables accumulate for minutes (measured 2.0x same-session slowdown
    on back-to-back sf10 pagerank runs). Best-effort: a non-LogicalRDD
    plan (nothing to free) or a py4j hiccup is a no-op and
    ContextCleaner remains the backstop. Only call this on checkpoints
    this module OWNS and has fully superseded — any plan still deriving
    from the released blocks would recompute from a hole."""
    if df is None:
        return
    try:
        node = df._jdf.queryExecution().analyzed()
        if node.getClass().getSimpleName() == "LogicalRDD":
            node.rdd().unpersist(False)
    except Exception:
        pass


def _pin_n(spark) -> int:
    """Partition count used by :func:`_lc_pinned` checkpoints: the
    session's shuffle-partition setting (scale-adaptive via conf), so a
    pinned table's HashPartitioning matches what any AQE-off exchange in
    the same query produces and joins between pinned tables line up."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return spark.sparkContext.defaultParallelism


def _lc_pinned(df: DataFrame) -> DataFrame:
    """``localCheckpoint`` that PRESERVES the plan's output partitioning
    in the checkpoint's LogicalRDD, so downstream joins/aggs keyed the
    same way (or on a superset of the keys) reuse the layout instead of
    re-exchanging (guide §2.4: operations keyed the same way share one
    exchange).

    Measured on Spark 4.1: with AQE enabled the checkpoint records
    ``UnknownPartitioning`` (AdaptiveSparkPlan reports no partitioning
    before its final plan exists), silently forfeiting the reuse — so
    AQE is disabled FOR THE MATERIALIZING QUERY ONLY and restored before
    returning; consumers of the checkpoint still plan adaptively. The
    iterative ops below end their round plans in an exchange/agg on the
    round key, so the capture costs nothing extra; use
    ``.repartition(_pin_n(spark), key)`` upstream when the plan would
    not otherwise end in the wanted partitioning."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return df.localCheckpoint()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def _lc_supersede(old: DataFrame | None, new: DataFrame) -> DataFrame:
    """Release a superseded checkpoint ONLY against its already-
    materialized successor. localCheckpoint truncates lineage, so a
    released checkpoint is permanently unrecomputable — any future
    refactor that passes a LAZY plan over the old blocks here would
    fail far away with "checkpoint block not found". This helper makes
    that misuse loud at the call site instead: it verifies ``new`` is
    itself a materialized checkpoint (LogicalRDD plan — the shape
    ``df.localCheckpoint()`` returns, eager by default) BEFORE freeing
    ``old``, and returns ``new`` so loop-carried supersession reads as
    one atomic step: ``prev = _lc_supersede(prev, nxt)``."""
    try:
        is_rdd = (
            new._jdf.queryExecution().analyzed().getClass().getSimpleName()
            == "LogicalRDD"
        )
    except Exception:
        is_rdd = False
    if not is_rdd:
        raise AssertionError(
            "_lc_supersede: successor is not a materialized checkpoint "
            "(LogicalRDD); releasing its predecessor would leave a plan "
            "over unrecomputable blocks — localCheckpoint() the successor "
            "first"
        )
    _lc_release(old)
    return new


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 5,
    redistribute_dangling: bool = False,
    tol: float | None = None,
) -> DataFrame:
    """PageRank by power iteration over a (src, dst) edge list
    (deduplicated internally). Returns (node, rank).

    Default update ``r'(v) = (1-d)/N + d * Σ_{u→v} r(u)/outdeg(u)`` —
    dangling-node mass is NOT redistributed (ranks then sum to < 1
    when sinks exist; same convention as the classic Spark/GraphX
    example), and the fixed-iteration run is deterministic arithmetic,
    so it is SQL-replayable (the oracle default).

    ``redistribute_dangling=True`` adds the textbook correction: each
    iteration, the rank mass sitting on out-degree-0 nodes is spread
    uniformly (``+ d * dangling_mass / N`` to every node), so ranks
    sum to 1. Cost: ONE extra scalar agg (semi-join of ranks against
    the precomputed dangling-node table + sum) and therefore one extra
    driver action per iteration.

    ``tol=x`` adds a convergence early-stop: iterate until the L1
    delta ``Σ |r' - r| < x`` (or ``n_iter``, whichever first). Cost:
    one rank-table join + scalar agg per iteration. Both options are
    off by default to keep the zero-action-per-iteration replayable
    plan.
    """
    if n_iter < 1:
        raise ValueError("pagerank: n_iter must be >= 1")
    # localCheckpoint the static tables: every iteration's plan would
    # otherwise re-run the edge dedup shuffle (and the node union) —
    # measured ~n_iter× the edge-pipeline cost at 3 iterations
    # static tables PINNED on their join keys (guide §2.4): e on src so
    # the degree agg and the ed join reuse one exchange; nodes on node so
    # each round's rank-merge left join is exchange-free; ed captures the
    # join's (src, n) partitioning for the per-round contribution join
    e = _lc_pinned(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .repartition(_pin_n(edges.sparkSession), "src")
        .distinct()
    )
    nodes = _lc_pinned(
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    ed = _lc_pinned(e.join(deg, "src"))
    dangling = None
    if redistribute_dangling:
        dangling = nodes.join(
            deg, nodes["node"] == deg["src"], "left_anti"
        ).localCheckpoint()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    # Per-iteration DRIVER ACTIONS (the dangling-mass sum, the tol
    # delta) re-execute the ranks lineage — without a checkpoint each
    # iteration that recompute is quadratic inside the checkpoint
    # window, so any action-per-iteration mode checkpoints every round.
    per_iter_ckpt = redistribute_dangling or tol is not None
    prev_ckpt = None  # the superseded rank checkpoint we own
    for i in range(n_iter):
        extra = 0.0
        if redistribute_dangling:
            dm = (
                ranks.join(dangling, "node", "left_semi")
                .agg(F.sum("rank"))
                .head()[0]
            )
            extra = damping * (dm or 0.0) / n
        contrib = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select("dst", (F.col("rank") / F.col("__deg")).alias("__c"))
            .groupBy("dst")
            .agg(F.sum("__c").alias("__in"))
        )
        new_ranks = nodes.join(
            contrib, nodes["node"] == contrib["dst"], "left"
        ).select(
            "node",
            (
                F.lit(base + extra)
                + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0))
            ).alias("rank"),
        )
        # the final iteration always checkpoints: the function is
        # already eager (nodes.count() above), and a materialized
        # result lets every intermediate AND static block be released
        # before returning — exactly one rank-table block set survives
        # per call instead of n_iter/checkpoint_every + 4
        last = i + 1 == n_iter
        if tol is not None:
            new_ranks = _lc_pinned(new_ranks)
            delta = (
                new_ranks.withColumnRenamed("rank", "__new")
                .join(ranks.withColumnRenamed("rank", "__old"), "node")
                .agg(F.sum(F.abs(F.col("__new") - F.col("__old"))))
                .head()[0]
            )
            # after the delta join consumed the predecessor
            prev_ckpt = _lc_supersede(prev_ckpt, new_ranks)
            ranks = new_ranks
            if delta is not None and delta < tol:
                break
        else:
            if per_iter_ckpt or (i + 1) % checkpoint_every == 0 or last:
                # pinned: the rank-merge left join ends partitioned on
                # node, which the next round's joins reuse
                new_ranks = _lc_pinned(new_ranks)
                prev_ckpt = _lc_supersede(prev_ckpt, new_ranks)
            ranks = new_ranks
    # ranks is now a materialized checkpoint with no lineage into the
    # static tables — free their blocks eagerly too
    for static in (e, nodes, ed, dangling):
        _lc_release(static)
    return ranks


def bfs_levels(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    max_depth: int = 10,
    directed: bool = True,
) -> DataFrame:
    """Breadth-first reachability: (node, level) for every node within
    ``max_depth`` hops of any source (level = hop count of the
    SHORTEST path, sources at level 0).

    Frontier expansion: visited and frontier are DataFrames; each round
    joins the frontier to the edge list, anti-joins already-visited
    nodes, and checkpoints (iterative-lineage discipline). Work per
    round is proportional to the frontier's out-edges — the standard
    scalable BFS on a relational engine; rounds end early when the
    frontier empties (one cheap isEmpty per round, same job count as
    the expansion itself)."""
    if max_depth < 0:
        raise ValueError("bfs_levels: max_depth must be >= 0")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = e.distinct().localCheckpoint()
    frontier = (
        sources.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("level", F.lit(0))
        .localCheckpoint()
    )
    visited = frontier
    # superseded checkpoints we own; the depth-0 sources checkpoint is
    # both visited and frontier, releasable once depth 1 materializes
    prev_visited = frontier
    prev_frontier = None
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("level", F.lit(depth))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            _lc_release(nxt)
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        # the new visited checkpoint is materialized — the previous
        # round's visited and frontier blocks are superseded (eager
        # release; ContextCleaner would get to them eventually, but a
        # deep BFS in a long session accumulates one block set per
        # level otherwise — the pagerank lesson)
        prev_visited = _lc_supersede(prev_visited, visited)
        prev_frontier = _lc_supersede(prev_frontier, nxt)
        frontier = nxt
    _lc_release(e)
    return visited


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    relabel_by_degree: bool = True,
) -> DataFrame:
    """Per-node triangle counts over an undirected graph given as an
    edge list (self-loops dropped, direction and duplicates ignored).
    Returns (node, n_triangles).

    Algorithm: canonicalize each edge to (lo, hi), deduplicate, then
    enumerate wedges a<b<c by joining e(a,b) ⋈ e(b,c) and closing them
    against e(a,c) — each triangle found exactly once, then credited
    to all three corners via one explode + hash-agg.

    ``relabel_by_degree=True`` (default) orients edges by the
    lexicographic order of ``(degree, node)`` instead of raw node ids:
    each wedge join's fan-out is then bounded by the LOWER-degree
    endpoint — the exact Chiba-Nishizeki degree orientation, which
    keeps a power-law hub (degree 10^7) from generating quadratic
    wedge candidates when its raw id happens to sort low. The
    orientation is internal: no global rank / window / zipWithIndex is
    needed, because Spark compares structs lexicographically — the
    degree join (two hash equi-joins on node key, O(E)) replaces an
    id relabel entirely. ``relabel_by_degree=False`` skips the degree
    joins (fine when ids are known to be degree-correlated, e.g.
    already relabeled upstream).

    Scale shape: one dedup, one degree hash-agg + two O(E) degree
    joins (orientation), two hash equi-joins (wedge + closure), one
    explode + hash-agg. Per-node triangle counts are orientation-
    invariant, so both modes return identical results."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("lo"),
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
    )
    if relabel_by_degree:
        deg = (
            e.select(F.col("lo").alias("node"))
            .unionByName(e.select(F.col("hi").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("__deg"))
        )
        keyed = (
            e.join(deg.withColumnRenamed("node", "lo"), "lo")
            .withColumnRenamed("__deg", "__dlo")
            .join(deg.withColumnRenamed("node", "hi"), "hi")
            .withColumnRenamed("__deg", "__dhi")
            .select(
                F.struct(
                    F.col("__dlo").alias("d"), F.col("lo").alias("n")
                ).alias("u"),
                F.struct(
                    F.col("__dhi").alias("d"), F.col("hi").alias("n")
                ).alias("v"),
            )
        )
        o = keyed.select(
            F.least(F.col("u"), F.col("v")).alias("lo"),
            F.greatest(F.col("u"), F.col("v")).alias("hi"),
        )
    else:
        o = e
    ab = o.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    bc = o.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    ac = o.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])
    corners = tri.select(F.explode(F.array("a", "b", "c")).alias("__k"))
    node = F.col("__k.n") if relabel_by_degree else F.col("__k")
    return corners.select(node.alias("node")).groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 5,
    directed: bool = False,
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007): every node starts labeled with its own id; each round
    it adopts the most frequent label among its neighbors, ties broken
    by the SMALLEST label — a deterministic variant (classic LPA breaks
    ties randomly), so a fixed-iteration run is SQL-replayable.
    Returns (node, label) after ``n_iter`` rounds.

    Scale shape per round: (labels ⋈ edges on src) → (dst, label)
    hash-agg count → per-dst argmax via ``min_by`` over a
    (-count, label) struct — two shuffles on graph keys, no window
    over the corpus, no driver state. Lineage is cut every round
    (iterative-loop discipline)."""
    if n_iter < 1:
        raise ValueError("label_propagation: n_iter must be >= 1")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    # static edge table PINNED on the per-round join key (src): the
    # repartition rides under the distinct's (src, dst) clustering so no
    # exchange is added, and every round's e ⋈ labels join then needs
    # neither side shuffled; nodes pinned on node the same way (its
    # distinct's own exchange) for the round-closing left join
    e = _lc_pinned(
        e.filter(F.col("src") != F.col("dst"))
        .repartition(_pin_n(e.sparkSession), "src")
        .distinct()
    )
    nodes = _lc_pinned(
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    labels = nodes.withColumn("label", F.col("node"))
    for i in range(n_iter):
        votes = (
            e.join(labels, e["src"] == labels["node"])
            .groupBy(F.col("dst").alias("v_node"), "label")
            .agg(F.count(F.lit(1)).alias("__n"))
        )
        # most frequent label, ties -> smallest label: min_by over a
        # (-count, label) struct (count is positive, negation is safe)
        best = votes.groupBy("v_node").agg(
            F.min_by(
                "label", F.struct((-F.col("__n")).alias("a"), F.col("label").alias("b"))
            ).alias("new_label")
        )
        # best is partitioned on v_node by its agg and nodes is pinned on
        # node, so this left join is exchange-free; the pinned checkpoint
        # re-captures (node, n) for the next round
        new_labels = _lc_pinned(
            nodes.join(best, nodes["node"] == best["v_node"], "left")
            .select(
                "node",
                F.coalesce(F.col("new_label"), F.col("node")).alias("label"),
            )
        )
        # eager release of the superseded label checkpoint (pagerank
        # discipline) — the first round's `labels` is a lazy projection
        # over nodes, not a checkpoint, so _lc_release no-ops there
        _lc_release(labels)
        labels = new_labels
    # the returned labels are a materialized checkpoint — the static
    # edge/node blocks can go too
    _lc_release(e)
    _lc_release(nodes)
    return labels


def sssp(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    node_col: str = "node",
    n_iter: int = 10,
) -> DataFrame:
    """Multi-source weighted shortest paths by synchronous
    Bellman-Ford relaxation over a (src, dst, weight) edge list:
    each round, ``dist'(v) = min(dist(v), min over edges u->v of
    dist(u) + w(u, v))``; sources start at distance 0. Runs at most
    ``n_iter`` rounds (shortest paths using <= n_iter hops — a fixed
    round count is deterministic arithmetic, so SQL-replayable as an
    unrolled min-merge chain) with an early stop when a round
    improves nothing. Returns (node, dist) for REACHED nodes only.
    Negative weights are rejected (Bellman-Ford tolerates them, but a
    bounded-round run would silently return hop-limited distances on
    a negative cycle instead of diverging loudly).

    Scale shape per round: (dists ⋈ edges on src) -> per-dst MIN
    hash-agg -> full-outer min-merge with the current dists — two key
    shuffles, no window, no driver state beyond the one improvement
    count that powers the early stop. Lineage is cut every round and
    superseded checkpoints are released eagerly (the pagerank
    discipline), so repeated calls leave one distance-table block set."""
    if n_iter < 1:
        raise ValueError("sssp: n_iter must be >= 1")
    # NOT pinned (r10): sssp was A/B'd with the _lc_pinned treatment the
    # other iterative ops got and REGRESSED at ~sf1 (24 s stable →
    # 28-36 s with 50-80 s worst runs, twice, interleaved) — its merged
    # table is a full-outer join whose output partitioning is Unknown on
    # Spark, so the rounds re-exchange the dists side regardless and the
    # pin only traded away AQE inside round materializations. Reverted
    # to the r09 shape on measurement.
    e = (
        edges.select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            F.col(weight).cast("double").alias("w"),
        )
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))  # parallel edges: keep the lightest
        .localCheckpoint()
    )
    neg = e.filter(F.col("w") < 0).isEmpty()
    if not neg:
        raise ValueError("sssp: negative edge weights are not supported")
    dists = (
        sources.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0.0))
        .localCheckpoint()
    )
    prev_ckpt = dists
    for _ in range(n_iter):
        relaxed = (
            dists.join(e, dists["node"] == e["src"])
            .select(F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("cand"))
            .groupBy("node")
            .agg(F.min("cand").alias("cand"))
        )
        merged = (
            dists.join(relaxed, "node", "full_outer")
            .select(
                "node",
                F.least(
                    F.coalesce(F.col("dist"), F.lit(float("inf"))),
                    F.coalesce(F.col("cand"), F.lit(float("inf"))),
                ).alias("dist"),
                (
                    F.col("dist").isNull()
                    | (F.col("cand") < F.col("dist"))
                ).alias("__improved"),
            )
            .localCheckpoint()
        )
        converged = merged.filter(F.col("__improved")).isEmpty()
        prev_ckpt = _lc_supersede(prev_ckpt, merged)
        dists = merged.select("node", "dist")
        if converged:
            break
    _lc_release(e)
    return dists


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 10,
) -> DataFrame:
    """k-core decomposition by synchronous peeling (Matula & Beck
    1983): repeatedly delete nodes with degree < k (over the UNDIRECTED
    deduplicated graph) until no node falls below k or ``n_iter``
    rounds elapse — a fixed round count is deterministic, so the
    peeling chain is SQL-replayable round by round. Returns
    (node, core_degree) for the surviving nodes, core_degree = degree
    within the RETURNED node set (on a run that exhausts ``n_iter``
    before converging, degrees are recomputed after the final sub-k
    filter, so they may be < k — the peel simply hadn't finished;
    converged runs never pay that extra pass).

    Scale shape per round: one degree hash-agg + two semi-joins that
    keep only edges whose BOTH endpoints survive — all O(E) key
    shuffles, no window, no driver state beyond the early-stop count.
    Lineage is cut per round with eager release of superseded
    checkpoints (the pagerank discipline)."""
    if k < 1:
        raise ValueError("kcore: k must be >= 1")
    if n_iter < 1:
        raise ValueError("kcore: n_iter must be >= 1")
    # edge table PINNED on lo (guide §2.4): the repartition rides under
    # the distinct's (lo, hi) clustering, the keep side of each semi-join
    # arrives partitioned on node from its own agg, and the hi-semi runs
    # FIRST so each round's survivor table ends partitioned on lo again —
    # the invariant the next round's lo-semi and the keep-side joins
    # reuse (the semi-join pair commutes, so the reorder changes nothing)
    e = _lc_pinned(
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("lo"),
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .repartition(_pin_n(edges.sparkSession), "lo")
        .distinct()
    )
    prev_ckpt = e
    prev_n = e.count()  # carried across rounds: one count job per round
    for _ in range(n_iter):
        deg = (
            e.select(F.col("lo").alias("node"))
            .unionByName(e.select(F.col("hi").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("__deg"))
        )
        keep = deg.filter(F.col("__deg") >= k).select("node")
        ne = _lc_pinned(
            e.join(keep.withColumnRenamed("node", "hi"), "hi", "left_semi")
            .join(keep.withColumnRenamed("node", "lo"), "lo", "left_semi")
            .select("lo", "hi")
        )
        n = ne.count()
        stable = n == prev_n
        prev_n = n
        prev_ckpt = _lc_supersede(prev_ckpt, ne)
        e = ne
        if stable:
            converged = True
            break
    else:
        converged = False
    deg = (
        e.select(F.col("lo").alias("node"))
        .unionByName(e.select(F.col("hi").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("core_degree"))
    )
    if converged:
        # stability ⟹ every remaining node already has degree >= k, so
        # the filter is inert and core_degree IS the within-set degree
        return deg.filter(F.col("core_degree") >= k)
    # n_iter exhausted before the peel converged: the >= k filter drops
    # sub-k nodes, so the PRE-filter degrees would still count edges to
    # them. Recompute degrees within the returned node set (one extra
    # degree agg + two semi-joins — only paid on non-converged runs) so
    # the output is internally consistent; note a returned core_degree
    # may then be < k (the peel simply hadn't finished), including 0
    # for a node whose surviving neighbors were all dropped.
    keep = deg.filter(F.col("core_degree") >= k).select("node")
    ef = (
        e.join(keep.withColumnRenamed("node", "lo"), "lo", "left_semi")
        .join(keep.withColumnRenamed("node", "hi"), "hi", "left_semi")
    )
    deg2 = (
        ef.select(F.col("lo").alias("node"))
        .unionByName(ef.select(F.col("hi").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("__d2"))
    )
    return keep.join(deg2, "node", "left").select(
        "node", F.coalesce(F.col("__d2"), F.lit(0)).alias("core_degree")
    )


def neighborhood_function(
    edges: DataFrame,
    radius: int = 2,
    src: str = "src",
    dst: str = "dst",
    lgk: int = 14,
) -> DataFrame:
    """HyperBall (Boldi & Vigna 2011): per node, the number of nodes
    reachable within r hops, for every r in 0..radius, via MERGEABLE
    HLL sketches instead of materialized reachability sets —
    ``ball_0(v) = {v}``, ``ball_{r+1}(v) = ball_r(v) ∪ ⋃_{v→u}
    ball_r(u)``, each round one (edges ⋈ sketches) join + one
    hll_union_agg hash-agg. Returns (node, radius, n_reachable).

    This is THE scalable way to compute neighborhood functions /
    effective-diameter estimates: reachability SETS are quadratic, the
    sketch table is O(nodes * 2^lgk) bits regardless of ball size.
    DataSketches HLL is EXACT in its sparse regime (< ~0.75 * 2^lgk
    distinct per sketch), which covers gate-scale graphs — the oracle
    replays exact reachability counts; beyond sparse the numbers
    become ±~1% estimates (raise lgk if exactness is required).
    Lineage is cut per round with eager release (pagerank discipline)."""
    if radius < 0:
        raise ValueError("neighborhood_function: radius must be >= 0")
    # static edge table PINNED on the per-round join key (dst): the
    # repartition replaces the distinct's own exchange (hash on dst is a
    # subset of the distinct's (src, dst) clustering, so the dedup agg
    # adds none), and every round's e ⋈ sk join reuses it — 2 exchanges
    # per round drop to 0 (guide §2.4)
    e = _lc_pinned(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .repartition(_pin_n(edges.sparkSession), "dst")
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # sketch table pinned on node (the agg's own exchange partitioning,
    # captured through the checkpoint) — the other side of the round join
    sk = _lc_pinned(
        nodes.groupBy("node")
        .agg(F.hll_sketch_agg(F.col("node"), F.lit(lgk)).alias("__sk"))
    )

    def _est(s: DataFrame, r: int) -> DataFrame:
        # materialize the (node, radius, estimate) rows BEFORE the
        # backing sketch table is superseded and released — the
        # estimates are one small row per node, the sketches are 2^lgk
        # bits per node
        return s.select(
            "node",
            F.lit(r).alias("radius"),
            F.hll_sketch_estimate("__sk").alias("n_reachable"),
        ).localCheckpoint()

    parts = [_est(sk, 0)]
    prev_ckpt = sk
    for r in range(1, radius + 1):
        contrib = e.join(sk, e["dst"] == sk["node"]).select(
            F.col("src").alias("node"), "__sk"
        )
        merged = _lc_pinned(
            contrib.unionByName(sk.select("node", "__sk"))
            .groupBy("node")
            .agg(F.hll_union_agg("__sk").alias("__sk"))
        )
        parts.append(_est(merged, r))
        prev_ckpt = _lc_supersede(prev_ckpt, merged)
        sk = merged
    _lc_release(prev_ckpt)  # the final sketches — estimates are taken
    _lc_release(e)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def harmonic_centrality(
    edges: DataFrame,
    radius: int = 6,
    src: str = "src",
    dst: str = "dst",
    lgk: int = 14,
    reverse: bool = True,
) -> DataFrame:
    """Harmonic centrality on the HyperBall base — Boldi & Vigna 2011's
    headline application: ``harmonic(v) = Σ_{u≠v} 1 / d(u, v)``,
    truncated at ``radius`` (exact when radius >= diameter; nodes
    farther than the radius contribute 0, the standard truncated
    form). With ``reverse=True`` (the textbook definition) distances
    are INCOMING — who can reach YOU — computed by running HyperBall
    over the transposed edge list; ``reverse=False`` scores outgoing
    reach instead. Returns (node, harmonic, n_reachable, closeness)
    where ``n_reachable = |ball_radius(v)|`` (self included) and
    ``closeness = (n_reachable - 1) / Σ_u d(u, v)`` (0 for nodes
    nothing reaches) — the Lin/closeness companion from the same
    sketch pass.

    NO new distributed machinery: one :func:`neighborhood_function`
    run (per-round sketch join + hash-agg, O(nodes * 2^lgk) state),
    then one arithmetic pass over its (node, radius, n_reachable)
    rows — ball deltas ``Δ_r = |ball_r| - |ball_{r-1}|`` give
    ``harmonic = Σ Δ_r / r`` and ``total_dist = Σ r * Δ_r``. The
    accumulation runs in a per-node window ORDERED BY radius (bounded:
    radius+1 rows per node), so the float addition order is
    deterministic and SQL-replayable bit-for-bit; in the HLL sparse
    regime the deltas are exact counts, beyond it they inherit the
    sketch's ±~1% (raise lgk if exactness is required)."""
    from pyspark.sql import Window

    if radius < 1:
        raise ValueError("harmonic_centrality: radius must be >= 1")
    nf = neighborhood_function(
        edges,
        radius=radius,
        src=(dst if reverse else src),
        dst=(src if reverse else dst),
        lgk=lgk,
    )
    worder = Window.partitionBy("node").orderBy("radius")
    wcum = worder.rowsBetween(Window.unboundedPreceding, 0)
    d = nf.withColumn(
        "__delta", F.col("n_reachable") - F.lag("n_reachable", 1).over(worder)
    )
    step = F.when(F.col("radius") >= 1, F.col("__delta"))
    harmonic = F.sum(
        F.coalesce(step / F.col("radius"), F.lit(0.0))
    ).over(wcum)
    total_dist = F.sum(
        F.coalesce(step * F.col("radius"), F.lit(0.0))
    ).over(wcum)
    return (
        d.withColumn("harmonic", harmonic)
        .withColumn("__td", total_dist)
        .filter(F.col("radius") == radius)
        .select(
            "node",
            "harmonic",
            "n_reachable",
            F.when(
                F.col("__td") > 0,
                (F.col("n_reachable") - 1) / F.col("__td"),
            )
            .otherwise(F.lit(0.0))
            .alias("closeness"),
        )
    )


def modularity(
    edges: DataFrame,
    communities: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    label_col: str = "label",
) -> DataFrame:
    """Newman modularity of a community assignment (Newman & Girvan
    2004) over the UNDIRECTED deduplicated graph: per community c,
    ``q_c = m_c / m - (d_c / 2m)^2`` with m = total undirected edges,
    m_c = intra-community edges, d_c = total degree of c's members;
    the graph's modularity Q is the sum of q_c. Returns one row per
    community — (label, n_nodes, m_intra, degree_sum, q_c) — so the
    score doubles as a community-quality report (which labels from
    :func:`label_propagation` are real, which are giant-component
    artifacts); sum q_c for the scalar Q.

    Scale shape: canonicalize + distinct the edge list once
    (localCheckpoint shared by all three consumers), then everything
    is equi-joins on node/label keys + hash-aggs: degrees = endpoint
    explode ⋈ communities → per-label sum; intra edges = communities
    joined on BOTH endpoints, filter equal labels, per-label count;
    m rides in as a 1-row aggregate cross-join (Catalyst broadcasts
    it — no driver action, the plan stays lazy). Nodes absent from
    ``communities`` are excluded from degree/intra sums (their edges
    still count in m) — pass a complete assignment for the textbook
    score."""
    # NOT pinned (r10): modularity was A/B'd with the _lc_pinned
    # treatment and REGRESSED at ~sf1 (6-6.5 s stable → 21-43 s medians
    # with 120-190 s worst runs, twice, interleaved) — its consumers mix
    # the fixed-count pinned layout with AQE-planned exchanges in three
    # different join keys (lo, hi, label), where the pin forfeits
    # runtime coalescing without freeing the hi/label exchanges.
    # Reverted to the r09 shape on measurement; the LPA assignment it
    # consumes keeps its (pinned) speedup.
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("lo"),
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
        .localCheckpoint()
    )
    # the label table feeds THREE joins (degree + both intra endpoints);
    # a lazy assignment (e.g. a label_propagation plan) would re-run its
    # whole iteration per consumer — materialize it once
    comm = communities.select(
        F.col(node_col).alias("__node"), F.col(label_col).alias("__label")
    ).localCheckpoint()
    m = e.agg(F.count(F.lit(1)).cast("double").alias("__m"))
    deg = (
        e.select(F.col("lo").alias("__node"))
        .unionByName(e.select(F.col("hi").alias("__node")))
        .join(comm, "__node")
        .groupBy("__label")
        .agg(
            F.count(F.lit(1)).alias("degree_sum"),
            F.countDistinct("__node").alias("n_nodes"),
        )
    )
    intra = (
        e.join(
            comm.select(
                F.col("__node").alias("lo"), F.col("__label").alias("__la")
            ),
            "lo",
        )
        .join(
            comm.select(
                F.col("__node").alias("hi"), F.col("__label").alias("__lb")
            ),
            "hi",
        )
        .filter(F.col("__la") == F.col("__lb"))
        .groupBy(F.col("__la").alias("__label"))
        .agg(F.count(F.lit(1)).alias("m_intra"))
    )
    half = F.col("degree_sum") / (F.lit(2.0) * F.col("__m"))
    return (
        deg.join(intra, "__label", "left")
        .crossJoin(m)
        .select(
            F.col("__label").alias(label_col),
            "n_nodes",
            F.coalesce(F.col("m_intra"), F.lit(0)).alias("m_intra"),
            "degree_sum",
            (
                F.coalesce(F.col("m_intra"), F.lit(0)) / F.col("__m")
                - half * half
            ).alias("q_c"),
        )
    )


def adamic_adar(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_degree: int = 4096,
) -> DataFrame:
    """Adamic-Adar link prediction (Adamic & Adar 2003) over the
    UNDIRECTED deduplicated graph: for every NON-adjacent pair (u, v)
    with at least one common neighbor, ``score = Σ_{w ∈ N(u)∩N(v)}
    1 / ln(deg(w))`` plus the raw common-neighbor count — the
    classic "people you may know" / co-purchase recommendation
    primitive. Returns (node_a, node_b, common_neighbors, score)
    with node_a < node_b.

    Scale shape: canonicalize + distinct the edge list once
    (localCheckpoint shared by the adjacency, degree, and anti-join
    consumers), one degree hash-agg, then ONE wedge equi-join on the
    middle node (adjacency ⋈ adjacency on w, u < v), an anti-join
    against the edge list to drop already-adjacent pairs, and a final
    per-pair hash-agg. Never all-pairs: the wedge fan-out is
    Σ_w deg(w)², so ``max_degree`` excludes hub middles past the cap
    (their wedge cost is quadratic while their AA weight 1/ln(deg)
    is the SMALLEST possible) — dropped-hub semantics are
    conservative (scores only shrink, pairs connected only through
    capped hubs disappear) and deterministic, so an oracle replaying
    the same cap matches exactly. Use :func:`adamic_adar_overflow`
    to see what the cap dropped."""
    if max_degree is not None and max_degree < 2:
        raise ValueError("adamic_adar: max_degree must be >= 2")
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("lo"),
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
        .localCheckpoint()
    )
    adj = e.select(F.col("lo").alias("v"), F.col("hi").alias("w")).unionByName(
        e.select(F.col("hi").alias("v"), F.col("lo").alias("w"))
    )
    deg = adj.groupBy("w").agg(F.count(F.lit(1)).alias("__deg"))
    mid = deg if max_degree is None else deg.filter(
        F.col("__deg") <= max_degree
    )
    a = adj.select(F.col("v").alias("node_a"), "w")
    b = adj.select(F.col("v").alias("node_b"), "w")
    wedges = (
        a.join(b, "w")
        .filter(F.col("node_a") < F.col("node_b"))
        .join(mid, "w")
    )
    cand = wedges.groupBy("node_a", "node_b").agg(
        F.count(F.lit(1)).alias("common_neighbors"),
        F.sum(F.lit(1.0) / F.log(F.col("__deg").cast("double"))).alias(
            "score"
        ),
    )
    return cand.join(
        e,
        (cand["node_a"] == e["lo"]) & (cand["node_b"] == e["hi"]),
        "left_anti",
    )


def adamic_adar_overflow(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_degree: int = 4096,
) -> DataFrame:
    """Report the hub nodes :func:`adamic_adar` excludes as wedge
    middles at ``max_degree`` — (node, degree) for every node over
    the cap, the boundedness-audit companion in the
    video_posting_overflow / sparse_cosine_overflow discipline."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("lo"),
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
    )
    adj = e.select(F.col("lo").alias("node")).unionByName(
        e.select(F.col("hi").alias("node"))
    )
    return (
        adj.groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
        .filter(F.col("degree") > max_degree)
    )


def degree_assortativity(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002) of the
    UNDIRECTED deduplicated graph: the Pearson correlation of the
    degrees at either end of an edge, computed over the symmetrized
    edge list (each undirected edge contributes both orientations, the
    standard convention — the statistic must be symmetric in its two
    arguments). r > 0: hubs attach to hubs (social networks);
    r < 0: hubs attach to leaves (star-ish / bipartite-ish graphs,
    most purchase graphs). Returns one row
    (n_edges, mean_degree, assortativity).

    Scale shape: canonicalize + distinct once (localCheckpoint shared
    by the degree and join consumers), one degree hash-agg, two
    equi-joins to decorate the edge endpoints, and one scalar moment
    agg — all moments are exact INTEGER sums (Σx, Σxy, Σx²) over
    integer degrees, so the coefficient replays bit-for-bit on any
    engine. Pearson is shift-invariant, so this equals Newman's
    remaining-degree (deg-1) formulation exactly."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("lo"),
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
        .localCheckpoint()
    )
    adj = e.select(F.col("lo").alias("v"), F.col("hi").alias("w")).unionByName(
        e.select(F.col("hi").alias("v"), F.col("lo").alias("w"))
    )
    deg = adj.groupBy("v").agg(F.count(F.lit(1)).alias("__deg"))
    dx = deg.select(F.col("v").alias("lo"), F.col("__deg").alias("__dx"))
    dy = deg.select(F.col("v").alias("hi"), F.col("__deg").alias("__dy"))
    sym = (
        e.join(dx, "lo")
        .join(dy, "hi")
        .select(F.col("__dx").alias("x"), F.col("__dy").alias("y"))
    )
    sym = sym.select("x", "y").unionByName(
        sym.select(F.col("y").alias("x"), F.col("x").alias("y"))
    )
    m = sym.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("x").alias("__sx"),
        F.sum("y").alias("__sy"),
        F.sum(F.col("x") * F.col("y")).alias("__sxy"),
        F.sum(F.col("x") * F.col("x")).alias("__sxx"),
        F.sum(F.col("y") * F.col("y")).alias("__syy"),
    )
    n = F.col("__n").cast("double")
    cov = F.col("__sxy") - F.col("__sx") * F.col("__sy") / n
    vx = F.col("__sxx") - F.col("__sx") * F.col("__sx") / n
    vy = F.col("__syy") - F.col("__sy") * F.col("__sy") / n
    return m.select(
        (F.col("__n") / 2).cast("long").alias("n_edges"),
        (F.col("__sx") / n).alias("mean_degree"),
        F.when(
            (vx > 0) & (vy > 0), cov / F.sqrt(vx * vy)
        ).otherwise(F.lit(0.0)).alias("assortativity"),
    )


def bipartite_project(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    onto: str = "dst",
    max_degree: int = 4096,
) -> DataFrame:
    """Bipartite one-mode projection: from a two-layer edge list
    (e.g. customer → supplier), build the weighted co-membership graph
    on the ``onto`` layer — (node_a, node_b, weight) where weight =
    number of shared neighbors in the OTHER layer (suppliers sharing
    customers, items sharing baskets, authors sharing papers). The
    adjacent-pair companion to :func:`adamic_adar` (which scores
    NON-adjacent pairs with log-damped weights).

    Scale shape: dedup the edge list, ONE wedge equi-join on the
    other-layer node, one pair hash-agg. The wedge fan-out is
    Σ_w deg(w)² over other-layer nodes, so ``max_degree`` drops
    over-cap middles (a customer connected to everything creates m²
    pairs while carrying no co-purchase signal) — deterministic,
    conservative, same cap discipline as adamic_adar."""
    if onto not in (src, dst):
        raise ValueError("bipartite_project: onto must name src or dst")
    on_col, other = (dst, src) if onto == dst else (src, dst)
    e = edges.select(
        F.col(other).alias("w"), F.col(on_col).alias("v")
    ).distinct()
    if max_degree is not None:
        over = (
            e.groupBy("w")
            .agg(F.count(F.lit(1)).alias("__deg"))
            .filter(F.col("__deg") > max_degree)
            .select("w")
        )
        e = e.join(over, "w", "left_anti")
    a = e.select("w", F.col("v").alias("node_a"))
    b = e.select("w", F.col("v").alias("node_b"))
    return (
        a.join(b, "w")
        .filter(F.col("node_a") < F.col("node_b"))
        .groupBy("node_a", "node_b")
        .agg(F.count(F.lit(1)).alias("weight"))
    )
