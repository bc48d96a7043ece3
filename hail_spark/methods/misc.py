"""maximal_independent_set + ld_prune.

Parity targets (reference hail-is/hail):
* ``maximal_independent_set`` — methods/misc.py:16 (+ IR node
  ArrayMaximalIndependentSet): the reference also collects the edge
  list to the driver and solves there; we do the same with the
  classic greedy remove-max-degree heuristic (no networkx needed).
* ``ld_prune`` — statgen.py:4708: pairwise r² within a bp window →
  edges where r² > threshold → keep a maximal independent set.

Spark shape for ld_prune: variants are binned by position window;
candidate pairs come from a banded self-join (equi-join on
(contig, bin) — never all-pairs); r² per pair is a zip_with fold over
the two entries arrays in codegen. Only the thresholded EDGES are
collected (the reference collects the same), never genotypes.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..matrixtable import ENTRIES, MatrixTable


def maximal_independent_set(edges: list[tuple]) -> set:
    """Greedy MIS: repeatedly delete the highest-degree node (the
    reference's default tie-breaking strategy, misc.py:16)."""
    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    nodes = set(adj)
    removed = set()
    while True:
        live_deg = {
            n: len(adj[n] - removed) for n in nodes if n not in removed
        }
        live_deg = {n: d for n, d in live_deg.items() if d > 0}
        if not live_deg:
            break
        worst = max(sorted(live_deg), key=lambda n: live_deg[n])
        removed.add(worst)
    return nodes - removed


def _ld_pairs(mt: MatrixTable, bp_window_size: int, x_field: str) -> DataFrame:
    """Windowed variant-pair LD: banded self-join on position bins
    (window ⇒ two adjacent bins max), per-pair Pearson r via a single
    zip_with+aggregate fold over mean-imputed genotypes.  Returns
    DataFrame (la, lb, r, r2) for position-ordered pairs within
    ``bp_window_size`` on the same contig.  Shared engine of ld_prune
    and ld_matrix (ref statgen.py:4708 / :3836)."""
    df = mt._df.select(
        F.col("locus"),
        F.col("locus")["contig"].alias("__c"),
        F.col("locus")["position"].alias("__p"),
        F.col(ENTRIES).getField(x_field).alias("__g"),
    )
    # per-variant moments for r² (n, sum, sumsq) over defined entries
    stats = df.select(
        "*",
        F.aggregate(
            "__g",
            F.struct(
                F.lit(0).alias("n"), F.lit(0.0).alias("s"), F.lit(0.0).alias("ss")
            ),
            lambda acc, g: F.when(
                g.isNotNull(),
                F.struct(
                    (acc["n"] + 1).alias("n"),
                    (acc["s"] + g).alias("s"),
                    (acc["ss"] + g * g).alias("ss"),
                ),
            ).otherwise(acc),
        ).alias("__m"),
    )
    binned = stats.select(
        "*",
        F.explode(
            F.array(
                (F.col("__p") / bp_window_size).cast("bigint"),
                (F.col("__p") / bp_window_size + 1).cast("bigint"),
            )
        ).alias("__bin"),
    )
    a, b = binned.alias("a"), binned.alias("b")
    pairs = a.join(
        b,
        on=[
            F.col("a.__c") == F.col("b.__c"),
            F.col("a.__bin") == F.col("b.__bin"),
            F.col("a.__p") < F.col("b.__p"),
            F.col("b.__p") - F.col("a.__p") <= bp_window_size,
            # each pair lands in exactly one shared bin: the one that is
            # b's own bin (avoids double-count via the +1 ghost bin)
            F.col("b.__bin") == (F.col("b.__p") / bp_window_size).cast("bigint"),
        ],
    )
    # mean-imputed moments (the reference's normalization): imputation
    # preserves the mean, shrinks ss by filling (N-n) cells with mean²
    N = float(len(mt._cols))
    am, bm = F.col("a.__m"), F.col("b.__m")
    ma = am["s"] / F.nullif(am["n"], F.lit(0))
    mb = bm["s"] / F.nullif(bm["n"], F.lit(0))
    sxy = F.aggregate(
        F.zip_with(
            F.col("a.__g"),
            F.col("b.__g"),
            lambda x, y: F.coalesce(x.cast("double"), ma) * F.coalesce(y.cast("double"), mb),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    cov = sxy / N - ma * mb
    va = (am["ss"] + (N - am["n"]) * ma * ma) / N - ma * ma
    vb = (bm["ss"] + (N - bm["n"]) * mb * mb) / N - mb * mb
    # constant variants (zero variance) → NULL r², which fails the
    # threshold filter — they can never be in LD
    rc = cov / F.sqrt(F.nullif(va * vb, F.lit(0.0)))
    return pairs.select(
        F.col("a.locus").alias("la"),
        F.col("b.locus").alias("lb"),
        rc.alias("r"),
        (rc * rc).alias("r2"),
    )


def ld_matrix(
    mt: MatrixTable,
    bp_window_size: int = 1_000_000,
    x_field: str = "GT",
) -> DataFrame:
    """Windowed LD matrix as a sparse entries DataFrame (la, lb, r) —
    the scalable form of ref statgen.py:3836 `ld_matrix` (which
    materializes a BlockMatrix; beyond the window radius entries are 0
    by construction there too).  Null r (constant variant) pairs are
    dropped."""
    return _ld_pairs(mt, bp_window_size, x_field).select(
        "la", "lb", "r"
    ).where(F.col("r").isNotNull())


def ld_prune(
    mt: MatrixTable,
    r2: float = 0.2,
    bp_window_size: int = 1_000_000,
    x_field: str = "GT",
) -> DataFrame:
    """Return the pruned-IN variant keys (ref statgen.py:4708): windowed
    pairwise r² (_ld_pairs), greedy MIS on the conflict edges."""
    edges_df = _ld_pairs(mt, bp_window_size, x_field).where(F.col("r2") > r2)
    edges = [
        ((e["la"]["contig"], e["la"]["position"]), (e["lb"]["contig"], e["lb"]["position"]))
        for e in edges_df.collect()
    ]
    conflicted = set()
    for x, y in edges:
        conflicted.add(x)
        conflicted.add(y)
    keep_of_conflicted = maximal_independent_set(edges)
    drop = conflicted - keep_of_conflicted
    spark = mt._df.sparkSession
    if not drop:
        return mt._df.select("locus")
    drop_df = spark.createDataFrame(
        [{"contig": c, "position": p} for c, p in drop],
        "contig string, position int",
    )
    return (
        mt._df.select("locus")
        .join(
            drop_df,
            on=[
                F.col("locus")["contig"] == F.col("contig"),
                F.col("locus")["position"] == F.col("position"),
            ],
            how="left_anti",
        )
        .select("locus")
    )


# ---------------------------------------------------------------------- #
# lambda_gc / filter_intervals / rename_duplicates / segment_intervals
# ---------------------------------------------------------------------- #
def lambda_gc(df: DataFrame, p_col, approximate: bool = True) -> float:
    """Genomic inflation factor λ_GC (ref statgen.py:3097 `lambda_gc`):
    median of qchisqtail(p, 1) over non-NaN p-values divided by the
    theoretical median qchisqtail(0.5, 1).

    Spark shape: one distributed aggregate.  χ²₁ quantile of p is
    qnorm(p/2)² (the z² identity), a pure-Column expression via the
    Acklam-inverse pandas UDF — no per-row Python.  ``approximate``
    uses GK percentile_approx (single pass, bounded memory, the
    reference's approx_cdf analogue); exact uses Spark's exact
    ``percentile`` (sort-based, like the reference's collect+median)."""
    from ..expr import stats as hstats

    p = _as_column(p_col)
    # χ²₁ upper quantile via the z² identity: qchisqtail(p,1) = qnorm(p/2)²
    # — the Acklam inverse is fully vectorized numpy, vs the general
    # qgamma Newton loop which iterates per element in Python (15 s vs
    # 0.5 s over 100k rows at sf0.1)
    z = hstats.qnorm_udf(p / 2.0)
    chisq = z * z
    good = F.when(~F.isnan(p) & p.isNotNull(), chisq)
    med = (
        F.percentile_approx(good, F.lit(0.5), F.lit(100000))
        if approximate
        else F.percentile(good, F.lit(0.5))
    )
    row = df.agg(med.alias("m")).collect()[0]
    from ..expr.stats import qchisqtail

    return float(row["m"]) / qchisqtail(0.5, 1)


def _as_column(c):
    return F.col(c) if isinstance(c, str) else c


def filter_intervals(ds, intervals: list, keep: bool = True):
    """Filter a keyed Table or MatrixTable to rows inside (or outside)
    a list of intervals (ref methods/misc.py:330 `filter_intervals` /
    IR TableFilterIntervals).

    ``intervals`` is a list of dicts ``{"start": .., "end": ..,
    "includes_start": bool, "includes_end": bool}`` whose point type is
    the first key field — either a scalar or, for locus keys, a
    ``{"contig": .., "position": ..}`` dict (interpreted with
    (contig, position) tuple ordering).

    Spark shape: the interval list is small and driver-resident (the
    reference evaluates it too), so this compiles to a pure Column OR
    predicate over the key — Catalyst pushes it to the parquet scan,
    and row-group min/max stats prune non-overlapping file splits: the
    same partition-pruning effect the reference gets from its interval
    partitioner, with zero custom code."""
    from ..table import Table

    mt = None
    if isinstance(ds, MatrixTable):
        mt, t = ds, None
        key0 = ds.row_key[0]
        df = ds._df
    else:
        assert isinstance(ds, Table)
        t = ds
        if not t.key:
            raise ValueError("filter_intervals: table must be keyed")
        key0 = t.key[0]
        df = t.df

    kcol = F.col(key0)
    ktype = df.schema[key0].dataType.simpleString()
    is_locus = ktype.startswith("struct") and "contig" in ktype

    pred = F.lit(False)
    for iv in intervals:
        # inside = (start < key or (incl_start and start == key)) and sym.
        if is_locus:
            kc, kp = kcol["contig"], kcol["position"]
            sc, sp = iv["start"]["contig"], iv["start"]["position"]
            ec, ep = iv["end"]["contig"], iv["end"]["position"]
            gt_start = (kc > sc) | ((kc == sc) & (kp > sp))
            eq_start = (kc == sc) & (kp == sp)
            lt_end = (kc < ec) | ((kc == ec) & (kp < ep))
            eq_end = (kc == ec) & (kp == ep)
        else:
            gt_start = kcol > F.lit(iv["start"])
            eq_start = kcol == F.lit(iv["start"])
            lt_end = kcol < F.lit(iv["end"])
            eq_end = kcol == F.lit(iv["end"])
        above = gt_start | (eq_start if iv.get("includes_start", True) else F.lit(False))
        below = lt_end | (eq_end if iv.get("includes_end", False) else F.lit(False))
        pred = pred | (above & below)

    if mt is not None:
        return mt.filter_rows(pred, keep=keep)
    return t.filter(pred, keep=keep)


def rename_duplicates(mt: MatrixTable, name: str = "unique_id") -> MatrixTable:
    """Disambiguate duplicate string column keys by appending ``_N``
    (ref methods/misc.py:280 `rename_duplicates`).  Column metadata is
    driver-resident by design (Hail collects the ids too), so this is
    pure driver logic over `mt._cols`."""
    ck = mt.col_key[0]
    seen: dict[str, int] = {}
    taken = {c[ck] for c in mt._cols}
    new_cols = []
    for c in mt._cols:
        s = c[ck]
        if s not in seen:
            seen[s] = 0
            uid = s
        else:
            n = seen[s] + 1
            while f"{s}_{n}" in taken:
                n += 1
            seen[s] = n
            uid = f"{s}_{n}"
            taken.add(uid)
        new_cols.append({**c, name: uid})
    return MatrixTable(mt._df, mt._row_key, new_cols, mt._col_key, mt._globals)


def segment_intervals(ht, points: list):
    """Segment an interval-keyed table at a sorted set of points (ref
    methods/misc.py:425 `segment_intervals`): each interval key is cut
    into sub-intervals at every interior point; rows multiply
    accordingly (explode), other fields are duplicated.

    Spark shape: the points become one sorted array literal (the
    reference materializes them as a global too); per row, lower/upper
    bounds into that array are codegen'd filters, sub-interval
    construction is a `sequence`+`transform` HOF, and the multiplying
    step is one `explode` — no shuffle at all."""
    from ..expr import functions as hf
    from ..table import Table

    assert isinstance(ht, Table)
    key0 = ht.key[0]
    pts = sorted(points)
    parr = F.array(*[F.lit(p) for p in pts])
    npts = len(pts)
    iv = F.col(key0)

    lower = hf.lower_bound(parr, iv["start"])
    higher = hf.lower_bound(parr, iv["end"])
    # a point exactly equal to an interval endpoint does not cut there
    lower = F.when(
        (lower < npts) & (F.element_at(parr, lower + 1) == iv["start"]), lower + 1
    ).otherwise(lower)
    higher = F.when(
        (higher < npts) & (F.element_at(parr, higher + 1) == iv["end"]), higher - 1
    ).otherwise(higher)

    def mk(start, end, inc_s, inc_e):
        return F.struct(
            start.alias("start"),
            end.alias("end"),
            inc_s.alias("includes_start"),
            inc_e.alias("includes_end"),
        )

    segmented = F.when(lower >= higher, F.array(iv)).otherwise(
        F.concat(
            F.array(
                mk(iv["start"], F.element_at(parr, lower + 1), iv["includes_start"], F.lit(False))
            ),
            F.transform(
                F.when(higher - 1 > lower, F.sequence(lower, higher - F.lit(2))).otherwise(
                    F.array().cast("array<int>")
                ),
                lambda x: mk(
                    F.element_at(parr, x + 1),
                    F.element_at(parr, x + 2),
                    F.lit(True),
                    F.lit(False),
                ),
            ),
            F.array(
                mk(F.element_at(parr, higher), iv["end"], F.lit(True), iv["includes_end"])
            ),
        )
    )
    df = (
        ht.df.withColumn("lower", lower)
        .withColumn("higher", higher)
        .withColumn("__segs", segmented)
        .withColumn(key0, F.explode("__segs"))
        .drop("__segs")
    )
    return Table(df, ht.key, ht.globals)
