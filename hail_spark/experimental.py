"""Experimental-library parity surface (ref hail/python/hail/experimental):
filtering_allele_frequency, haplotype_freq_em, full_outer_join_mt,
import_gtf/get_gene_intervals, ld_score, pc_project, trio phasing,
export_entries_by_col, tidyr (gather/spread/separate),
simulate_phenotypes, define_function.

Each function cites its reference file; everything stays DataFrame-first —
per-row math uses Column expressions or Arrow-batched pandas UDFs, never
row-at-a-time Python.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .matrixtable import ENTRIES, MatrixTable
from .table import Table


# ---------------------------------------------------------------------- #
# filtering_allele_frequency (ref experimental/filtering_allele_frequency.py
# + is/hail/experimental/package.scala calcFilterAlleleFreq)
# ---------------------------------------------------------------------- #
def _faf_scalar(ac: int, an: int, ci: float) -> float:
    """Whiffin et al. 2017 filtering AF: the highest population AF whose
    ci-quantile of Poisson(an·af) allele counts stays below the observed
    ac.  Same uniroot-then-refine shape as the reference (package.scala
    calcFilterAlleleFreq); qpois/uniroot are our own from-scratch
    numerics."""
    from .expr.stats import qpois, uniroot

    if ac is None or an is None or ac <= 1 or an == 0:
        return 0.0

    def f(af: float) -> float:
        return float(ac - 1 - qpois(ci, an * af))

    root = uniroot(f, 1e-10, 2.0, tol=1e-7)
    precision = 1e-6
    rounder = 1.0 / (precision / 100.0)
    max_af = round((root or 0.0) * rounder) / rounder

    def find_max_ac(af: float) -> int:
        return 0 if af == 0 else int(qpois(ci, an * af))

    while find_max_ac(max_af) < ac:
        max_af += precision
    return max_af - precision


def filtering_allele_frequency(ac, an, ci=0.95) -> Column:
    """Column surface of the filtering allele frequency (ref
    experimental/filtering_allele_frequency.py).  Arrow-batched pandas
    UDF — the per-value root-find has no closed form (the reference
    computes it in native code per row too)."""

    @pandas_udf("double")
    def _faf(acs: pd.Series, ans: pd.Series, cis: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _faf_scalar(
                    None if pd.isna(a) else int(a),
                    None if pd.isna(n) else int(n),
                    float(c),
                )
                for a, n, c in zip(acs, ans, cis)
            ]
        )

    ci_col = F.lit(float(ci)) if isinstance(ci, (int, float)) else ci
    a = F.col(ac) if isinstance(ac, str) else ac
    n = F.col(an) if isinstance(an, str) else an
    return _faf(a, n, ci_col)


# ---------------------------------------------------------------------- #
# haplotype_freq_em (ref experimental/haplotype_freq_em.py +
# package.scala haplotypeFreqEM — Excoffier & Slatkin 1995)
# ---------------------------------------------------------------------- #
def _hap_em_scalar(g: Sequence[int]) -> list[float] | None:
    """EM haplotype counts for a biallelic variant pair.  Input genotype
    counts in order [AABB, AABb, AAbb, AaBB, AaBb, Aabb, aaBB, aaBb,
    aabb]; output counts [AB, aB, Ab, ab] (reference's order)."""
    if g is None or len(g) != 9 or any(x is None for x in g):
        return None
    g = [int(x) for x in g]
    n_samples = sum(g)
    if n_samples == 0 or g[0] >= n_samples:
        return [float(g[0]), 0.0, 0.0, 0.0]
    n_hap = 2.0 * n_samples
    const = np.array(
        [
            2.0 * g[0] + g[1] + g[3],  # AB
            2.0 * g[6] + g[3] + g[7],  # aB
            2.0 * g[2] + g[1] + g[5],  # Ab
            2.0 * g[8] + g[5] + g[7],  # ab
        ]
    )
    p_next = (const + g[4] / 2.0) / n_hap
    p_cur = p_next + 1.0
    it = 0
    while np.max(np.abs(p_next - p_cur)) > 1e-7 and it < 1000:
        p_cur = p_next
        cis = p_cur[0] * p_cur[3]     # AB·ab (cis double-het phase)
        trans = p_cur[1] * p_cur[2]   # aB·Ab
        denom = cis + trans
        if denom == 0:
            break
        extra = np.array([cis, trans, trans, cis]) * (g[4] / denom)
        p_next = (const + extra) / n_hap
        it += 1
    return (p_next * n_hap).tolist()


def haplotype_freq_em(gt_counts) -> Column:
    """Column surface (ref experimental/haplotype_freq_em.py): estimated
    haplotype counts [AB, aB, Ab, ab] from the 9 genotype-combination
    counts of a variant pair."""

    @pandas_udf("array<double>")
    def _em(counts: pd.Series) -> pd.Series:
        return pd.Series([_hap_em_scalar(c) for c in counts])

    c = F.col(gt_counts) if isinstance(gt_counts, str) else gt_counts
    return _em(c)


# ---------------------------------------------------------------------- #
# full_outer_join_mt (ref experimental/full_outer_join_mt.py)
# ---------------------------------------------------------------------- #
def full_outer_join_mt(left: MatrixTable, right: MatrixTable) -> MatrixTable:
    """Full outer join of two MatrixTables on row AND column keys (ref
    experimental/full_outer_join_mt.py): output rows are the union of
    row keys, cols the union of col keys; entries become
    struct(left_entry, right_entry) with nulls where a side is absent.

    Spark shape: col-dimension union is driver metadata (both inputs
    keep cols driver-side by design); the row dimension is ONE
    full-outer equi-join on the row key — AQE handles skew, no
    shuffle beyond the join itself.  Entry realignment is a pure
    Column gather: each side's entries array is indexed by a literal
    old-position map (null for absent columns)."""
    if left._row_key != right._row_key:
        raise ValueError("full_outer_join_mt: row keys must match")
    ck = left._col_key
    if ck != right._col_key:
        raise ValueError("full_outer_join_mt: col keys must match")

    def ckey(c: dict):
        return tuple(c[k] for k in ck)

    lmap = {ckey(c): i for i, c in enumerate(left._cols)}
    rmap = {ckey(c): i for i, c in enumerate(right._cols)}
    all_keys = sorted(set(lmap) | set(rmap))
    cols = [
        {
            **dict(zip(ck, k)),
            "left_col": left._cols[lmap[k]] if k in lmap else None,
            "right_col": right._cols[rmap[k]] if k in rmap else None,
        }
        for k in all_keys
    ]

    rk = list(left._row_key)
    lrow = [c for c in left._df.columns if c != ENTRIES and c not in rk]
    rrow = [c for c in right._df.columns if c != ENTRIES and c not in rk]
    l = left._df.select(
        *rk,
        F.struct(*[F.col(c) for c in lrow]).alias("left_row") if lrow else F.struct(F.lit(True).alias("__d")).alias("left_row"),
        F.col(ENTRIES).alias("__le"),
    )
    r = right._df.select(
        *rk,
        F.struct(*[F.col(c) for c in rrow]).alias("right_row") if rrow else F.struct(F.lit(True).alias("__d")).alias("right_row"),
        F.col(ENTRIES).alias("__re"),
    )
    j = l.join(r, on=rk, how="full_outer")

    def gather(src: Column, mapping: dict) -> Column:
        slots = [
            src[mapping[k]] if k in mapping else F.lit(None)
            for k in all_keys
        ]
        return F.array(*slots)

    out = j.select(
        *rk,
        "left_row",
        "right_row",
        F.arrays_zip(
            gather(F.col("__le"), lmap).alias("left_entry"),
            gather(F.col("__re"), rmap).alias("right_entry"),
        ).alias(ENTRIES),
    )
    return MatrixTable(out, left._row_key, cols, ck, {**right._globals, **left._globals})


# ---------------------------------------------------------------------- #
# import_gtf / get_gene_intervals (ref experimental/import_gtf.py)
# ---------------------------------------------------------------------- #
def import_gtf(
    spark: SparkSession,
    path: str,
    min_partitions: int | None = None,
) -> Table:
    """Import a GTF annotation file as an interval-keyed Table (ref
    experimental/import_gtf.py:13): the 8 fixed GTF columns plus every
    `key "value";` attribute as a string field; keyed by the
    [start, end] interval (1-based, end-inclusive, like the
    reference).

    Spark shape: one distributed text scan; the attribute column is
    parsed with `str_to_map` after a regexp normalization — all
    codegen.  Attribute names are discovered with a first
    aggregation pass (distinct map keys), then projected as
    columns."""
    reader = spark.read.text(path)
    if min_partitions:
        reader = reader.repartition(min_partitions)
    df = reader.where(~F.col("value").startswith("#"))
    p = F.split(F.col("value"), "\t")
    base = df.select(
        F.element_at(p, 1).alias("seqname"),
        F.element_at(p, 2).alias("source"),
        F.element_at(p, 3).alias("feature"),
        F.element_at(p, 4).cast("int").alias("start"),
        F.element_at(p, 5).cast("int").alias("end"),
        F.when(F.element_at(p, 6) != ".", F.element_at(p, 6).cast("double")).alias("score"),
        F.when(F.element_at(p, 7) != ".", F.element_at(p, 7)).alias("strand"),
        F.when(F.element_at(p, 8) != ".", F.element_at(p, 8).cast("int")).alias("frame"),
        F.element_at(p, 9).alias("__attr_raw"),
    )
    # normalize `k "v"; k2 "v2";` to `k=v|k2=v2` then str_to_map
    attr = F.expr(
        r"""str_to_map(regexp_replace(regexp_replace(__attr_raw, '\\s*(\\w+)\\s+"([^"]*)";?', '$1=$2'), '$', ''), '', '=')"""
    )
    base = base.withColumn("__attrs", attr).drop("__attr_raw")
    keys = sorted(
        r["k"]
        for r in base.select(F.explode(F.map_keys("__attrs")).alias("k")).distinct().collect()
    )
    out = base.select(
        F.struct(
            F.struct(F.col("seqname").alias("contig"), F.col("start").alias("position")).alias("start"),
            F.struct(F.col("seqname").alias("contig"), F.col("end").alias("position")).alias("end"),
            F.lit(True).alias("includes_start"),
            F.lit(True).alias("includes_end"),
        ).alias("interval"),
        "seqname",
        "source",
        "feature",
        "score",
        "strand",
        "frame",
        *[F.col("__attrs")[k].alias(k) for k in keys],
    )
    return Table(out, ("interval",))


def get_gene_intervals(
    gtf: Table,
    gene_symbols: Sequence[str] | None = None,
    gene_ids: Sequence[str] | None = None,
    transcript_ids: Sequence[str] | None = None,
) -> list[dict]:
    """Filter a GTF table to matching genes/transcripts and return their
    intervals (ref experimental/import_gtf.py:224 `get_gene_intervals`)."""
    df = gtf.df.where(F.col("feature") == "gene")
    conds = []
    if gene_symbols:
        conds.append(F.col("gene_name").isin(*gene_symbols))
    if gene_ids:
        conds.append(F.col("gene_id").isin(*gene_ids))
    if transcript_ids:
        conds.append(F.col("transcript_id").isin(*transcript_ids))
    if conds:
        pred = conds[0]
        for c in conds[1:]:
            pred = pred | c
        df = df.where(pred)
    return [r["interval"].asDict(recursive=True) for r in df.select("interval").collect()]


# ---------------------------------------------------------------------- #
# ld_score (ref experimental/ldscore.py)
# ---------------------------------------------------------------------- #
def ld_score(mt: MatrixTable, radius: int, x_field: str = "GT") -> DataFrame:
    """Univariate LD scores (ref experimental/ldscore.py:18 `ld_score`):
    for each variant, the sum over the +-radius bp window of the
    bias-adjusted r² (r²_adj = ((n-1)/(n-2))·r² − 1/(n-2); the self
    term is exactly 1).

    Spark shape: the reference routes this through an n_variants ×
    n_variants BlockMatrix sparsified to the window band; here the
    banded structure IS the join — the existing windowed-pair engine
    (`_ld_pairs`, a bin-bucketed equi-self-join) emits only in-window
    pairs, so the score is one symmetric union + hash-agg per locus.
    Scales with (variants × window density), never variants²."""
    from .methods.misc import _ld_pairs

    n = float(len(mt._cols))
    pairs = _ld_pairs(mt, radius, x_field).where(F.col("r2").isNotNull())
    adj = lambda c: ((n - 1.0) / (n - 2.0)) * c - (1.0 / (n - 2.0))
    sym = pairs.select(F.col("la").alias("locus"), adj(F.col("r2")).alias("c")).unionByName(
        pairs.select(F.col("lb").alias("locus"), adj(F.col("r2")).alias("c"))
    )
    per_locus = sym.groupBy("locus").agg(F.sum("c").alias("__pair_sum"))
    all_loci = mt._df.select("locus")
    return (
        all_loci.join(per_locus, on="locus", how="left")
        .select(
            "locus",
            (F.coalesce(F.col("__pair_sum"), F.lit(0.0)) + 1.0).alias("univariate"),
        )
    )


# ---------------------------------------------------------------------- #
# pc_project (ref experimental/pca.py:13 `pc_project`)
# ---------------------------------------------------------------------- #
def pc_project(
    mt: MatrixTable,
    loadings: DataFrame,
    x_field: str = "GT",
) -> DataFrame:
    """Project genotypes onto reference PCA loadings (ref
    experimental/pca.py:13): per sample s, score_k = Σ_variants
    loading_k · (gt_s − 2·af) / sqrt(M·2·af·(1−af)), using the
    reference panel's per-variant af carried on the loadings table
    (columns: row key…, `loadings` array<double>, `af` double).

    Spark shape: one equi-join of the loadings onto the matrix rows
    (broadcast when small), then a single hash-free aggregation — the
    per-sample score vector accumulates via k elementwise array sums
    over the entries array (map-side combine; k and n_samples are
    small, variants are the big axis)."""
    rk = list(mt._row_key)
    j = mt._df.join(loadings, on=rk, how="inner").where(
        F.col("af").isNotNull() & (F.col("af") > 0) & (F.col("af") < 1)
    )
    m = loadings.count()
    gt = F.col(ENTRIES).getField(x_field)
    af = F.col("af")
    denom = F.sqrt(F.lit(float(m)) * 2.0 * af * (1.0 - af))
    gt_norm = F.transform(gt, lambda g: (g.cast("double") - 2.0 * af) / denom)
    k = len(loadings.select("loadings").first()["loadings"])
    contribs = [
        F.transform(gt_norm, lambda g: F.coalesce(g, F.lit(0.0)) * F.element_at(F.col("loadings"), i + 1)).alias(f"__c{i}")
        for i in range(k)
    ]
    per_row = j.select(*contribs)
    from .expr.aggregators import array_sum_fixed

    n_samples = len(mt._cols)
    agg_row = per_row.agg(
        *[array_sum_fixed(F.col(f"__c{i}"), n_samples).alias(f"__s{i}") for i in range(k)]
    ).collect()[0]
    scores = np.array([agg_row[f"__s{i}"] for i in range(k)]).T  # n_samples × k
    spark = mt._df.sparkSession
    return spark.createDataFrame(
        [
            {**{kf: c[kf] for kf in mt._col_key}, "scores": scores[i].tolist()}
            for i, c in enumerate(mt._cols)
        ]
    )


# ---------------------------------------------------------------------- #
# trio phasing (ref experimental/phase_by_transmission.py)
# ---------------------------------------------------------------------- #
def phase_by_transmission(kid, dad, mom) -> Column:
    """Biallelic-autosome phase-by-transmission (ref
    experimental/phase_by_transmission.py:16), on n_alt-coded diploid
    GTs.  Returns array of 3 phased calls
    struct(a1, a2, phased=true) ordered [proband, father, mother]:
    proband is father_allele|mother_allele, parents are
    transmitted|untransmitted.  Missing (null) when the trio cannot be
    phased: any call missing, a Mendelian violation, or all three
    heterozygous (the reference's unphasable cases 1-3)."""

    def c(x):
        return F.col(x) if isinstance(x, str) else x

    k, d, m = c(kid), c(dad), c(mom)

    def pcall(a1, a2):
        return F.struct(
            F.lit(a1).alias("a1") if isinstance(a1, int) else a1.alias("a1"),
            F.lit(a2).alias("a2") if isinstance(a2, int) else a2.alias("a2"),
            F.lit(True).alias("phased"),
        )

    def parent_phased(g, transmitted):
        # transmitted|untransmitted from an n_alt-coded genotype
        other = F.when(g == 1, 1 - transmitted).otherwise(
            F.when(g == 0, F.lit(0)).otherwise(F.lit(1))
        )
        return pcall(transmitted if isinstance(transmitted, Column) else F.lit(transmitted), other)

    # transmitted allele from each parent given kid's genotype
    # kid=0 -> (0,0); kid=2 -> (1,1); kid=1 -> one parent gave the alt:
    #   decidable unless both parents are het
    dad_can_0 = d < 2
    dad_can_1 = d > 0
    mom_can_0 = m < 2
    mom_can_1 = m > 0

    t_dad = (
        F.when(k == 0, F.lit(0))
        .when(k == 2, F.lit(1))
        .when((k == 1) & (d == 2), F.lit(1))
        .when((k == 1) & (d == 0), F.lit(0))
        .when((k == 1) & (m == 2), F.lit(0))   # alt came from mom
        .when((k == 1) & (m == 0), F.lit(1))
    )
    t_mom = (
        F.when(k == 0, F.lit(0))
        .when(k == 2, F.lit(1))
        .when((k == 1) & (m == 2), F.lit(1))
        .when((k == 1) & (m == 0), F.lit(0))
        .when((k == 1) & (d == 2), F.lit(0))
        .when((k == 1) & (d == 0), F.lit(1))
    )
    # Mendelian consistency: each parent must carry its transmitted allele
    consistent = (
        F.when(t_dad == 0, dad_can_0).otherwise(dad_can_1)
        & F.when(t_mom == 0, mom_can_0).otherwise(mom_can_1)
    )
    phasable = (
        k.isNotNull()
        & d.isNotNull()
        & m.isNotNull()
        & t_dad.isNotNull()
        & t_mom.isNotNull()
        & consistent
    )
    kid_phased = pcall(t_dad, t_mom)
    dad_phased = parent_phased(d, t_dad)
    mom_phased = parent_phased(m, t_mom)
    return F.when(phasable, F.array(kid_phased, dad_phased, mom_phased))


def phase_trio_matrix_by_transmission(tm: MatrixTable) -> MatrixTable:
    """Annotate a trio MatrixTable's entries with `phased_calls` (ref
    experimental/phase_by_transmission.py:209) — one pure-Column
    transform over the trio entries array, no shuffle."""
    e = F.col(ENTRIES)
    new = F.transform(
        e,
        lambda t: t.withField(
            "phased_calls",
            phase_by_transmission(
                t["proband_entry"]["GT"], t["father_entry"]["GT"], t["mother_entry"]["GT"]
            ),
        ),
    )
    return tm._with_df(tm._df.withColumn(ENTRIES, new))


def explode_trio_matrix(
    tm: MatrixTable, keep_trio_cols: bool = True, keep_trio_entries: bool = False
) -> MatrixTable:
    """Split a trio MatrixTable back into a sample MatrixTable (ref
    experimental/phase_by_transmission.py:275 `explode_trio_matrix`):
    each trio column becomes 3 sample columns (proband, father,
    mother); entries are re-gathered per member.  Pure Column array
    rebuild on the driver-side column metadata — no shuffle."""
    members = [("id", "proband_entry"), ("pat_id", "father_entry"), ("mat_id", "mother_entry")]
    new_cols = []
    slots = []
    for ti, trio in enumerate(tm._cols):
        for id_field, entry_field in members:
            col = {"s": trio[id_field]}
            if keep_trio_cols:
                col["source_trio"] = dict(trio)
            new_cols.append(col)
            slots.append((ti, entry_field))
    e = F.col(ENTRIES)
    trio_entry_type = tm._df.schema[ENTRIES].dataType.elementType
    member_fields = [f.name for f in trio_entry_type["proband_entry"].dataType.fields]
    parts = []
    for ti, ef in slots:
        base = e[ti][ef]
        if keep_trio_entries:
            base = F.struct(
                *[base[f].alias(f) for f in member_fields],
                e[ti].alias("source_trio_entry"),
            )
        parts.append(base)
    out = tm._df.withColumn(ENTRIES, F.array(*parts))
    return MatrixTable(out, tm._row_key, new_cols, ("s",), tm._globals)


# ---------------------------------------------------------------------- #
# export_entries_by_col (ref experimental/export_entries_by_col.py)
# ---------------------------------------------------------------------- #
def export_entries_by_col(mt: MatrixTable, path: str, batch_size: int = 256) -> None:
    """Write one delimited file tree per column (ref
    experimental/export_entries_by_col.py:9): the entries long table is
    written once, hash-partitioned BY COLUMN KEY via partitionBy — a
    single distributed write that fans out per-sample directories,
    instead of one job per column."""
    long = mt.entries()
    ck = list(mt._col_key)
    flat = long.df
    for c in flat.columns:
        if flat.schema[c].dataType.simpleString().startswith("struct"):
            sub = flat.schema[c].dataType
            flat = flat.select(
                *[x for x in flat.columns if x != c],
                *[F.col(c)[f.name].alias(f"{c}.{f.name}") for f in sub.fields],
            )
    (
        flat.repartition(*[F.col(k) for k in ck])
        .write.mode("overwrite")
        .partitionBy(*ck)
        .option("sep", "\t")
        .option("header", True)
        .csv(path)
    )


# ---------------------------------------------------------------------- #
# tidyr: gather / spread / separate (ref experimental/tidyr.py)
# ---------------------------------------------------------------------- #
def gather(ht: Table, key: str, value: str, *fields: str) -> Table:
    """Wide → long (ref tidyr.py:8 `gather`): the listed field columns
    collapse into (key, value) pairs — a stack() generator, one
    map-only stage."""
    keep = [c for c in ht.df.columns if c not in fields]
    n = len(fields)
    args = ", ".join(f"'{f}', `{f}`" for f in fields)
    df = ht.df.select(
        *keep, F.expr(f"stack({n}, {args}) as (`{key}`, `{value}`)")
    )
    return Table(df, tuple(k for k in ht.key if k in keep))


def spread(ht: Table, field: str, value: str, key: Sequence[str] | None = None) -> Table:
    """Long → wide (ref tidyr.py:44 `spread`): distinct values of
    `field` become columns holding `value` — groupBy().pivot(), one
    shuffle with map-side distinct of the pivot domain."""
    key = list(key or ht.key)
    others = [c for c in ht.df.columns if c not in (*key, field, value)]
    df = (
        ht.df.groupBy(*key, *others)
        .pivot(field)
        .agg(F.first(value))
    )
    return Table(df, tuple(key))


def separate(ht: Table, field: str, into: Sequence[str], delim: str) -> Table:
    """Split one string column into several (ref tidyr.py:102
    `separate`) — a single split() projection."""
    parts = F.split(F.col(field), delim)
    df = ht.df.select(
        *[c for c in ht.df.columns if c != field],
        *[F.element_at(parts, i + 1).alias(name) for i, name in enumerate(into)],
    )
    return Table(df, tuple(k for k in ht.key if k != field))


# ---------------------------------------------------------------------- #
# simulate_phenotypes (ref experimental/ldscsim.py:46)
# ---------------------------------------------------------------------- #
def simulate_phenotypes(
    mt: MatrixTable,
    h2: float,
    pi: float | None = None,
    seed: int = 0,
    x_field: str = "GT",
) -> DataFrame:
    """Simulate a heritable phenotype (ref ldscsim.py:46
    `simulate_phenotypes`, infinitesimal and spike-&-slab models):
    β_v ~ N(0, h2/(M·pi)) with probability pi (else 0), genotypes are
    per-variant standardized, y_s = Σ_v X_norm[v,s]·β_v + ε_s with
    ε ~ N(0, 1−h2).

    Spark shape: β is a deterministic per-row hash draw (xxhash64 →
    normal via the existing rand machinery's inverse-CDF), the
    genetic component is one elementwise array-sum aggregation over
    the entries array, ε is a driver-side seeded draw per sample
    (n_samples is metadata-scale).  One pass, no shuffle."""
    from .expr import functions as hf
    from .expr.aggregators import array_sum_fixed

    if not 0 <= h2 <= 1:
        raise ValueError("h2 must be in [0, 1]")
    pi = 1.0 if pi is None else pi
    m = mt._df.count()
    e = F.col(ENTRIES).getField(x_field)
    n = len(mt._cols)
    key_cols = [F.col(k) for k in mt._row_key]
    u_beta = hf.rand_unif(F.xxhash64(*key_cols, F.lit("beta"), F.lit(seed)))
    u_slab = hf.rand_unif(F.xxhash64(*key_cols, F.lit("slab"), F.lit(seed)))
    from .expr import stats as hstats

    z = hstats.qnorm_udf(u_beta)
    beta = F.when(u_slab < F.lit(pi), z * F.lit(float(np.sqrt(h2 / (m * pi))))).otherwise(
        F.lit(0.0)
    )
    # beta uses a pandas UDF, which Spark forbids inside HOF lambdas:
    # evaluate it in a first projection, reference the column after
    pre = mt._df.select(e.alias("__g"), beta.alias("__beta"))
    g_arr = F.col("__g")
    # per-variant standardization from the row's own entries
    stats_ = F.aggregate(
        g_arr,
        F.struct(F.lit(0).alias("n"), F.lit(0.0).alias("s"), F.lit(0.0).alias("ss")),
        lambda acc, g: F.when(
            g.isNotNull(),
            F.struct(
                (acc["n"] + 1).alias("n"),
                (acc["s"] + g).alias("s"),
                (acc["ss"] + g * g).alias("ss"),
            ),
        ).otherwise(acc),
    )
    mean = stats_["s"] / F.nullif(stats_["n"].cast("double"), F.lit(0.0))
    var = stats_["ss"] / F.nullif(stats_["n"].cast("double"), F.lit(0.0)) - mean * mean
    sd = F.sqrt(F.nullif(var, F.lit(0.0)))
    contrib = F.transform(
        g_arr, lambda g: F.coalesce((g.cast("double") - mean) / sd, F.lit(0.0)) * F.col("__beta")
    )
    agg = (
        pre.select(contrib.alias("__c"))
        .agg(array_sum_fixed(F.col("__c"), n).alias("g"))
        .collect()[0]
    )
    genetic = np.array(agg["g"] if agg["g"] is not None else [0.0] * n)
    rng = np.random.default_rng(seed)
    eps = rng.standard_normal(n) * float(np.sqrt(max(1.0 - h2, 0.0)))
    y = genetic + eps
    spark = mt._df.sparkSession
    return spark.createDataFrame(
        [
            {**{kf: c[kf] for kf in mt._col_key}, "y": float(y[i])}
            for i, c in enumerate(mt._cols)
        ]
    )


# ---------------------------------------------------------------------- #
# define_function (ref experimental/function.py:30)
# ---------------------------------------------------------------------- #
def define_function(fn, *_arg_types, **_kw):
    """Reference parity (ref experimental/function.py:30): upstream
    registers a reusable IR function; here lambdas already build
    Column trees, so a plain Python function IS the reusable form."""
    return fn
