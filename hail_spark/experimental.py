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


# ---------------------------------------------------------------------- #
# ld_score_regression (ref experimental/ld_score_regression.py:17)
# ---------------------------------------------------------------------- #
def ld_score_regression(
    ht: Table,
    weight_col: str,
    ld_score_col: str,
    chi_sq_col: str,
    n_col: str,
    n_blocks: int = 200,
    two_step_threshold: int = 30,
    n_reference_panel_variants: int | None = None,
) -> dict:
    """LD score regression (Bulik-Sullivan et al. 2015; ref
    experimental/ld_score_regression.py:17): intercept + SNP
    heritability via the two-step estimator — step 1 fits
    intercept+slope on variants with χ² < threshold, step 2 fixes the
    intercept and re-fits the slope on all variants; standard errors
    come from an n_blocks contiguous block jackknife; the final slope
    SE combines both steps through the reference's c-correction.

    Spark shape: each of the 3+3 IRLS iterations is ONE hash
    aggregation producing per-block sufficient statistics
    (Σw, Σwx, Σwx², Σwy, Σwxy — 5 doubles × n_blocks); the weighted
    OLS solves and the jackknife are driver math over those
    n_blocks×5 partials, so driver traffic is O(n_blocks), never
    O(variants).  Block ids come from the distributed two-pass scan
    (rank of each included variant in key order), matching the
    reference's scan-based separator assignment."""
    from .operators.scans import scan_multi

    M_override = n_reference_panel_variants
    df = ht.df.where(
        F.col(weight_col).isNotNull() & F.col(ld_score_col).isNotNull()
    )
    base = Table(
        df.select(
            *[F.col(k) for k in ht.key],
            F.col(ld_score_col).alias("__x"),
            F.greatest(F.col(ld_score_col), F.lit(1.0)).alias("__x_floor"),
            F.greatest(F.col(weight_col), F.lit(1.0)).alias("__w_floor"),
            F.col(chi_sq_col).alias("__y"),
            F.col(n_col).cast("double").alias("__n"),
        ),
        ht.key,
    )
    base = base.annotate(
        __in1=(F.col("__y").isNotNull() & (F.col("__y") < float(two_step_threshold))),
        __in2=F.col("__y").isNotNull(),
    )
    # distributed prefix ranks in key order -> contiguous jackknife blocks
    base = scan_multi(
        base,
        {
            "__r1": ("sum", F.col("__in1").cast("long")),
            "__r2": ("sum", F.col("__in2").cast("long")),
        },
    )
    tot = base.df.agg(
        F.count(F.when(F.col("__in1"), 1)).alias("m1"),
        F.count(F.when(F.col("__in2"), 1)).alias("m2"),
        F.count(F.lit(1)).alias("m_all"),
        F.avg(F.when(F.col("__in2"), F.col("__y"))).alias("mean_y"),
        F.avg(F.when(F.col("__in2"), F.col("__x"))).alias("mean_x"),
        F.avg(F.when(F.col("__in2"), F.col("__n"))).alias("mean_n"),
    ).collect()[0]
    m1, m2 = tot["m1"], tot["m2"]
    M = M_override or tot["m_all"]
    mean_n = tot["mean_n"]
    if m1 < n_blocks or m2 < n_blocks:
        raise ValueError("ld_score_regression: fewer included variants than blocks")

    def blk(rank_col: str, m: int) -> Column:
        b = F.floor(F.col(rank_col) * n_blocks / F.lit(float(m))).cast("int")
        return F.least(b, F.lit(n_blocks - 1))

    work = base.df.select(
        "__x", "__x_floor", "__w_floor", "__y", "__n", "__in1", "__in2",
        blk("__r1", m1).alias("__b1"),
        blk("__r2", m2).alias("__b2"),
    ).persist()
    work.count()

    initial = [1.0, (tot["mean_y"] - 1.0) / tot["mean_x"]]

    def wexpr(betas: list[float], flag: str) -> Column:
        pred = F.lit(betas[0]) + F.lit(betas[1]) * F.col("__x_floor")
        return F.when(
            F.col(flag), 1.0 / (F.col("__w_floor") * 2.0 * pred * pred)
        ).otherwise(F.lit(0.0))

    def block_sums(w: Column, y: Column, flag: str, block: str) -> np.ndarray:
        rows = (
            work.where(F.col(flag))
            .groupBy(block)
            .agg(
                F.sum(w).alias("sw"),
                F.sum(w * F.col("__x")).alias("swx"),
                F.sum(w * F.col("__x") * F.col("__x")).alias("swxx"),
                F.sum(w * y).alias("swy"),
                F.sum(w * F.col("__x") * y).alias("swxy"),
            )
            .collect()
        )
        out = np.zeros((n_blocks, 5))
        for r in rows:
            out[r[block]] = [r["sw"], r["swx"], r["swxx"], r["swy"], r["swxy"]]
        return out

    def solve2(s: np.ndarray) -> list[float]:
        # weighted OLS of y on [1, x] from [Σw, Σwx, Σwx², Σwy, Σwxy]
        A = np.array([[s[0], s[1]], [s[1], s[2]]])
        b = np.array([s[3], s[4]])
        return np.linalg.solve(A, b).tolist()

    # ---- step 1: intercept + slope on χ² < threshold
    s1_betas = list(initial)
    s1_blocks = None
    for _ in range(3):
        w = wexpr(s1_betas, "__in1")
        s1_blocks = block_sums(w, F.col("__y"), "__in1", "__b1")
        s1_betas = solve2(s1_blocks.sum(axis=0))
        h2 = min(max(s1_betas[1] * M / mean_n, 0.0), 1.0)
        s1_betas = [s1_betas[0], h2 * mean_n / M]

    s1_block_betas = [
        solve2(s1_blocks.sum(axis=0) - s1_blocks[i]) for i in range(n_blocks)
    ]
    s1_bc = np.array(
        [
            [n_blocks * s1_betas[k] - (n_blocks - 1) * bb[k] for k in range(2)]
            for bb in s1_block_betas
        ]
    )
    s1_jk_mean = s1_bc.mean(axis=0)
    s1_jk_var = (
        (s1_bc**2).sum(axis=0) - s1_bc.sum(axis=0) ** 2 / n_blocks
    ) / (n_blocks - 1) / n_blocks

    # ---- step 2: slope only, intercept fixed at step-1 intercept
    s2_betas = list(initial)
    s2_blocks = None
    yprime = F.col("__y") - F.lit(s1_betas[0])
    for _ in range(3):
        w = wexpr(s2_betas, "__in2")
        yprime = F.col("__y") - F.lit(s1_betas[0])
        s2_blocks = block_sums(w, yprime, "__in2", "__b2")
        tot2 = s2_blocks.sum(axis=0)
        slope = tot2[4] / tot2[2]
        h2 = min(max(slope * M / mean_n, 0.0), 1.0)
        s2_betas = [s1_betas[0], h2 * mean_n / M]

    s2_block_betas = np.array(
        [
            (s2_blocks.sum(axis=0) - s2_blocks[i])[4]
            / (s2_blocks.sum(axis=0) - s2_blocks[i])[2]
            for i in range(n_blocks)
        ]
    )
    s2_bc = n_blocks * s2_betas[1] - (n_blocks - 1) * s2_block_betas

    # ---- combine (reference's c-correction couples the two jackknives)
    w0 = wexpr(initial, "__in2")
    cagg = work.where(F.col("__in2")).agg(
        F.sum(w0 * F.col("__x")).alias("a"),
        F.sum(w0 * F.col("__x") * F.col("__x")).alias("b"),
    ).collect()[0]
    c = cagg["a"] / cagg["b"]
    final_betas = [s1_betas[0], s2_betas[1]]
    final_block = np.array(
        [
            s2_block_betas[i] - c * (s1_block_betas[i][0] - final_betas[0])
            for i in range(n_blocks)
        ]
    )
    final_bc = n_blocks * final_betas[1] - (n_blocks - 1) * final_block
    final_var = (
        (final_bc**2).sum() - final_bc.sum() ** 2 / n_blocks
    ) / (n_blocks - 1) / n_blocks

    mean_chi_sq = tot["mean_y"]
    work.unpersist()
    return {
        "mean_chi_sq": float(mean_chi_sq),
        "intercept": {
            "estimate": float(final_betas[0]),
            "standard_error": float(np.sqrt(s1_jk_var[0])),
        },
        "snp_heritability": {
            "estimate": float((M / mean_n) * final_betas[1]),
            "standard_error": float(np.sqrt((M / mean_n) ** 2 * final_var)),
        },
    }


# ---------------------------------------------------------------------- #
# sparse_split_multi (ref experimental/sparse_mt/sparse_split_multi.py:4)
# ---------------------------------------------------------------------- #
def sparse_split_multi(vmt: MatrixTable, filter_changed_loci: bool = False) -> MatrixTable:
    """Split multiallelic variants on a local-allele (sparse) MatrixTable
    — the combiner's variant_data with LGT/LA/LAD/LPL fields (ref
    experimental/sparse_mt/sparse_split_multi.py:4).

    Per alternate allele i the row splits into a biallelic min-repped
    row (a_index=i, was_split for 3+-allele rows); entry fields are
    re-derived from the local-allele representation: GT is the
    downcoded dosage of global allele i, AD collapses LAD to
    [other, allele-i], PL[g] is the min LPL over local genotype pairs
    that downcode to dosage g, GQ is recomputed from the new PL.  A
    sample whose LA set lacks allele i downcodes to hom-ref with
    missing PL (the reference's contract).  Star alleles are NOT
    filtered (unlike split_multi_hts).

    Spark shape: splitting is a per-row transform+explode (map-only);
    the entry rework is a pure-Column transform over the entries array
    — no UDF, no shuffle.  ``filter_changed_loci``: min_rep here only
    trims (position can only move right); rows whose min-repped
    position differs are errors upstream, so they are dropped when the
    flag is set and surfaced as nulls otherwise."""
    from .expr import functions as hf

    df = vmt._df
    al = F.col("alleles")
    pos = F.col("locus")["position"]
    nalt = F.size(al) - 1

    def split_struct(i: Column) -> Column:
        mr = hf.min_rep(pos, al[0], al[i + 1])
        st = F.struct(
            F.array(mr["ref"], mr["alt"]).alias("alleles"),
            (i + 1).alias("a_index"),
            F.lit(True).alias("was_split"),
            mr["position"].alias("new_pos"),
        )
        if filter_changed_loci:
            return F.when(mr["position"] == pos, st)
        return st

    unsplit = F.array(
        F.struct(
            al.alias("alleles"),
            F.lit(1).alias("a_index"),
            F.lit(False).alias("was_split"),
            pos.alias("new_pos"),
        )
    )
    # sort split rows by their new allele pair, like the reference
    splits = F.when(nalt < 2, unsplit).otherwise(
        F.array_sort(
            F.filter(
                F.transform(F.sequence(F.lit(0), nalt - 1), split_struct),
                lambda s: s.isNotNull(),
            )
        )
    )
    ex = df.withColumn("__split", F.explode(splits))

    i_g = F.col("__split")["a_index"]
    la = lambda e: e["LA"]

    def new_entry(e: Column) -> Column:
        # 1-based position of global allele i in LA -> 0-based local index
        p1 = F.array_position(la(e), i_g)
        local_a = F.when(p1 > 0, (p1 - 1).cast("int"))
        gt = F.when(
            e["LGT"].isNotNull(),
            F.size(
                F.filter(e["LGT"], lambda a: F.element_at(la(e), a + 1) == i_g)
            ),
        )
        ad_i = F.coalesce(
            F.when(local_a.isNotNull(), F.element_at(e["LAD"], local_a + 1)), F.lit(0)
        )
        ad = F.when(
            e["LAD"].isNotNull(),
            F.array(
                F.aggregate(e["LAD"], F.lit(0), lambda acc, x: acc + x) - ad_i, ad_i
            ),
        )
        nla = F.size(la(e))
        tri = (nla * (nla + 1) / 2).cast("int")

        def pl_for(g: Column) -> Column:
            # min LPL over local diploid pairs whose downcode-count == g
            def count_of(j: Column) -> Column:
                pair = hf.unphased_diploid_gt_index_call(j)
                return (
                    F.when(pair["j"] == local_a, 1).otherwise(0)
                    + F.when(pair["k"] == local_a, 1).otherwise(0)
                )

            cands = F.filter(
                F.sequence(F.lit(0), tri - 1), lambda j: count_of(j) == g
            )
            return F.array_min(
                F.transform(cands, lambda j: F.element_at(e["LPL"], j + 1))
            )

        pl = F.when(
            e["LPL"].isNotNull() & local_a.isNotNull() & (F.size(e["LGT"]) == 2),
            F.transform(F.sequence(F.lit(0), F.lit(2)), pl_for),
        )
        gq = F.coalesce(hf.gq_from_pl(pl), e["GQ"])
        return F.struct(
            gt.alias("GT"),
            e["phased"].alias("phased"),
            ad.alias("AD"),
            e["DP"].alias("DP"),
            gq.alias("GQ"),
            pl.alias("PL"),
        )

    out = ex.select(
        F.struct(
            F.col("locus")["contig"].alias("contig"),
            F.col("__split")["new_pos"].alias("position"),
        ).alias("locus"),
        F.col("__split")["alleles"].alias("alleles"),
        F.col("__split")["a_index"].alias("a_index"),
        F.col("__split")["was_split"].alias("was_split"),
        *[c for c in df.columns if c not in ("locus", "alleles", ENTRIES)],
        F.transform(F.col(ENTRIES), new_entry).alias(ENTRIES),
    )
    return MatrixTable(out, ("locus", "alleles"), vmt._cols, vmt._col_key, vmt._globals)


# ---------------------------------------------------------------------- #
# densify (ref experimental/sparse_mt/densify.py:4)
# ---------------------------------------------------------------------- #
def densify(sparse_mt: MatrixTable) -> MatrixTable:
    """Expand reference blocks of a sparse MatrixTable into dense
    entries (ref experimental/sparse_mt/densify.py:4): for EVERY row
    (reference-block rows included), a sample's missing entry is filled
    with the most recent earlier entry whose END covers the position;
    the END field is dropped.  Entries are copied verbatim (GT stays
    missing on filled block entries — unlike VDS.to_dense_mt's
    hom-ref fill).

    Spark shape: the reference runs a per-sample backward scan; here
    END-carrying entries become a coverage relation once (posexplode),
    bucketed into fixed-width position bins, and every site picks its
    latest covering block per sample through a banded hash equi-join +
    max_by — no ordered scan state, AQE-splittable.  Like the
    reference, duplicate loci are not handled (a block starting at the
    same position as a later row does not fill it)."""
    from .vds import _BIN

    df = sparse_mt._df
    rk = list(sparse_mt._row_key)
    efields = [f.name for f in df.schema[ENTRIES].dataType.elementType.fields]
    if "END" not in efields:
        raise ValueError("densify requires an END entry field")
    keep_fields = [f for f in efields if f != "END"]

    contig = F.col("locus")["contig"]
    pos = F.col("locus")["position"]

    blocks = (
        df.select(
            contig.alias("__c"),
            pos.alias("__start"),
            F.posexplode(ENTRIES).alias("__s", "__be"),
        )
        .filter(F.col("__be")["END"].isNotNull())
        .select("__c", "__start", "__s", "__be", F.col("__be")["END"].alias("__end"))
    )
    binned = blocks.select(
        "*",
        F.explode(
            F.sequence(
                (F.col("__start") / _BIN).cast("bigint"),
                (F.col("__end") / _BIN).cast("bigint"),
            )
        ).alias("__bin"),
    )
    sites = df.select(
        *rk,
        contig.alias("__c"),
        pos.alias("__p"),
        (pos / _BIN).cast("bigint").alias("__bin"),
    )
    hits = (
        sites.join(binned, on=["__c", "__bin"], how="inner")
        .filter((F.col("__start") < F.col("__p")) & (F.col("__end") >= F.col("__p")))
        .groupBy(*rk, "__s")
        .agg(F.max_by("__be", "__start").alias("__fill"))
        .groupBy(*rk)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("__s", "__fill"))
            ).alias("__refmap")
        )
    )
    joined = df.join(hits, on=rk, how="left")

    def out_entry(e, i):
        src = F.coalesce(e, F.col("__refmap")[i])
        return F.when(
            src.isNotNull(), F.struct(*[src[f].alias(f) for f in keep_fields])
        )

    idxs = F.sequence(F.lit(0), F.lit(len(sparse_mt._cols) - 1))
    dense = joined.select(
        *[c for c in df.columns if c != ENTRIES],
        F.transform(
            idxs, lambda i: out_entry(F.element_at(F.col(ENTRIES), i + 1), i)
        ).alias(ENTRIES),
    )
    return MatrixTable(
        dense, sparse_mt._row_key, sparse_mt._cols, sparse_mt._col_key, sparse_mt._globals
    )


# ---------------------------------------------------------------------- #
# BlockMatrix multi-write (ref experimental/write_multiple.py)
# ---------------------------------------------------------------------- #
def write_block_matrices(bms: Sequence, prefix: str, overwrite: bool = False) -> None:
    """Write several BlockMatrices under numbered paths (ref
    experimental/write_multiple.py `write_block_matrices`)."""
    for i, bm in enumerate(bms):
        bm.write(f"{prefix}{i}", overwrite=overwrite)


def export_block_matrices(
    bms: Sequence, prefix: str, delimiter: str = "\t"
) -> None:
    """Export BlockMatrices as delimited text (ref
    experimental/write_multiple.py `export_block_matrices` /
    `block_matrices_tofiles`): each matrix's entries stream out as one
    distributed CSV write of its long form (i, j, value) — never
    collected."""
    for i, bm in enumerate(bms):
        (
            bm.to_long()
            .orderBy("i", "j")
            .write.mode("overwrite")
            .option("sep", delimiter)
            .option("header", True)
            .csv(f"{prefix}{i}")
        )


block_matrices_tofiles = export_block_matrices


# ---------------------------------------------------------------------- #
# mt_to_table_of_ndarray (ref experimental/table_ndarray_utils.py)
# ---------------------------------------------------------------------- #
def mt_to_table_of_ndarray(
    mt: MatrixTable, x_field: str = "GT", block_size: int = 64
) -> DataFrame:
    """Group rows into blocks of `block_size` and pack the entry matrix
    of each block as an ndarray struct (ref
    experimental/table_ndarray_utils.py `mt_to_table_of_ndarray` — the
    blanczos input shape).  One pass: distributed add_index, integer
    division for the block id, collect_list gather per block."""
    from .operators import scans
    from .table import Table as HTable

    t = HTable(mt._df, mt._row_key)
    t = scans.add_index(t, "__idx")
    df = t.df.withColumn("__block", (F.col("__idx") / block_size).cast("bigint"))
    packed = (
        df.select(
            "__block",
            "__idx",
            F.col(ENTRIES).getField(x_field).alias("__row"),
        )
        .groupBy("__block")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__idx"), F.col("__row")))
            ).alias("__rows")
        )
        .select(
            "__block",
            F.struct(
                F.array(
                    F.size(F.col("__rows")).cast("bigint"),
                    F.size(F.col("__rows")[0]["__row"]).cast("bigint"),
                ).alias("shape"),
                F.flatten(
                    F.transform(F.col("__rows"), lambda r: r["__row"].cast("array<double>"))
                ).alias("data"),
            ).alias("ndarray"),
        )
    )
    return packed.orderBy("__block")


# ---------------------------------------------------------------------- #
# loop (ref experimental/loop.py) — IR looping construct
# ---------------------------------------------------------------------- #
def loop(f, _typ=None, *init):
    """Reference parity for hl.experimental.loop (ref
    experimental/loop.py): upstream builds a tail-recursive IR node;
    here expressions are plain Python driving Column construction, so
    a bounded Python loop IS the construct.  `f` receives a `recur`
    continuation and the loop state; iteration proceeds until `f`
    returns without calling recur (bounded at 10k steps)."""
    state = list(init)
    result = None
    for _ in range(10_000):
        called = {"flag": False}

        def recur(*new_state):
            called["flag"] = True
            return new_state

        out = f(recur, *state)
        if called["flag"] and isinstance(out, tuple):
            state = list(out)
            continue
        result = out
        break
    else:
        raise RuntimeError("loop: exceeded 10000 iterations")
    return result


# ---------------------------------------------------------------------- #
# expression IO + multi-MT write (ref experimental/expressions.py:8-63,
# write_multiple.py:11)
# ---------------------------------------------------------------------- #
def write_expression(value, path: str, overwrite: bool = False) -> None:
    """Persist an evaluated (driver-side) value as JSON (ref
    experimental/expressions.py:8 `write_expression` — upstream writes
    a 1-row table; the value here is already a Python object)."""
    import json
    import os

    if os.path.exists(path) and not overwrite:
        raise FileExistsError(f"{path} exists; pass overwrite=True")
    with open(path, "w") as fh:
        json.dump(value, fh, default=str)


def read_expression(path: str):
    """Read back a value written by write_expression (ref
    experimental/expressions.py:47)."""
    import json

    with open(path) as fh:
        return json.load(fh)


def write_matrix_tables(
    mts: Sequence[MatrixTable], prefix: str, overwrite: bool = False
) -> list[str]:
    """Write several MatrixTables under numbered paths, returning the
    paths (ref experimental/write_multiple.py:11 `write_matrix_tables`)."""
    paths = []
    for i, mt in enumerate(mts):
        p = f"{prefix}{i}.mt"
        mt.write(p, overwrite=overwrite)
        paths.append(p)
    return paths


# ---------------------------------------------------------------------- #
# namespace completion (ref experimental/__init__.py __all__)
# ---------------------------------------------------------------------- #
def init(*args, **kwargs):
    """Parity for hl.experimental.init (ref experimental/context.py:16)
    — same engine init as hail_spark.init."""
    from .session import init as _init

    return _init(*args, **kwargs)


def load_dataset(name: str, version: str, reference_genome: str = "GRCh38", region: str = "us", cloud: str = "gcp"):
    """Annotation-dataset loader (ref experimental/datasets.py:20).
    The reference streams from Hail's public cloud buckets; this
    container has no network access, so the fetch is gated — the
    call shape and error contract are preserved."""
    raise EnvironmentError(
        f"load_dataset({name!r}, {version!r}): no network access in this "
        "environment; download the dataset and read it with read_table/"
        "read_matrix_table instead"
    )


class DB:
    """Annotation database (ref experimental/db.py:267): the reference
    joins curated cloud-hosted datasets onto a table by key.  Gated
    like load_dataset — constructing is allowed (config is local), any
    fetch raises."""

    def __init__(self, *, region: str = "us", cloud: str = "gcp", url: str | None = None, config=None):
        self.region = region
        self.cloud = cloud
        self.url = url
        self.config = config

    def available_databases(self) -> list:
        return []

    def annotate_rows_db(self, rel, *names):
        raise EnvironmentError(
            "DB.annotate_rows_db: no network access in this environment"
        )


def plot_roc_curve(ht, scores, tp_label: str = "tp", fp_label: str = "fp", colors=None, title: str = "ROC Curve", hover_mode: str = "mouse"):
    """ROC data (ref experimental/plots.py:17).  Plotting backends are
    out of engine scope (SURVEY §2.12 viz) — this computes and returns
    the (fpr, tpr, auc) arrays the reference hands to bokeh.

    Scale shape (r03 verdict item 6): the table is first aggregated to
    per-distinct-score (tp, fp) counts — a distributed hash agg — and
    only the distinct-score curve points are collected and scanned
    driver-side. No unpartitioned window, no full-table collect; driver
    memory is O(distinct scores), not O(rows)."""
    df = ht.df if hasattr(ht, "df") else ht
    if isinstance(scores, str):
        scores = [scores]
    out = {}
    for s in scores:
        pts = (
            df.groupBy(F.col(s).alias("__score"))
            .agg(
                F.sum(F.col(tp_label).cast("double")).alias("tp"),
                F.sum(F.col(fp_label).cast("double")).alias("fp"),
            )
            .orderBy(F.col("__score").desc())
            .collect()
        )
        tot_tp = sum(r["tp"] or 0.0 for r in pts)
        tot_fp = sum(r["fp"] or 0.0 for r in pts)
        tpr, fpr = [], []
        ctp = cfp = 0.0
        for r in pts:
            ctp += r["tp"] or 0.0
            cfp += r["fp"] or 0.0
            tpr.append(ctp / tot_tp if tot_tp else 0.0)
            fpr.append(cfp / tot_fp if tot_fp else 0.0)
        auc = 0.0
        for i in range(1, len(pts)):
            auc += (fpr[i] - fpr[i - 1]) * (tpr[i] + tpr[i - 1]) / 2.0
        out[s] = {"fpr": fpr, "tpr": tpr, "auc": auc}
    return out


def hail_metadata(t_path: str):
    """Native-table metadata summary (ref experimental/plots.py:97 —
    there a partition-size plot; here the metadata dict itself)."""
    import json as _json
    import os as _os

    with open(_os.path.join(t_path, "_hail_spark_metadata.json")) as f:
        return _json.load(f)


def strftime(*args, **kwargs):
    from .expr.functions import strftime as _f

    return _f(*args, **kwargs)


def strptime(*args, **kwargs):
    from .expr.functions import strptime as _f

    return _f(*args, **kwargs)
