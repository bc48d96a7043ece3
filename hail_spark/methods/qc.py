"""QC method library — pure compositions over MatrixTable ops.

Parity target: hail/python/hail/methods/qc.py (sample_qc :59,
variant_qc :219). Both are aggregate compositions: variant_qc is a
row-wise entry aggregation (array HOFs, one pass, no shuffle);
sample_qc is a per-column aggregation (posexplode + groupBy col index).

Genotype calls use the int encoding of SURVEY.md §2.9 (biallelic:
0 = hom-ref, 1 = het, 2 = hom-var, NULL = missing).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..matrixtable import ENTRIES, MatrixTable


def _defined(arr: Column, f) -> Column:
    return F.filter(arr, lambda e: e.isNotNull() & f(e).isNotNull())


def variant_qc(mt: MatrixTable, gt_field: str = "GT", name: str = "variant_qc") -> MatrixTable:
    """Per-row (variant) QC: call_rate, n_called, n_het, n_hom_ref,
    n_hom_var, AC/AF/AN (ref qc.py:219). One pass over the entries
    array per row — stays in whole-stage codegen."""

    def stats(entries: Column) -> dict[str, Column]:
        gts = F.transform(entries, lambda e: e[gt_field])
        called = F.filter(gts, lambda g: g.isNotNull())
        n_called = F.size(called)
        n_total = F.size(gts)
        n_het = F.size(F.filter(called, lambda g: g == 1))
        n_hom_ref = F.size(F.filter(called, lambda g: g == 0))
        n_hom_var = F.size(F.filter(called, lambda g: g == 2))
        an = (n_called * 2).cast("int")
        ac1 = F.aggregate(called, F.lit(0), lambda a, g: a + g).cast("int")
        qc = F.struct(
            (n_called.cast("double") / n_total).alias("call_rate"),
            n_called.cast("int").alias("n_called"),
            (n_total - n_called).cast("int").alias("n_not_called"),
            n_het.cast("int").alias("n_het"),
            n_hom_ref.cast("int").alias("n_hom_ref"),
            n_hom_var.cast("int").alias("n_hom_var"),
            an.alias("AN"),
            F.array((an - ac1), ac1).alias("AC"),
            F.array(
                F.when(an > 0, (an - ac1) / an),
                F.when(an > 0, ac1 / an),
            ).alias("AF"),
            F.when(n_called > 0, n_het / n_called).alias("het_freq"),
        )
        return {name: qc}

    return mt.annotate_rows_agg_entries(stats)


def sample_qc(mt: MatrixTable, gt_field: str = "GT"):
    """Per-column (sample) QC DataFrame: n_called, call_rate, n_het,
    n_hom_ref, n_hom_var, n_non_ref (ref qc.py:59). posexplode +
    groupBy col index (the distributed wide-aggregation path)."""
    n_rows_col = F.count(F.lit(1))
    return mt.aggregate_cols_elementwise(
        {
            "n_total": lambda e: F.count(F.lit(1)),
            "n_called": lambda e: F.count(e[gt_field]),
            "n_het": lambda e: F.count(F.when(e[gt_field] == 1, 1)),
            "n_hom_ref": lambda e: F.count(F.when(e[gt_field] == 0, 1)),
            "n_hom_var": lambda e: F.count(F.when(e[gt_field] == 2, 1)),
            "n_non_ref": lambda e: F.count(F.when(e[gt_field] > 0, 1)),
            "call_rate": lambda e: (
                F.count(e[gt_field]).cast("double") / F.count(F.lit(1))
            ),
        }
    )


def hwe_expected_het_freq(af: Column) -> Column:
    """2p(1-p) — expected het frequency under HWE."""
    return 2.0 * af * (1.0 - af)


def summarize_variants(mt) -> dict:
    """Per-allele-type counts + ti/tv ratio (ref qc.py:1725).
    One pass: explode alt alleles, hash-agg on the derived category."""
    from pyspark.sql import functions as F

    from ..expr import functions as hf

    alts = mt._df.select(
        F.element_at("alleles", 1).alias("ref"),
        F.explode(F.slice("alleles", 2, 1 << 20)).alias("alt"),
    )
    typed = alts.select(
        hf.allele_type(F.col("ref"), F.col("alt")).alias("t"),
        hf.is_transition(F.col("ref"), F.col("alt")).alias("ti"),
        hf.is_transversion(F.col("ref"), F.col("alt")).alias("tv"),
    )
    row = typed.agg(
        F.count(F.lit(1)).alias("n_alleles"),
        F.sum(F.when(F.col("ti"), 1).otherwise(0)).alias("n_ti"),
        F.sum(F.when(F.col("tv"), 1).otherwise(0)).alias("n_tv"),
    ).first()
    counts = {
        r["t"]: r["n"] for r in typed.groupBy("t").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    return {
        "n_variants": mt._df.count(),
        "n_alleles": row["n_alleles"],
        "allele_types": counts,
        "r_ti_tv": (row["n_ti"] / row["n_tv"]) if row["n_tv"] else float("nan"),
    }


def compute_charr(
    mt: MatrixTable,
    min_af: float = 0.05,
    max_af: float = 0.95,
    min_dp: int = 10,
    max_dp: int = 100,
    min_gq: int = 20,
    ref_af_field: str | None = None,
    gt_field: str = "GT",
    ad_field: str = "AD",
) -> "DataFrame":
    """CHARR DNA-contamination estimator (ref qc.py:1822-1937).

    Per sample: mean over filtered hom-var entries of
    ``(AD[0] / (AD[0]+AD[1])) / ref_AF`` — hom-var sites should carry no
    ref reads, so the ref-read fraction scaled by the population ref
    allele frequency estimates the contaminating fraction.

    Row filter: biallelic with ref_AF in (min_af, max_af); entry filter:
    hom-var, GQ >= min_gq, DP (or AD sum) in [min_dp, max_dp].  ref_AF
    comes from ``ref_af_field`` if given (the reference requires an
    external AF below 10k samples but we default to the in-sample
    estimate: 1 - sum(GT)/2N over called entries).

    One posexplode + groupBy(sample index) — the same single-shuffle
    wide-aggregation shape as sample_qc.
    """
    from pyspark.sql import DataFrame  # noqa: F401

    df = mt._df
    ents = F.col(ENTRIES)
    if ref_af_field:
        ref_af = F.col(ref_af_field)
    else:
        gts = F.filter(F.transform(ents, lambda e: e[gt_field]), lambda g: g.isNotNull())
        an = 2 * F.size(gts)
        ref_af = F.when(
            an > 0,
            1.0 - F.aggregate(gts, F.lit(0), lambda a, g: a + g).cast("double") / an,
        )
    filtered = df.where(F.size("alleles") == 2) if "alleles" in df.columns else df
    long = (
        filtered.select(ref_af.alias("__raf"), ents.alias("__es"))
        .where((F.col("__raf") > min_af) & (F.col("__raf") < max_af))
        .select("__raf", F.posexplode("__es").alias("__idx", "__e"))
    )
    e = F.col("__e")
    dp = F.coalesce(e["DP"] if "DP" in _entry_names(mt) else F.lit(None).cast("int"),
                    F.element_at(e[ad_field], 1) + F.element_at(e[ad_field], 2))
    kept = long.where(
        (e[gt_field] == 2)
        & (e["GQ"] >= min_gq)
        & dp.between(min_dp, max_dp)
        & e[ad_field].isNotNull()
    )
    ad0 = F.element_at(e[ad_field], 1).cast("double")
    ad1 = F.element_at(e[ad_field], 2).cast("double")
    per_idx = kept.groupBy("__idx").agg(
        F.avg((ad0 / (ad0 + ad1)) / F.col("__raf")).alias("charr")
    )
    spark = df.sparkSession
    col_df = spark.createDataFrame([{"__idx": i, **c} for i, c in enumerate(mt._cols)])
    return (
        per_idx.join(F.broadcast(col_df), on="__idx", how="right")
        .select(*[k for k in mt._col_key], "charr")
    )


def _entry_names(mt: MatrixTable) -> list[str]:
    return [f.name for f in mt._df.schema[ENTRIES].dataType.elementType.fields]
