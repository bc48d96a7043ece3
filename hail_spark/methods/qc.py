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
