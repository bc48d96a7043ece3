"""Drive our importers against the REFERENCE'S OWN golden test
resources (hail/hail/test/resources — the 274-file corpus its
methods/test_impex.py round-trips, SURVEY §5.1).  Structural goldens
are derived from the fixture files themselves in-test (line counts,
header parses) — nothing memorized.  The GEN↔BGEN case is a true
differential: example.gen and example.8bits.bgen encode the same data,
so our text parser and our binary decoder must agree on it."""

import gzip
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

RES = "/root/reference/hail/hail/test/resources"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(RES), reason="reference resources not available"
)


def test_import_vcf_sample_vcf(spark):
    from hail_spark.io.vcf import import_vcf

    path = f"{RES}/sample.vcf"
    with open(path) as f:
        lines = f.readlines()
    data_lines = [l for l in lines if not l.startswith("#")]
    header = next(l for l in lines if l.startswith("#CHROM"))
    n_samples = len(header.rstrip("\n").split("\t")) - 9
    mt = import_vcf(spark, path)
    assert mt.count_rows() == len(data_lines)
    assert mt.count_cols() == n_samples
    # locus/alleles of the first data line round-trip
    first = data_lines[0].split("\t")
    row = mt._df.orderBy(F.col("locus.contig"), F.col("locus.position")).first()
    got = (
        mt._df.filter(
            (F.col("locus.contig") == first[0])
            & (F.col("locus.position") == int(first[1]))
        )
        .first()
    )
    assert got is not None and got["alleles"][0] == first[3]


def test_import_vcf_33alleles_split(spark):
    """33alleles.vcf is a sites-only VCF (no samples) — the rows-only
    split_multi must fan its 33-allele site into 32 biallelic rows."""
    from hail_spark.io.vcf import import_vcf
    from hail_spark.methods.genetics import split_multi
    from hail_spark.table import Table

    mt = import_vcf(spark, f"{RES}/33alleles.vcf")
    assert mt.count_cols() == 0
    n_alts = mt._df.select(F.sum(F.size("alleles") - 1).alias("n")).first()["n"]
    t = Table(mt._df.drop("__entries"), ("locus", "alleles"))
    split = split_multi(t)
    assert split.df.count() == n_alts  # one biallelic row per alt
    assert split.df.filter(F.size("alleles") != 2).count() == 0
    assert split.df.select(F.max("a_index")).first()[0] == n_alts


def test_gen_bgen_differential(spark):
    """Our GEN text parser and BGEN v1.2 binary decoder must agree on
    the reference's paired example fixtures (same underlying data)."""
    from hail_spark.io.bgen import import_bgen
    from hail_spark.io.impex import import_gen

    gen = import_gen(spark, f"{RES}/example.gen", f"{RES}/example.sample")
    bgen = import_bgen(spark, f"{RES}/example.8bits.bgen")
    assert gen.count_cols() == bgen.count_cols() == 500
    n_gen, n_bgen = gen.count_rows(), bgen.count_rows()
    assert n_gen == n_bgen == 199
    # dosage differential at every (variant, sample): expected dosage
    # from GP must match within the 8-bit BGEN quantization (~1/255 per
    # probability, x2 slots -> tolerate 0.02)
    def dosages(mt):
        e = F.col("__entries")
        return (
            mt._df.select(
                F.col("position").alias("pos") if "position" in mt._df.columns
                else F.col("locus")["position"].alias("pos"),
                F.transform(
                    e,
                    lambda x: F.when(
                        x.isNotNull() & x["GP"].isNotNull(),
                        F.round(
                            F.element_at(x["GP"], 2) + 2.0 * F.element_at(x["GP"], 3), 4
                        ),
                    ),
                ).alias("d"),
            )
            .orderBy("pos")
            .collect()
        )

    dg = {r["pos"]: r["d"] for r in dosages(gen)}
    db = {r["pos"]: r["d"] for r in dosages(bgen)}
    assert set(dg) == set(db)
    n_checked = 0
    for pos in dg:
        for a, b in zip(dg[pos], db[pos]):
            if a is None or b is None:
                continue
            assert abs(a - b) < 0.02, (pos, a, b)
            n_checked += 1
    assert n_checked > 50_000  # ~199 x 500 defined entries


def test_import_plink_balding_nichols(spark):
    from hail_spark.io.plink import import_plink

    base = f"{RES}/balding-nichols-1024-variants-4-samples-3-populations"
    with open(base + ".bim") as f:
        n_var = sum(1 for _ in f)
    with open(base + ".fam") as f:
        n_samp = sum(1 for _ in f)
    mt = import_plink(spark, base)
    assert mt.count() == (n_var, n_samp) == (1024, 4)
    # dosage mass sanity: all entries in {0,1,2,null}
    bad = mt._df.select(
        F.size(
            F.filter(
                F.col("__entries"),
                lambda e: e.isNotNull() & ~e["GT"].isin(0, 1, 2),
            )
        ).alias("bad")
    ).agg(F.sum("bad")).first()[0]
    assert bad == 0


def test_import_fam_and_pedigree(spark):
    from hail_spark.genetics import Pedigree
    from hail_spark.io.impex import import_fam

    path = f"{RES}/denovo.fam"
    with open(path) as f:
        n = sum(1 for l in f if l.strip())
    fam = import_fam(spark, path)
    assert fam.count() == n
    ped = Pedigree.read(path)
    assert len(ped.trios) == n
    assert len(ped.complete_trios()) > 0


def test_import_locus_intervals_example(spark):
    from hail_spark.io.impex import import_locus_intervals

    path = f"{RES}/example1.interval_list"
    with open(path) as f:
        n = sum(1 for l in f if l.strip() and not l.startswith("@"))
    t = import_locus_intervals(spark, path)
    assert t.df.count() == n
    r = t.df.first()
    assert r["interval"]["start"]["position"] <= r["interval"]["end"]["position"]


def test_hwe_test_vcf_p_values(spark):
    """HWE_test.vcf is the reference's HWE fixture; our exact mid-p
    must be a valid p in (0, 1] and equal the reference formula on the
    counted genotypes."""
    from hail_spark.expr.stats import hardy_weinberg_test
    from hail_spark.io.vcf import import_vcf
    from hail_spark.methods.qc import variant_qc

    mt = import_vcf(spark, f"{RES}/HWE_test.vcf")
    vq = variant_qc(mt)
    rows = vq._df.select(F.col("variant_qc").alias("q")).collect()
    assert rows
    import math

    n_strict = 0
    for r in rows:
        q = r["q"]
        if q["n_called"] == 0:
            # n=0: NaN p (ours arrives as null through Arrow) — nothing
            # numeric to compare
            assert q["p_value_hwe"] is None or math.isnan(q["p_value_hwe"])
            continue
        exact = hardy_weinberg_test(q["n_hom_ref"], q["n_het"], q["n_hom_var"])
        assert q["p_value_hwe"] == pytest.approx(exact["p_value"], rel=1e-12)
        assert 0.0 <= q["p_value_hwe"] <= 1.0
        n_strict += 1
    assert n_strict > 0
