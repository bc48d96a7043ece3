"""Family/genetics methods: split_multi, trio_matrix, mendel_errors,
concordance — semantics mirrored from the reference's
family_methods/statgen tests."""

import textwrap

import pytest
from pyspark.sql import functions as F

from hail_spark.io import import_fam, import_vcf
from hail_spark.methods.genetics import (
    concordance,
    mendel_errors,
    split_multi_hts,
    trio_matrix,
)

VCF = textwrap.dedent(
    """\
    ##fileformat=VCFv4.2
    #CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tkid\tdad\tmom
    1\t100\t.\tA\tT\t.\t.\t.\tGT\t0/1\t0/0\t0/1
    1\t200\t.\tG\tC,T\t.\t.\t.\tGT\t1/2\t0/1\t0/2
    1\t300\t.\tT\tA\t.\t.\t.\tGT\t1/1\t0/0\t0/0
    1\t400\t.\tC\tG\t.\t.\t.\tGT\t0/0\t1/1\t1/1
    1\t500\t.\tA\tC\t.\t.\t.\tGT\t./.\t0/1\t0/1
    """
)


@pytest.fixture(scope="module")
def trio_vcf(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("gen")
    (d / "t.vcf").write_text(VCF)
    (d / "t.fam").write_text("f1 kid dad mom 1 2\n")
    return str(d / "t.vcf"), str(d / "t.fam")


def test_split_multi(spark, trio_vcf):
    mt = import_vcf(spark, trio_vcf[0])
    sp = split_multi_hts(mt)
    rows = sp._df.filter(F.col("locus")["position"] == 200).orderBy("a_index").collect()
    assert len(rows) == 2  # C and T alts
    assert rows[0]["alleles"] == ["G", "C"] and rows[0]["was_split"] is True
    assert rows[1]["alleles"] == ["G", "T"]
    # kid 1/2: for a_index=1 (C) downcode → 1; for a_index=2 (T) → 1
    gts0 = [e["GT"] for e in rows[0]["__entries"]]
    gts1 = [e["GT"] for e in rows[1]["__entries"]]
    assert gts0 == [1, 1, 0]  # kid(1/2)→1 wrt C, dad(0/1)→1, mom(0/2)→0
    assert gts1 == [1, 0, 1]
    # biallelic rows pass through unsplit
    r100 = sp._df.filter(F.col("locus")["position"] == 100).collect()
    assert len(r100) == 1 and r100[0]["was_split"] is False
    assert sp.count_rows() == 6  # 4 biallelic + 2 from the triallelic


def test_trio_matrix_and_mendel(spark, trio_vcf):
    vcf, fam_p = trio_vcf
    mt = split_multi_hts(import_vcf(spark, vcf))
    fam = import_fam(spark, fam_p).df
    tm = trio_matrix(mt, fam)
    assert [c["id"] for c in tm._cols] == ["kid"]
    r = tm._df.filter(F.col("locus")["position"] == 100).first()
    t = r["__entries"][0]
    assert t["proband_entry"]["GT"] == 1
    assert t["father_entry"]["GT"] == 0
    assert t["mother_entry"]["GT"] == 1

    errs = {
        (r["locus"]["position"], tuple(r["alleles"])): r["n_errors"]
        for r in mendel_errors(mt, fam).collect()
    }
    assert errs[(100, ("A", "T"))] == 0
    assert errs[(300, ("T", "A"))] == 1  # kid hom-var, both parents hom-ref
    assert errs[(400, ("C", "G"))] == 1  # kid hom-ref, both parents hom-var
    assert errs[(500, ("A", "C"))] == 0  # kid missing → no error counted


def test_concordance_self_and_perturbed(spark, trio_vcf):
    mt = import_vcf(spark, trio_vcf[0])
    c = {(r["left_gt"], r["right_gt"]): r["n"] for r in concordance(mt, mt).collect()}
    # self-concordance: everything on the diagonal
    assert all(l == r for (l, r) in c)
    total = sum(c.values())
    assert total == mt.count_rows() * mt.count_cols()
    assert c[(-1, -1)] == 1  # the single ./. call (kid at pos 500)
