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


def test_balding_nichols_and_impute_sex(spark):
    from hail_spark.methods.genetics import balding_nichols_model, impute_sex

    mt = balding_nichols_model(spark, 2, 20, 150, fst=0.2, seed=7, n_partitions=4)
    assert mt.count() == (150, 20)
    gts = mt._df.select(F.explode(F.col("__entries").getField("GT")).alias("g"))
    stats = gts.agg(F.min("g"), F.max("g"), F.avg("g")).first()
    assert stats[0] == 0 and stats[1] == 2 and 0.3 < stats[2] < 1.7
    # determinism across partitionings
    mt2 = balding_nichols_model(spark, 2, 20, 150, fst=0.2, seed=7, n_partitions=2)
    a = sorted(map(tuple, mt._df.select("locus").collect()))
    assert mt._df.select(F.hash(F.to_json(F.struct("*")))).agg(F.sum("*")).first()[0] == \
           mt2._df.select(F.hash(F.to_json(F.struct("*")))).agg(F.sum("*")).first()[0]

    # impute_sex: X-genotypes — males (hom only) vs females (HWE hets)
    import numpy as np
    rng = np.random.default_rng(2)
    ns, nv = 10, 200
    p = rng.uniform(0.2, 0.8, nv)
    G = np.zeros((nv, ns))
    for j in range(ns):
        if j < 5:   # male: haploid → always hom
            G[:, j] = 2 * rng.binomial(1, p)
        else:       # female: diploid HWE
            G[:, j] = rng.binomial(2, p)
    from hail_spark.matrixtable import ENTRIES, MatrixTable
    rows = [{"locus": {"contig": "X", "position": i + 1},
             ENTRIES: [{"GT": int(g)} for g in G[i]]} for i in range(nv)]
    df = spark.createDataFrame(rows, f"locus struct<contig:string,position:int>, {ENTRIES} array<struct<GT:int>>")
    xmt = MatrixTable(df, ("locus",), [{"s": f"S{j}"} for j in range(ns)], ("s",))
    sex = {r["s"]: r for r in impute_sex(xmt).collect()}
    assert all(sex[f"S{j}"]["is_female"] is False for j in range(5)), sex
    assert all(sex[f"S{j}"]["is_female"] is True for j in range(5, 10)), sex


def test_tdt_and_de_novo(spark, trio_vcf):
    from hail_spark.io import import_fam, import_vcf
    from hail_spark.methods.genetics import de_novo_candidates, transmission_disequilibrium_test

    vcf, fam_p = trio_vcf
    mt = import_vcf(spark, vcf)
    fam = import_fam(spark, fam_p).df
    res = {r["locus"]["position"]: r for r in transmission_disequilibrium_test(mt, fam).collect()}
    # pos 100: dad 0/0, mom 0/1, kid 0/1 → t=1, u=0
    assert (res[100]["t"], res[100]["u"]) == (1, 0)
    # pos 300: dad 0/0 mom 0/0 kid 1/1 → no het parent → t=u=0, chi2 null
    assert (res[300]["t"], res[300]["u"]) == (0, 0) and res[300]["chi_sq"] is None
    assert all(0.0 <= r["p_value"] <= 1.0 for r in res.values())

    dn = de_novo_candidates(mt, fam).collect()
    # no kid-het/parents-homref site in this VCF except... pos 100 kid het but mom het → not de novo
    assert dn == []
    # plant one: pos 300 variant has kid 1/1 (not de novo); craft kid het case
    import textwrap
    p2 = vcf + ".dn.vcf"
    open(p2, "w").write(textwrap.dedent("""\
        ##fileformat=VCFv4.2
        #CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tkid\tdad\tmom
        1\t700\t.\tA\tT\t.\t.\t.\tGT\t0/1\t0/0\t0/0
        """))
    dn2 = de_novo_candidates(import_vcf(spark, p2), fam).collect()
    assert len(dn2) == 1 and dn2[0]["id"] == "kid"
