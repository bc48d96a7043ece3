"""Family/genetics methods: split_multi, trio_matrix, mendel_errors,
concordance — semantics mirrored from the reference's
family_methods/statgen tests."""

import textwrap

import pytest
from pyspark.sql import functions as F

from hail_spark.io import import_fam, import_vcf
from hail_spark.methods.genetics import (
    concordance,
    concordance_pairs,
    mendel_errors,
    mendel_errors_by_variant,
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
        for r in mendel_errors_by_variant(mt, fam).collect()
    }
    assert errs[(100, ("A", "T"))] == 0
    assert errs[(300, ("T", "A"))] == 1  # kid hom-var, both parents hom-ref
    assert errs[(400, ("C", "G"))] == 1  # kid hom-ref, both parents hom-var
    assert errs[(500, ("A", "C"))] == 0  # kid missing → no error counted


def test_concordance_self_and_perturbed(spark, trio_vcf):
    mt = import_vcf(spark, trio_vcf[0])
    c = {(r["left_gt"], r["right_gt"]): r["n"] for r in concordance_pairs(mt, mt).collect()}
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


def test_filter_alleles_downcode(spark, trio_vcf):
    from hail_spark.methods.genetics import filter_alleles

    mt = import_vcf(spark, trio_vcf[0])
    # drop the 'T' alt everywhere (triallelic G→C,T at pos 200 loses T)
    fa = filter_alleles(mt, lambda ref, alt, i: alt != "T")
    r = fa._df.filter(F.col("locus")["position"] == 200).first()
    assert r["alleles"] == ["G", "C"]
    assert r["old_alleles"] == ["G", "C", "T"]
    # kid was 1/2 (C,T): T downcodes to ref → GT wrt C = 1
    # dad 0/1 → 1; mom 0/2 (T) → T→ref → 0
    gts = [e["GT"] for e in r["__entries"]]
    assert gts == [1, 1, 0]
    # rows whose only alt is removed disappear
    before = mt._df.count()
    removed = filter_alleles(mt, lambda ref, alt, i: F.lit(False))
    assert removed._df.count() == 0
    # pos 100's only alt IS 'T' → that row drops; all others keep >=1 alt
    assert fa._df.count() == before - 1


def test_import_gen(spark, tmp_path):
    from hail_spark.io.impex import import_gen

    gen = tmp_path / "x.gen"
    gen.write_text(
        "01 SNP1 rs1 1000 A G 1 0 0 0 1 0 0 0 1\n"
        "01 SNP2 rs2 2000 T C 0.33 0.33 0.34 0 0.1 0.9 0.98 0.01 0.01\n"
    )
    smp = tmp_path / "x.sample"
    smp.write_text(
        "ID_1 ID_2 missing\n0 0 0\nS1 S1 0\nS2 S2 0\nS3 S3 0\n"
    )
    mt = import_gen(spark, str(gen), str(smp))
    assert [c["s"] for c in mt._cols] == ["S1", "S2", "S3"]
    rows = {r["varid"]: r for r in mt._df.collect()}
    assert rows["SNP1"]["locus"]["position"] == 1000
    assert rows["SNP1"]["alleles"] == ["A", "G"]
    assert [e["GT"] for e in rows["SNP1"]["__entries"]] == [0, 1, 2]
    e2 = rows["SNP2"]["__entries"]
    assert [e["GT"] for e in e2] == [2, 2, 0]
    assert e2[0]["GP"] == [0.33, 0.33, 0.34]
    # no_call_prob thresholding drops ambiguous calls
    mt2 = import_gen(spark, str(gen), str(smp), no_call_prob=0.5)
    e = {r["varid"]: r for r in mt2._df.collect()}["SNP2"]["__entries"]
    assert [x["GT"] for x in e] == [None, 2, 0]


def test_info_score(spark):
    from hail_spark.expr.functions import info_score
    from hail_spark.matrixtable import ENTRIES

    import numpy as np

    gps = [[0.9, 0.1, 0.0], [0.2, 0.5, 0.3], [0.0, 0.1, 0.9], [0.7, 0.2, 0.1]]
    df = spark.createDataFrame(
        [{ENTRIES: [{"GP": gp} for gp in gps]}],
        f"{ENTRIES} array<struct<GP: array<double>>>",
    )
    row = df.select(info_score(F.col(ENTRIES)).alias("i")).first()["i"]
    e = np.array([gp[1] + 2 * gp[2] for gp in gps])
    f = np.array([gp[1] + 4 * gp[2] for gp in gps])
    n = len(gps)
    theta = e.sum() / (2 * n)
    expected = 1 - (f - e * e).sum() / (2 * n * theta * (1 - theta))
    assert row["n_included"] == 4
    assert row["score"] == pytest.approx(expected, rel=1e-12)
    # monomorphic (all hom-ref certain) → score 1
    mono = spark.createDataFrame(
        [{ENTRIES: [{"GP": [1.0, 0.0, 0.0]}] * 3}],
        f"{ENTRIES} array<struct<GP: array<double>>>",
    )
    assert mono.select(info_score(F.col(ENTRIES)).alias("i")).first()["i"]["score"] == 1.0


def test_compute_charr(spark):
    from hail_spark.matrixtable import ENTRIES, MatrixTable
    from hail_spark.methods.qc import compute_charr

    # 3 samples, 2 usable hom-var sites; S2 contaminated (ref reads at hom-var)
    def ent(gt, ad0, ad1, dp, gq):
        return {"GT": gt, "AD": [ad0, ad1], "DP": dp, "GQ": gq}

    rows = [
        # site 1: AF... GTs: 1,2,2 → ref_af = 1 - 5/6 ≈ 0.1667 → outside (0.05,0.95)? inside
        {"locus": {"contig": "1", "position": 100}, "alleles": ["A", "G"],
         ENTRIES: [ent(1, 10, 10, 20, 99), ent(2, 0, 20, 20, 99), ent(2, 4, 16, 20, 99)]},
        {"locus": {"contig": "1", "position": 200}, "alleles": ["A", "C"],
         ENTRIES: [ent(1, 10, 10, 20, 99), ent(2, 2, 18, 20, 99), ent(2, 6, 14, 20, 99)]},
    ]
    df = spark.createDataFrame(
        rows,
        "locus struct<contig:string,position:int>, alleles array<string>, "
        f"{ENTRIES} array<struct<GT:int, AD:array<int>, DP:int, GQ:int>>",
    )
    mt = MatrixTable(df, ("locus",), [{"s": "S0"}, {"s": "S1"}, {"s": "S2"}], ("s",))
    res = {r["s"]: r["charr"] for r in compute_charr(mt, min_dp=5).collect()}
    raf1, raf2 = 1 - 5 / 6, 1 - 5 / 6
    exp_s2 = ((4 / 20) / raf1 + (6 / 20) / raf2) / 2
    exp_s1 = ((0 / 20) / raf1 + (2 / 20) / raf2) / 2
    assert res["S2"] == pytest.approx(exp_s2, rel=1e-12)
    assert res["S1"] == pytest.approx(exp_s1, rel=1e-12)
    assert res["S0"] is None  # het everywhere → no hom-var entries


def test_export_gen_roundtrip(spark, tmp_path):
    from hail_spark.io.impex import export_gen, import_gen

    gen = tmp_path / "y.gen"
    gen.write_text(
        "01 SNP1 rs1 1000 A G 1 0 0 0 1 0 0 0 1\n"
        "01 SNP2 rs2 2000 T C 0.25 0.5 0.25 0 0.1 0.9 0.98 0.01 0.01\n"
    )
    smp = tmp_path / "y.sample"
    smp.write_text("ID_1 ID_2 missing\n0 0 0\nS1 S1 0\nS2 S2 0\nS3 S3 0\n")
    mt = import_gen(spark, str(gen), str(smp))
    out = tmp_path / "out"
    export_gen(mt, str(out))
    mt2 = import_gen(spark, str(out / "gen"), str(out / "samples.sample"))
    assert [c["s"] for c in mt2._cols] == ["S1", "S2", "S3"]
    orig = {r["varid"]: r for r in mt._df.collect()}
    back = {r["varid"]: r for r in mt2._df.collect()}
    assert set(orig) == set(back)
    for v in orig:
        assert back[v]["locus"] == orig[v]["locus"]
        assert back[v]["alleles"] == orig[v]["alleles"]
        for e1, e2 in zip(orig[v]["__entries"], back[v]["__entries"]):
            assert e2["GT"] == e1["GT"]
            for p1, p2 in zip(e1["GP"], e2["GP"]):
                assert abs(p1 - p2) < 1e-4
