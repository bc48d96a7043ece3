"""gVCF ingestion + VDS combiner (modeled on the reference's
vds/combiner test strategy: synthesize gVCFs, combine, densify,
check against hand-computed expectations)."""

import pytest
from pyspark.sql import functions as F

from hail_spark.io.gvcf import combine_gvcfs, import_gvcf_interval
from hail_spark.matrixtable import ENTRIES

HDR = """##fileformat=VCFv4.2
##INFO=<ID=END,Number=1,Type=Integer,Description="End">
##FORMAT=<ID=GT,Number=1,Type=String,Description="GT">
##FORMAT=<ID=DP,Number=1,Type=Integer,Description="DP">
##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="GQ">
##FORMAT=<ID=AD,Number=R,Type=Integer,Description="AD">
##FORMAT=<ID=PL,Number=G,Type=Integer,Description="PL">
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t{s}
"""


def _write_gvcf(path, sample, lines):
    with open(path, "w") as f:
        f.write(HDR.format(s=sample))
        for ln in lines:
            f.write(ln + "\n")


@pytest.fixture(scope="module")
def gvcf_paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("gvcfs")
    # S0: ref block 1-1000 (DP 20), variant at 1500 A->T het,
    #     ref block 1501-2000 (DP 18)
    _write_gvcf(
        d / "s0.g.vcf",
        "S0",
        [
            "1\t1\t.\tA\t<NON_REF>\t.\t.\tEND=1000\tGT:DP:GQ\t0/0:20:50",
            "1\t1500\t.\tA\tT,<NON_REF>\t50\t.\t.\tGT:DP:GQ:AD:PL\t0/1:30:99:15,15,0:50,0,40,60,45,90",
            "1\t1501\t.\tT\t<NON_REF>\t.\t.\tEND=2000\tGT:DP:GQ\t0/0:18:45",
        ],
    )
    # S1: ref block 1-2000 (DP 25) covering the variant site; no variant
    _write_gvcf(
        d / "s1.g.vcf",
        "S1",
        ["1\t1\t.\tA\t<NON_REF>\t.\t.\tEND=2000\tGT:DP:GQ\t0/0:25:60"],
    )
    # S2: variant at 1500 A->G hom; ref blocks around it; also X/Y blocks
    _write_gvcf(
        d / "s2.g.vcf",
        "S2",
        [
            "1\t1\t.\tA\t<NON_REF>\t.\t.\tEND=1499\tGT:DP:GQ\t0/0:22:55",
            "1\t1500\t.\tA\tG,<NON_REF>\t80\t.\t.\tGT:DP:GQ:AD:PL\t1/1:28:90:0,28,0:95,30,0,99,40,99",
            "X\t1\t.\tA\t<NON_REF>\t.\t.\tEND=1000\tGT:DP:GQ\t0/0:11:50",
            "Y\t1\t.\tA\t<NON_REF>\t.\t.\tEND=1000\tGT:DP:GQ\t0/0:10:50",
            "20\t1\t.\tA\t<NON_REF>\t.\t.\tEND=1000\tGT:DP:GQ\t0/0:21:50",
        ],
    )
    return [str(d / "s0.g.vcf"), str(d / "s1.g.vcf"), str(d / "s2.g.vcf")]


@pytest.fixture(scope="module")
def vds(spark, gvcf_paths):
    return combine_gvcfs(spark, gvcf_paths)


def test_combiner_samples_and_shapes(vds):
    assert [c["s"] for c in vds.variant_data._cols] == ["S0", "S1", "S2"]
    assert vds.variant_data.count_rows() == 1  # one variant site (1:1500)
    # ref block starts: 1 (S0,S1,S2 share), 1501 (S0), X/Y/20 (S2)
    assert vds.reference_data.count_rows() == 5


def test_combiner_allele_union_and_local_fields(vds):
    row = vds.variant_data._df.collect()[0]
    assert row["locus"]["contig"] == "1" and row["locus"]["position"] == 1500
    assert row["alleles"] == ["A", "G", "T"]  # merged + sorted alts
    e0, e1, e2 = row[ENTRIES]
    # S0 was A->T: local alt T maps to merged index 2
    assert e0["LA"] == [0, 2]
    assert e0["LGT"] == [0, 1] and e0["GT"] == 1
    assert e0["LPL"] == [50, 0, 40, 60, 45, 90]
    assert e1 is None  # S1 has no variant row here (covered by ref block)
    # S2 was A->G hom: local alt G maps to merged index 1
    assert e2["LA"] == [0, 1]
    assert e2["GT"] == 2 and e2["DP"] == 28


def test_densify_fills_from_ref_blocks(vds):
    dense = vds.to_dense_mt()
    row = dense._df.collect()[0]
    e0, e1, e2 = row[ENTRIES]
    assert e0["GT"] == 1
    # S1 filled from its covering block (1-2000, DP 25): hom-ref
    assert e1["GT"] == 0 and e1["DP"] == 25 and e1["GQ"] == 60
    assert e2["GT"] == 2


def test_import_gvcf_interval(spark, gvcf_paths):
    v = import_gvcf_interval(spark, gvcf_paths[0], "1", 900, 1600)
    # ref blocks clipped to the window
    refs = {
        r["locus"]["position"]: r[ENTRIES][0]
        for r in v.reference_data._df.collect()
    }
    assert set(refs) == {900, 1501}
    assert refs[900]["END"] == 1000
    assert refs[1501]["END"] == 1600
    assert v.variant_data.count_rows() == 1


def test_truncate_reference_blocks(vds):
    t = vds.truncate_reference_blocks(500)
    long = (
        t.reference_data._df.select(
            F.col("locus")["position"].alias("p"),
            F.posexplode(ENTRIES).alias("s", "e"),
        )
        .filter(F.col("e").isNotNull())
        .select("p", "s", F.col("e")["END"].alias("end"))
    )
    rows = long.collect()
    assert all(r["end"] - r["p"] + 1 <= 500 for r in rows)
    # S1's 1-2000 block becomes 4 segments
    s1 = sorted((r["p"], r["end"]) for r in rows if r["s"] == 1)
    assert s1 == [(1, 500), (501, 1000), (1001, 1500), (1501, 2000)]
    # coverage preserved
    before = {r["s"]: r["bases_covered"] for r in vds.interval_coverage().collect()}
    after = {r["s"]: r["bases_covered"] for r in t.interval_coverage().collect()}
    assert before == after


def test_merge_reference_blocks_round_trip(vds):
    # truncating then merging with DP+GQ equivalence restores S1's block
    t = vds.truncate_reference_blocks(500)
    m = t.merge_reference_blocks(equivalence_fields=["GQ", "DP"])
    long = (
        m.reference_data._df.select(
            F.col("locus")["position"].alias("p"),
            F.posexplode(ENTRIES).alias("s", "e"),
        )
        .filter(F.col("e").isNotNull())
        .select("p", "s", F.col("e")["END"].alias("end"))
    )
    s1 = sorted((r["p"], r["end"]) for r in long.collect() if r["s"] == 1)
    assert s1 == [(1, 2000)]


def test_impute_sex_chromosome_ploidy(vds):
    out = {r["s"]: r for r in vds.impute_sex_chromosome_ploidy("20").collect()}
    s2 = out["S2"]
    assert s2["autosomal_mean_dp"] == pytest.approx(21.0)
    assert s2["x_mean_dp"] == pytest.approx(11.0)
    assert s2["x_ploidy"] == pytest.approx(2 * 11 / 21)
    assert s2["y_ploidy"] == pytest.approx(2 * 10 / 21)


def test_vds_union_cols_matches_single_pass(spark, gvcf_paths):
    # hierarchical combine: (s0+s1) ∪ (s2) must equal the one-pass combine
    left = combine_gvcfs(spark, gvcf_paths[:2])
    right = combine_gvcfs(spark, gvcf_paths[2:])
    merged = left.union_cols(right)
    onepass = combine_gvcfs(spark, gvcf_paths)

    assert [c["s"] for c in merged.variant_data._cols] == ["S0", "S1", "S2"]
    assert merged.reference_data.count_rows() == onepass.reference_data.count_rows()

    def ref_long(v):
        return {
            (r["locus"]["contig"], r["locus"]["position"], i): (e["END"], e["DP"], e["GQ"])
            for r in v.reference_data._df.collect()
            for i, e in enumerate(r[ENTRIES])
            if e is not None
        }

    assert ref_long(merged) == ref_long(onepass)
    # the variant site: S0's alts ["T"] and S2's ["G"] were combined in
    # different batches → two rows with per-row-valid local fields
    rows = merged.variant_data._df.collect()
    by_alleles = {tuple(r["alleles"]): r for r in rows}
    assert set(by_alleles) == {("A", "T"), ("A", "G")}
    t_row = by_alleles[("A", "T")]
    assert t_row[ENTRIES][0]["LA"] == [0, 1] and t_row[ENTRIES][2] is None
    g_row = by_alleles[("A", "G")]
    assert g_row[ENTRIES][2]["GT"] == 2 and g_row[ENTRIES][0] is None


def test_vds_union_cols_rejects_overlap(spark, gvcf_paths):
    a = combine_gvcfs(spark, gvcf_paths[:2])
    with pytest.raises(ValueError):
        a.union_cols(a)
