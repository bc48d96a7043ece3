"""Experimental-library surface tests (ref hail/python/hail/experimental):
filtering AF, haplotype EM, full_outer_join_mt, GTF import, ld_score,
pc_project, trio phasing, tidyr, simulate_phenotypes,
export_entries_by_col."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hail_spark import experimental as hx
from hail_spark.matrixtable import ENTRIES, MatrixTable
from hail_spark.table import Table


# ---------------------------------------------------------------------- #
# filtering_allele_frequency
# ---------------------------------------------------------------------- #
def test_faf_scalar_properties():
    # singletons and empty AN give 0 (reference contract)
    assert hx._faf_scalar(1, 1000, 0.95) == 0.0
    assert hx._faf_scalar(0, 1000, 0.95) == 0.0
    assert hx._faf_scalar(5, 0, 0.95) == 0.0
    # FAF is below the naive AF and monotone in ac
    faf10 = hx._faf_scalar(10, 10000, 0.95)
    faf50 = hx._faf_scalar(50, 10000, 0.95)
    assert 0 < faf10 < 10 / 10000
    assert 0 < faf50 < 50 / 10000
    assert faf50 > faf10
    # the defining property: max AC at the FAF stays below observed ac,
    # one precision step above exceeds-or-meets it
    from hail_spark.expr.stats import qpois

    for ac, an in [(10, 10000), (50, 10000), (7, 3000)]:
        faf = hx._faf_scalar(ac, an, 0.95)
        assert qpois(0.95, an * faf) < ac
        assert qpois(0.95, an * (faf + 2e-6)) >= ac


def test_faf_column(spark):
    df = spark.createDataFrame(
        [(10, 10000), (1, 10000), (50, 10000)], "ac int, an int"
    )
    out = df.select(hx.filtering_allele_frequency("ac", "an", 0.95).alias("faf")).collect()
    assert out[1]["faf"] == 0.0
    assert abs(out[0]["faf"] - hx._faf_scalar(10, 10000, 0.95)) < 1e-12


# ---------------------------------------------------------------------- #
# haplotype_freq_em
# ---------------------------------------------------------------------- #
def test_hap_em_perfect_ld():
    # only AABB and aabb observed -> all mass on AB and ab
    counts = [30, 0, 0, 0, 0, 0, 0, 0, 10]
    ab, aB, Ab, ab_ = hx._hap_em_scalar(counts)
    assert abs(ab - 60) < 1e-6
    assert abs(ab_ - 20) < 1e-6
    assert abs(aB) < 1e-6 and abs(Ab) < 1e-6


def test_hap_em_equilibrium():
    # independent variants at 50/50: double-het mass splits evenly
    # 16 samples in HWE+LE proportions for p=q=0.5
    counts = [1, 2, 1, 2, 4, 2, 1, 2, 1]
    est = hx._hap_em_scalar(counts)
    assert abs(sum(est) - 32) < 1e-6
    for e in est:
        assert abs(e - 8) < 1e-3


def test_hap_em_marginals_preserved():
    rng = np.random.default_rng(2)
    counts = rng.integers(0, 20, 9).tolist()
    est = hx._hap_em_scalar(counts)
    n = sum(counts)
    # A-allele count preserved: 2*(AA row) + (Aa row) == AB + Ab
    nA = 2 * (counts[0] + counts[1] + counts[2]) + (counts[3] + counts[4] + counts[5])
    assert abs((est[0] + est[2]) - nA) < 1e-4
    assert abs(sum(est) - 2 * n) < 1e-4


def test_hap_em_column(spark):
    df = spark.createDataFrame([([30, 0, 0, 0, 0, 0, 0, 0, 10],)], "c array<int>")
    out = df.select(hx.haplotype_freq_em("c").alias("h")).first()["h"]
    assert abs(out[0] - 60) < 1e-6


# ---------------------------------------------------------------------- #
# full_outer_join_mt
# ---------------------------------------------------------------------- #
def _mk_mt(spark, positions, samples, gt_fn):
    rows = [
        {
            "locus": {"contig": "1", "position": p},
            ENTRIES: [{"GT": gt_fn(p, s)} for s in range(len(samples))],
        }
        for p in positions
    ]
    df = spark.createDataFrame(
        rows, f"locus struct<contig:string,position:int>, {ENTRIES} array<struct<GT:int>>"
    )
    return MatrixTable(df, ("locus",), [{"s": s} for s in samples], ("s",))


def test_full_outer_join_mt(spark):
    mt1 = _mk_mt(spark, [1, 2, 3], ["a", "b"], lambda p, s: 0)
    mt2 = _mk_mt(spark, [3, 4, 5], ["c", "d"], lambda p, s: 1)
    out = hx.full_outer_join_mt(mt1, mt2)
    assert [c["s"] for c in out._cols] == ["a", "b", "c", "d"]
    assert out._df.count() == 5
    rows = {r["locus"]["position"]: r for r in out._df.collect()}
    # locus 1: only left
    e1 = rows[1][ENTRIES]
    assert e1[0]["left_entry"]["GT"] == 0 and e1[0]["right_entry"] is None
    assert e1[2]["left_entry"] is None
    # locus 3: both
    e3 = rows[3][ENTRIES]
    assert e3[0]["left_entry"]["GT"] == 0
    assert e3[2]["right_entry"]["GT"] == 1
    # locus 5: only right
    e5 = rows[5][ENTRIES]
    assert e5[0]["left_entry"] is None and e5[3]["right_entry"]["GT"] == 1
    assert rows[1]["left_row"] is not None and rows[1]["right_row"] is None


# ---------------------------------------------------------------------- #
# import_gtf / get_gene_intervals
# ---------------------------------------------------------------------- #
GTF = (
    '#comment line\n'
    '1\thavana\tgene\t100\t500\t.\t+\t.\tgene_id "G1"; gene_name "ALPHA";\n'
    '1\thavana\ttranscript\t100\t300\t0.5\t+\t0\tgene_id "G1"; transcript_id "T1";\n'
    '2\tensembl\tgene\t900\t990\t.\t-\t.\tgene_id "G2"; gene_name "BETA";\n'
)


def test_import_gtf(spark, tmp_path):
    p = tmp_path / "a.gtf"
    p.write_text(GTF)
    t = hx.import_gtf(spark, str(p))
    rows = t.df.collect()
    assert len(rows) == 3
    g1 = [r for r in rows if r["feature"] == "gene" and r["gene_id"] == "G1"][0]
    assert g1["interval"]["start"]["position"] == 100
    assert g1["interval"]["end"]["position"] == 500
    assert g1["gene_name"] == "ALPHA"
    assert g1["strand"] == "+"
    tr = [r for r in rows if r["feature"] == "transcript"][0]
    assert tr["transcript_id"] == "T1"
    assert tr["score"] == 0.5
    assert tr["frame"] == 0
    ivs = hx.get_gene_intervals(t, gene_symbols=["BETA"])
    assert len(ivs) == 1
    assert ivs[0]["start"]["contig"] == "2"


# ---------------------------------------------------------------------- #
# ld_score
# ---------------------------------------------------------------------- #
def test_ld_score_matches_numpy(spark):
    rng = np.random.default_rng(9)
    n_s, n_v = 20, 12
    X = rng.integers(0, 3, (n_v, n_s))
    # two perfectly correlated variants
    X[3] = X[2]
    mt = _mk_mt(
        spark, list(range(1, n_v + 1)), [f"s{i}" for i in range(n_s)],
        lambda p, s: int(X[p - 1, s]),
    )
    out = {r["locus"]["position"]: r["univariate"] for r in hx.ld_score(mt, radius=100).collect()}
    # numpy replica
    Xc = X - X.mean(axis=1, keepdims=True)
    denom = np.sqrt((Xc * Xc).mean(axis=1))
    R = (Xc / np.where(denom == 0, np.nan, denom)[:, None]) @ (
        Xc / np.where(denom == 0, np.nan, denom)[:, None]
    ).T / n_s
    r2 = R**2
    adj = ((n_s - 1) / (n_s - 2)) * r2 - 1 / (n_s - 2)
    for i in range(n_v):
        expect = 1.0 + np.nansum([adj[i, j] for j in range(n_v) if j != i])
        assert abs(out[i + 1] - expect) < 1e-6, (i, out[i + 1], expect)


# ---------------------------------------------------------------------- #
# pc_project
# ---------------------------------------------------------------------- #
def test_pc_project_recovers_reference_scores(spark):
    # self-projection sanity: project the SAME dataset onto loadings from
    # a numpy PCA of its normalized matrix; scores must match numpy
    rng = np.random.default_rng(4)
    n_s, n_v, k = 10, 50, 3
    X = rng.integers(0, 3, (n_v, n_s)).astype(float)
    af = X.mean(axis=1) / 2
    ok = (af > 0) & (af < 1)
    Xn = (X - 2 * af[:, None]) / np.sqrt(n_v * 2 * af * (1 - af))[:, None]
    U, S, Vt = np.linalg.svd(Xn, full_matrices=False)
    loadings = U[:, :k]  # n_v × k
    expected = Xn.T @ loadings  # n_s × k

    mt = _mk_mt(
        spark, list(range(1, n_v + 1)), [f"s{i}" for i in range(n_s)],
        lambda p, s: int(X[p - 1, s]),
    )
    ldf = spark.createDataFrame(
        [
            {
                "locus": {"contig": "1", "position": i + 1},
                "loadings": loadings[i].tolist(),
                "af": float(af[i]),
            }
            for i in range(n_v)
        ],
        "locus struct<contig:string,position:int>, loadings array<double>, af double",
    )
    out = hx.pc_project(mt, ldf)
    got = {r["s"]: r["scores"] for r in out.collect()}
    for i in range(n_s):
        np.testing.assert_allclose(got[f"s{i}"], expected[i], atol=1e-9)


# ---------------------------------------------------------------------- #
# trio phasing
# ---------------------------------------------------------------------- #
def test_phase_by_transmission_cases(spark):
    cases = [
        # (kid, dad, mom) -> expected [kid(a1,a2), dad(a1,a2), mom(a1,a2)] or None
        ((0, 0, 0), [(0, 0), (0, 0), (0, 0)]),
        ((2, 2, 2), [(1, 1), (1, 1), (1, 1)]),
        ((1, 2, 0), [(1, 0), (1, 1), (0, 0)]),
        ((1, 0, 2), [(0, 1), (0, 0), (1, 1)]),
        ((1, 1, 0), [(1, 0), (1, 0), (0, 0)]),  # dad het, mom homref -> alt from dad
        ((1, 0, 1), [(0, 1), (0, 0), (1, 0)]),
        ((1, 1, 1), None),   # all het: unphasable
        ((2, 0, 2), None),   # mendelian violation: dad can't give alt
        ((0, 2, 0), None),   # violation: dad must transmit alt
        ((None, 1, 1), None),
    ]
    df = spark.createDataFrame(
        [{"i": i, "k": c[0][0], "d": c[0][1], "m": c[0][2]} for i, c in enumerate(cases)],
        "i int, k int, d int, m int",
    )
    out = df.select(
        "i", hx.phase_by_transmission("k", "d", "m").alias("ph")
    ).collect()
    got = {r["i"]: r["ph"] for r in out}
    for i, (_, expect) in enumerate(cases):
        if expect is None:
            assert got[i] is None, f"case {i}"
        else:
            ph = [(p["a1"], p["a2"]) for p in got[i]]
            assert ph == expect, f"case {i}: {ph} != {expect}"
            assert all(p["phased"] for p in got[i])


def test_explode_trio_matrix(spark):
    from hail_spark.methods.genetics import trio_matrix

    mt = _mk_mt(spark, [1, 2], ["kid", "dad", "mom"], lambda p, s: (p + s) % 3)
    fam = spark.createDataFrame(
        [{"fam_id": "f1", "id": "kid", "pat_id": "dad", "mat_id": "mom", "is_female": True}]
    )
    tm = trio_matrix(mt, fam)
    ex = hx.explode_trio_matrix(tm)
    assert [c["s"] for c in ex._cols] == ["kid", "dad", "mom"]
    r = {x["locus"]["position"]: x[ENTRIES] for x in ex._df.collect()}
    assert [e["GT"] for e in r[1]] == [1 % 3, 2 % 3, 3 % 3]
    assert ex._cols[0]["source_trio"]["fam_id"] == "f1"


def test_phase_trio_matrix_by_transmission(spark):
    from hail_spark.methods.genetics import trio_matrix

    mt = _mk_mt(spark, [1], ["kid", "dad", "mom"], lambda p, s: [1, 2, 0][s])
    fam = spark.createDataFrame(
        [{"fam_id": "f1", "id": "kid", "pat_id": "dad", "mat_id": "mom", "is_female": True}]
    )
    tm = trio_matrix(mt, fam)
    ph = hx.phase_trio_matrix_by_transmission(tm)
    e = ph._df.first()[ENTRIES][0]
    calls = [(p["a1"], p["a2"]) for p in e["phased_calls"]]
    assert calls == [(1, 0), (1, 1), (0, 0)]


# ---------------------------------------------------------------------- #
# tidyr
# ---------------------------------------------------------------------- #
def test_gather_spread_roundtrip(spark):
    df = spark.createDataFrame(
        [("x", 1.0, 2.0), ("y", 3.0, 4.0)], "id string, a double, b double"
    )
    t = Table(df, ("id",))
    long = hx.gather(t, "key", "value", "a", "b")
    rows = sorted((r["id"], r["key"], r["value"]) for r in long.df.collect())
    assert rows == [("x", "a", 1.0), ("x", "b", 2.0), ("y", "a", 3.0), ("y", "b", 4.0)]
    wide = hx.spread(long, "key", "value", key=["id"])
    back = sorted((r["id"], r["a"], r["b"]) for r in wide.df.collect())
    assert back == [("x", 1.0, 2.0), ("y", 3.0, 4.0)]


def test_separate(spark):
    df = spark.createDataFrame([("a:1",), ("b:2",)], "v string")
    t = Table(df, ())
    out = hx.separate(t, "v", ["name", "num"], ":")
    rows = sorted((r["name"], r["num"]) for r in out.df.collect())
    assert rows == [("a", "1"), ("b", "2")]


# ---------------------------------------------------------------------- #
# simulate_phenotypes
# ---------------------------------------------------------------------- #
def test_simulate_phenotypes(spark):
    rng = np.random.default_rng(8)
    n_s, n_v = 30, 80
    X = rng.integers(0, 3, (n_v, n_s))
    mt = _mk_mt(
        spark, list(range(1, n_v + 1)), [f"s{i}" for i in range(n_s)],
        lambda p, s: int(X[p - 1, s]),
    )
    out = hx.simulate_phenotypes(mt, h2=0.5, seed=3)
    ys = np.array([r["y"] for r in out.collect()])
    assert len(ys) == n_s
    assert np.std(ys) > 0
    # deterministic under the same seed
    ys2 = np.array([r["y"] for r in hx.simulate_phenotypes(mt, h2=0.5, seed=3).collect()])
    np.testing.assert_allclose(sorted(ys), sorted(ys2))
    # h2=0: pure environmental noise, unit-ish variance
    ys0 = np.array([r["y"] for r in hx.simulate_phenotypes(mt, h2=0.0, seed=3).collect()])
    assert 0.3 < np.var(ys0) < 3.0


# ---------------------------------------------------------------------- #
# export_entries_by_col
# ---------------------------------------------------------------------- #
def test_export_entries_by_col(spark, tmp_path):
    mt = _mk_mt(spark, [1, 2, 3], ["sA", "sB"], lambda p, s: (p * (s + 1)) % 3)
    out = str(tmp_path / "cols")
    hx.export_entries_by_col(mt, out)
    import glob

    dirs = sorted(glob.glob(f"{out}/s=*"))
    assert [d.split("s=")[-1] for d in dirs] == ["sA", "sB"]
    import csv

    for d, s_idx in zip(dirs, range(2)):
        files = glob.glob(f"{d}/*.csv")
        rows = []
        for fp in files:
            with open(fp) as fh:
                rows.extend(list(csv.DictReader(fh, delimiter="\t")))
        assert len(rows) == 3
        gts = {int(r["locus.position"]): int(r["GT"]) for r in rows}
        assert gts == {p: (p * (s_idx + 1)) % 3 for p in (1, 2, 3)}


# ---------------------------------------------------------------------- #
# ld_score_regression
# ---------------------------------------------------------------------- #
def test_ld_score_regression_recovers_truth(spark):
    # simulate the LDSC generative model in its realistic regime:
    # E[chi2] = 1 + N*h2/M * l with chi2_1 multiplicative noise
    rng = np.random.default_rng(13)
    M, N, h2 = 8000, 1000, 0.4
    l = rng.uniform(1.0, 20.0, M)
    mean_chi = 1.0 + N * h2 / M * l
    chi2 = mean_chi * rng.chisquare(1, M)
    df = spark.createDataFrame(
        [
            {"idx": int(i), "l2": float(l[i]), "chi2": float(chi2[i]), "n": N, "w": float(l[i])}
            for i in range(M)
        ]
    )
    t = Table(df.orderBy("idx"), ("idx",))
    res = hx.ld_score_regression(
        t, weight_col="w", ld_score_col="l2", chi_sq_col="chi2", n_col="n",
        n_blocks=20, two_step_threshold=30,
    )
    # jackknife SEs are ~0.04 here; allow ~2.5 SE around truth
    assert abs(res["intercept"]["estimate"] - 1.0) < 0.12
    assert abs(res["snp_heritability"]["estimate"] - h2) < 0.10
    assert 0 < res["snp_heritability"]["standard_error"] < 0.1
    assert 0 < res["intercept"]["standard_error"] < 0.1
    assert abs(res["mean_chi_sq"] - float(np.mean(chi2))) < 1e-6


# ---------------------------------------------------------------------- #
# sparse_split_multi
# ---------------------------------------------------------------------- #
def test_sparse_split_multi(spark):
    # one multiallelic row: alleles [A, C, G]; two samples with local alleles
    schema = (
        "locus struct<contig:string,position:int>, alleles array<string>, "
        + ENTRIES
        + " array<struct<GT:int,LGT:array<int>,LA:array<int>,phased:boolean,"
        "LAD:array<int>,DP:int,GQ:int,LPL:array<int>>>"
    )
    rows = [
        {
            "locus": {"contig": "1", "position": 100},
            "alleles": ["A", "C", "G"],
            ENTRIES: [
                # s0: saw both alts locally: LA=[0,1,2]; GT=C/G (local 1/2)
                {
                    "GT": 2, "LGT": [1, 2], "LA": [0, 1, 2], "phased": False,
                    "LAD": [2, 5, 7], "DP": 14, "GQ": 30,
                    "LPL": [50, 40, 60, 10, 0, 20],
                },
                # s1: only saw G (global 2) locally: LA=[0,2]; GT=0/1 local
                {
                    "GT": 1, "LGT": [0, 1], "LA": [0, 2], "phased": False,
                    "LAD": [8, 3], "DP": 11, "GQ": 25,
                    "LPL": [15, 0, 45],
                },
            ],
        }
    ]
    df = spark.createDataFrame(rows, schema)
    vmt = MatrixTable(df, ("locus", "alleles"), [{"s": "s0"}, {"s": "s1"}], ("s",))
    out = hx.sparse_split_multi(vmt)
    got = {tuple(r["alleles"]): r for r in out._df.collect()}
    assert set(got) == {("A", "C"), ("A", "G")}
    ac, ag = got[("A", "C")], got[("A", "G")]
    assert ac["a_index"] == 1 and ac["was_split"]
    assert ag["a_index"] == 2 and ag["was_split"]

    # --- allele C (global 1) ---
    s0, s1 = ac[ENTRIES]
    # s0 LGT=[1,2] locals -> globals [1,2]: one C allele -> GT=1
    assert s0["GT"] == 1
    # AD: LAD=[2,5,7], C is local 1 -> ad_i=5, other=9
    assert s0["AD"] == [9, 5]
    # PL: local pairs downcode wrt local_a=1:
    #  j=0:(0,0)->0; j=1:(0,1)->1; j=2:(1,1)->2; j=3:(0,2)->0; j=4:(1,2)->1; j=5:(2,2)->0
    #  PL[0]=min(50,10,20)=10, PL[1]=min(40,0)=0, PL[2]=60
    assert s0["PL"] == [10, 0, 60]
    assert s0["GQ"] == 10
    # s1 has no C in LA -> downcoded hom-ref, PL missing, GQ falls back
    assert s1["GT"] == 0
    assert s1["PL"] is None
    assert s1["GQ"] == 25

    # --- allele G (global 2) ---
    s0g, s1g = ag[ENTRIES]
    assert s0g["GT"] == 1
    assert s0g["AD"] == [7, 7]
    # wrt local_a=2: j=0->0, j=1->0, j=2->0, j=3->1, j=4->1, j=5->2
    # PL[0]=min(50,40,60)=40, PL[1]=min(10,0)=0, PL[2]=20
    assert s0g["PL"] == [40, 0, 20]
    # s1: G is local 1: LGT=[0,1] -> GT=1; LAD=[8,3] -> AD=[8,3]
    assert s1g["GT"] == 1
    assert s1g["AD"] == [8, 3]
    assert s1g["PL"] == [15, 0, 45]
    assert s1g["GQ"] == 15


def test_sparse_split_multi_biallelic_passthrough(spark):
    schema = (
        "locus struct<contig:string,position:int>, alleles array<string>, "
        + ENTRIES
        + " array<struct<GT:int,LGT:array<int>,LA:array<int>,phased:boolean,"
        "LAD:array<int>,DP:int,GQ:int,LPL:array<int>>>"
    )
    rows = [
        {
            "locus": {"contig": "1", "position": 7},
            "alleles": ["AT", "CT"],  # min_rep trims to A/C
            ENTRIES: [
                {"GT": 2, "LGT": [1, 1], "LA": [0, 1], "phased": False,
                 "LAD": [0, 9], "DP": 9, "GQ": 40, "LPL": [99, 45, 0]},
            ],
        }
    ]
    df = spark.createDataFrame(rows, schema)
    vmt = MatrixTable(df, ("locus", "alleles"), [{"s": "x"}], ("s",))
    out = hx.sparse_split_multi(vmt)
    r = out._df.collect()[0]
    # biallelic: not split, alleles NOT min-repped (reference contract)
    assert r["was_split"] is False and r["a_index"] == 1
    assert r["alleles"] == ["AT", "CT"]
    e = r[ENTRIES][0]
    assert e["GT"] == 2 and e["AD"] == [0, 9] and e["PL"] == [99, 45, 0]


# ---------------------------------------------------------------------- #
# densify / block-matrix export / ndarray packing / loop
# ---------------------------------------------------------------------- #
def test_densify_merged_sparse(spark):
    # ref blocks: s0 covers 1-10 (DP 7), s1 covers 5-8 (DP 9)
    schema = (
        "locus struct<contig:string,position:int>, alleles array<string>, "
        + ENTRIES
        + " array<struct<GT:int,DP:int,END:int>>"
    )
    rows = [
        {"locus": {"contig": "1", "position": 1}, "alleles": ["N", "<NON_REF>"],
         ENTRIES: [{"GT": None, "DP": 7, "END": 10}, None]},
        {"locus": {"contig": "1", "position": 5}, "alleles": ["N", "<NON_REF>"],
         ENTRIES: [None, {"GT": None, "DP": 9, "END": 8}]},
        # variant at 6: s0 missing (covered by block), s1 has a call
        {"locus": {"contig": "1", "position": 6}, "alleles": ["A", "T"],
         ENTRIES: [None, {"GT": 2, "DP": 4, "END": None}]},
        # variant at 9: s1's block ended at 8 -> stays missing
        {"locus": {"contig": "1", "position": 9}, "alleles": ["C", "G"],
         ENTRIES: [None, None]},
    ]
    df = spark.createDataFrame(rows, schema)
    mt = MatrixTable(df, ("locus", "alleles"), [{"s": "s0"}, {"s": "s1"}], ("s",))
    out = hx.densify(mt)
    got = {r["locus"]["position"]: r[ENTRIES] for r in out._df.collect()}
    # reference semantics: ALL rows kept (block rows too), END dropped,
    # filled entries copied verbatim (GT stays missing)
    assert set(got) == {1, 5, 6, 9}
    e6 = got[6]
    assert e6[0]["GT"] is None and e6[0]["DP"] == 7  # filled from s0's block
    assert e6[1]["GT"] == 2 and e6[1]["DP"] == 4     # real call kept
    assert "END" not in e6[0].asDict()
    e9 = got[9]
    assert e9[0]["GT"] is None and e9[0]["DP"] == 7  # s0 block covers 9
    assert e9[1] is None                              # s1's block ended at 8
    # the second block row: s0's earlier block fills s0's missing entry
    e5 = got[5]
    assert e5[0]["DP"] == 7 and e5[1]["DP"] == 9


def test_export_block_matrices(spark, tmp_path):
    from hail_spark.linalg.blockmatrix import BlockMatrix

    a = np.arange(6, dtype=float).reshape(2, 3)
    bm = BlockMatrix.from_numpy(spark, a, 2)
    hx.export_block_matrices([bm], str(tmp_path / "bm"), delimiter="\t")
    import glob, csv

    rows = []
    for fp in glob.glob(str(tmp_path / "bm0" / "*.csv")):
        with open(fp) as fh:
            rows.extend(list(csv.DictReader(fh, delimiter="\t")))
    got = {(int(r["i"]), int(r["j"])): float(r["v"]) for r in rows}
    assert got == {(i, j): a[i, j] for i in range(2) for j in range(3)}


def test_mt_to_table_of_ndarray(spark):
    mt = _mk_mt(spark, list(range(1, 11)), ["a", "b", "c"], lambda p, s: (p + s) % 3)
    out = hx.mt_to_table_of_ndarray(mt, block_size=4).collect()
    assert [r["__block"] for r in out] == [0, 1, 2]
    shapes = [tuple(r["ndarray"]["shape"]) for r in out]
    assert shapes == [(4, 3), (4, 3), (2, 3)]
    # data round-trips in row-major order
    first = np.array(out[0]["ndarray"]["data"]).reshape(4, 3)
    expect = np.array([[(p + s) % 3 for s in range(3)] for p in range(1, 5)])
    np.testing.assert_array_equal(first, expect)


def test_loop():
    # factorial via the recur continuation
    out = hx.loop(lambda recur, acc, i: recur(acc * i, i + 1) if i <= 5 else acc, None, 1, 1)
    assert out == 120
