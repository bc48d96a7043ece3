"""Parity surface part 2: BlockMatrix / nd / vds / experimental module
completion (ref linalg/blockmatrix.py, nd/nd.py, vds/__init__.py,
experimental/__init__.py)."""

import ast
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

REF = "/root/reference/hail/python/hail"


def _ref_all(path):
    tree = ast.parse(open(path).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if getattr(t, "id", None) == "__all__":
                    return [ast.literal_eval(e) for e in node.value.elts]
    return []


def test_module_all_lists_resolve():
    import hail_spark.experimental as ex
    import hail_spark.vds as vds
    from hail_spark.vds import VariantDataset

    assert [
        n
        for n in _ref_all(f"{REF}/vds/__init__.py")
        if not (hasattr(vds, n) or hasattr(VariantDataset, n))
    ] == []
    assert [n for n in _ref_all(f"{REF}/experimental/__init__.py") if not hasattr(ex, n)] == []


def test_blockmatrix_class_parity():
    from hail_spark.linalg.blockmatrix import BlockMatrix

    def class_methods(path, cls):
        tree = ast.parse(open(path).read())
        for node in ast.walk(tree):
            if isinstance(node, ast.ClassDef) and node.name == cls:
                return [
                    n.name
                    for n in node.body
                    if isinstance(n, ast.FunctionDef) and not n.name.startswith("_")
                ]

    missing = [
        m
        for m in class_methods(f"{REF}/linalg/blockmatrix.py", "BlockMatrix")
        if m not in dir(BlockMatrix) and m not in ("n_rows", "n_cols", "block_size")
    ]
    assert missing == [], missing


def test_blockmatrix_new_surface(spark, tmp_path):
    from hail_spark.linalg.blockmatrix import BlockMatrix

    M = np.arange(12, dtype=float).reshape(4, 3)
    bm = BlockMatrix.from_numpy(spark, M, block_size=2)
    assert bm.shape == (4, 3) and bm.T.shape == (3, 4) and not bm.is_sparse
    assert np.allclose(bm.sqrt().to_ndarray(), np.sqrt(M))
    assert np.allclose(bm.scalar_mul(-1.0).abs().to_numpy(), M)
    assert np.allclose(
        bm.filter([0, 2, 3], [1, 2]).to_numpy(), M[[0, 2, 3]][:, [1, 2]]
    )
    assert np.allclose(BlockMatrix.fill(3, 3, 2.5, block_size=2).to_numpy(), 2.5)
    R = BlockMatrix.random(5, 4, block_size=2, seed=3).to_numpy()
    assert R.shape == (5, 4) and len(np.unique(R)) == 20
    tri = BlockMatrix.from_numpy(spark, np.ones((3, 3)), block_size=2)
    assert np.allclose(tri.sparsify_triangle().to_numpy(), np.triu(np.ones((3, 3))))
    assert np.allclose(
        tri.sparsify_triangle(lower=True).to_numpy(), np.tril(np.ones((3, 3)))
    )
    rows = {r["row_idx"]: r["entries"] for r in bm.to_table_row_major().df.collect()}
    assert rows[2] == list(M[2])
    mtr = bm.to_matrix_table_row_major()
    assert mtr.count() == (4, 3) and mtr._entry_fields() == ["element"]
    assert bm.entries().df.count() == 12
    sparse = bm.sparsify_band(0, 0)
    assert sparse.is_sparse and not sparse.densify().is_sparse
    p = str(tmp_path / "m.bin")
    bm.tofile(p)
    assert np.allclose(BlockMatrix.fromfile(p, 4, 3, block_size=2).to_numpy(), M)
    rp = str(tmp_path / "rects")
    bm.export_rectangles(rp, [(0, 2, 0, 2), (2, 4, 1, 3)])
    got = BlockMatrix.rectangles_to_numpy(rp)
    assert np.allclose(got[(0, 2, 0, 2)], M[0:2, 0:2])
    assert np.allclose(got[(2, 4, 1, 3)], M[2:4, 1:3])


def test_blockmatrix_from_entry_expr(spark):
    from hail_spark.linalg.blockmatrix import BlockMatrix
    from hail_spark.matrixtable import MatrixTable

    mt = MatrixTable.from_parts(
        rows={"r": [1, 2]},
        cols={"s": ["a", "b", "c"]},
        entries={"x": [[1.0, None, 3.0], [4.0, 5.0, 6.0]]},
    )
    bm = BlockMatrix.from_entry_expr(mt, "x", mean_impute=True, block_size=2)
    out = bm.to_numpy()
    assert np.allclose(out, [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    c = BlockMatrix.from_entry_expr(mt, "x", mean_impute=True, center=True, block_size=2).to_numpy()
    assert np.allclose(c.sum(axis=1), 0.0)


def test_nd_completion(spark):
    from hail_spark.expr import functions as hf
    from hail_spark.expr import ndarray as nd

    v = hf.eval(nd.array([[1, 2], [3, 4]]))
    assert v["shape"] == [2, 2] and v["data"] == [1.0, 2.0, 3.0, 4.0]
    cm = hf.eval(
        nd.from_column_major(
            F.array(*[F.lit(float(x)) for x in [1, 3, 2, 4]]), (2, 2)
        )
    )
    assert cm["data"] == [1.0, 2.0, 3.0, 4.0]
    assert hf.eval(nd.identity(2))["data"] == [1.0, 0.0, 0.0, 1.0]
    a, b = nd.array([[1.0, 2.0], [3.0, 4.0]]), nd.array([[5.0], [6.0]])
    assert hf.eval(nd.concatenate([a, b], axis=1))["data"] == [1.0, 2.0, 5.0, 3.0, 4.0, 6.0]
    x = hf.eval(nd.solve_helper(nd.array([[2.0, 0.0], [0.0, 4.0]]), nd.array([2.0, 8.0]), 1))
    assert x["shape"] == [2] and x["data"] == [1.0, 2.0]
    missing = [
        m
        for m in (
            "array from_column_major solve_helper concatenate identity arange full "
            "zeros ones eye diagonal maximum minimum qr svd eigh solve solve_triangular "
            "vstack hstack inv"
        ).split()
        if not hasattr(nd, m)
    ]
    assert missing == [], missing


def test_vds_functions(spark):
    from hail_spark.expr import functions as hf
    from hail_spark.vds import lgt_to_gt, local_to_global

    la = F.array(F.lit(0), F.lit(2))
    assert hf.eval(lgt_to_gt(F.array(F.lit(0), F.lit(1)), la)) == [0, 2]
    # reference doctests (vds/functions.py:32)
    assert hf.eval(
        local_to_global(F.array(F.lit(9), F.lit(10)), la, 3, 0, "R")
    ) == [9, 0, 10]
    assert hf.eval(
        local_to_global(F.array(F.lit(94), F.lit(0), F.lit(123)), la, 3, 999, "G")
    ) == [94, 999, 999, 0, 999, 123]


def test_vds_combiner_plan_roundtrip(tmp_path):
    from hail_spark.vds import load_combiner, new_combiner

    c = new_combiner(
        output_path=str(tmp_path / "out.vds"),
        temp_path=str(tmp_path),
        gvcf_paths=["a.g.vcf", "b.g.vcf"],
    )
    plan = c.save()
    c2 = load_combiner(plan)
    assert c2.output_path == c.output_path and c2.gvcf_paths == ["a.g.vcf", "b.g.vcf"]
    with pytest.raises(ValueError):
        new_combiner(output_path="x", temp_path=str(tmp_path)).run()


def test_experimental_gates_and_roc(spark):
    import hail_spark.experimental as ex
    from hail_spark.table import Table

    with pytest.raises(EnvironmentError):
        ex.load_dataset("gnomad", "1.0")
    with pytest.raises(EnvironmentError):
        ex.DB().annotate_rows_db(None, "x")
    df = spark.createDataFrame(
        [
            {"score": 0.9, "tp": 1, "fp": 0},
            {"score": 0.8, "tp": 1, "fp": 0},
            {"score": 0.7, "tp": 0, "fp": 1},
            {"score": 0.1, "tp": 0, "fp": 1},
        ]
    )
    roc = ex.plot_roc_curve(Table(df, ()), "score")
    assert roc["score"]["auc"] == pytest.approx(1.0)


def test_utils_surface(spark):
    import hail_spark as hs
    import hail_spark.utils as u

    names = _ref_all(f"{REF}/utils/__init__.py")
    assert [n for n in names if not (hasattr(u, n) or hasattr(hs, n))] == []
    assert u.deduplicate(["a", "a", "a"])[1] == ["a", "a_1", "a_2"]
    assert u.deduplicate(["a", "a_1", "a"])[1] == ["a", "a_1", "a_2"]
    assert list(u.chunk(2, [1, 2, 3])) == [[1, 2], [3]]
    fd = u.frozendict(a=1)
    assert hash(fd) is not None
    with pytest.raises(TypeError):
        fd["b"] = 2
    assert list(u.LinkedList().push(1, 2, 3)) == [3, 2, 1]
    assert u.range_table(5).df.count() == 5
    g = u.genomic_range_table(3)
    assert [r["locus"]["position"] for r in g.df.orderBy("locus.position").collect()] == [1, 2, 3]
    assert u.range_matrix_table(2, 3).count() == (2, 3)
    with pytest.raises(EnvironmentError):
        u.get_1kg("/tmp/x")
    with pytest.raises(NotImplementedError):
        u.no_service_backend("thing")


def test_genetics_value_types(tmp_path):
    import hail_spark as hs
    from hail_spark.genetics import AlleleType, Call, Locus, Pedigree, Trio

    names = _ref_all(f"{REF}/genetics/__init__.py")
    assert [n for n in names if not hasattr(hs.genetics, n)] == []
    c = Call([0, 1])
    assert c.is_het() and not c.is_hom_ref() and str(c) == "0/1"
    assert Call([1, 1]).is_hom_var() and Call([1, 1]).unphased_diploid_gt_index() == 2
    assert Call([0, 2], phased=True).__str__() == "0|2"
    loc = Locus.parse("X:1000")
    assert (loc.contig, loc.position) == ("X", 1000)
    ped = Pedigree(
        [Trio("kid", fam_id="f1", pat_id="dad", mat_id="mom", is_female=True), Trio("solo")]
    )
    assert len(ped.complete_trios()) == 1
    p = str(tmp_path / "out.fam")
    ped.write(p)
    assert Pedigree.read(p) == ped
    assert ped.filter_to(["kid"]).trios[0].s == "kid"
    assert AlleleType.SNP.name == "SNP"
    import hail_spark.expr.stats as st

    with pytest.raises(NotImplementedError):
        st.LinearMixedModel(None, None, None)


def test_grouped_surfaces(spark):
    from hail_spark.matrixtable import GroupedMatrixCols, GroupedMatrixRows
    from hail_spark.table import Table

    t = Table(
        spark.createDataFrame([{"k": 1, "v": 2}, {"k": 1, "v": 3}, {"k": 2, "v": 4}]),
        ("k",),
    )
    out = t.group_by("k").partition_hint(2).aggregate(s=F.sum("v"))
    assert sorted((r["k"], r["s"]) for r in out.df.collect()) == [(1, 5), (2, 4)]
    for cls in (GroupedMatrixRows, GroupedMatrixCols):
        assert hasattr(cls, "partition_hint") and hasattr(cls, "aggregate_entries")


def test_winnowing_fingerprints(spark):
    from hail_spark.llmdata.textstats import (
        winnowing_fingerprints,
        winnowing_overlap_pairs,
    )

    df = spark.createDataFrame(
        [
            {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog"},
            {"doc_id": 2, "text": "a quick brown fox jumps over a sleepy cat"},
            {"doc_id": 3, "text": "completely different content here entirely"},
            {"doc_id": 4, "text": "xy"},
        ]
    )
    fp = winnowing_fingerprints(df)
    per_doc = {r["doc_id"]: r["count"] for r in fp.groupBy("doc_id").count().collect()}
    assert 4 not in per_doc and all(per_doc[d] > 5 for d in (1, 2, 3))
    # winnowing guarantee: the shared >= k+w-1 substring yields shared prints
    pairs = {(r["id_a"], r["id_b"]): r["n_shared"] for r in winnowing_overlap_pairs(df).collect()}
    assert pairs.get((1, 2), 0) >= 2 and (1, 3) not in pairs
    # density: ~2/(w+1) of kgram mass kept, never more than all
    n_kgrams = len("the quick brown fox jumps over the lazy dog") - 8 + 1
    assert per_doc[1] <= n_kgrams


def test_vep_json_typ_parses_realistic_output(spark):
    """vep_json_typ must lift a realistic VEP --json line (the shapes
    VEP 95 emits) into fully-typed structs via from_json."""
    import json as _json

    from hail_spark.methods.annotate import vep_json_typ

    line = _json.dumps(
        {
            "assembly_name": "GRCh38",
            "allele_string": "A/T",
            "start": 100, "end": 100, "strand": 1,
            "seq_region_name": "1",
            "id": "rs123",
            "input": "1\t100\t.\tA\tT\t.\t.\t.",
            "most_severe_consequence": "missense_variant",
            "variant_class": "SNV",
            "colocated_variants": [
                {"allele_string": "A/T", "id": "rs123", "start": 100, "end": 100,
                 "minor_allele": "T", "minor_allele_freq": 0.01,
                 "clin_sig": ["benign"], "pubmed": [123456]}
            ],
            "transcript_consequences": [
                {"allele_num": 1, "amino_acids": "K/N", "biotype": "protein_coding",
                 "canonical": 1, "consequence_terms": ["missense_variant"],
                 "gene_id": "ENSG0001", "gene_symbol": "GENE1",
                 "hgvsc": "ENST1:c.1A>T", "impact": "MODERATE",
                 "polyphen_score": 0.9, "polyphen_prediction": "probably_damaging",
                 "sift_score": 0.02, "sift_prediction": "deleterious",
                 "domains": [{"db": "Pfam", "name": "PF0001"}],
                 "strand": 1, "transcript_id": "ENST1", "variant_allele": "T"}
            ],
            "intergenic_consequences": None,
        }
    )
    df = spark.createDataFrame([{"vep": line}])
    parsed = df.select(F.from_json("vep", vep_json_typ()).alias("v")).first()["v"]
    assert parsed["most_severe_consequence"] == "missense_variant"
    tc = parsed["transcript_consequences"][0]
    assert tc["gene_symbol"] == "GENE1" and tc["polyphen_score"] == pytest.approx(0.9)
    assert tc["domains"][0]["db"] == "Pfam"
    cv = parsed["colocated_variants"][0]
    assert cv["minor_allele_freq"] == pytest.approx(0.01) and cv["pubmed"] == [123456]


def test_qc_full_field_sets(spark):
    import numpy as np
    from pyspark.sql import Row

    from hail_spark.matrixtable import MatrixTable
    from hail_spark.methods.qc import sample_qc, variant_qc

    rng = np.random.default_rng(1)
    alleles_list = [["A", "T"], ["A", "AT"], ["AT", "A"], ["C", "G"], ["A", "*"]]
    rows = []
    for i, al in enumerate(alleles_list):
        ents = [
            Row(
                GT=int(rng.integers(0, 3)) if rng.random() > 0.1 else None,
                DP=int(rng.integers(5, 40)),
            )
            for _ in range(6)
        ]
        rows.append(
            {"locus": {"contig": "1", "position": 100 + i}, "alleles": al, "__entries": ents}
        )
    df = spark.createDataFrame(
        rows,
        "locus struct<contig:string,position:int>, alleles array<string>, "
        "__entries array<struct<GT:int,DP:int>>",
    )
    mt = MatrixTable(df, ("locus", "alleles"), [{"s": f"s{j}"} for j in range(6)], ("s",))
    sq = sample_qc(mt)
    for f in (
        "call_rate n_called n_not_called n_filtered n_het n_hom_ref n_hom_var "
        "n_non_ref n_singleton n_snp n_insertion n_deletion n_transition "
        "n_transversion n_star r_ti_tv r_het_hom_var r_insertion_deletion dp_stats"
    ).split():
        assert f in sq.columns, f
    tot = sq.agg(
        F.sum("n_snp").alias("snp"), F.sum("n_star").alias("star"), F.sum("n_called").alias("nc")
    ).first()
    assert tot["nc"] > 0 and tot["snp"] >= 0
    vq = variant_qc(mt)._df.orderBy("locus.position").first()["variant_qc"]
    for f in (
        "call_rate n_called n_not_called n_filtered n_het n_hom_ref n_hom_var "
        "n_non_ref AN AC AF het_freq_hwe p_value_hwe p_value_excess_het dp_stats"
    ).split():
        assert f in vq.asDict(), f
    # two-sided + one-sided p's complement around the same distribution
    assert 0.0 <= vq["p_value_hwe"] <= 1.0 and 0.0 <= vq["p_value_excess_het"] <= 1.0
    assert vq["dp_stats"]["min"] <= vq["dp_stats"]["mean"] <= vq["dp_stats"]["max"]


def test_concordance_reference_triple(spark):
    from hail_spark.matrixtable import MatrixTable
    from hail_spark.methods.genetics import concordance

    def mk(gts):
        m = MatrixTable.from_parts(rows={"r": [1, 2, 3]}, cols={"s": ["a", "b"]}, entries={"GT": gts})
        return MatrixTable(m._df, ("row_idx",), [{"s": "a"}, {"s": "b"}], ("s",))

    m1 = mk([[0, 1], [2, None], [1, 1]])
    m2 = mk([[0, 1], [1, None], [0, 0]])
    g, cols_t, rows_t = concordance(m1, m2)
    # states: 1=no-call 2=homref 3=het 4=homvar; hand-counted pairs
    assert g[2][2] == 1 and g[3][3] == 1 and g[4][3] == 1 and g[1][1] == 1 and g[3][2] == 2
    assert sum(map(sum, g)) == 6  # 3 rows x 2 samples
    cols = {r["s"]: r for r in cols_t.df.collect()}
    assert cols["a"]["n_discordant"] == 2 and cols["b"]["n_discordant"] == 1
    rows = {r["row_idx"]: r["n_discordant"] for r in rows_t.df.collect()}
    assert rows == {0: 0, 1: 1, 2: 2}
    # self-concordance has zero discordance and a diagonal summary
    gs, cs, rs = concordance(m1, m1)
    assert all(gs[i][j] == 0 for i in range(2, 5) for j in range(2, 5) if i != j)
    assert all(r["n_discordant"] == 0 for r in cs.df.collect())


def test_mendel_errors_four_tables(spark):
    from pyspark.sql import Row

    from hail_spark.matrixtable import MatrixTable
    from hail_spark.methods.genetics import mendel_errors

    ents = [
        [Row(GT=1), Row(GT=0), Row(GT=0)],  # kid het, parents hom-ref -> code 2
        [Row(GT=1), Row(GT=0), Row(GT=2)],  # consistent
        [Row(GT=0), Row(GT=2), Row(GT=2)],  # both hom-var, kid hom-ref -> code 8
    ]
    rows = [
        {"locus": {"contig": "1", "position": 100 + i}, "alleles": ["A", "T"], "__entries": e}
        for i, e in enumerate(ents)
    ]
    df = spark.createDataFrame(
        rows,
        "locus struct<contig:string,position:int>, alleles array<string>, "
        "__entries array<struct<GT:int>>",
    )
    mt = MatrixTable(df, ("locus", "alleles"), [{"s": "kid"}, {"s": "dad"}, {"s": "mom"}], ("s",))
    fam = spark.createDataFrame(
        [{"fam_id": "f1", "id": "kid", "pat_id": "dad", "mat_id": "mom", "is_female": True}]
    )
    errs, per_fam, per_sample, per_variant = mendel_errors(mt, fam)
    codes = sorted(r["mendel_code"] for r in errs.df.collect())
    assert codes == [2, 8]
    e0 = errs.df.first()
    assert e0["fam_id"] == "f1" and e0["s"] == "kid"
    # per-family: keyed by parents, with children + snp splits (ADVICE r03)
    pf = per_fam.df.first()
    assert (pf["pat_id"], pf["mat_id"], pf["fam_id"]) == ("dad", "mom", "f1")
    assert pf["children"] == 1 and pf["errors"] == 2 and pf["snp_errors"] == 2
    # per-individual: code 2 implicates dad+mom+kid, code 8 only kid
    # (ref family_methods.py:309 Implicated column)
    ps = {r["s"]: r for r in per_sample.df.collect()}
    assert set(ps) == {"kid", "dad", "mom"}
    assert ps["kid"]["errors"] == 2 and ps["kid"]["snp_errors"] == 2
    assert ps["dad"]["errors"] == 1 and ps["mom"]["errors"] == 1
    assert ps["dad"]["fam_id"] == "f1"
    # per-variant covers ALL rows, zero-filled
    pv = {r["locus"]["position"]: r["errors"] for r in per_variant.df.collect()}
    assert pv == {100: 1, 101: 0, 102: 1}


def test_sample_qc_allele_dosage_and_homozygote_count(spark):
    """ADVICE r03: sample_qc allele-type counts are per alternate ALLELE
    (hom-var contributes 2, ref qc.py:173-200), and variant_qc carries
    homozygote_count (ref qc.py:219)."""
    from hail_spark.matrixtable import MatrixTable
    from hail_spark.methods.qc import sample_qc, variant_qc

    # 3 variants (SNP-ti, SNP-tv, Insertion) x 2 samples, fixed GTs:
    # s0: [2, 1, 0]  s1: [1, 2, 2]
    gts = [[2, 1], [1, 2], [0, 2]]
    rows = []
    alleles_list = [["A", "G"], ["A", "T"], ["A", "AT"]]
    for i, (al, g) in enumerate(zip(alleles_list, gts)):
        rows.append(
            {
                "locus": {"contig": "1", "position": 100 + i},
                "alleles": al,
                "__entries": [{"GT": g[0]}, {"GT": g[1]}],
            }
        )
    df = spark.createDataFrame(
        rows,
        "locus struct<contig:string,position:int>, alleles array<string>, "
        "__entries array<struct<GT:int>>",
    )
    mt = MatrixTable(
        df, ("locus", "alleles"), [{"s": "s0"}, {"s": "s1"}], ("s",)
    )
    sq = {r["s"]: r for r in sample_qc(mt).collect()}
    # s0: SNP-ti hom-var (2) + SNP-tv het (1) = n_snp 3, ti 2, tv 1, ins 0
    assert sq["s0"]["n_snp"] == 3
    assert sq["s0"]["n_transition"] == 2
    assert sq["s0"]["n_transversion"] == 1
    assert sq["s0"]["n_insertion"] == 0
    # s1: SNP-ti het (1) + SNP-tv hom-var (2) = 3; ins hom-var (2)
    assert sq["s1"]["n_snp"] == 3
    assert sq["s1"]["n_transition"] == 1
    assert sq["s1"]["n_transversion"] == 2
    assert sq["s1"]["n_insertion"] == 2
    vq = {
        r["locus"]["position"]: r["variant_qc"]
        for r in variant_qc(mt, hwe=False)._df.collect()
    }
    assert list(vq[100]["homozygote_count"]) == [0, 1]  # s0 hom-var
    assert list(vq[102]["homozygote_count"]) == [1, 1]  # s0 hom-ref, s1 hom-var
