"""lambda_gc, filter_intervals, rename_duplicates, segment_intervals,
simulate_random_mating, spectral moments, import_matrix_table, VCF
header metadata — round-2 parity surface (ref methods/misc.py,
statgen.py:3097, pca.py:426/458, impex.py:1974/2740,
relatedness/mating_simulation.py)."""

import math
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from hail_spark.expr import functions as hf
from hail_spark.io import impex
from hail_spark.matrixtable import ENTRIES, MatrixTable
from hail_spark.methods import misc, relatedness, statgen
from hail_spark.table import Table


# ---------------------------------------------------------------------- #
# lambda_gc
# ---------------------------------------------------------------------- #
def test_lambda_gc_uniform_pvalues(spark):
    # p ~ U(0,1) exactly: median chisq == theoretical median -> lambda == 1
    n = 10001
    df = spark.range(n).select(((F.col("id") + 1) / (n + 1)).alias("p"))
    lam = misc.lambda_gc(df, "p", approximate=False)
    assert abs(lam - 1.0) < 0.01
    lam_approx = misc.lambda_gc(df, "p", approximate=True)
    assert abs(lam_approx - 1.0) < 0.02


def test_lambda_gc_inflated(spark):
    # chisq stats scaled by 2 -> lambda == 2
    from hail_spark.expr.stats import pchisqtail

    rng = np.random.default_rng(5)
    chis = rng.chisquare(1, 4000) * 2.0
    ps = [float(pchisqtail(c, 1)) for c in chis]
    df = spark.createDataFrame([(p,) for p in ps], "p double")
    lam = misc.lambda_gc(df, "p", approximate=False)
    assert abs(lam - 2.0) < 0.15


# ---------------------------------------------------------------------- #
# filter_intervals
# ---------------------------------------------------------------------- #
def test_filter_intervals_scalar_key(spark):
    t = Table(spark.range(100).select(F.col("id").cast("int").alias("k")), ("k",))
    ivs = [
        {"start": 10, "end": 20, "includes_start": True, "includes_end": False},
        {"start": 50, "end": 55, "includes_start": False, "includes_end": True},
    ]
    kept = sorted(r["k"] for r in misc.filter_intervals(t, ivs).df.collect())
    assert kept == list(range(10, 20)) + list(range(51, 56))
    dropped = misc.filter_intervals(t, ivs, keep=False).df.count()
    assert dropped == 100 - len(kept)


def test_filter_intervals_locus_key(spark):
    rows = [
        {"locus": {"contig": c, "position": p}}
        for c in ("1", "2")
        for p in range(1, 21)
    ]
    df = spark.createDataFrame(rows, "locus struct<contig:string,position:int>")
    t = Table(df, ("locus",))
    ivs = [
        {
            "start": {"contig": "1", "position": 5},
            "end": {"contig": "1", "position": 10},
            "includes_start": True,
            "includes_end": True,
        }
    ]
    kept = misc.filter_intervals(t, ivs).df.collect()
    assert sorted(r["locus"]["position"] for r in kept) == list(range(5, 11))
    assert all(r["locus"]["contig"] == "1" for r in kept)


# ---------------------------------------------------------------------- #
# rename_duplicates
# ---------------------------------------------------------------------- #
def _tiny_mt(spark, samples):
    df = spark.createDataFrame(
        [{"v": 1, ENTRIES: [{"GT": i % 3} for i in range(len(samples))]}],
        f"v int, {ENTRIES} array<struct<GT:int>>",
    )
    return MatrixTable(df, ("v",), [{"s": s} for s in samples], ("s",))


def test_rename_duplicates(spark):
    mt = _tiny_mt(spark, ["a", "b", "a", "a", "b_1", "b"])
    out = misc.rename_duplicates(mt)
    uids = [c["unique_id"] for c in out._cols]
    assert uids == ["a", "b", "a_1", "a_2", "b_1", "b_2"]
    assert len(set(uids)) == len(uids)
    # original key column untouched
    assert [c["s"] for c in out._cols] == ["a", "b", "a", "a", "b_1", "b"]


# ---------------------------------------------------------------------- #
# segment_intervals
# ---------------------------------------------------------------------- #
def test_segment_intervals(spark):
    rows = [
        {"iv": {"start": 0, "end": 10, "includes_start": True, "includes_end": False}, "x": "A"},
        {"iv": {"start": 10, "end": 14, "includes_start": True, "includes_end": False}, "x": "B"},
    ]
    df = spark.createDataFrame(
        rows, "iv struct<start:int,end:int,includes_start:boolean,includes_end:boolean>, x string"
    )
    t = Table(df, ("iv",))
    out = misc.segment_intervals(t, [3, 7, 12]).df.collect()
    a = sorted(
        ((r["iv"]["start"], r["iv"]["end"]) for r in out if r["x"] == "A")
    )
    b = sorted(
        ((r["iv"]["start"], r["iv"]["end"]) for r in out if r["x"] == "B")
    )
    assert a == [(0, 3), (3, 7), (7, 10)]
    assert b == [(10, 12), (12, 14)]
    # uncut interval passes through unchanged
    out2 = misc.segment_intervals(t, [100]).df.collect()
    assert len(out2) == 2


def test_segment_intervals_point_on_boundary(spark):
    rows = [{"iv": {"start": 5, "end": 9, "includes_start": True, "includes_end": False}}]
    df = spark.createDataFrame(
        rows, "iv struct<start:int,end:int,includes_start:boolean,includes_end:boolean>"
    )
    t = Table(df, ("iv",))
    # points equal to endpoints do not cut
    out = misc.segment_intervals(t, [5, 9]).df.collect()
    assert len(out) == 1
    assert (out[0]["iv"]["start"], out[0]["iv"]["end"]) == (5, 9)


# ---------------------------------------------------------------------- #
# simulate_random_mating
# ---------------------------------------------------------------------- #
def _geno_mt(spark, n_samples=6, n_rows=40, seed=3):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_rows):
        rows.append(
            {
                "locus": {"contig": "1", "position": i + 1},
                ENTRIES: [{"GT": int(g)} for g in rng.integers(0, 3, n_samples)],
            }
        )
    df = spark.createDataFrame(
        rows, f"locus struct<contig:string,position:int>, {ENTRIES} array<struct<GT:int>>"
    )
    return MatrixTable(df, ("locus",), [{"s": f"s{j}"} for j in range(n_samples)], ("s",))


def test_simulate_random_mating_shapes(spark):
    mt = _geno_mt(spark)
    out = relatedness.simulate_random_mating(mt, n_rounds=2, generation_size_multiplier=1.0)
    # generations: 6 founders + 6 + 12 offspring
    assert len(out._cols) == 6 + 6 + 12
    row = out._df.select(ENTRIES).first()[ENTRIES]
    assert len(row) == 24
    # founders preserved verbatim
    orig = mt._df.select(ENTRIES).first()[ENTRIES]
    assert [e["GT"] for e in row[:6]] == [e["GT"] for e in orig]
    # children GTs are valid diploid dosage values
    assert all(e["GT"] in (0, 1, 2) for e in row if e["GT"] is not None)


def test_simulate_random_mating_mendelian_consistency(spark):
    # hom_ref x hom_ref -> child hom_ref; hom_var x hom_var -> hom_var
    df = spark.createDataFrame(
        [
            {"locus": {"contig": "1", "position": 1}, ENTRIES: [{"GT": 0}, {"GT": 0}]},
            {"locus": {"contig": "1", "position": 2}, ENTRIES: [{"GT": 2}, {"GT": 2}]},
        ],
        f"locus struct<contig:string,position:int>, {ENTRIES} array<struct<GT:int>>",
    )
    mt = MatrixTable(df, ("locus",), [{"s": "m"}, {"s": "f"}], ("s",))
    out = relatedness.simulate_random_mating(mt, n_rounds=1, generation_size_multiplier=2.0)
    rows = {r["locus"]["position"]: r[ENTRIES] for r in out._df.collect()}
    assert all(e["GT"] == 0 for e in rows[1][2:])
    assert all(e["GT"] == 2 for e in rows[2][2:])


def test_simulate_random_mating_no_founders(spark):
    mt = _geno_mt(spark)
    out = relatedness.simulate_random_mating(
        mt, n_rounds=2, generation_size_multiplier=1.0, keep_founders=False
    )
    assert len(out._cols) == 6
    assert len(out._df.select(ENTRIES).first()[ENTRIES]) == 6


# ---------------------------------------------------------------------- #
# spectral moments
# ---------------------------------------------------------------------- #
def test_spectral_moments_match_exact(spark):
    # small dense matrix: Krylov-subspace Hutchinson vs exact trace powers
    mt = _geno_mt(spark, n_samples=8, n_rows=60, seed=11)
    from hail_spark.methods.statgen import _hwe_normalized_bm, _spectral_moments

    A, _, _ = _hwe_normalized_bm(mt, "GT", 32)
    An = A.to_numpy()
    C = An.T @ An
    exact = [np.trace(np.linalg.matrix_power(C, i)) for i in (1, 2, 3)]
    moments, stdevs = _spectral_moments(
        mt, 3, p=3, moment_samples=7, block_size=32, seed=7
    )
    # with moment_samples close to n and a deep subspace this is tight
    for est, ex in zip(moments, exact):
        assert abs(est - ex) / max(abs(ex), 1e-9) < 0.35
    assert all(s >= 0 for s in stdevs)


def test_pca_and_moments(spark):
    mt = _geno_mt(spark, n_samples=8, n_rows=60, seed=12)
    evals, scores_df, _lo, moments, stdevs = statgen._pca_and_moments(
        mt, k=3, num_moments=3, q_iterations=4, moment_samples=4, block_size=32
    )
    assert len(evals) == 3
    assert scores_df.count() == 8
    from hail_spark.methods.statgen import _hwe_normalized_bm

    A, _, _ = _hwe_normalized_bm(mt, "GT", 32)
    An = A.to_numpy()
    C = An.T @ An
    exact1 = np.trace(C)
    # first moment (trace) is the easiest: exact top-k part + projected rest
    assert abs(moments[0] - exact1) / exact1 < 0.35


def test_linear_mixed_model_stub():
    with pytest.raises(NotImplementedError):
        statgen.linear_mixed_model(None)
    with pytest.raises(NotImplementedError):
        statgen.linear_mixed_regression_rows(None)


# ---------------------------------------------------------------------- #
# import_matrix_table + VCF metadata
# ---------------------------------------------------------------------- #
def test_import_matrix_table(spark, tmp_path):
    p = tmp_path / "m.tsv"
    p.write_text(
        "gene\tannot\tS1\tS2\tS3\n"
        "g1\ta\t1\t2\tNA\n"
        "g2\tb\t4\tNA\t6\n"
    )
    mt = impex.import_matrix_table(
        spark, str(p), row_fields={"gene": "str", "annot": "str"}, row_key=["gene"]
    )
    assert [c["col_id"] for c in mt._cols] == ["S1", "S2", "S3"]
    rows = {r["gene"]: r[ENTRIES] for r in mt._df.collect()}
    assert [e["x"] for e in rows["g1"]] == [1, 2, None]
    assert [e["x"] for e in rows["g2"]] == [4, None, 6]


def test_import_matrix_table_no_header(spark, tmp_path):
    p = tmp_path / "m2.tsv"
    p.write_text("r1\t1.5\t2.5\nr2\t3.0\tNA\n")
    mt = impex.import_matrix_table(
        spark,
        str(p),
        row_fields={"row_id": "str"},
        entry_type="float64",
        no_header=True,
    )
    assert [c["col_id"] for c in mt._cols] == ["col0", "col1"]
    rows = {r["row_id"]: r[ENTRIES] for r in mt._df.collect()}
    assert [e["x"] for e in rows["r1"]] == [1.5, 2.5]
    assert [e["x"] for e in rows["r2"]] == [3.0, None]


def test_get_vcf_metadata(tmp_path):
    p = tmp_path / "x.vcf"
    p.write_text(
        "##fileformat=VCFv4.2\n"
        '##FILTER=<ID=LowQual,Description="Low quality">\n'
        '##INFO=<ID=MQ,Number=1,Type=Float,Description="RMS Mapping Quality">\n'
        '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="Read Depth">\n'
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tNA1\tNA2\n"
        "1\t1\t.\tA\tT\t.\t.\t.\tGT\t0/1\t1/1\n"
    )
    md = impex.get_vcf_metadata(str(p))
    assert md["filter"]["LowQual"]["Description"] == "Low quality"
    assert md["info"]["MQ"] == {
        "Description": "RMS Mapping Quality", "Number": "1", "Type": "Float"
    }
    assert md["format"]["DP"]["Type"] == "Integer"
    hi = impex.get_vcf_header_info(str(p))
    assert hi["sampleIDs"] == ["NA1", "NA2"]


# ---------------------------------------------------------------------- #
# vep / nirvana subprocess plumbing (stub annotator command)
# ---------------------------------------------------------------------- #
def test_vep_plumbing_with_stub_command(spark, tmp_path):
    from hail_spark.methods import annotate

    # stub annotator: echoes one JSON object per input line
    stub = tmp_path / "fake_vep.py"
    stub.write_text(
        "import sys, json\n"
        "for line in sys.stdin:\n"
        "    f = line.rstrip('\\n').split('\\t')\n"
        "    print(json.dumps({'input': f[0] + ':' + f[1], 'ref': f[3]}))\n"
    )
    df = spark.createDataFrame(
        [
            {"locus": {"contig": "1", "position": 100}, "alleles": ["A", "T"]},
            {"locus": {"contig": "2", "position": 5}, "alleles": ["G", "C", "GC"]},
        ],
        "locus struct<contig:string,position:int>, alleles array<string>",
    )
    out = annotate.vep(df, command=["python", str(stub)], block_size=1)
    rows = {r["locus"]["position"]: r for r in out.collect()}
    import json as _json

    v100 = _json.loads(rows[100]["vep"])
    assert v100 == {"input": "1:100", "ref": "A"}
    v5 = _json.loads(rows[5]["vep"])
    assert v5["ref"] == "G"


def test_vep_missing_binary_raises(spark):
    from hail_spark.methods import annotate

    df = spark.createDataFrame(
        [{"locus": {"contig": "1", "position": 1}, "alleles": ["A", "T"]}],
        "locus struct<contig:string,position:int>, alleles array<string>",
    )
    with pytest.raises(EnvironmentError):
        annotate.vep(df)
    with pytest.raises(EnvironmentError):
        annotate.nirvana(df)


def test_nirvana_plumbing_with_stub_command(spark, tmp_path):
    from hail_spark.methods import annotate

    stub = tmp_path / "fake_nirvana.py"
    stub.write_text(
        "import sys, json\n"
        "for line in sys.stdin:\n"
        "    f = line.rstrip('\\n').split('\\t')\n"
        "    print(json.dumps({'chrom': f[0], 'alts': f[4]}))\n"
    )
    df = spark.createDataFrame(
        [{"locus": {"contig": "7", "position": 9}, "alleles": ["AT", "A"]}],
        "locus struct<contig:string,position:int>, alleles array<string>",
    )
    out = annotate.nirvana(df, command=["python", str(stub)])
    import json as _json

    got = _json.loads(out.collect()[0]["nirvana"])
    assert got == {"chrom": "7", "alts": "A"}


def test_vep_full_path_against_fake_binary(spark, monkeypatch):
    """r03 verdict item 8: the WHOLE vep() path — PATH resolution via
    shutil.which, VEPConfig command/env, per-partition subprocess,
    block framing, JSON validation, and the vep_json_typ lift — runs
    end-to-end against the checked-in reference-shaped fake
    (tests/fixtures/vep)."""
    import json as _json
    import os

    from pyspark.sql import functions as F

    from hail_spark.methods import annotate

    fixdir = os.path.join(os.path.dirname(__file__), "fixtures")
    monkeypatch.setenv("PATH", fixdir + os.pathsep + os.environ["PATH"])
    df = spark.createDataFrame(
        [
            {"locus": {"contig": "1", "position": 100 + i},
             "alleles": ["A", "T"] if i % 2 == 0 else ["AC", "A"]}
            for i in range(10)
        ],
        "locus struct<contig:string,position:int>, alleles array<string>",
    ).repartition(3)
    # default path: binary found on PATH, --json mode
    out = annotate.vep(df, block_size=4)
    rows = {r["locus"]["position"]: r for r in out.collect()}
    assert len(rows) == 10
    v = _json.loads(rows[100]["vep"])
    assert v["most_severe_consequence"] == "missense_variant"
    assert v["transcript_consequences"][0]["biotype"] == "protein_coding"
    v_indel = _json.loads(rows[101]["vep"])
    assert v_indel["variant_class"] == "indel"
    # typed lift through the reference's vep_json_typ schema
    typed = out.select(
        F.col("locus"),
        F.from_json("vep", annotate.vep_json_typ()).alias("v"),
    )
    t = {r["locus"]["position"]: r["v"] for r in typed.collect()}
    assert t[100]["seq_region_name"] == "1" and t[100]["start"] == 100
    assert t[100]["transcript_consequences"][0]["impact"] == "MODERATE"
    assert t[100]["transcript_consequences"][0]["gene_symbol"].startswith("GENE")
    # VEPConfig: explicit command + env overlay reaches the subprocess
    cfg = annotate.VEPConfig(
        command=[os.path.join(fixdir, "vep"), "--json"],
        env={"VEP_FAKE_TAG": "cfg-env"},
    )
    out2 = annotate.vep(df, config=cfg, block_size=1000)
    v2 = _json.loads(out2.collect()[0]["vep"])
    assert v2["id"] == "cfg-env"
