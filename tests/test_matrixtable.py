"""MatrixTable semantics (modeled on the reference's
test/hail/matrixtable/test_matrix_table.py)."""

import pytest
from pyspark.sql import functions as F

from hail_spark.matrixtable import ENTRIES, MatrixTable
from hail_spark.methods import qc


@pytest.fixture(scope="module")
def mt(spark):
    # 4 variants x 3 samples, GT call ints with some missing
    rows = []
    gts = {
        ("1", 100): [0, 1, 2],
        ("1", 200): [None, 0, 0],
        ("2", 50): [1, 1, None],
        ("2", 75): [2, None, 2],
    }
    for (contig, pos), g in gts.items():
        for i, gt in enumerate(g):
            rows.append(
                {"contig": contig, "pos": pos, "s": f"s{i}", "GT": gt, "DP": 10 + i}
            )
    long = spark.createDataFrame(rows, schema="contig string, pos int, s string, GT int, DP int")
    return MatrixTable.from_long(
        long, row_key=["contig", "pos"], col_key="s", entry_fields=["GT", "DP"]
    )


def test_shape(mt):
    assert mt.count() == (4, 3)
    assert [c["s"] for c in mt._cols] == ["s0", "s1", "s2"]


def test_entries_long(mt):
    e = mt.entries()
    assert e.count() == 12  # posexplode_outer keeps missing entries
    assert set(e.row) >= {"contig", "pos", "s", "GT", "DP"}


def test_filter_rows(mt):
    assert mt.filter_rows(F.col("contig") == "1").count_rows() == 2


def test_filter_cols_choose(mt):
    sub = mt.filter_cols(lambda c: c["s"] != "s1")
    assert sub.count_cols() == 2
    e = sub.entries().filter(F.col("pos") == 100)
    gts = sorted([r["GT"] for r in e.collect()])
    assert gts == [0, 2]


def test_filter_entries_sets_missing(mt):
    f = mt.filter_entries(lambda e: e["GT"] > 0)
    res = f.aggregate_entries(n=F.count(F.col("GT")))
    assert res["n"] == 6  # GTs 1,2 / — / 1,1 / 2,2


def test_annotate_entries(mt):
    a = mt.annotate_entries(lambda e: {"GT2": e["GT"] * 2})
    res = a.aggregate_entries(s=F.sum("GT2"))
    assert res["s"] == 2 * (0 + 1 + 2 + 0 + 0 + 1 + 1 + 2 + 2)


def test_annotate_entries_with_cols(mt):
    a = mt.annotate_entries_with_cols(lambda e, c: {"tag": F.concat(c["s"], F.lit(":"), e["GT"].cast("string"))})
    e = a.entries().filter(F.col("pos") == 100)
    tags = sorted(r["tag"] for r in e.collect() if r["tag"] is not None)
    assert tags == ["s0:0", "s1:1", "s2:2"]


def test_variant_qc(mt):
    v = qc.variant_qc(mt)
    out = {(r["contig"], r["pos"]): r["variant_qc"] for r in v.rows().collect()}
    vq = out[("1", 100)]
    assert vq["n_called"] == 3 and vq["n_het"] == 1 and vq["AC"] == [3, 3]
    vq2 = out[("1", 200)]
    assert vq2["n_called"] == 2 and vq2["call_rate"] == pytest.approx(2 / 3)


def test_sample_qc(mt, spark):
    s = qc.sample_qc(mt)
    out = {r["s"]: r for r in s.collect()}
    assert out["s0"]["n_called"] == 3 and out["s0"]["n_het"] == 1
    assert out["s2"]["n_called"] == 3 and out["s2"]["n_hom_var"] == 2


def test_group_rows_by(mt):
    g = mt.group_rows_by("contig").aggregate(
        mean_dp=lambda e: F.avg(e["DP"]), n_called=lambda e: F.count(e["GT"])
    )
    assert g.count_rows() == 2
    e = g.entries()
    row = {(r["contig"], r["s"]): r["n_called"] for r in e.collect()}
    assert row[("1", "s0")] == 1  # one defined GT for s0 on contig 1


def test_union_rows_cols(mt):
    u = mt.union_rows(mt)
    assert u.count() == (8, 3)
    mt2 = mt.choose_cols([0, 1])
    mt3 = mt.choose_cols([2])
    uc = mt2.union_cols(mt3)
    assert uc.count() == (4, 3)


def test_unfilter_entries(mt):
    f = mt.filter_entries(lambda e: e["GT"] > 0).unfilter_entries({"GT": 0, "DP": 0})
    res = f.aggregate_entries(n=F.count("GT"), s=F.sum("DP"))
    assert res["n"] == 12


def test_write_read(mt, spark, tmp_path):
    p = str(tmp_path / "m.hsm")
    mt.write(p, overwrite=True)
    m2 = MatrixTable.read(spark, p)
    assert m2.count() == (4, 3)
    assert m2.col_key == ("s",)
