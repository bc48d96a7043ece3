"""VariantDataset: densify from reference blocks, merged-sparse view,
coverage — semantics from reference vds/methods.py."""

import pytest
from pyspark.sql import functions as F

from hail_spark.matrixtable import ENTRIES, MatrixTable
from hail_spark.vds import VariantDataset


@pytest.fixture(scope="module")
def vds(spark):
    # 2 samples. Ref blocks: s0 covers [100,250] (DP 20) and [300,400];
    # s1 covers [100,150] only.
    ref_rows = [
        {
            "locus": {"contig": "1", "position": 100},
            ENTRIES: [{"END": 250, "DP": 20}, {"END": 150, "DP": 9}],
        },
        {
            "locus": {"contig": "1", "position": 300},
            ENTRIES: [{"END": 400, "DP": 30}, None],
        },
    ]
    ref_df = spark.createDataFrame(
        ref_rows,
        f"locus struct<contig:string, position:int>, "
        f"{ENTRIES} array<struct<END:int, DP:int>>",
    )
    # Variant sites: 120 (s0 called 0/1; s1 uncalled), 200 (both uncalled),
    # 350 (s1 called 1/1; s0 uncalled), 500 (nobody covered/called)
    var_rows = [
        {"locus": {"contig": "1", "position": 120}, "alleles": ["A", "T"],
         ENTRIES: [{"GT": 1, "DP": 12}, None]},
        {"locus": {"contig": "1", "position": 200}, "alleles": ["G", "C"],
         ENTRIES: [None, None]},
        {"locus": {"contig": "1", "position": 350}, "alleles": ["T", "A"],
         ENTRIES: [None, {"GT": 2, "DP": 7}]},
        {"locus": {"contig": "1", "position": 500}, "alleles": ["C", "G"],
         ENTRIES: [None, None]},
    ]
    var_df = spark.createDataFrame(
        var_rows,
        f"locus struct<contig:string, position:int>, alleles array<string>, "
        f"{ENTRIES} array<struct<GT:int, DP:int>>",
    )
    cols = [{"s": "s0"}, {"s": "s1"}]
    return VariantDataset(
        MatrixTable(ref_df, ("locus",), cols, ("s",)),
        MatrixTable(var_df, ("locus", "alleles"), cols, ("s",)),
    )


def test_to_dense_mt(vds):
    dense = vds.to_dense_mt()
    rows = {r["locus"]["position"]: r[ENTRIES] for r in dense._df.collect()}
    # 120: s0 keeps its call; s1 filled hom-ref from block [100,150] DP 9
    assert rows[120][0]["GT"] == 1 and rows[120][0]["DP"] == 12
    assert rows[120][1]["GT"] == 0 and rows[120][1]["DP"] == 9
    # 200: s0 filled from [100,250] DP 20; s1 NOT covered (block ends 150)
    assert rows[200][0]["GT"] == 0 and rows[200][0]["DP"] == 20
    assert rows[200][1] is None
    # 350: s0 filled from [300,400]; s1 keeps its 1/1
    assert rows[350][0]["GT"] == 0 and rows[350][0]["DP"] == 30
    assert rows[350][1]["GT"] == 2
    # 500: nobody covered → both missing
    assert rows[500][0] is None and rows[500][1] is None


def test_merged_sparse_and_coverage(vds):
    m = vds.to_merged_sparse_mt()
    assert m.count_rows() == 6  # 4 variant + 2 ref rows
    ref_rows = m._df.filter(F.col("is_ref_block")).count()
    assert ref_rows == 2
    cov = {r["s"]: r["bases_covered"] for r in vds.interval_coverage().collect()}
    assert cov["s0"] == (250 - 100 + 1) + (400 - 300 + 1)
    assert cov["s1"] == 150 - 100 + 1


def test_filters_and_roundtrip(vds, tmp_path, spark):
    sub = vds.filter_samples(["s1"])
    assert sub.n_samples() == 1
    chr_none = vds.filter_chromosomes("2")
    assert chr_none.variant_data.count_rows() == 0
    p = str(tmp_path / "vds")
    vds.write(p)
    back = VariantDataset.read(spark, p)
    assert back.variant_data.count_rows() == 4
    assert back.reference_data.count_rows() == 2
    with pytest.raises(ValueError):
        VariantDataset(vds.reference_data, sub.variant_data)


def test_segment_reference_blocks(spark, vds):
    intervals = spark.createDataFrame(
        [("1", 110, 160), ("1", 240, 320), ("2", 1, 10)],
        "contig string, start int, end int",
    )
    seg = vds.segment_reference_blocks(intervals)
    rows = [
        (
            r["locus"]["position"],
            (r["interval"]["start"], r["interval"]["end"]),
            [(e["END"], e["DP"]) if e else None for e in r[ENTRIES]],
        )
        for r in seg._df.orderBy("locus.position", "interval.start").collect()
    ]
    # block s0 [100,250] ∩ [110,160] → [110,160]; s1 [100,150] → [110,150]
    assert rows[0] == (110, (110, 160), [(160, 20), (150, 9)])
    # block s0 [100,250] ∩ [240,320] → [240,250]; s1 block misses → null
    assert rows[1] == (240, (240, 320), [(250, 20), None])
    # block s0 [300,400] ∩ [240,320] → [300,320]; s1 has null entry
    assert rows[2] == (300, (240, 320), [(320, 30), None])
    # nothing on contig 2; no block fully outside all intervals survives
    assert len(rows) == 3
