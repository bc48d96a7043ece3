"""Reference genome / liftover / sequence tests (ref
ReferenceGenome.scala, functions.py:6185-6571)."""

import pytest
from pyspark.sql import functions as F

from hail_spark.expr.genome import (
    GRCH37,
    GRCH38,
    chain_to_df,
    get_sequence,
    liftover,
    load_fasta,
    parse_chain_file,
    parse_variant,
)


def test_contig_length_and_global_position(spark):
    df = spark.createDataFrame(
        [("1", 100), ("2", 1), ("X", 5), ("nope", 3)],
        "contig string, position int",
    )
    out = df.select(
        "contig",
        GRCH37.contig_length(F.col("contig")).alias("len"),
        GRCH37.global_position(F.col("contig"), F.col("position")).alias("g"),
    ).collect()
    got = {r["contig"]: (r["len"], r["g"]) for r in out}
    assert got["1"] == (249250621, 99)
    assert got["2"] == (243199373, 249250621)
    assert got["X"][0] == 155270560
    assert got["nope"] == (None, None)
    assert GRCH38.total_length > 3e9


def test_locus_from_global_position_roundtrip(spark):
    df = spark.createDataFrame(
        [("1", 1), ("1", 249250621), ("2", 7), ("MT", 16569)],
        "contig string, position int",
    )
    out = df.select(
        "contig",
        "position",
        GRCH37.locus_from_global_position(
            GRCH37.global_position(F.col("contig"), F.col("position"))
        ).alias("l"),
    ).collect()
    for r in out:
        assert (r["l"]["contig"], r["l"]["position"]) == (r["contig"], r["position"])


def test_parse_variant(spark):
    r = (
        spark.range(1)
        .select(parse_variant(F.lit("1:1000:A:T,TC")).alias("v"))
        .first()["v"]
    )
    assert r["locus"]["contig"] == "1" and r["locus"]["position"] == 1000
    assert list(r["alleles"]) == ["A", "T", "TC"]


@pytest.fixture()
def chain(tmp_path, spark):
    # one + strand chain with a 10-base gap, one - strand chain
    text = (
        "chain 100 c1 1000 + 100 400 d1 2000 + 500 810 1\n"
        "150 10 20\n"
        "130\n"
        "\n"
        "chain 90 c2 1000 + 0 50 d2 300 - 0 50 2\n"
        "50\n"
    )
    p = tmp_path / "test.over.chain"
    p.write_text(text)
    return chain_to_df(spark, parse_chain_file(str(p)))


def test_liftover(spark, chain):
    loci = spark.createDataFrame(
        [
            ("c1", 101),   # block 1 start (0-based 100 → dst 500 → 1-based 501)
            ("c1", 250),   # 0-based 249 ∈ block 1 [100,250)? no: 249 < 250 ✓ → 500+149
            ("c1", 255),   # gap (0-based 254 ∈ [250,260)) → null
            ("c1", 261),   # block 2: 0-based 260 → dst 520+150=670 → 671... see chain math
            ("c2", 1),     # - strand: 0-based 0 → fwd dst 300-0-50 + (50-1-0) = 299 → 300
            ("c9", 5),     # unknown contig → null
        ],
        "contig string, position int",
    )
    out = {
        (r["contig"], r["position"]): (
            r["target_contig"],
            r["target_position"],
            r["target_strand"],
        )
        for r in liftover(loci, chain).collect()
    }
    assert out[("c1", 101)] == ("d1", 501, 1)
    assert out[("c1", 250)] == ("d1", 650, 1)
    assert out[("c1", 255)] == (None, None, None)
    # block 2: src [260, 390), dst q_pos = 500+150+20 = 670
    assert out[("c1", 261)] == ("d1", 671, 1)
    # negative strand: q_size=300, q_pos=0, size=50 → fwd start 250;
    # pos0=0 maps to dst 250 + (49 - 0) = 299 → 1-based 300
    assert out[("c2", 1)] == ("d2", 300, -1)
    assert out[("c9", 5)] == (None, None, None)


def test_get_sequence(spark, tmp_path):
    fa = tmp_path / "toy.fa"
    fa.write_text(">ctg desc\nACGTACGT\nAAAA\n>m\nTTTT\n")
    seqs = load_fasta(str(fa))
    assert seqs == {"ctg": "ACGTACGTAAAA", "m": "TTTT"}
    df = spark.createDataFrame(
        [("ctg", 1), ("ctg", 5), ("m", 4), ("zz", 1)],
        "contig string, position int",
    )
    out = {
        (r["contig"], r["position"]): r["s"]
        for r in df.select(
            "contig",
            "position",
            get_sequence(
                spark, seqs, F.col("contig"), F.col("position"), before=1, after=2
            ).alias("s"),
        ).collect()
    }
    assert out[("ctg", 1)] == "ACG"      # no left flank available
    assert out[("ctg", 5)] == "TACG"     # full 1+1+2 window
    assert out[("m", 4)] == "TT"         # right flank clipped
    assert out[("zz", 1)] is None
