"""Shard-then-concatenate writer + bounded-state aggregation paths
(io/shard.py, downsample_table, array_sum_fixed)."""

import os

from pyspark.sql import functions as F

from hail_spark.expr.aggregators import array_sum_fixed, downsample_table
from hail_spark.io.shard import concat_shards, write_shards


def test_write_shards_preserves_partition_order(spark, tmp_path):
    df = spark.range(0, 100, numPartitions=7).orderBy("id")

    def encode(it):
        chunks, n = [], 0
        for r in it:
            chunks.append(f"{r['id']}\n".encode())
            n += 1
        return chunks, n

    shard_dir = str(tmp_path / "shards")
    shards = write_shards(df, shard_dir, encode)
    assert sum(n for _, n in shards) == 100
    out = str(tmp_path / "out.txt")
    concat_shards([p for p, _ in shards], out, header=b"# hdr\n")
    lines = open(out).read().splitlines()
    assert lines[0] == "# hdr"
    # globally ordered input => concatenated shards are globally ordered
    assert [int(x) for x in lines[1:]] == list(range(100))
    # shards are cleaned up by concat_shards
    assert os.listdir(shard_dir) == []


def test_downsample_table_bounded_and_correct(spark):
    rows = [{"g": i % 2, "x": (i % 50) / 100.0, "y": (i % 7) / 10.0} for i in range(5000)]
    df = spark.createDataFrame(rows)
    out = downsample_table(
        df, F.col("x"), F.col("y"), group_cols=("g",), n_divisions=10
    ).collect()
    assert len(out) == 2
    for r in out:
        cells = {
            (int(p["x"] * 10), int(p["y"] * 10)) for p in r["points"]
        }
        # one representative per occupied cell, bounded by the grid
        assert len(r["points"]) == len(cells) <= 100
    expect = {(int(x * 10 // 1), int(y * 10 // 1)) for x, y in
              ((r["x"], r["y"]) for r in rows)}
    got = {(int(p["x"] * 10), int(p["y"] * 10))
           for r in out for p in r["points"]}
    assert got == expect


def test_array_sum_fixed_matches_python(spark):
    rows = [{"g": i % 3, "v": [float(i), float(i * 2), float(i % 5)]} for i in range(200)]
    # a couple of missing arrays are skipped, as in hl.agg.array_sum
    rows[7]["v"] = None
    rows[19]["v"] = None
    df = spark.createDataFrame(rows, "g int, v array<double>")
    got = {
        r["g"]: r["s"]
        for r in df.groupBy("g").agg(array_sum_fixed(F.col("v"), 3).alias("s")).collect()
    }
    want = {}
    for r in rows:
        if r["v"] is None:
            continue
        acc = want.setdefault(r["g"], [0.0, 0.0, 0.0])
        for i, x in enumerate(r["v"]):
            acc[i] += x
    for g, arr in want.items():
        assert [round(v, 9) for v in got[g]] == [round(v, 9) for v in arr]
