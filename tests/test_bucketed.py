"""Bucketed tables (io/bucketed.py): the joins and aggs on the bucket
key must run with ZERO Exchange operators."""

import pytest
from pyspark.sql import functions as F

from hail_spark.io.bucketed import read_bucketed, register_bucketed, write_bucketed


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("buckets"))
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(o, "t_orders_b", f"{base}/orders", "o_orderkey", 8,
                   sort_cols="o_orderkey")
    write_bucketed(li, "t_lineitem_b", f"{base}/lineitem", "l_orderkey", 8,
                   sort_cols="l_orderkey")
    return base


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed):
    o = read_bucketed(spark, "t_orders_b")
    li = read_bucketed(spark, "t_lineitem_b")
    # force sort-merge (at test scale AQE would broadcast the small
    # side, which also avoids a shuffle but isn't the property under
    # test) and aggregate ON the bucket key so no post-join exchange
    # is legitimately required anywhere in the plan
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        rows = {r["o_orderkey"]: r["n"] for r in j.collect()}
        plan = _plan(j)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # zero shuffles end-to-end
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # values must equal the unbucketed join
    o2 = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li2 = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    want = {
        r["o_orderkey"]: r["n"]
        for r in li2.join(o2, li2["l_orderkey"] == o2["o_orderkey"])
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert rows == want


def test_bucketed_groupby_skips_exchange(spark, bucketed):
    o = read_bucketed(spark, "t_orders_b")
    agg = o.groupBy("o_orderkey").agg(F.sum("o_totalprice").alias("s"))
    agg.collect()
    assert "Exchange" not in _plan(agg)


def test_reregister_after_catalog_loss(spark, sf_dir, bucketed):
    # simulate a fresh session: drop the catalog entry, re-attach the
    # existing files, and the no-shuffle property must survive
    spark.sql("DROP TABLE IF EXISTS t_orders_b2")
    register_bucketed(
        spark,
        "t_orders_b2",
        f"{bucketed}/orders",
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ, o_orderpriority STRING",
        "o_orderkey",
        8,
        sort_cols="o_orderkey",
    )
    o = read_bucketed(spark, "t_orders_b2")
    assert o.count() == spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    agg = o.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n"))
    agg.collect()
    assert "Exchange" not in _plan(agg)


def test_bucketed_write_one_file_per_bucket(spark, sf_dir, tmp_path):
    # r10 (guide §6): the pre-write repartition on the bucket columns
    # bounds output to one file per bucket REGARDLESS of the source
    # layout. Without it a 16-partition source writes up to 16x8 files
    # (measured 128 at sf0.1) and a 1-partition source writes all 8
    # buckets serially in one task.
    import glob

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").repartition(16)
    p = str(tmp_path / "multi")
    write_bucketed(li, "t_multi_b", p, "l_orderkey", 8, sort_cols="l_orderkey")
    try:
        assert len(glob.glob(f"{p}/*.parquet")) == 8
        got = read_bucketed(spark, "t_multi_b").count()
        assert got == spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_multi_b")
