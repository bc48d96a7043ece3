"""Footer-metadata stats scan (io/query_table.parquet_stats)."""

from hail_spark.io.query_table import parquet_stats


def test_stats_match_full_scan_and_push_down(spark, sf_dir):
    from pyspark.sql import functions as F

    path = f"{sf_dir}/lineitem.parquet"
    got = parquet_stats(spark, path, ["l_quantity", "l_partkey"])
    full = spark.read.parquet(path).agg(
        F.min("l_quantity"), F.max("l_quantity"),
        F.min("l_partkey"), F.max("l_partkey"), F.count(F.lit(1)),
    ).collect()[0]
    assert (got["l_quantity_min"], got["l_quantity_max"]) == (full[0], full[1])
    assert (got["l_partkey_min"], got["l_partkey_max"]) == (full[2], full[3])
    assert got["n_rows"] == full[4]

    # the plan really pushes the aggregate into the scan
    spark.conf.set("spark.sql.sources.useV1SourceList",
                   "avro,csv,json,kafka,orc,text")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try:
        plan = (
            spark.read.parquet(path)
            .agg(F.min("l_quantity"), F.max("l_quantity"), F.count(F.lit(1)))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "PushedAggregation" in plan
    finally:
        spark.conf.unset("spark.sql.sources.useV1SourceList")
        spark.conf.unset("spark.sql.parquet.aggregatePushdown")

    # conf restored by the helper itself: a fresh default-source read
    # plans WITHOUT pushed aggregation
    plan2 = (
        spark.read.parquet(path)
        .agg(F.count(F.lit(1)))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedAggregation" not in plan2
