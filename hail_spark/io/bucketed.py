"""Bucketed-table storage — pre-shuffled, co-located joins.

The missing piece between "repartition per query" and "pay a shuffle
every time": write a fact table ONCE bucketed (and sorted) by its join
key, and every subsequent equi-join or aggregation on that key runs
with NO Exchange — at 100 TB the bucketed layout amortizes one shuffle
across every downstream query (the reference gets the same effect from
its ordered-RVD partitioner; Spark's native form is Hive-style
bucketing, `DataFrameWriter.bucketBy`).

Spark constraint: bucketed writes must go through ``saveAsTable`` (the
bucket spec lives in the catalog, not the parquet footer). The default
in-memory catalog supports this fine — no Hive metastore / derby
involved; table METADATA lasts for the session while the FILES persist
at ``path``, so long-lived pipelines re-register with
``register_bucketed`` after a restart.

Verified behavior (tests/test_bucketed.py): joining two tables
bucketed on the join key with the same bucket count produces a
SortMergeJoin with ZERO Exchange operators; a groupBy on the bucket
key likewise skips its Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str] | str,
    n_buckets: int,
    sort_cols: list[str] | str | None = None,
) -> None:
    """Write ``df`` as a bucketed (optionally sorted-within-bucket)
    parquet table registered as ``table`` with files at ``path``.
    Overwrites both. Bucket count is part of the join contract: two
    tables co-join shuffle-free only with the SAME ``n_buckets``."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # r10 (guide §6, output file sizing): without this repartition every
    # input task writes its own file PER BUCKET it holds — tasks×buckets
    # small files at scale, and a single-partition source writes all
    # buckets serially in one task at gate scale. Repartitioning on the
    # bucket columns (Spark's bucket hash IS the HashPartitioning hash)
    # gives each task exactly one bucket: file count == n_buckets at any
    # input layout, and the write parallelizes across buckets. Bucket
    # count (and hence target file size) stays the caller's contract.
    w = (
        df.repartition(n_buckets, *[F.col(c) for c in cols])
        .write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, *cols)
    )
    if sort_cols:
        scols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(*scols)
    w.format("parquet").saveAsTable(table)


def register_bucketed(
    spark: SparkSession,
    table: str,
    path: str,
    schema_ddl: str,
    bucket_cols: list[str] | str,
    n_buckets: int,
    sort_cols: list[str] | str | None = None,
) -> None:
    """Re-attach an existing bucketed directory to a fresh session's
    catalog (the files outlive the in-memory catalog)."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    sort = ""
    if sort_cols:
        scols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        sort = f" SORTED BY ({', '.join(scols)})"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(
        f"CREATE TABLE {table} ({schema_ddl}) USING parquet "
        f"CLUSTERED BY ({', '.join(cols)}){sort} INTO {n_buckets} BUCKETS "
        f"LOCATION '{path}'"
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (the catalog carries the bucket spec —
    a plain ``spark.read.parquet(path)`` would NOT know the layout and
    would reintroduce shuffles)."""
    return spark.table(table)
