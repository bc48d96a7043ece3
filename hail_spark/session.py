"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]`` (single JVM); the configs below are
chosen so the same code scales to a real cluster: AQE for runtime
re-planning (skew joins, partition coalescing), Arrow for the pandas-UDF
slow path, and shuffle partitions sized to the local core count instead
of Spark's default 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # last-wins duplicate map keys (Hail dict-build semantics; also lets
    # map_from_entries-based aggregators keep one value per key)
    "spark.sql.mapKeyDedupPolicy": "LAST_WIN",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.optimizer.nestedSchemaPruning.enabled": "true",
    "spark.sql.parquet.compression.codec": "zstd",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
}


def get_spark(app_name: str = "hail_spark", **extra: str) -> SparkSession:
    """Return (creating if needed) the engine's SparkSession."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.master(f"local[{cpus}]").appName(app_name)
    for k, v in {**_DEFAULTS, **extra}.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def init(app_name: str = "hail_spark", **extra: str) -> SparkSession:
    """Parity alias for ``hl.init`` / ``hl.init_spark`` (ref
    hail/__init__.py, context.py init_spark): create-or-get the
    session. The reference's log/tmp/branching-factor knobs are Spark
    configs here — pass them via ``extra``."""
    return get_spark(app_name, **extra)


init_spark = init
init_local = init


def stop() -> None:
    """Parity alias for ``hl.stop``: stop the active session."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()


def spark_context():
    """Parity alias for ``hl.spark_context`` (ref context.py)."""
    return get_spark().sparkContext


def tmp_dir() -> str:
    """Parity alias for ``hl.tmp_dir``: the engine scratch directory."""
    import tempfile

    return tempfile.gettempdir()
