"""Benchmark runner: times every queries() entry at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with the noop sink (full execution, no
driver-side collect cost)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from hail_spark import get_spark  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("bench")
    # warm the JVM/codegen/scan caches so the first timed query doesn't
    # absorb session startup (q1 was paying ~2s of warmup)
    spark.range(1000).selectExpr("sum(id)").write.mode("overwrite").format(
        "noop"
    ).save()
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).limit(
        1
    ).write.mode("overwrite").format("noop").save()
    timings: dict[str, float] = {}
    for name, fn in entry_mod.queries().items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            timings[name] = round(time.time() - t0, 3)
            if os.environ.get("SPARK_GRAFT_BENCH_VERBOSE"):
                print(f"# {name}: {timings[name]}s", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            timings[name] = -1.0
            print(f"# {name} FAILED: {type(e).__name__}: {str(e)[:200]}", file=sys.stderr)
    total = round(sum(v for v in timings.values() if v >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "hail_spark_query_suite",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
