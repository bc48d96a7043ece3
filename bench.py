"""Benchmark runner: times every queries() entry at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

The full per-query metric dict is ALSO written to BENCH.json next to
this script (the 128-query JSON line outgrew the driver's stdout tail
capture in round 2 — "parsed": null), and the printed line carries a
compact summary plus a "queries_file" pointer.  Set
SPARK_GRAFT_BENCH_FULL_LINE=1 to print the full dict inline instead.

$SPARK_GRAFT_BENCH_ITERS (default 3) runs each query N times and
reports the per-query MEDIAN plus spread (max-min) — r03's driver total
differed ~15% from the builder's clean record under sandbox load, so
single-iteration suite comparisons were noise-bound (r03 verdict
item 9). Set to 1 for a quick single-pass run.

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
    # exercise shuffle + hash-agg + sort-merge-join codegen paths once:
    # these dominate JIT warmup and otherwise land on the first timed query
    _li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    _o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    _li.groupBy("l_orderkey").count().join(
        _o.select("o_orderkey"), _li.l_orderkey == _o.o_orderkey
    ).orderBy("count").limit(10).write.mode("overwrite").format("noop").save()
    # warm the STREAMING machinery the same way (micro-batch engine,
    # offset/commit logs, state store provider, memory sink): the first
    # streaming query of a session otherwise absorbs all of that inside
    # its timed region — measured 7-59 s for the first replay of a fresh
    # session vs 2-5 s once warm. One tiny file-source stateful query,
    # run to completion untimed, exactly like the batch warmup above.
    try:
        import shutil
        import tempfile

        _wdir = tempfile.mkdtemp(prefix="bench_stream_warm_")
        try:
            from pyspark.sql import functions as _F

            spark.range(200).select(
                _F.col("id"),
                _F.timestamp_seconds(_F.col("id") * 60).alias("ts"),
            ).repartition(2).write.mode("overwrite").parquet(_wdir + "/src")
            _ws = (
                spark.readStream.schema("id bigint, ts timestamp")
                .option("maxFilesPerTrigger", 1)
                .parquet(_wdir + "/src")
                .withWatermark("ts", "10 minutes")
                .groupBy(_F.window("ts", "1 hour"))
                .count()
            )
            _wq = (
                _ws.writeStream.format("memory")
                .queryName("bench_stream_warm")
                .outputMode("complete")
                .option("checkpointLocation", _wdir + "/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            _wq.awaitTermination()
        finally:
            shutil.rmtree(_wdir, ignore_errors=True)
    except Exception as e:  # noqa: BLE001 - warmup must never fail the bench
        print(f"# stream warmup skipped: {e}", file=sys.stderr)
    iters = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3")))
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    only_set = set(only.split(",")) if only else None
    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    for name, fn in entry_mod.queries().items():
        if only_set is not None and name not in only_set:
            continue
        runs: list[float] = []
        failed = False
        for it in range(iters):
            # adaptive: a query whose first run already took >5 s is not
            # noise-bound (relative jitter shrinks with runtime) — cap it
            # at TWO iterations so median-of-3 doesn't triple the suite
            # wall-clock on the heavy tail. Two (not one): the suite's
            # first few queries absorb all remaining JVM/JIT warmup, so a
            # single cold run can read 3x the steady-state cost.
            if it > 1 and runs and runs[0] > 5.0:
                break
            t0 = time.time()
            try:
                df = fn(spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
                runs.append(round(time.time() - t0, 3))
            except Exception as e:  # noqa: BLE001
                failed = True
                print(
                    f"# {name} FAILED: {type(e).__name__}: {str(e)[:200]}",
                    file=sys.stderr,
                )
                break
        if failed or not runs:
            timings[name] = -1.0
            spread[name] = -1.0
        else:
            runs.sort()
            if len(runs) == 2:
                # heavy-query path: first run was cold (JIT/warmup), the
                # second is representative — report the min, keep the
                # cold-warm gap visible in spread
                timings[name] = runs[0]
            else:
                timings[name] = runs[len(runs) // 2]  # median
            spread[name] = round(runs[-1] - runs[0], 3)
        if os.environ.get("SPARK_GRAFT_BENCH_VERBOSE"):
            print(f"# {name}: {timings[name]}s ±{spread[name]}", file=sys.stderr)
    total = round(sum(v for v in timings.values() if v >= 0), 3)
    n_fail = sum(1 for v in timings.values() if v < 0)
    metric = {
        "metric": "hail_spark_query_suite",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "sf": sf,
        "iters": iters,
        "n_queries": len(timings),
        "n_failed": n_fail,
    }
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.json")
    try:
        with open(out_path, "w") as f:
            json.dump(metric, f, indent=1)
            f.write("\n")
    except OSError as e:
        print(f"# could not write {out_path}: {e}", file=sys.stderr)
    if os.environ.get("SPARK_GRAFT_BENCH_FULL_LINE"):
        print(json.dumps(metric))
    else:
        slowest = dict(
            sorted(
                ((k, v) for k, v in timings.items() if v >= 0),
                key=lambda kv: -kv[1],
            )[:5]
        )
        print(
            json.dumps(
                {
                    "metric": "hail_spark_query_suite",
                    "value": total,
                    "unit": "sec",
                    "sf": sf,
                    "iters": iters,
                    "n_queries": len(timings),
                    "n_failed": n_fail,
                    "slowest5": slowest,
                    "queries_file": out_path,
                }
            )
        )


if __name__ == "__main__":
    main()
