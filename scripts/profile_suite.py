"""Round-9 measurement harness (guide §1): for every queries() entry,
run once at $SPARK_GRAFT_SF_DIR with the noop sink, recording

  - wall seconds
  - number of Spark jobs the query triggered (setJobGroup +
    statusTracker().getJobIdsForGroup) — driver loops / collects /
    staging writes all surface as extra jobs
  - the formatted physical plan (written to plans/r09/_baseline/<name>.txt
    on the first run; later runs diff against it by hand)

Output: one JSON file (default /tmp/profile_suite.json) with
{name: {"sec": s, "jobs": n}}.

Usage: python scripts/profile_suite.py [out.json] [only,names]
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from hail_spark import get_spark  # noqa: E402


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/profile_suite.json"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plan_dir = os.environ.get(
        "SPARK_GRAFT_PLAN_DIR", "/root/repo/plans/r09/_baseline"
    )
    os.makedirs(plan_dir, exist_ok=True)
    spark = get_spark("profile_suite")
    sc = spark.sparkContext
    # same warmup as bench.py
    spark.range(1000).selectExpr("sum(id)").write.mode("overwrite").format(
        "noop"
    ).save()
    _li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    _o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    _li.groupBy("l_orderkey").count().join(
        _o.select("o_orderkey"), _li.l_orderkey == _o.o_orderkey
    ).orderBy("count").limit(10).write.mode("overwrite").format("noop").save()
    res = {}
    for name, fn in entry_mod.queries().items():
        if only and name not in only:
            continue
        sc.setJobGroup(f"prof_{name}", name)
        sc.setJobDescription(name)
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.time()
            sec = round(t2 - t0, 3)
            build = round(t1 - t0, 3)
        except Exception as e:  # noqa: BLE001
            res[name] = {"sec": -1.0, "jobs": -1, "err": f"{type(e).__name__}: {e}"}
            print(f"# {name} FAILED: {e}", file=sys.stderr)
            continue
        finally:
            sc.setJobGroup("", "")
            sc.setJobDescription(None)
        try:
            jobs = len(sc.statusTracker().getJobIdsForGroup(f"prof_{name}"))
        except Exception:  # noqa: BLE001
            jobs = -1
        plan_file = os.path.join(plan_dir, f"{name}.txt")
        if not os.path.exists(plan_file):
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(plan_file, "w") as f:
                f.write(buf.getvalue())
        res[name] = {"sec": sec, "build": build, "jobs": jobs}
        print(f"# {name}: {sec}s build={build}s jobs={jobs}", file=sys.stderr)
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    total = sum(v["sec"] for v in res.values() if v["sec"] > 0)
    print(json.dumps({"total_sec": round(total, 2), "n": len(res)}))


if __name__ == "__main__":
    main()
