"""Snapshot before/after explain("formatted") plans for touched queries.

Usage: python scripts/snap_plans.py q1,q2,...
Writes plans/r09/<q>_after.txt and, if missing, copies the committed
baseline plan (plans/r09/_baseline/<q>.txt) to plans/r09/<q>_before.txt.
"""
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLANS = os.path.join(REPO, "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r10"))


def main():
    names = sys.argv[1].split(",")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as e

    qs = e.queries()
    for name in names:
        before = os.path.join(PLANS, f"{name}_before.txt")
        base = os.path.join(PLANS, "_baseline", f"{name}.txt")
        if not os.path.exists(before) and os.path.exists(base):
            shutil.copy(base, before)
        df = qs[name](spark, sf)
        with open(os.path.join(PLANS, f"{name}_after.txt"), "w") as fh:
            fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        print("snapped", name)


if __name__ == "__main__":
    main()
