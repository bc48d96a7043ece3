"""Physical-plan audit over every queries() entry: flags scans that
filter without parquet pushdown, CartesianProduct joins, and scans
reading >12 columns.  This is the check that caught the
coalesce(pred,false) pushdown blocker (SCALE.md round 3) — run it after
touching any filter/join/scan path.

Usage: python scripts/audit_plans.py [sf_dir] [only,names]
Exit code 1 if any finding."""

from __future__ import annotations

import contextlib
import io
import re
import sys

sys.path.insert(0, "/root/repo")


def audit(spark, sf_dir: str, only=None) -> list[tuple[str, str]]:
    import __spark_entry__ as entry_mod

    findings = []
    for name, fn in entry_mod.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
        except Exception as ex:  # noqa: BLE001
            findings.append((name, f"BUILD-ERROR {type(ex).__name__}: {str(ex)[:120]}"))
            continue
        buf = io.StringIO()
        try:
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
        except Exception as ex:  # noqa: BLE001
            findings.append((name, f"EXPLAIN-ERROR {type(ex).__name__}"))
            continue
        p = buf.getvalue()
        has_filter = bool(re.search(r"\(\d+\) Filter", p))
        scans = re.findall(r"PushedFilters: \[([^\]]*)\]", p)
        empty = [s for s in scans if not s.strip()]
        if has_filter and scans and len(empty) == len(scans):
            cond = re.search(r"Condition : (.{0,120})", p)
            findings.append(
                (name, f"NO-PUSHDOWN ({len(scans)} scans) :: {cond.group(1) if cond else ''}")
            )
        if "CartesianProduct" in p:
            findings.append((name, "CARTESIAN"))
        for s in re.findall(r"ReadSchema: struct<([^>]*)", p):
            if len(s.split(",")) > 12:
                findings.append((name, f"WIDE-SCAN {len(s.split(','))} cols"))
                break
    return findings


def main():
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    findings = audit(spark, sf_dir, only)
    for n, f in findings:
        print(f"FLAG  {n}: {f}")
    print(f"{len(findings)} findings")
    sys.exit(1 if findings else 0)


if __name__ == "__main__":
    main()
