"""Gate reentrancy: two concurrent driver sessions must not share staging.

Round-8 postmortem: ``import_table_impute`` and ``vcf_round_trip`` staged
intermediate files at FIXED ``/tmp/sparkgraft_*`` paths; two concurrent
sessions (judge's pytest + plan audit) collided — ``mode("overwrite")``
plus a glob read across both processes double-read part files, and the
gate saw values exactly 2x the oracle's.  Round 9 pid-suffixes every
staging path through ``_tmp_base`` (``__spark_entry__.py``) and cleans up
at process exit.  This test locks the fix: it runs BOTH staging queries in
TWO concurrent subprocesses at sf0.001 and checks each process's result
against the DuckDB oracle — under the old fixed paths the overlapping
overwrite+read made at least one side read doubled data.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"

_CHILD = r"""
import json, sys
sf_dir = sys.argv[1]
from pyspark.sql import SparkSession
import __spark_entry__ as e
spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName(f"reentrancy-{sys.argv[2]}")
    .getOrCreate()
)
out = {}
for name in ("import_table_impute", "vcf_round_trip"):
    rows = e.queries()[name](spark, sf_dir).collect()
    out[name] = sorted([str(x) for x in r] for r in rows)
print("RESULT:" + json.dumps(out))
spark.stop()
"""

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.mark.skipif(
    not os.path.exists(SF_DIR), reason="testdata sf0.001 not present"
)
def test_two_concurrent_sessions_match_oracle(tmp_path):
    env = dict(os.environ, PYTHONPATH=REPO)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD, SF_DIR, str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            cwd=REPO,
            env=env,
        )
        for i in range(2)
    ]
    results = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out.decode()[-2000:]
        line = [
            ln for ln in out.decode().splitlines() if ln.startswith("RESULT:")
        ][-1]
        results.append(json.loads(line[len("RESULT:"):]))

    import __spark_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    oracles = e.oracle_sql()
    for name in ("import_table_impute", "vcf_round_trip"):
        want = sorted(
            [str(x) for x in r] for r in con.execute(oracles[name]).fetchall()
        )
        for i, res in enumerate(results):
            got = res[name]
            assert len(got) == len(want), (name, i, len(got), len(want))
            # Compare the numeric cells loosely (str of float formatting can
            # differ between Spark collect and DuckDB fetchall); the r08
            # collision produced exactly-2x aggregate values, which this
            # catches regardless of formatting.
            for grow, wrow in zip(got, want):
                assert len(grow) == len(wrow)
                for g, w in zip(grow, wrow):
                    try:
                        assert abs(float(g) - float(w)) < 1e-6, (name, i, g, w)
                    except ValueError:
                        assert g == w, (name, i, g, w)
