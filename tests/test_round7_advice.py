"""Round-7 ADVICE fixes: NULL-key group joins, PSI null exclusion,
per-file fixed-width header skip, dsir cache hygiene."""

import pytest
from pyspark.sql import functions as F


def test_target_encode_keeps_null_categories(spark):
    from hail_spark.llmdata.features import target_encode

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), (None, 10.0), (None, 20.0), ("b", 5.0)],
        "cat string, y double",
    )
    out = target_encode(df, "cat", "y", leave_one_out=False)
    rows = {(r["cat"], r["y"]): r["cat_te"] for r in out.collect()}
    # no rows dropped
    assert out.count() == 5
    # NULL category is its own group: mean(y | NULL) = 15.0
    assert rows[(None, 10.0)] == pytest.approx(15.0)
    assert rows[(None, 20.0)] == pytest.approx(15.0)
    assert rows[("a", 1.0)] == pytest.approx(2.0)
    # leave-one-out also preserves NULL rows
    loo = target_encode(df, "cat", "y", leave_one_out=True)
    assert loo.count() == 5
    loo_rows = {(r["cat"], r["y"]): r["cat_te"] for r in loo.collect()}
    assert loo_rows[(None, 10.0)] == pytest.approx(20.0)


def test_robust_outliers_keeps_null_keys(spark):
    from hail_spark.llmdata.features import robust_outliers

    rows = [("g", float(v)) for v in [1, 2, 3, 4, 100]] + [
        (None, 1.0),
        (None, 2.0),
        (None, 3.0),
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    out = robust_outliers(df, "k", "v", threshold=3.5)
    assert out.count() == len(rows)
    flagged = {
        (r["k"], r["v"]): r["v_outlier"] for r in out.collect()
    }
    assert flagged[("g", 100.0)] is True
    assert flagged[(None, 2.0)] is False


def test_standardize_and_bins_keep_null_keys(spark):
    from hail_spark.llmdata.features import (
        quantile_bins,
        standardize_by_group,
        winsorize_by_group,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), (None, 5.0), (None, 7.0)],
        "k string, v double",
    )
    for fn in (
        lambda d: standardize_by_group(d, "k", "v"),
        lambda d: winsorize_by_group(d, "k", "v", 0.25, 0.75),
        lambda d: quantile_bins(d, "k", "v", n_bins=2),
    ):
        assert fn(df).count() == 4


def test_weighted_percentile_null_group(spark):
    from hail_spark.llmdata.features import weighted_percentile_by_group

    df = spark.createDataFrame(
        [("a", 1.0, 1.0), (None, 2.0, 1.0), (None, 4.0, 3.0)],
        "k string, v double, w double",
    )
    out = {r["k"]: r for r in weighted_percentile_by_group(
        df, "k", "v", "w", [0.5]
    ).collect()}
    assert set(out) == {"a", None}
    assert out[None]["p_0_5"] == pytest.approx(4.0)


def test_psi_excludes_nulls(spark):
    from hail_spark.operators.validate import psi_report

    vals = [(float(i % 10),) for i in range(100)]
    a = spark.createDataFrame(vals, "x double")
    # same distribution + a pile of NULLs: PSI must stay ~0 and the
    # null rows must not count toward n_new
    b = spark.createDataFrame(vals + [(None,)] * 50, "x double")
    r = psi_report(a, b, "x", n_bins=5).head()
    assert r["psi"] == pytest.approx(0.0, abs=1e-12)
    assert r["n_ref"] == 100 and r["n_new"] == 100


def _write(p, text):
    with open(p, "w") as f:
        f.write(text)


def test_fixed_width_header_skipped_per_file(spark, tmp_path):
    from hail_spark.io.impex import import_fixed_width

    d = tmp_path / "fw"
    d.mkdir()
    _write(d / "part1.txt", "HEADERROW\n00001ab \n00002cd \n")
    _write(d / "part2.txt", "HEADERROW\n00003ef \n")
    t = import_fixed_width(
        spark,
        str(d),
        [("k", 1, 5, "bigint"), ("s", 6, 3, "string")],
        skip_header=1,
    )
    got = sorted(map(tuple, t.df.collect()))
    # one header dropped from EACH file, not one (or N) globally
    assert got == [(1, "ab"), (2, "cd"), (3, "ef")]


def test_fixed_width_multi_header_per_file(spark, tmp_path):
    from hail_spark.io.impex import import_fixed_width

    d = tmp_path / "fw2"
    d.mkdir()
    _write(d / "a.txt", "TITLE\nUNITS\n00001xx \n00002yy \n")
    _write(d / "b.txt", "TITLE\nUNITS\n00003zz \n")
    t = import_fixed_width(
        spark,
        str(d),
        [("k", 1, 5, "bigint"), ("s", 6, 3, "string")],
        skip_header=2,
    )
    got = sorted(map(tuple, t.df.collect()))
    assert got == [(1, "xx"), (2, "yy"), (3, "zz")]


def test_dsir_eager_releases_cache(spark):
    from hail_spark.llmdata.sampling import dsir_select

    rows = [(f"d{i}", "apple banana fig " * 3, False) for i in range(30)]
    rows += [(f"t{i}", "apple banana cherry", True) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id string, text string, tgt boolean")
    before = len(
        [r for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()]
    )
    out = dsir_select(df, "text", "doc_id", "tgt", k=3, n_buckets=64)
    assert out.count() == 3
    after = len(
        [r for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()]
    )
    # the gram persist() must not survive the call (localCheckpoint
    # blocks of the k-row result may — those are ContextCleaner-owned)
    assert after <= before + 1
    # lazy mode returns an explicit (selection, cache) pair — the
    # handle survives any derived transformation (an attribute on the
    # DataFrame would be lost by the first select/filter)
    lazy, cache = dsir_select(
        df, "text", "doc_id", "tgt", k=3, n_buckets=64, eager=False
    )
    derived = lazy.select("doc_id")
    assert derived.count() == 3
    cache.unpersist(blocking=True)
