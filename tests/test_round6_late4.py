"""Round-6 late-wave batch 5: drift (PSI/KS), k-anonymity, DP counts."""

import math

import pytest
from pyspark.sql import functions as F

from hail_spark.operators.validate import (
    dp_noisy_counts,
    k_anonymity_report,
    ks_statistic,
    psi_report,
)


def test_psi_identical_distributions_near_zero(spark):
    vals = [float(i % 100) for i in range(1000)]
    a = spark.createDataFrame([(v,) for v in vals], "x double")
    b = spark.createDataFrame([(v,) for v in vals], "x double")
    r = psi_report(a, b, "x", n_bins=10).head()
    assert r["psi"] == pytest.approx(0.0, abs=1e-12)
    assert r["n_ref"] == 1000 and r["n_new"] == 1000


def test_psi_detects_shift(spark):
    a = spark.createDataFrame([(float(i % 100),) for i in range(1000)], "x double")
    b = spark.createDataFrame(
        [(float(i % 100) + 50,) for i in range(1000)], "x double"
    )
    r = psi_report(a, b, "x", n_bins=10).head()
    assert r["psi"] > 0.25  # major shift by the standard threshold


def test_psi_approx_close_to_exact(spark):
    import random

    rng = random.Random(3)
    vals = [rng.gauss(0, 1) for _ in range(2000)]
    a = spark.createDataFrame([(v,) for v in vals[:1000]], "x double")
    b = spark.createDataFrame([(v,) for v in vals[1000:]], "x double")
    e = psi_report(a, b, "x", exact=True).head()["psi"]
    ap = psi_report(a, b, "x", exact=False, accuracy=10000).head()["psi"]
    assert abs(e - ap) < 0.05


def test_ks_known_value(spark):
    # F_a uniform on {1..4}, F_b point mass at 4: sup diff at v=3 is .75
    a = spark.createDataFrame([(float(v),) for v in [1, 2, 3, 4]], "x double")
    b = spark.createDataFrame([(4.0,)] * 4, "x double")
    r = ks_statistic(a, b, "x").head()
    assert r["ks"] == pytest.approx(0.75)
    assert r["n_a"] == 4 and r["n_b"] == 4


def test_ks_identical_zero(spark):
    a = spark.createDataFrame([(float(i),) for i in range(50)], "x double")
    r = ks_statistic(a, a, "x").head()
    assert r["ks"] == pytest.approx(0.0)


def test_k_anonymity_report(spark):
    rows = [("a", 1)] * 5 + [("b", 1)] * 3 + [("c", 2)] * 1
    df = spark.createDataFrame(rows, "q1 string, q2 long")
    r = k_anonymity_report(df, ["q1", "q2"], k=5).head()
    assert r["k_anonymity"] == 1
    assert r["n_classes"] == 3
    assert r["n_violating_classes"] == 2
    assert r["n_violating_rows"] == 4
    assert r["frac_violating_rows"] == pytest.approx(4 / 9)


def test_dp_noisy_counts_properties(spark):
    S1 = "unit-secret-aaaaaaaaaaaaaaaa"
    S2 = "unit-secret-bbbbbbbbbbbbbbbb"
    rows = [("t%d" % (i % 20), i) for i in range(2000)]
    df = spark.createDataFrame(rows, "g string, i long")
    out1 = {r["g"]: r for r in dp_noisy_counts(df, "g", epsilon=1.0, secret_seed=S1).collect()}
    out2 = {r["g"]: r for r in dp_noisy_counts(df, "g", epsilon=1.0, secret_seed=S1).collect()}
    out3 = {r["g"]: r for r in dp_noisy_counts(df, "g", epsilon=1.0, secret_seed=S2).collect()}
    # reproducible for a fixed secret seed, different across seeds
    assert all(out1[g]["noisy_n"] == out2[g]["noisy_n"] for g in out1)
    assert any(out1[g]["noisy_n"] != out3[g]["noisy_n"] for g in out1)
    # noise is centered: mean |noise| over 20 groups ~ 1/eps, max bounded
    noises = [abs(out1[g]["noisy_n"] - out1[g]["n"]) for g in out1]
    assert 0.05 < sum(noises) / len(noises) < 8.0
    # higher epsilon -> smaller noise for the same uniform draw
    tight = {r["g"]: r for r in dp_noisy_counts(df, "g", epsilon=10.0, secret_seed=S1).collect()}
    for g in out1:
        n1 = abs(out1[g]["noisy_n"] - out1[g]["n"])
        n10 = abs(tight[g]["noisy_n"] - tight[g]["n"])
        assert n10 == pytest.approx(n1 / 10.0, rel=1e-9)


def test_dp_default_is_nondeterministic(spark):
    # no seed -> real randomness: two releases differ, and there is
    # no deterministic function of the public output that recovers n
    df = spark.createDataFrame(
        [("t%d" % (i % 10), i) for i in range(1000)], "g string, i long"
    )
    a = {r["g"]: r["noisy_n"] for r in dp_noisy_counts(df, "g").collect()}
    b = {r["g"]: r["noisy_n"] for r in dp_noisy_counts(df, "g").collect()}
    assert any(a[g] != b[g] for g in a)


def test_dp_rejects_bad_epsilon_and_weak_seed(spark):
    df = spark.createDataFrame([("a", 1)], "g string, i long")
    with pytest.raises(ValueError):
        dp_noisy_counts(df, "g", epsilon=0.0)
    with pytest.raises(ValueError, match="high-entropy"):
        dp_noisy_counts(df, "g", secret_seed="short")


def test_auc_known_values(spark):
    from hail_spark.operators.abtest import auc_by_group

    # perfect separation -> 1.0; reversed -> 0.0; all tied -> 0.5
    rows = (
        [("sep", float(i + 10), True) for i in range(5)]
        + [("sep", float(i), False) for i in range(5)]
        + [("rev", float(i), True) for i in range(5)]
        + [("rev", float(i + 10), False) for i in range(5)]
        + [("tie", 1.0, True)] * 4
        + [("tie", 1.0, False)] * 6
    )
    df = spark.createDataFrame(rows, "g string, s double, y boolean")
    out = {r["g"]: r for r in auc_by_group(df, "g", "s", "y").collect()}
    assert out["sep"]["auc"] == pytest.approx(1.0)
    assert out["rev"]["auc"] == pytest.approx(0.0)
    assert out["tie"]["auc"] == pytest.approx(0.5)
    assert out["sep"]["n_pos"] == 5 and out["sep"]["n_neg"] == 5


def test_auc_matches_pairwise_definition(spark):
    import random

    from hail_spark.operators.abtest import auc_by_group

    rng = random.Random(11)
    rows = [("g", round(rng.gauss(1.0 if rng.random() < 0.5 else 0.0, 1.0), 2),
             bool(i % 3)) for i in range(200)]
    rows = [("g", s, y) for (_, s, y) in rows]
    df = spark.createDataFrame(rows, "g string, s double, y boolean")
    got = auc_by_group(df, "g", "s", "y").head()["auc"]
    pos = [s for _, s, y in rows if y]
    neg = [s for _, s, y in rows if not y]
    num = sum(
        1.0 if p > n else (0.5 if p == n else 0.0) for p in pos for n in neg
    )
    assert got == pytest.approx(num / (len(pos) * len(neg)), rel=1e-12)


def test_auc_degenerate_group(spark):
    from hail_spark.operators.abtest import auc_by_group

    df = spark.createDataFrame([("g", 1.0, True)] * 3, "g string, s double, y boolean")
    r = auc_by_group(df, "g", "s", "y").head()
    assert r["auc"] is None and r["n_neg"] == 0


def test_jackknife_ratio_matches_manual(spark):
    import hashlib
    import math

    from hail_spark.operators.abtest import bucketed_jackknife_ratio

    rows = [("g", i, float(i % 7) + 0.5) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, uid long, v double")
    df = df.withColumn("one", F.lit(1.0))
    got = bucketed_jackknife_ratio(
        df, "g", "v", "one", n_buckets=10, uid_col="uid"
    ).head()
    # manual replication
    def bucket(uid):
        return int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16) % 10

    sums = {}
    for _, uid, v in rows:
        b = bucket(uid)
        s = sums.setdefault(b, [0.0, 0.0])
        s[0] += v
        s[1] += 1.0
    tn = sum(s[0] for s in sums.values())
    td = sum(s[1] for s in sums.values())
    rl = [(tn - s[0]) / (td - s[1]) for s in sums.values() if td != s[1]]
    m = len(rl)
    mean = sum(rl) / m
    se = math.sqrt((m - 1) / m * sum((r - mean) ** 2 for r in rl))
    assert got["ratio"] == pytest.approx(tn / td, rel=1e-12)
    assert got["se"] == pytest.approx(se, rel=1e-6)
    assert got["n_buckets_used"] == m and got["n_rows"] == 200


def test_jackknife_se_shrinks_with_data(spark):
    from hail_spark.operators.abtest import bucketed_jackknife_ratio

    import random

    rng = random.Random(5)
    small = [("g", i, rng.gauss(10, 3)) for i in range(100)]
    big = [("g", i, rng.gauss(10, 3)) for i in range(10000)]

    def se_of(rows):
        df = spark.createDataFrame(rows, "g string, uid long, v double")
        df = df.withColumn("one", F.lit(1.0))
        return bucketed_jackknife_ratio(
            df, "g", "v", "one", n_buckets=20, uid_col="uid"
        ).head()["se"]

    assert se_of(big) < se_of(small)


def test_fixed_width_round_trip_values(spark, tmp_path):
    from hail_spark.io.impex import export_fixed_width, import_fixed_width

    df = spark.createDataFrame(
        [(1, "ab", 3.5), (22, "c", -1.25), (333, "", 0.0)],
        "k long, s string, v double",
    )
    p = str(tmp_path / "fw")
    export_fixed_width(df, p, [("k", 5), ("s", 3), ("v", 8)], n_files=1)
    back = import_fixed_width(
        spark, p, [("k", 1, 5, "bigint"), ("s", 6, 3, "string"), ("v", 9, 8, "double")]
    ).df
    got = sorted(map(tuple, back.collect()))
    # an all-spaces field trims to the empty string (fixed-width
    # cannot distinguish '' from NULL for string fields)
    assert got == [(1, "ab", 3.5), (22, "c", -1.25), (333, "", 0.0)]


def test_fixed_width_overflow_raises(spark, tmp_path):
    from hail_spark.io.impex import export_fixed_width

    df = spark.createDataFrame([("toolong",)], "s string")
    with pytest.raises(Exception, match="wider than"):
        export_fixed_width(df, str(tmp_path / "x"), [("s", 3)])


def test_clustering_coefficient_triangle_free_vs_clique(spark):
    from hail_spark.operators.graph import triangle_count

    # K4: every node coeff 1 (deg 3, 3 triangles -> 2*3/(3*2)=1)
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    df = spark.createDataFrame(edges, "src long, dst long")
    tri = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
    for n in range(4):
        deg = 3
        assert 2 * tri[n] / (deg * (deg - 1)) == 1.0


def test_merge_aggregates_matches_full_and_chains(spark):
    from hail_spark.operators.incremental import (
        aggregate_partial,
        merge_aggregates,
    )

    rows = [("a", float(i)) for i in range(30)] + [("b", float(-i)) for i in range(10)]
    df = spark.createDataFrame(rows, "k string, v double")
    specs = {"n": ("v", "count"), "s": ("v", "sum"),
             "lo": ("v", "min"), "hi": ("v", "max")}
    mspec = {"n": "count", "s": "sum", "lo": "min", "hi": "max"}
    full = {r["k"]: r for r in aggregate_partial(df, ["k"], specs).collect()}
    # three-way chained merge over row-slices
    parts = [
        aggregate_partial(spark.createDataFrame(rows[i::3], "k string, v double"), ["k"], specs)
        for i in range(3)
    ]
    merged = merge_aggregates(merge_aggregates(parts[0], parts[1], ["k"], mspec),
                              parts[2], ["k"], mspec)
    got = {r["k"]: r for r in merged.collect()}
    for k in full:
        for c in ("n", "s", "lo", "hi"):
            assert got[k][c] == full[k][c], (k, c)


def test_merge_aggregates_hll_union(spark):
    from hail_spark.operators.incremental import (
        aggregate_partial,
        merge_aggregates,
    )

    rows = [("g", i % 500) for i in range(2000)]
    df = spark.createDataFrame(rows, "k string, v long")
    specs = {"sk": ("v", "hll")}
    a = aggregate_partial(spark.createDataFrame(rows[:1000], "k string, v long"), ["k"], specs)
    b = aggregate_partial(spark.createDataFrame(rows[1000:], "k string, v long"), ["k"], specs)
    m = merge_aggregates(a, b, ["k"], {"sk": "hll"})
    est = m.select(F.hll_sketch_estimate("sk")).head()[0]
    assert abs(est - 500) / 500 < 0.05


def test_merge_aggregates_disjoint_keys_pass_through(spark):
    from hail_spark.operators.incremental import merge_aggregates

    a = spark.createDataFrame([("x", 1, 5.0)], "k string, n long, s double")
    b = spark.createDataFrame([("y", 2, 7.0)], "k string, n long, s double")
    m = {r["k"]: r for r in
         merge_aggregates(a, b, ["k"], {"n": "count", "s": "sum"}).collect()}
    assert m["x"]["n"] == 1 and m["y"]["s"] == 7.0


def test_stratified_fixed_k_exact_and_stable(spark):
    from hail_spark.llmdata.sampling import stratified_fixed_k

    rows = [(i, "s%d" % (i % 3)) for i in range(100)]
    df = spark.createDataFrame(rows, "uid long, s string")
    out = stratified_fixed_k(df, "s", 7, "uid", seed=2)
    counts = {r["s"]: r["n"] for r in
              out.groupBy("s").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"s0": 7, "s1": 7, "s2": 7}
    again = sorted(map(tuple, stratified_fixed_k(df, "s", 7, "uid", seed=2).collect()))
    assert sorted(map(tuple, out.collect())) == again
    # stratum smaller than k -> whole stratum
    small = stratified_fixed_k(df.filter("uid < 2"), "s", 7, "uid")
    assert small.count() == 2


def test_survival_curve_km_hand_values(spark):
    from hail_spark.operators.relational import survival_curve

    # keys: A churns at t=1, B churns at t=2, C censored at t=2
    # (corpus end = 100; horizon 10)
    rows = [
        ("A", 0), ("A", 1),
        ("B", 0), ("B", 2),
        ("C", 98), ("C", 100),
    ]
    df = spark.createDataFrame(rows, "k string, ts long")
    out = {r["t"]: r for r in
           survival_curve(df, "k", "ts", unit=1, horizon=10).collect()}
    # t=1: at risk 3, churn A -> S = 2/3
    assert out[1]["n_at_risk"] == 3 and out[1]["n_churned"] == 1
    assert out[1]["survival"] == pytest.approx(2 / 3)
    # t=2: at risk 2, churn B, censor C -> S = 2/3 * 1/2 = 1/3
    assert out[2]["n_churned"] == 1 and out[2]["n_censored"] == 1
    assert out[2]["survival"] == pytest.approx(1 / 3)


def test_survival_curve_all_churn_hits_zero(spark):
    from hail_spark.operators.relational import survival_curve

    rows = [("A", 0), ("A", 5), ("B", 0), ("B", 5), ("Z", 0), ("Z", 100)]
    df = spark.createDataFrame(rows, "k string, ts long")
    out = {r["t"]: r for r in
           survival_curve(df, "k", "ts", unit=1, horizon=1).collect()}
    # at t=100 the last at-risk key churns... Z's last event == tmax, so
    # Z is censored; A and B churn together at t=5
    assert out[5]["n_churned"] == 2
    assert out[5]["survival"] == pytest.approx(1 / 3)
    assert out[100]["n_censored"] == 1 and out[100]["survival"] == pytest.approx(1 / 3)


def test_survival_rejects_bad_params(spark):
    from hail_spark.operators.relational import survival_curve

    df = spark.createDataFrame([("A", 1)], "k string, ts long")
    with pytest.raises(ValueError):
        survival_curve(df, "k", "ts", unit=0, horizon=1)


def test_render_chat_and_stats(spark):
    from hail_spark.llmdata.chat import chat_stats, render_chat

    turns = [
        {"role": "system", "content": "be nice"},
        {"role": "user", "content": "hi"},
        {"role": "assistant", "content": "hello"},
    ]
    df = spark.createDataFrame(
        [(1, turns)], "id long, turns array<struct<role:string,content:string>>"
    )
    r = df.select(
        render_chat(F.col("turns"), "chatml").alias("c"),
        render_chat(F.col("turns"), "plain", add_generation_prompt=True).alias("p"),
        chat_stats(F.col("turns")).alias("st"),
    ).head()
    assert r["c"] == (
        "<|im_start|>system\nbe nice<|im_end|>\n"
        "<|im_start|>user\nhi<|im_end|>\n"
        "<|im_start|>assistant\nhello<|im_end|>\n"
    )
    assert r["p"] == "system: be nice\nuser: hi\nassistant: hello\nassistant:"
    st = r["st"]
    assert st["n_turns"] == 3 and st["n_user"] == 1 and st["n_assistant"] == 1
    assert st["has_system_first"] and st["alternates"]
    assert st["n_empty_turns"] == 0 and st["total_chars"] == len("be nice") + 2 + 5


def test_chat_stats_flags_bad_structure(spark):
    from hail_spark.llmdata.chat import chat_stats

    bad = [
        {"role": "user", "content": "a"},
        {"role": "user", "content": ""},
    ]
    df = spark.createDataFrame(
        [(1, bad)], "id long, turns array<struct<role:string,content:string>>"
    )
    st = df.select(chat_stats(F.col("turns")).alias("st")).head()["st"]
    assert not st["alternates"]
    assert st["n_empty_turns"] == 1
    assert not st["has_system_first"]


def test_render_chat_rejects_unknown_template(spark):
    from hail_spark.llmdata.chat import render_chat

    with pytest.raises(ValueError):
        render_chat(F.lit(None), "unknown")


def test_weighted_percentile_hand_values(spark):
    from hail_spark.llmdata.features import weighted_percentile_by_group

    # values 1..4 with weights 1,1,2,6 (total 10): cumw 1,2,4,10
    rows = [("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 2.0), ("g", 4.0, 6.0)]
    df = spark.createDataFrame(rows, "k string, v double, w double")
    r = weighted_percentile_by_group(df, "k", "v", "w", [0.2, 0.4, 0.5, 1.0]).head()
    assert r["p_0_2"] == 2.0   # cumw 2 >= 2
    assert r["p_0_4"] == 3.0   # cumw 4 >= 4
    assert r["p_0_5"] == 4.0   # first cumw >= 5 is 10 at v=4
    assert r["p_1_0"] == 4.0


def test_weighted_percentile_unit_weights_match_exact_rank(spark):
    from hail_spark.llmdata.features import weighted_percentile_by_group

    vals = [float(i) for i in range(1, 101)]
    df = spark.createDataFrame([("g", v, 1.0) for v in vals], "k string, v double, w double")
    r = weighted_percentile_by_group(df, "k", "v", "w", [0.5, 0.9]).head()
    assert r["p_0_5"] == 50.0 and r["p_0_9"] == 90.0
    # zero/negative weights are excluded
    df2 = df.union(spark.createDataFrame([("g", 1000.0, 0.0)], "k string, v double, w double"))
    r2 = weighted_percentile_by_group(df2, "k", "v", "w", [1.0]).head()
    assert r2["p_1_0"] == 100.0
