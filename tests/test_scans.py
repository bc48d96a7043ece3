"""Distributed scan primitive parity (ref LowerTableIR.scala:1284-1560)."""

from pyspark.sql import functions as F

from hail_spark import Table
from hail_spark.operators import scans


def test_scan_sum_exclusive(spark):
    t = Table.range(spark, 1000, n_partitions=13)
    out = scans.scan_sum(t, F.col("idx"), "run").collect()
    got = {r["idx"]: r["run"] for r in out}
    acc = 0
    for i in range(1000):
        assert got[i] == acc, f"row {i}"
        acc += i


def test_scan_sum_with_nulls(spark):
    t = Table.parallelize(
        spark,
        [{"k": i, "x": None if i % 3 == 0 else float(i)} for i in range(30)],
        schema="k int, x double",
    ).key_by("k")
    out = {r["k"]: r["run"] for r in scans.scan_sum(t, F.col("x"), "run").collect()}
    acc = 0.0
    for i in range(30):
        assert out[i] == acc
        if i % 3 != 0:
            acc += float(i)


def test_scan_count_dense_index(spark):
    t = Table.range(spark, 500, n_partitions=11)
    out = scans.add_index(t, "i2").collect()
    assert all(r["idx"] == r["i2"] for r in out)


def test_prev_nonnull(spark):
    rows = [{"k": i, "x": (f"v{i}" if i % 4 == 0 else None)} for i in range(40)]
    t = Table.parallelize(spark, rows, schema="k int, x string").key_by("k")
    out = {r["k"]: r["p"] for r in scans.prev_nonnull(t, F.col("x"), "p").collect()}
    for i in range(40):
        expect = f"v{(i // 4) * 4}"
        assert out[i] == expect


def test_scan_min_max_mean(spark):
    import math
    from hail_spark.operators.scans import scan_max, scan_mean, scan_min
    from hail_spark.table import Table

    vals = [5.0, 3.0, None, 8.0, 1.0, None, 9.0, 2.0]
    t = Table.parallelize(
        spark,
        [{"k": i, "v": v} for i, v in enumerate(vals)],
        "k int, v double",
        key=("k",),
    ).repartition(3)
    t = t.key_by("k")
    out = scan_mean(scan_max(scan_min(t, F.col("v"), "mn"), F.col("v"), "mx"), F.col("v"), "avg")
    rows = {r["k"]: r for r in out.df.collect()}
    # exclusive-prefix oracle in python
    def prefix(i, fn):
        seen = [x for x in vals[:i] if x is not None]
        return fn(seen) if seen else None
    for i in range(len(vals)):
        assert rows[i]["mn"] == prefix(i, min), i
        assert rows[i]["mx"] == prefix(i, max), i
        want = prefix(i, lambda s: sum(s) / len(s))
        got = rows[i]["avg"]
        assert (got is None and want is None) or math.isclose(got, want), i


def test_scan_full_generality(spark):
    """hl.scan.* over the full aggregator set (ref aggregators.py:2049):
    collect / collect_as_set / take / stats / fraction / any / all /
    counter / product, checked row-by-row vs a python exclusive-prefix
    oracle on multi-partition input."""
    import math
    from collections import Counter

    from hail_spark.operators import scans
    from hail_spark.table import Table

    vals = [(i, float((i * 37) % 10) if i % 7 else None, i % 3 == 0) for i in range(50)]
    df = spark.createDataFrame(vals, "k int, x double, p boolean").repartition(5)
    t = Table(df, key=("k",))
    t = scans.scan_collect(t, F.col("x"), "c")
    t = scans.scan_collect_as_set(t, F.col("x"), "cs")
    t = scans.scan_take(t, F.col("x"), "tk", 3)
    t = scans.scan_stats(t, F.col("x"), "st")
    t = scans.scan_fraction(t, F.col("p"), "fr")
    t = scans.scan_any(t, F.col("p"), "an")
    t = scans.scan_all(t, F.col("p"), "al")
    t = scans.scan_counter(t, (F.col("k") % 3).cast("string"), "cnt")
    t = scans.scan_product(t, F.when(F.col("k") % 10 == 0, 2.0).otherwise(1.0), "pr")
    rows = t.order_by("k").df.collect()

    xs, ps, ks = [], [], []
    for i, (k, x, p) in enumerate(sorted(vals)):
        r = rows[i]
        pref = [v for v in xs if v is not None]
        assert r["c"] == pref, ("c", k)
        assert r["cs"] == sorted(set(pref)), ("cs", k)
        assert r["tk"] == pref[:3], ("tk", k)
        if pref:
            n = len(pref)
            m = sum(pref) / n
            var = sum(v * v for v in pref) / n - m * m
            assert abs(r["st"]["mean"] - m) < 1e-9
            assert abs(r["st"]["stdev"] - math.sqrt(max(var, 0.0))) < 1e-9
            assert r["st"]["n"] == n
            assert r["st"]["min"] == min(pref) and r["st"]["max"] == max(pref)
        else:
            assert r["st"] is None
        assert r["an"] == (True in ps), ("an", k)
        assert r["al"] == (False not in ps), ("al", k)
        if ps:
            assert abs(r["fr"] - sum(ps) / len(ps)) < 1e-12, ("fr", k)
        assert dict(r["cnt"] or {}) == dict(Counter(str(kk % 3) for kk in ks))
        assert r["pr"] == 2.0 ** sum(1 for kk in ks if kk % 10 == 0), ("pr", k)
        xs.append(x)
        ps.append(p)
        ks.append(k)


def test_scan_filter_combinator(spark):
    # ref test_expr.py:1118 — filtered rows contribute nothing but every
    # row still gets the (exclusive) prefix state
    t = Table.range(spark, 5, n_partitions=3)
    t2 = scans.scan_collect(
        t, scans.scan_filter(F.col("idx") % 2 == 0, F.col("idx")), "pfx"
    )
    got = [sorted(r["pfx"]) for r in t2.df.orderBy("idx").collect()]
    assert got == [[], [0], [0], [0, 2], [0, 2]]


def test_scan_collect_explode(spark):
    # ref test_expr.py:1141 — prefix of flattened [idx, idx+1] arrays
    t = Table.range(spark, 5, n_partitions=3)
    t2 = scans.scan_collect_explode(
        t, F.array(F.col("idx"), F.col("idx") + 1), "pfx"
    )
    got = [list(r["pfx"]) for r in t2.df.orderBy("idx").collect()]
    expect = []
    acc = []
    for i in range(5):
        expect.append(list(acc))
        acc += [i, i + 1]
    assert got == expect


def test_scan_group_by(spark):
    # ref test_expr.py:1178 — exclusive-prefix map key -> collected vals
    t = Table.range(spark, 5, n_partitions=3)
    t2 = scans.scan_group_by(t, F.col("idx") % 3, F.col("idx"), "m")
    got = [
        {k: list(v) for k, v in r["m"].items()}
        for r in t2.df.orderBy("idx").collect()
    ]
    assert got == [
        {},
        {0: [0]},
        {0: [0], 1: [1]},
        {0: [0], 1: [1], 2: [2]},
        {0: [0, 3], 1: [1], 2: [2]},
    ]
    # filtered inner scan: keys register even with all values missing
    t3 = scans.scan_group_by(
        t,
        F.col("idx") % 3,
        scans.scan_filter(F.col("idx") % 2 == 0, F.col("idx")),
        "m",
    )
    got3 = [
        {k: list(v) for k, v in r["m"].items()}
        for r in t3.df.orderBy("idx").collect()
    ]
    assert got3 == [
        {},
        {0: [0]},
        {0: [0], 1: []},
        {0: [0], 1: [], 2: [2]},
        {0: [0], 1: [], 2: [2]},
    ]


def test_scan_array_sum(spark):
    # ref test_expr.py:1212 — a = [idx]*5; elementwise prefix sums; the
    # array_agg(count) case is the all-ones instance of the same scan
    t = Table.range(spark, 5, n_partitions=3)
    t = t.annotate(a=F.array_repeat(F.col("idx"), 5))
    t2 = scans.scan_array_sum(t, F.col("a"), "a2")
    rows = {r["idx"]: r["a2"] for r in t2.df.collect()}
    assert rows[0] is None
    for i in range(1, 5):
        assert list(rows[i]) == [sum(range(i))] * 5
    # count form: arrays of ones -> prefix row count per element
    t3 = t.annotate(ones=F.array_repeat(F.lit(1), 5))
    t4 = scans.scan_array_sum(t3, F.col("ones"), "cnt")
    rows4 = {r["idx"]: r["cnt"] for r in t4.df.collect()}
    for i in range(1, 5):
        assert list(rows4[i]) == [i] * 5


def test_scan_group_by_null_keys(spark):
    # ADVICE r2: null keys used to raise NULL_MAP_KEY; they are dropped
    # from the map (same deviation as agg.group_by)
    from hail_spark.operators import scans
    from hail_spark.table import Table

    df = spark.createDataFrame(
        [(0, "a", 1), (1, None, 2), (2, "a", 3), (3, None, 4)], ["idx", "k", "v"]
    )
    t = Table(df, ("idx",), {})
    t2 = scans.scan_group_by(t, F.col("k"), F.col("v"), "m")
    rows = {r["idx"]: r["m"] for r in t2.df.collect()}
    assert rows[0] == {}
    assert rows[3] == {"a": [1, 3]}


def test_scan_multi_combinator_kinds(spark):
    # collect_explode and group_by inside scan_multi must match the
    # standalone chained combinators (same single up/down-pass state)
    from hail_spark.operators import scans
    from hail_spark.table import Table

    df = spark.createDataFrame(
        [
            (0, "a", 1, [10, 20]),
            (1, "b", 2, None),
            (2, "a", None, [30]),
            (3, None, 4, [40, None]),
            (4, "b", 5, []),
        ],
        ["idx", "k", "v", "arr"],
    ).repartition(3)
    t = Table(df, ("idx",), {})
    multi = scans.scan_multi(
        t,
        {
            "flat": ("collect_explode", F.col("arr")),
            "grp": ("group_by", F.col("k"), F.col("v")),
            "s": ("sum", F.col("v")),
        },
    )
    got = {r["idx"]: (r["flat"], r["grp"], r["s"]) for r in multi.df.collect()}

    chained = scans.scan_collect_explode(t, F.col("arr"), "flat")
    chained = scans.scan_group_by(chained, F.col("k"), F.col("v"), "grp")
    chained = scans.scan_sum(chained, F.col("v"), "s")
    want = {r["idx"]: (r["flat"], r["grp"], r["s"]) for r in chained.df.collect()}
    assert got == want
    assert got[4] == ([10, 20, 30, 40], {"a": [1], "b": [2]}, 7)
