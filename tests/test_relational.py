"""Time-series relational operators (operators/relational.py):
as-of join, sessionization, rolling windows, exact heavy hitters.

Edge cases the sf-data oracle queries can't reach: no-match left rows,
tolerance cutoffs, forward direction, equal-timestamp ties, string
keys in frequent_items, and the Misra-Gries no-false-negative
guarantee under adversarial skew.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hail_spark.operators.relational import (
    asof_join,
    frequent_items,
    rolling_aggregate,
    session_stats,
    sessionize,
)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


class TestAsofJoin:
    def test_backward_basic_and_no_match(self, spark):
        left = _df(spark, [("a", 10), ("a", 25), ("b", 5)], "k string, ts long")
        right = _df(
            spark,
            [("a", 8, 1.0), ("a", 20, 2.0), ("b", 7, 9.0)],
            "k string, rts long, v double",
        )
        out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts")
        got = {(r["k"], r["ts"]): (r["v"], r["rts"]) for r in out.collect()}
        assert got == {
            ("a", 10): (1.0, 8),
            ("a", 25): (2.0, 20),
            ("b", 5): (None, None),  # right row is AFTER: no backward match
        }

    def test_equal_ts_matches(self, spark):
        left = _df(spark, [("a", 10)], "k string, ts long")
        right = _df(spark, [("a", 10, 5.0)], "k string, rts long, v double")
        out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts")
        assert out.collect()[0]["v"] == 5.0

    def test_tolerance(self, spark):
        left = _df(spark, [("a", 100), ("a", 200)], "k string, ts long")
        right = _df(spark, [("a", 95, 1.0)], "k string, rts long, v double")
        out = asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts", tolerance=10
        )
        got = {r["ts"]: r["v"] for r in out.collect()}
        assert got == {100: 1.0, 200: None}  # 200-95 > 10 nulled out

    def test_forward(self, spark):
        left = _df(spark, [("a", 10), ("a", 30)], "k string, ts long")
        right = _df(
            spark, [("a", 15, 1.0), ("a", 40, 2.0)], "k string, rts long, v double"
        )
        out = asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts", direction="forward"
        )
        got = {r["ts"]: (r["v"], r["rts"]) for r in out.collect()}
        assert got == {10: (1.0, 15), 30: (2.0, 40)}

    def test_name_collision_suffix(self, spark):
        left = _df(spark, [("a", 10, 7.0)], "k string, ts long, v double")
        right = _df(spark, [("a", 5, 1.0)], "k string, ts long, v double")
        out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts")
        row = out.collect()[0]
        assert row["v"] == 7.0 and row["v_right"] == 1.0 and row["ts_right"] == 5

    def test_bad_direction(self, spark):
        left = _df(spark, [("a", 1)], "k string, ts long")
        with pytest.raises(ValueError):
            asof_join(left, left, on="k", left_ts="ts", direction="nearest")


class TestSessionize:
    def test_gap_splits(self, spark):
        df = _df(
            spark,
            [(1, 0), (1, 50), (1, 200), (2, 0)],
            "u long, ts long",
        )
        out = sessionize(df, "u", "ts", gap=100)
        got = {(r["u"], r["ts"]): r["session_idx"] for r in out.collect()}
        assert got == {(1, 0): 0, (1, 50): 0, (1, 200): 1, (2, 0): 0}

    def test_gap_boundary_is_same_session(self, spark):
        # gap strictly greater-than starts a new session
        df = _df(spark, [(1, 0), (1, 100)], "u long, ts long")
        out = sessionize(df, "u", "ts", gap=100)
        assert {r["session_idx"] for r in out.collect()} == {0}

    def test_session_stats(self, spark):
        df = _df(
            spark,
            [(1, 0, 1.0), (1, 10, 2.0), (1, 500, 4.0)],
            "u long, ts long, value double",
        )
        out = session_stats(df, "u", "ts", gap=100, value_col="value")
        got = {
            r["session_idx"]: (r["n_events"], r["duration"], r["value_sum"])
            for r in out.collect()
        }
        assert got == {0: (2, 10, 3.0), 1: (1, 0, 4.0)}


class TestRolling:
    def test_trailing_range(self, spark):
        df = _df(
            spark,
            [(1, 0, 1.0), (1, 5, 2.0), (1, 11, 4.0)],
            "u long, ts long, value double",
        )
        out = rolling_aggregate(df, "u", "ts", "value", window=10)
        got = {r["ts"]: (r["roll_sum"], r["roll_n"]) for r in out.collect()}
        # frame is [ts-10, ts]: at ts=11 the ts=0 row has aged out
        assert got == {0: (1.0, 1), 5: (3.0, 2), 11: (6.0, 2)}

    def test_simultaneous_events_share_frame(self, spark):
        df = _df(spark, [(1, 5, 1.0), (1, 5, 2.0)], "u long, ts long, value double")
        out = rolling_aggregate(df, "u", "ts", "value", window=10, aggs=("sum",))
        assert [r["roll_sum"] for r in out.collect()] == [3.0, 3.0]

    def test_min_max(self, spark):
        df = _df(spark, [(1, 0, 3.0), (1, 1, 1.0)], "u long, ts long, value double")
        out = rolling_aggregate(df, "u", "ts", "value", window=10, aggs=("min", "max"))
        last = out.orderBy("ts").collect()[-1]
        assert last["roll_min"] == 1.0 and last["roll_max"] == 3.0


class TestFrequentItems:
    def test_exact_counts(self, spark):
        rows = [("a",)] * 50 + [("b",)] * 10 + [("c",)] * 2
        df = spark.createDataFrame(rows, "w string").repartition(4)
        out = {r["w"]: r["cnt"] for r in frequent_items(df, "w", min_count=10).collect()}
        assert out == {"a": 50, "b": 10}

    def test_no_false_negatives_under_skew(self, spark):
        # adversarial: heavy hitter spread thin across partitions among
        # a sea of singletons — the MG union must still surface it
        rows = [(f"junk{i}",) for i in range(2000)] + [("hot",)] * 40
        df = spark.createDataFrame(rows, "w string").repartition(8)
        out = frequent_items(df, "w", min_count=40).collect()
        assert {r["w"]: r["cnt"] for r in out} == {"hot": 40}

    def test_capacity_override_and_validation(self, spark):
        df = spark.createDataFrame([("x",)] * 5, "w string")
        with pytest.raises(ValueError):
            frequent_items(df, "w", min_count=0)
        out = frequent_items(df, "w", min_count=5, capacity=64).collect()
        assert out[0]["cnt"] == 5


def test_asof_matches_pandas_merge_asof(spark):
    """Property test: asof_join ≡ pandas.merge_asof (an independent
    implementation of the same semantics) across random key/ts layouts,
    both directions."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=25
        ),
        st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=25
        ),
        st.sampled_from(["backward", "forward"]),
    )
    @settings(max_examples=12, deadline=None)
    def check(lrows, rrows, direction):
        # dedupe (key, ts) on the right: with duplicate right timestamps
        # the matched payload is implementation-defined in both engines
        rmap = {}
        for i, (k, t) in enumerate(rrows):
            rmap[(k, t)] = float(i)
        lpdf = pd.DataFrame(lrows, columns=["k", "ts"]).sort_values("ts").reset_index(drop=True)
        rpdf = pd.DataFrame(
            [(k, t, v) for (k, t), v in rmap.items()], columns=["k", "rts", "v"]
        ).sort_values("rts").reset_index(drop=True)
        want = pd.merge_asof(
            lpdf, rpdf, left_on="ts", right_on="rts", by="k", direction=direction
        )
        left = spark.createDataFrame(lpdf, "k long, ts long")
        right = spark.createDataFrame(rpdf, "k long, rts long, v double")
        out = asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts", direction=direction
        ).toPandas()
        gotm = {}
        for r in out.itertuples():
            gotm.setdefault((r.k, r.ts), []).append(
                None if pd.isna(r.v) else r.v
            )
        wantm = {}
        for r in want.itertuples():
            wantm.setdefault((r.k, r.ts), []).append(None if pd.isna(r.v) else r.v)
        assert {k: sorted(v, key=str) for k, v in gotm.items()} == {
            k: sorted(v, key=str) for k, v in wantm.items()
        }

    check()


class TestSaltedJoin:
    def test_matches_plain_join_and_spreads_hot_key(self, spark):
        from hail_spark.operators.relational import salted_join

        # 5000 rows of one hot key + a tail
        rows = [(0, i) for i in range(5000)] + [(k, k) for k in range(1, 50)]
        left = spark.createDataFrame(rows, "k long, payload long")
        right = spark.createDataFrame(
            [(k, f"d{k}") for k in range(50)], "k long, dim string"
        )
        got = salted_join(left, right, "k", n_salts=8)
        want = left.join(right, "k")
        assert got.count() == want.count() == 5049
        assert (
            got.agg(F.sum("payload")).collect()[0][0]
            == want.agg(F.sum("payload")).collect()[0][0]
        )
        # the hot key's rows must now hash-spread over multiple
        # (k, salt) shuffle keys
        n_groups = (
            salted_join(left, right, "k", n_salts=8)
            .groupBy("k")
            .count()
            .count()
        )
        assert n_groups == 50

    def test_left_join_keeps_unmatched(self, spark):
        from hail_spark.operators.relational import salted_join

        left = spark.createDataFrame([(1, "x"), (99, "y")], "k long, v string")
        right = spark.createDataFrame([(1, "d")], "k long, dim string")
        got = {r["k"]: r["dim"] for r in salted_join(left, right, "k", 4, "left").collect()}
        assert got == {1: "d", 99: None}

    def test_bad_how(self, spark):
        from hail_spark.operators.relational import salted_join

        df = spark.createDataFrame([(1,)], "k long")
        import pytest as _pytest

        with _pytest.raises(ValueError):
            salted_join(df, df, "k", how="full")


def test_sessionize_matches_python_reference(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        st.lists(
            st.tuples(st.integers(0, 2), st.integers(0, 40)), min_size=1, max_size=30
        ),
        st.integers(1, 15),
    )
    @settings(max_examples=15, deadline=None)
    def check(rows, gap):
        # de-dup (user, ts): equal timestamps have no defined lag order
        rows = sorted(set(rows))
        df = spark.createDataFrame(rows, "u long, ts long")
        got = {
            (r["u"], r["ts"]): r["session_idx"]
            for r in sessionize(df, "u", "ts", gap=gap).collect()
        }
        want = {}
        by_user: dict = {}
        for u, ts in rows:
            by_user.setdefault(u, []).append(ts)
        for u, tss in by_user.items():
            sid, prev = 0, None
            for ts in sorted(tss):
                if prev is not None and ts - prev > gap:
                    sid += 1
                want[(u, ts)] = sid
                prev = ts
        assert got == want

    check()


def test_frequent_items_matches_counter(spark):
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=300),
        st.integers(1, 20),
        st.integers(2, 6),
    )
    @settings(max_examples=10, deadline=None)
    def check(items, min_count, nparts):
        df = spark.createDataFrame([(w,) for w in items], "w string").repartition(
            nparts
        )
        got = {r["w"]: r["cnt"] for r in frequent_items(df, "w", min_count).collect()}
        want = {w: c for w, c in Counter(items).items() if c >= min_count}
        assert got == want

    check()


class TestFunnelCohort:
    def test_funnel_strict_order_and_window(self, spark):
        from hail_spark.operators.relational import funnel, funnel_counts

        rows = [
            # u1 completes A->B->C
            (1, 10, "A"), (1, 20, "B"), (1, 30, "C"),
            # u2 does B before A: B must NOT count
            (2, 10, "B"), (2, 20, "A"),
            # u3 completes but C is outside the window
            (3, 0, "A"), (3, 5, "B"), (3, 1000, "C"),
        ]
        df = spark.createDataFrame(rows, "u long, ts long, t string")
        f = {r["u"]: (r["step_1_ts"], r["step_2_ts"], r["step_3_ts"])
             for r in funnel(df, "u", "ts", "t", ["A", "B", "C"], within=100).collect()}
        assert f == {1: (10, 20, 30), 2: (20, None, None), 3: (0, 5, None)}
        counts = {r["step"]: r["n_keys"]
                  for r in funnel_counts(df, "u", "ts", "t",
                                         ["A", "B", "C"], within=100).collect()}
        assert counts == {1: 3, 2: 2, 3: 1}

    def test_cohort_retention(self, spark):
        from hail_spark.operators.relational import cohort_retention

        rows = [(1, 0), (1, 1), (1, 3), (2, 1), (2, 3), (3, 0)]
        df = spark.createDataFrame(rows, "u long, wk long")
        got = {(r["cohort"], r["periods_since"]): r["n_active"]
               for r in cohort_retention(df, "u", "wk").collect()}
        assert got == {(0, 0): 2, (0, 1): 1, (0, 3): 1, (1, 0): 1, (1, 2): 1}


def test_collapse_bursts(spark):
    from hail_spark.operators.relational import collapse_bursts

    rows = [
        (1, 0, "a"), (1, 5, "b"), (1, 9, "c"),   # one burst (chained <10)
        (1, 30, "d"),                              # new burst
        (2, 0, "e"),
    ]
    df = spark.createDataFrame(rows, "u long, ts long, tag string")
    got = sorted(r["tag"] for r in collapse_bursts(df, "u", "ts", window=10,
                                                   tiebreak="tag").collect())
    assert got == ["a", "d", "e"]


def test_funnel_counts_empty_funnel_yields_zero(spark):
    """ADVICE r05: when no key reaches step 1, n_keys must be 0 per
    step (the SQL oracle's COUNT semantics), not NULL from an empty
    SUM."""
    from hail_spark.operators.relational import funnel_counts

    rows = [(1, 0, "other"), (2, 5, "other")]
    df = spark.createDataFrame(rows, "u long, ts long, et string")
    got = {(r["step"], r["step_name"]): r["n_keys"]
           for r in funnel_counts(df, "u", "ts", "et", ["a", "b"]).collect()}
    assert got == {(1, "a"): 0, (2, "b"): 0}


def test_frequent_items_capacity_cap(spark):
    """ADVICE r05: a derived capacity beyond the sanity cap (memory and
    broadcast scale as N/min_count) must raise, not OOM later."""
    import pytest as _pytest

    from hail_spark.operators.relational import frequent_items

    df = spark.createDataFrame([("x",)], "tok string")
    with _pytest.raises(ValueError, match="sanity cap"):
        frequent_items(df, "tok", min_count=1, total=10_000_000_000)
    # explicit capacity bypasses the cap (caller owns the guarantee)
    out = frequent_items(
        df, "tok", min_count=1, total=10_000_000_000, capacity=128
    )
    assert out.collect()[0]["cnt"] == 1


class TestResample:
    def test_fill_modes(self, spark):
        from hail_spark.operators.relational import resample

        rows = [(1, 0, 10.0), (1, 25, 20.0), (2, 5, 1.0)]
        df = spark.createDataFrame(rows, "k long, ts long, v double")
        aggs = {"n": F.count(F.lit(1)), "vs": F.sum("v")}
        got = {
            fill: sorted(
                (r["k"], r["bucket"], r["n"], r["vs"])
                for r in resample(df, "k", "ts", 10, aggs, fill=fill).collect()
            )
            for fill in ("null", "zero", "ffill")
        }
        assert got["null"] == [(1, 0, 1, 10.0), (1, 10, None, None),
                               (1, 20, 1, 20.0), (2, 0, 1, 1.0)]
        assert got["zero"] == [(1, 0, 1, 10.0), (1, 10, 0, 0.0),
                               (1, 20, 1, 20.0), (2, 0, 1, 1.0)]
        assert got["ffill"] == [(1, 0, 1, 10.0), (1, 10, 1, 10.0),
                                (1, 20, 1, 20.0), (2, 0, 1, 1.0)]

    def test_negative_ts_floor_bucketing(self, spark):
        from hail_spark.operators.relational import resample

        df = spark.createDataFrame([(1, -15, 1.0), (1, 5, 2.0)],
                                   "k long, ts long, v double")
        out = sorted(r["bucket"] for r in
                     resample(df, "k", "ts", 10,
                              {"n": F.count(F.lit(1))}).collect())
        # floor semantics: -15 -> -20 (not -10), grid -20..0
        assert out == [-20, -10, 0]

    def test_bad_fill(self, spark):
        import pytest as _pytest

        from hail_spark.operators.relational import resample

        df = spark.createDataFrame([(1, 0, 1.0)], "k long, ts long, v double")
        with _pytest.raises(ValueError):
            resample(df, "k", "ts", 10, {"n": F.count(F.lit(1))}, fill="pad")


class TestFuzzyJoin:
    def test_matches_brute_force(self, spark):
        import itertools

        from hail_spark.operators.relational import fuzzy_join

        def lev(a, b):
            m = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
            for i in range(len(a) + 1):
                m[i][0] = i
            for j in range(len(b) + 1):
                m[0][j] = j
            for i in range(1, len(a) + 1):
                for j in range(1, len(b) + 1):
                    m[i][j] = min(m[i - 1][j] + 1, m[i][j - 1] + 1,
                                  m[i - 1][j - 1] + (a[i - 1] != b[j - 1]))
            return m[len(a)][len(b)]

        words = ["kitten", "sitten", "sittin", "sitting", "apple", "appel",
                 "aple", "x", "xy", "", "banana", "bananna"]
        L = spark.createDataFrame(list(enumerate(words)),
                                  "left_id long, w string")
        R = spark.createDataFrame(list(enumerate(words)),
                                  "right_id long, w string")
        for d in (1, 2):
            got = sorted((r["left_id"], r["right_id"], r["dist"])
                         for r in fuzzy_join(L, R, "w", max_dist=d).collect())
            want = sorted(
                (i, j, lev(a, b))
                for (i, a), (j, b) in itertools.product(enumerate(words),
                                                        repeat=2)
                if lev(a, b) <= d
            )
            assert got == want

    def test_validation(self, spark):
        import pytest as _pytest

        from hail_spark.operators.relational import fuzzy_join

        df = spark.createDataFrame([(1, "a")], "left_id long, w string")
        with _pytest.raises(ValueError):
            fuzzy_join(df, df, "w", max_dist=0)


def test_as_of_time_travel(spark):
    from hail_spark.llmdata.versioning import as_of

    log = spark.createDataFrame(
        [("a", 1, "u", 10.0), ("a", 3, "u", 30.0), ("a", 5, "d", 0.0),
         ("b", 2, "u", 20.0), ("c", 9, "u", 90.0),
         ("d", 4, "u", 40.0), ("d", 4, "u", 41.0)],   # version tie
        "k string, v long, op string, val double",
    )

    def snap(version):
        return {
            r["k"]: (r["v"], r["val"])
            for r in as_of(log, "k", "v", version, op_col="op",
                           tiebreak_col="val").collect()
        }

    assert snap(2) == {"a": (1, 10.0), "b": (2, 20.0)}
    assert snap(4) == {"a": (3, 30.0), "b": (2, 20.0), "d": (4, 41.0)}
    # a deleted at v=5; c not yet born
    assert snap(6) == {"b": (2, 20.0), "d": (4, 41.0)}
    assert snap(9)["c"] == (9, 90.0)
