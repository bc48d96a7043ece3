"""Reference-API parity surface: every name a reference user reaches
via hl.* / hl.methods.* / hl.expr.* resolves here, and the new
functional additions behave (ref hail/__init__.py __all__,
methods/__init__.py __all__, expr/__init__.py __all__)."""

import ast

import pytest
from pyspark.sql import functions as F

from hail_spark.expr import functions as hf


REF = "/root/reference/hail/python/hail"


def _ref_all(path):
    tree = ast.parse(open(path).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if getattr(t, "id", None) == "__all__":
                    return [ast.literal_eval(e) for e in node.value.elts]
    return []


# names whose reference meaning is the expression-IR/typecheck layer or
# explicitly out-of-scope subsystems (SURVEY §2.12: viz; Batch service)
_IR_LAYER = {
    "Aggregation", "ArrayExpression", "ArrayNumericExpression",
    "ArrayStructExpression", "BooleanExpression", "CallExpression",
    "CollectionExpression", "DictExpression", "Expression",
    "ExpressionException", "Float32Expression", "Float64Expression",
    "Indices", "Int32Expression", "Int64Expression", "IntervalExpression",
    "LocusExpression", "NDArrayExpression", "NDArrayNumericExpression",
    "NumericExpression", "SetExpression", "StreamExpression",
    "StringExpression", "StructExpression", "TupleExpression",
    "analyze", "apply_expr", "builders", "cast_expr", "coercer_from_dtype",
    "construct_expr", "construct_reference", "construct_variable",
    "extract_refs_by_indices", "get_refs", "matrix_table_source",
    "raise_unless_column_indexed", "raise_unless_entry_indexed",
    "raise_unless_row_indexed", "table_source", "to_expr", "unify_all",
    "unify_exprs", "unify_types", "unify_types_limited",
    "expr_any", "expr_array", "expr_bool", "expr_call", "expr_dict",
    "expr_float32", "expr_float64", "expr_int32", "expr_int64",
    "expr_interval", "expr_locus", "expr_ndarray", "expr_numeric",
    "expr_oneof", "expr_set", "expr_str", "expr_struct", "expr_tuple",
    "tmatrix", "ttable", "tvariable", "tblockmatrix",
    "_compare", "_console_log", "_locus_windows_per_contig", "_showstr",
    "_stream_range", "_values_similar", "_zip_func", "_zip_join_producers",
    "_zip_streams", "eval_timed", "is_valid_contig",  # present; listed for clarity
    "ggplot", "plot", "ir", "init_batch",
}


def test_top_level_all_resolves():
    import hail_spark as hs

    missing = []
    for n in _ref_all(f"{REF}/__init__.py"):
        if n in ("ggplot", "plot", "ir", "init_batch"):
            continue  # viz + Batch service: out of engine scope
        if not hasattr(hs, n):
            missing.append(n)
    assert missing == [], missing


def test_methods_all_resolves():
    import hail_spark.methods as m

    missing = [n for n in _ref_all(f"{REF}/methods/__init__.py") if not hasattr(m, n)]
    assert missing == [], missing


def test_expr_all_resolves():
    import hail_spark as hs
    import hail_spark.expr.stats as stats
    import hail_spark.expr.genome as genome
    import hail_spark.expr.ndarray as nd
    from hail_spark.expr import aggregators as agg

    missing = []
    for n in _ref_all(f"{REF}/expr/__init__.py"):
        if n in _IR_LAYER:
            continue
        if not any(hasattr(mod, n) for mod in (hf, hs, stats, genome, nd, agg)):
            missing.append(n)
    assert missing == [], missing


def test_builtin_name_aliases():
    assert hf.len is hf.len_
    assert hf.zip is hf.zip_
    assert hf.range is hf.range_
    assert hf.sorted is hf.sorted_
    assert hf.median is hf.median_
    # bare builtins are untouched inside the module
    assert len([1, 2]) == 2


def test_types_module():
    from hail_spark.expr import types as ty

    assert ty.dtype("array<int32>").simpleString() == "array<int>"
    s = ty.dtype("struct{x: int32, y: array<float64>}")
    assert [f.name for f in s.fields] == ["x", "y"]
    assert ty.dtype("dict<str, int64>").simpleString() == "map<string,bigint>"
    assert ty.dtype("tuple(int32, str)").fields[1].name == "1"
    assert ty.dtype("ndarray<float64, 2>").simpleString() == "array<array<double>>"
    assert ty.dtype("interval<locus<GRCh38>>").fields[0].name == "start"
    assert ty.impute_type(3).simpleString() == "int"
    assert ty.impute_type(2**40).simpleString() == "bigint"
    assert ty.impute_type({"a": [1.0]}).simpleString() == "map<string,array<double>>"
    assert ty.is_numeric(ty.tint32) and not ty.is_numeric(ty.tstr)
    assert ty.hts_entry_schema["GT"].dataType == ty.tcall
    with pytest.raises(ValueError):
        ty.dtype("array<int32")


def test_eval_and_calls(spark):
    assert hf.eval(F.lit(2) + 2) == 4
    v, t = hf.eval_typed(F.lit(1.5))
    assert v == 1.5 and t.simpleString() == "double"
    c = hf.eval(hf.call(0, 1))
    assert (c["GT"], c["ploidy"], c["phased"]) == (1, 2, False)
    assert hf.eval(hf.downcode(F.array(F.lit(1), F.lit(2)), 2)) == 1


def test_mendel_error_code(spark):
    loc = F.struct(F.lit("2").alias("contig"), F.lit(2000000).alias("position"))
    locx = F.struct(F.lit("X").alias("contig"), F.lit(1).alias("position"))

    def code(l, fem, d, m, k):
        return hf.eval(hf.mendel_error_code(l, F.lit(fem), F.lit(d), F.lit(m), F.lit(k)))

    assert code(loc, True, 2, 2, 1) == 1
    assert code(loc, True, 0, 0, 1) == 2
    assert code(loc, True, 0, None, 2) == 3  # NoCall mom is in ~HomRef
    assert code(loc, True, 1, 0, 2) == 4
    assert code(loc, True, 0, 0, 2) == 5
    assert code(loc, True, 2, None, 0) == 6
    assert code(loc, True, 1, 2, 0) == 7
    assert code(loc, True, 2, 2, 0) == 8
    assert code(locx, False, 0, 2, 0) == 9
    assert code(locx, False, 0, 0, 2) == 10
    assert code(loc, True, 0, 2, 1) is None  # consistent
    # reference doctest: father (0,0), mother (1,1), child (0,0) -> 7
    assert (
        hf.eval(
            hf.mendel_error_code(
                loc, F.lit(True), hf.call(0, 0), hf.call(1, 1), hf.call(0, 0)
            )
        )
        == 7
    )


def test_genome_level_functions(spark):
    assert hf.eval(hf.contig_length(F.lit("1"))) == 249250621
    assert hf.eval(hf.is_valid_contig(F.lit("1")))
    assert not hf.eval(hf.is_valid_contig(F.lit("zzz")))
    assert not hf.eval(hf.is_valid_locus(F.lit("1"), F.lit(0)))
    r = hf.eval(hf.locus_from_global_position(F.lit(0)))
    assert (r["contig"], r["position"]) == ("1", 1)


def test_sort_by_and_multi_hyper(spark):
    assert hf.eval(
        hf._sort_by(F.array(F.lit(3), F.lit(1), F.lit(2)), lambda l, r: l > r)
    ) == [3, 2, 1]
    rows = [
        r["v"]
        for r in spark.range(40)
        .select(hf.rand_multi_hyper(F.col("id"), [2, 7, 1], 4, seed=7).alias("v"))
        .collect()
    ]
    assert all(sum(r) == 4 for r in rows)
    assert all(0 <= r[0] <= 2 and 0 <= r[1] <= 7 and 0 <= r[2] <= 1 for r in rows)
    assert len({tuple(r) for r in rows}) > 1  # actually random


def test_struct_interval_flags():
    import hail_spark as hs

    s = hs.Struct(a=1, b="x")
    assert s.a == 1 and s.annotate(c=2).c == 2 and "a" not in s.drop("a")
    i = hs.Interval(1, 5)
    assert i.contains(1) and not i.contains(5) and i.overlaps(hs.Interval(4, 9))
    hs._set_flags(some_flag="on")
    assert hs._get_flags("some_flag") == {"some_flag": "on"}
    with hs._with_flags(some_flag="off"):
        assert hs._get_flags("some_flag") == {"some_flag": "off"}
    assert hs._get_flags("some_flag") == {"some_flag": "on"}
    assert hs.cite_hail().startswith("Hail Team")


def test_split_multi_rows_only(spark):
    from hail_spark.methods.genetics import split_multi
    from hail_spark.table import Table

    df = spark.createDataFrame(
        [
            {"locus": {"contig": "1", "position": 100}, "alleles": ["A", "T", "C"], "x": 7},
            {"locus": {"contig": "1", "position": 200}, "alleles": ["G", "C"], "x": 8},
            {"locus": {"contig": "1", "position": 300}, "alleles": ["G", "*", "C"], "x": 9},
        ],
        "locus struct<contig:string,position:int>, alleles array<string>, x int",
    )
    out = split_multi(Table(df, ("locus", "alleles")))._df.orderBy(
        "locus.position", "a_index"
    )
    rows = out.collect()
    # star allele dropped, multiallelics split, passthrough intact
    assert [(r["locus"]["position"], r["a_index"], r["alleles"][1]) for r in rows] == [
        (100, 1, "T"), (100, 2, "C"), (200, 1, "C"), (300, 2, "C"),
    ]
    assert all(r["old_alleles"] and r["x"] for r in rows)
    assert rows[0]["was_split"] and not rows[2]["was_split"]
    kept = split_multi(Table(df, ("locus", "alleles")), keep_star=True)._df.count()
    assert kept == 5


def test_index_bgen(tmp_path, spark):
    import json

    from hail_spark.io.bgen import export_bgen_test_file, index_bgen

    import numpy as np

    p = str(tmp_path / "t.bgen")
    export_bgen_test_file(
        p,
        variants=[("rs1", "1", 100, ["A", "G"]), ("rs2", "01", 200, ["C", "T"])],
        gps=np.array(
            [
                [[0.1, 0.8, 0.1], [0.9, 0.05, 0.05]],
                [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
            ]
        ),
        samples=["s1", "s2"],
    )
    idx_path = str(tmp_path / "custom.idx.json")
    counts = index_bgen(p, index_file_map={p: idx_path}, contig_recoding={"01": "1"})
    assert counts == [2]
    idx = json.load(open(idx_path))
    assert [v["contig"] for v in idx["variants"]] == ["1", "1"]


def test_import_csv(tmp_path, spark):
    f = tmp_path / "t.csv"
    f.write_text('a,b\n1,"x,y"\n2,NA\n')
    t = __import__("hail_spark.io.impex", fromlist=["import_csv"]).import_csv(
        spark, str(f), impute=True
    )
    rows = {r["a"]: r["b"] for r in t.df.collect()}
    assert rows == {1: "x,y", 2: None}


def test_skat_dispatcher_and_read_aliases(spark, tmp_path):
    import hail_spark.methods as m

    assert m._linear_skat is m.linear_skat
    assert m._hwe_normalized_blanczos is m._blanczos_pca
    df = spark.range(5).withColumnRenamed("id", "k")
    from hail_spark.table import Table

    Table(df, ("k",)).write(str(tmp_path / "t"))
    t2 = m.read_table(spark, str(tmp_path / "t"))
    assert t2.df.count() == 5


def test_agg_namespace_completion(spark):
    from hail_spark.expr import aggregators as agg

    df = spark.createDataFrame(
        [
            {"g": "a", "arr": [1.0, 2.0, None]},
            {"g": "a", "arr": [3.0, 4.0, 5.0]},
            {"g": "b", "arr": [10.0, 20.0, 30.0]},
        ]
    )
    r = (
        df.groupBy("g")
        .agg(
            agg.explode(agg.sum, F.col("arr")).alias("esum"),
            agg.explode(agg.count, F.col("arr")).alias("ecnt"),
            agg.explode(agg.mean, F.col("arr")).alias("emean"),
            agg.explode(agg.sum, F.col("arr"), transform=lambda e: e * 2).alias("e2"),
            agg.array_agg(agg.sum, F.col("arr")).alias("asum"),
            agg.array_agg(agg.mean, F.col("arr")).alias("amean"),
            agg.array_agg(agg.min, F.col("arr")).alias("amin"),
            agg._prev_nonnull(F.col("g")).alias("pn"),
        )
        .orderBy("g")
        .collect()
    )
    a = r[0]
    assert (a["esum"], a["ecnt"], a["emean"], a["e2"]) == (15.0, 5, 3.0, 30.0)
    assert a["asum"] == [4.0, 6.0, 5.0]  # null elements skipped, like agg.sum
    assert a["amean"] == [2.0, 3.0, 5.0]
    assert a["amin"] == [1.0, 2.0, 5.0]
    assert a["pn"] == "a"
    loc = df.select(
        agg._aggregate_local_array(F.col("arr"), agg.sum).alias("ls"),
        agg._aggregate_local_array(F.col("arr"), agg.count).alias("lc"),
    ).collect()
    assert [(x["ls"], x["lc"]) for x in loc] == [(3.0, 2), (12.0, 3), (60.0, 3)]
    t = (
        spark.createDataFrame([{"v": "1"}, {"v": "2.5"}, {"v": None}])
        .agg(agg._impute_type(F.col("v")).alias("t"))
        .first()["t"]
    )
    assert t["anyNonMissing"] and not t["allDefined"]
    assert t["supportsFloat64"] and not t["supportsInt32"]
    assert agg.filter is agg.agg_filter
    assert agg._reservoir_sample is agg.reservoir_sample
    with pytest.raises(NotImplementedError):
        agg._densify(3, F.col("arr"))


def test_table_matrixtable_method_parity():
    """Every public reference Table/MatrixTable method resolves."""
    import ast

    from hail_spark.matrixtable import MatrixTable
    from hail_spark.table import Table

    def class_methods(path, cls):
        tree = ast.parse(open(path).read())
        for node in ast.walk(tree):
            if isinstance(node, ast.ClassDef) and node.name == cls:
                return [
                    n.name
                    for n in node.body
                    if isinstance(n, ast.FunctionDef) and not n.name.startswith("_")
                ]

    assert [m for m in class_methods(f"{REF}/table.py", "Table") if m not in dir(Table)] == []
    assert [
        m
        for m in class_methods(f"{REF}/matrixtable.py", "MatrixTable")
        if m not in dir(MatrixTable)
    ] == []


def test_mt_surface_completion(spark):
    from hail_spark.matrixtable import MatrixTable

    mt = MatrixTable.from_parts(
        globals={"g1": 7},
        rows={"r": [10, 20, 30]},
        cols={"s": ["a", "b"]},
        entries={"x": [[1, 2], [3, None], [5, 6]]},
    )
    assert mt.count() == (3, 2)
    assert mt.aggregate_rows(m=F.max("r")) == {"m": 30}
    assert mt.aggregate_cols(n=F.count(F.lit(1))) == {"n": 2}
    assert mt.annotate_globals(g2=1).index_globals() == {"g1": 7, "g2": 1}
    assert mt.globals.g1 == 7 and sorted(mt.row_value.keys()) == ["r"]
    assert mt.col_value == {"s": ["a", "b"]} and sorted(mt.entry.keys()) == ["x"]
    assert mt.select_rows(r2=F.col("r") * 2)._df.columns == ["row_idx", "r2", "__entries"]
    tr = mt.transmute_rows(r2=F.col("r") * 2)
    assert "r" not in tr._df.columns and "r2" in tr._df.columns
    tc = mt.transmute_cols(lambda c: {"S": str(c["s"]).upper()})
    assert tc._cols[0] == {"col_idx": 0, "S": "A"}  # 's' dropped (read by f)
    lt = mt.localize_entries("ent", "the_cols")
    assert "ent" in lt.df.columns and len(lt.globals["the_cols"]) == 2
    wide = mt.make_table().df.orderBy("row_idx").collect()
    assert (wide[1]["0"], wide[1]["1"]) == (3, None)
    s = mt.summarize()
    assert (s["n_rows"], s["n_cols"], s["n_entries"]) == (3, 2, 6)
    te = mt.transmute_entries(lambda e: {"y": e["x"] * 10}, drop=("x",))
    assert te._entry_fields() == ["y"]
    keys = spark.createDataFrame([{"row_idx": 0, "col_idx": 1}])
    assert mt.index_entries(keys).first()["entry"]["x"] == 2
    assert mt.repartition(2).n_partitions() == 2
    assert MatrixTable.from_rows_table(mt.rows()).count() == (3, 0)
    efs = mt.filter_entries(lambda e: e["x"] > 2).compute_entry_filter_stats()
    assert efs._cols[0]["entry_stats_col"]["n_filtered"] >= 1


def test_table_surface_completion(spark, tmp_path):
    from hail_spark.table import Table

    t = Table(
        spark.createDataFrame([{"k": 1, "v": "a"}, {"k": 2, "v": "b"}]), ("k",)
    )
    assert t.row_value == ("v",)
    assert t.index_globals() == {}
    keys = spark.createDataFrame([{"k": 2}])
    assert t.index(keys).first()["v"] == "b"
    t.write_many(str(tmp_path / "many"), ["v"])
    back = Table.read(spark, str(tmp_path / "many/v"))
    assert sorted(r["v"] for r in back.df.collect()) == ["a", "b"]
    assert t.cache() is t
    t.unpersist()


def test_zip_enumerate_reference_semantics(spark):
    # hl.zip truncates to shortest by default (ref functions.py:4485)
    z = hf.eval(
        hf.zip(
            F.array(F.lit(1)),
            F.array(F.lit(10), F.lit(20)),
            F.array(F.lit(100), F.lit(200), F.lit(300)),
        )
    )
    assert [tuple(r) for r in z] == [(1, 10, 100)]
    zf = hf.eval(hf.zip(F.array(F.lit(1)), F.array(F.lit(10), F.lit(20)), fill_missing=True))
    assert [tuple(r) for r in zf] == [(1, 10), (None, 20)]
    # hl.enumerate: index first, start offset (ref :4538)
    e = hf.eval(hf.enumerate(F.array(F.lit("A"), F.lit("B")), 3))
    assert [tuple(r) for r in e] == [(3, "A"), (4, "B")]
    e2 = hf.eval(hf.enumerate(F.array(F.lit("A"),), index_first=False))
    assert [tuple(r) for r in e2] == [("A", 0)]


def test_sorted_median_reference_semantics(spark):
    arr = F.array(F.lit("Charlie"), F.lit("Alice"), F.lit("Bob"))
    assert hf.eval(hf.sorted(arr)) == ["Alice", "Bob", "Charlie"]
    assert hf.eval(hf.sorted(arr, reverse=True)) == ["Charlie", "Bob", "Alice"]
    assert hf.eval(hf.sorted(arr, key=lambda x: F.length(x))) == ["Bob", "Alice", "Charlie"]
    # hl.median doctest: even length takes the lower middle, type kept
    assert hf.eval(hf.median(F.array(*[F.lit(x) for x in [1, 3, 5, 6, 7, 9]]))) == 5
    assert hf.eval(hf.median(F.array(*[F.lit(x) for x in [2, 4]]))) == 2


def test_any_all_forms(spark):
    b = F.array(F.lit(False), F.lit(True))
    assert hf.eval(hf.any(b)) is True and hf.eval(hf.all(b)) is False
    assert hf.eval(hf.any(lambda x: x > 2, F.array(F.lit(1), F.lit(3)))) is True
    assert hf.eval(hf.all(lambda x: x > 0, F.array(F.lit(1), F.lit(3)))) is True
    assert hf.eval(hf.any(F.lit(False), F.lit(True))) is True
    assert hf.eval(hf.all(F.lit(True), F.lit(False))) is False


def test_agg_hardy_weinberg_test(spark):
    from hail_spark.expr import aggregators as agg
    from hail_spark.expr.stats import hardy_weinberg_test as exact

    df = spark.createDataFrame([{"g": "x", "gt": i % 3} for i in range(30)])
    r = df.groupBy("g").agg(agg.hardy_weinberg_test(F.col("gt")).alias("h")).first()["h"]
    want = exact(10, 10, 10)
    assert r["het_freq_hwe"] == pytest.approx(want["het_freq_hwe"])
    assert r["p_value"] == pytest.approx(want["p_value"])
    r1 = (
        df.groupBy("g")
        .agg(agg.hardy_weinberg_test(F.col("gt"), one_sided=True).alias("h"))
        .first()["h"]
    )
    assert r1["p_value"] == pytest.approx(exact(10, 10, 10, one_sided=True)["p_value"])
    # reference doctests (functions.py:1235) — exact mid-p
    assert exact(250, 500, 250)["p_value"] == pytest.approx(0.9747844394217698, abs=1e-12)
    assert exact(37, 200, 85)["p_value"] == pytest.approx(1.1337210383168987e-06, rel=1e-10)
