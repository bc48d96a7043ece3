"""Multi-way zip join: N same-schema keyed tables → one row per key with
an array of per-source structs, aligned by source index.

Parity target: ``TableMultiWayZipJoin`` (ref hail/python/hail/ir/
table_ir.py:824; lowered via TableStage.zipPartitions,
LowerTableIR.scala:223; Python surface hl.Table.multi_way_zip_join,
table.py:4586).

Spark-first strategy: tag + unionByName + single hash aggregation —
ONE shuffle total regardless of N (an N-way outer-join chain would
shuffle N times). Element i of the output array is source i's row for
that key, NULL if absent (Hail's semantics; if a source has duplicate
keys one row wins, matching Hail's undefined-choice for dup keys).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import functions as F

from ..table import Table


def multi_way_zip_join(tables: list[Table], data_field: str = "data") -> Table:
    if not tables:
        raise ValueError("need at least one table")
    key = tables[0].key
    if not key or any(t.key != key for t in tables):
        raise ValueError("all tables must share the same key")
    n = len(tables)
    value_cols = [c for c in tables[0].df.columns if c not in key]

    tagged = [
        t.df.select(
            *key,
            F.lit(i).alias("__src"),
            F.struct(*[F.col(c) for c in value_cols]).alias("__v"),
        )
        for i, t in enumerate(tables)
    ]
    unioned = reduce(lambda a, b: a.unionByName(b), tagged)
    gathered = unioned.groupBy(*key).agg(
        F.map_from_entries(F.collect_list(F.struct("__src", "__v"))).alias("__m")
    )
    out = gathered.select(
        *key,
        F.transform(
            F.sequence(F.lit(0), F.lit(n - 1)), lambda i: F.col("__m")[i]
        ).alias(data_field),
    )
    g = {}
    for t in tables:
        g.update(t.globals)
    return Table(out, key, g)
