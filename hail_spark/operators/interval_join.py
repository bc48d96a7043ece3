"""Interval (containment/range) joins.

Parity target: ``TableIntervalJoin`` (ref hail/python/hail/ir/
table_ir.py:111; KeyedRVD.scala:99-129 — Hail joins a point-keyed table
to an interval-keyed table by walking aligned partitions).

Two strategies, chosen by right-side size — the same split Hail gets
implicitly from its partitioner:

* ``interval_join_point``: small interval side → broadcast non-equi
  join. Catalyst turns it into BroadcastNestedLoopJoin; with the
  interval side in memory on every executor there is no shuffle at all,
  so this scales to any left size.
* ``interval_join_binned``: big-big → flatmap each interval to the
  fixed-width bins it covers, compute each point's bin, hash equi-join
  on the bin, then re-check the exact predicate. Turns an O(n·m)
  nested-loop into a shuffle-bounded equi-join (SURVEY.md §7 hard
  parts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..table import Table


def _containment(point: Column, lo: Column, hi: Column,
                 includes_start: bool, includes_end: bool) -> Column:
    lo_ok = point >= lo if includes_start else point > lo
    hi_ok = point <= hi if includes_end else point < hi
    return lo_ok & hi_ok


def interval_join_point(
    left: Table,
    right: Table,
    point: Column,
    start: str = "start",
    end: str = "end",
    includes_start: bool = True,
    includes_end: bool = False,
    how: str = "inner",
) -> Table:
    """Broadcast containment join: every left row matched against the
    (small) interval table. `point` is an expression over left columns."""
    rdf = right.df
    cond = _containment(point, rdf[start], rdf[end], includes_start, includes_end)
    df = left.df.join(F.broadcast(rdf), on=cond, how=how)
    return Table(df, left.key, {**right.globals, **left.globals})


def interval_join_binned(
    left: Table,
    right: Table,
    point: Column,
    start: str = "start",
    end: str = "end",
    bin_width: float | int = 1000,
    includes_start: bool = True,
    includes_end: bool = False,
    how: str = "inner",
) -> Table:
    """Big-big containment join via interval binning.

    Each interval row explodes to ceil(len/bin_width) rows keyed by bin
    id; each point computes one bin id; the equi-join on bin id shuffles
    both sides by hash(bin) — skew only if one bin is hot (AQE skew-join
    handles that). The exact containment predicate is re-applied after
    the join, so correctness never depends on the bin width.
    """
    rdf = right.df
    bin_of = lambda c: F.floor(c / F.lit(float(bin_width))).cast("bigint")  # noqa: E731
    r_binned = rdf.withColumn(
        "__bin",
        F.explode(F.sequence(bin_of(rdf[start]), bin_of(rdf[end]))),
    )
    l_binned = left.df.withColumn("__bin", bin_of(point))
    cond = (l_binned["__bin"] == r_binned["__bin"]) & _containment(
        point, r_binned[start], r_binned[end], includes_start, includes_end
    )
    df = l_binned.join(r_binned, on=cond, how=how).drop("__bin")
    return Table(df, left.key, {**right.globals, **left.globals})
