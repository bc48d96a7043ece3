"""query_table — point/range lookups into a written native table
WITHOUT a Spark job.

Parity target: ``hl.query_table`` / ``hl.query_matrix_table_rows``
(ref functions.py:7245/7295), which read the reference's per-partition
key b-tree index (hail/hail/src/is/hail/io/index/IndexReader.scala)
driver-side. Our native format is key-sorted parquet (Table.write,
table.py), so the equivalent index is parquet row-group min/max
statistics: this module opens the parquet footer(s) with pyarrow,
prunes row groups whose [min, max] key interval misses the probe, and
scans only the surviving groups — O(row-group) driver-side I/O, no
cluster round trip, exactly the latency class of the reference's
indexed reads.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any

import pyarrow.parquet as pq


def _key_meta(path: str) -> list[str]:
    with open(os.path.join(path, "_hail_spark_metadata.json")) as f:
        return json.load(f)["key"]


def _row_group_bounds(pf: pq.ParquetFile, col_idx: int):
    """(min, max) per row group for one column, None if stats absent."""
    out = []
    for rg in range(pf.metadata.num_row_groups):
        col = pf.metadata.row_group(rg).column(col_idx)
        st = col.statistics
        out.append((st.min, st.max) if st is not None and st.has_min_max else None)
    return out


_MANIFEST_NAME = "_key_manifest.json"
_JSONABLE = (int, float, str, bool)


def build_key_manifest(path: str, key: list[str]) -> bool:
    """Write a per-file first-key [min, max] manifest
    (``_key_manifest.json``) next to a native table's metadata — one
    driver-side footer pass at WRITE time so point/range lookups skip
    the file listing + footer reads entirely (at 10^5 files that is
    the dominant lookup cost; the reference persists partition bounds
    in its table spec for the same reason —
    AbstractRVDSpec.scala:224). Returns True if written; keys whose
    parquet stats aren't JSON-primitive (dates, decimals, binary) skip
    the manifest and lookups fall back to footer pruning. A skipped
    build also REMOVES any manifest left by a previous write of the
    same path, so an overwrite can never leave a stale one behind."""

    def _skip() -> bool:
        try:
            os.remove(os.path.join(path, _MANIFEST_NAME))
        except OSError:
            pass
        return False

    if not key:
        return _skip()
    k0 = key[0]
    entries = {}
    for fp in sorted(glob.glob(os.path.join(path, "rows", "*.parquet"))):
        pf = pq.ParquetFile(fp)
        names = pf.schema_arrow.names
        if k0 not in names:
            return _skip()
        fmin, fmax = None, None
        for b in _row_group_bounds(pf, names.index(k0)):
            if b is None:
                fmin, fmax = None, None
                break
            fmin = b[0] if fmin is None or b[0] < fmin else fmin
            fmax = b[1] if fmax is None or b[1] > fmax else fmax
        if fmin is None or not (
            isinstance(fmin, _JSONABLE) and isinstance(fmax, _JSONABLE)
        ):
            return _skip()  # no/unsupported stats — never a partial lie
        entries[os.path.basename(fp)] = [fmin, fmax]
    with open(os.path.join(path, _MANIFEST_NAME), "w") as f:
        json.dump({"key_field": k0, "files": entries}, f)
    return True


def _manifest_files(path: str, k0: str, lo, hi) -> list[str] | None:
    """File list pruned by the persisted manifest, or None when no
    usable manifest exists (fall back to listing + footer pruning).
    Files written after the manifest (not listed in it) are never
    silently skipped — their presence invalidates the manifest."""
    mp = os.path.join(path, _MANIFEST_NAME)
    if not os.path.exists(mp):
        return None
    try:
        with open(mp) as f:
            m = json.load(f)
    except (OSError, json.JSONDecodeError):
        return None
    if m.get("key_field") != k0:
        return None
    listed = m.get("files", {})
    actual = {
        os.path.basename(p)
        for p in glob.glob(os.path.join(path, "rows", "*.parquet"))
    }
    if set(listed) != actual:
        return None  # stale manifest — correctness beats the shortcut
    if listed and not (
        isinstance(lo, _JSONABLE) and isinstance(hi, _JSONABLE)
    ):
        return None  # probe type can't compare against JSON bounds
    try:
        return sorted(
            os.path.join(path, "rows", name)
            for name, (fmin, fmax) in listed.items()
            if fmin <= hi and fmax >= lo
        )
    except TypeError:
        # JSON-primitive but incomparable probe (str probe vs int
        # bounds, mixed interval endpoints): degrade to footer pruning
        # instead of surfacing a comparison error
        return None


def query_table(path: str, point=None, interval: tuple | None = None) -> list[dict]:
    """Read rows whose first key field equals ``point`` (or falls in
    ``interval=(lo, hi)`` inclusive) from a Table.write output dir.

    Runs entirely on the driver with pyarrow; the persisted key
    manifest (written by Table.write) selects candidate FILES without
    opening any footer, then row-group min/max stats prune within the
    survivors — only overlapping row groups are deserialized."""
    if (point is None) == (interval is None):
        raise ValueError("exactly one of point / interval is required")
    key = _key_meta(path)
    if not key:
        raise ValueError("query_table requires a keyed table")
    k0 = key[0]
    lo, hi = (point, point) if interval is None else interval

    files = _manifest_files(path, k0, lo, hi)
    if files is None:
        files = sorted(glob.glob(os.path.join(path, "rows", "*.parquet")))
    rows: list[dict] = []
    for fp in files:
        pf = pq.ParquetFile(fp)
        names = pf.schema_arrow.names
        ci = names.index(k0)
        groups = [
            rg
            for rg, b in enumerate(_row_group_bounds(pf, ci))
            if b is None or (b[0] <= hi and b[1] >= lo)
        ]
        if not groups:
            continue
        tbl = pf.read_row_groups(groups)
        col = tbl.column(k0).to_pylist()
        keep = [i for i, v in enumerate(col) if v is not None and lo <= v <= hi]
        if keep:
            sub = tbl.take(keep).to_pylist()
            rows.extend(sub)
    return rows


def query_matrix_table_rows(
    path: str,
    point=None,
    interval: tuple | None = None,
    entries_name: str = "entries",
) -> list[dict]:
    """Point/interval reads into a written MatrixTable WITHOUT a Spark
    job (ref ``hl.query_matrix_table_rows``, functions.py:7295): the
    same row-group-pruned pyarrow read as :func:`query_table` over the
    MT's rows dir (our MT layout is a keyed table whose rows carry the
    entries array), with the entries field surfaced under
    ``entries_name`` — the reference's parameter for the same rename."""
    rows = query_table(path, point=point, interval=interval)
    # on disk the entries array lives under the internal reserved name
    # (matrixtable.ENTRIES == "__entries"); surface it as entries_name
    for r in rows:
        if "__entries" in r:
            r[entries_name] = r.pop("__entries")
    return rows


def matrix_table_cols(path: str) -> list[dict]:
    """Column table of a written MatrixTable, read driver-side from the
    metadata sidecar (cols live in ``_matrix_metadata.json`` — no data
    file I/O at all, matching the reference where cols are part of the
    matrix spec, not a partitioned dataset)."""
    with open(os.path.join(path, "_matrix_metadata.json")) as f:
        return json.load(f)["cols"]


def table_stats(path: str) -> dict[str, Any]:
    """Partition/row-group manifest of a native table — the analogue of
    the reference's partition-bounds metadata (AbstractRVDSpec.scala:224)."""
    key = _key_meta(path)
    files = sorted(glob.glob(os.path.join(path, "rows", "*.parquet")))
    n_rows, n_groups, bounds = 0, 0, []
    for fp in files:
        pf = pq.ParquetFile(fp)
        n_rows += pf.metadata.num_rows
        n_groups += pf.metadata.num_row_groups
        if key:
            ci = pf.schema_arrow.names.index(key[0])
            for b in _row_group_bounds(pf, ci):
                if b:
                    bounds.append(b)
    return {
        "key": key,
        "n_files": len(files),
        "n_rows": n_rows,
        "n_row_groups": n_groups,
        "key_bounds": bounds,
    }


def parquet_stats(spark, path: str, cols: list[str]):
    """min/max per column + row count answered from PARQUET FOOTER
    METADATA — no row scan. Routes the read through the v2 parquet
    source with ``spark.sql.parquet.aggregatePushdown`` so the plan's
    BatchScan carries PushedAggregation (asserted in
    tests/test_query_table_stats.py) and each file contributes only
    its footer stats; at 100 TB that is thousands of footer reads
    instead of a full scan. Returns one Row with ``<c>_min``,
    ``<c>_max`` per column and ``n_rows``.

    The two session confs are flipped and RESTORED around the one
    collect (session-global — don't call concurrently with other
    planning on the same session)."""
    from pyspark.sql import functions as F

    conf = spark.conf
    old_v1 = conf.get("spark.sql.sources.useV1SourceList", None)
    old_pd = conf.get("spark.sql.parquet.aggregatePushdown", None)
    try:
        conf.set(
            "spark.sql.sources.useV1SourceList", "avro,csv,json,kafka,orc,text"
        )
        conf.set("spark.sql.parquet.aggregatePushdown", "true")
        df = spark.read.parquet(path)
        aggs = []
        for c in cols:
            aggs.append(F.min(c).alias(f"{c}_min"))
            aggs.append(F.max(c).alias(f"{c}_max"))
        aggs.append(F.count(F.lit(1)).alias("n_rows"))
        return df.agg(*aggs).collect()[0]
    finally:
        for k, v in (
            ("spark.sql.sources.useV1SourceList", old_v1),
            ("spark.sql.parquet.aggregatePushdown", old_pd),
        ):
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
