"""Executor-side shard writing + driver-side concatenation.

Single-file binary sinks (.bed, .bgen, …) are inherently one sequential
byte stream, but the expensive part — encoding rows to bytes — need not
run on the driver. This module gives exporters the reference's
shard-then-concatenate shape (ref io/plink/ExportPlink.scala,
io/gen/ExportBGEN.scala: per-partition part files merged at the end):

1. the input DataFrame is globally ordered (``orderBy`` upstream ⇒
   range-partitioned, partition index = output order),
2. each task encodes its partition and writes one shard file
   (tmp + atomic rename, so task retries are idempotent),
3. the driver concatenates shards in partition order and removes them.

The shard directory must be on storage reachable by both executors and
driver (local FS in local mode; a shared/distributed FS on a cluster —
the same requirement the reference's writers have for their part files).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame


def write_shards(df: DataFrame, shard_dir: str, encode_partition) -> list[tuple[str, int]]:
    """Run ``encode_partition(rows_iterator) -> (iterable[bytes], n_rows)``
    on every partition of ``df``, each task writing one shard file.
    Returns ``[(shard_path, n_rows)]`` in partition (= global) order.
    """
    os.makedirs(shard_dir, exist_ok=True)

    def work(idx, it):
        chunks, n = encode_partition(it)
        tmp = os.path.join(shard_dir, f".part-{idx:05d}.tmp")
        with open(tmp, "wb") as f:
            for chunk in chunks:
                f.write(chunk)
        os.replace(tmp, os.path.join(shard_dir, f"part-{idx:05d}"))
        yield (idx, n)

    counts = dict(df.rdd.mapPartitionsWithIndex(work).collect())
    return [
        (os.path.join(shard_dir, f"part-{i:05d}"), counts[i])
        for i in sorted(counts)
    ]


def concat_shards(paths: list[str], out_path: str, header: bytes = b"") -> None:
    """Stream shards into ``out_path`` in order, then delete them."""
    with open(out_path, "wb") as out:
        if header:
            out.write(header)
        for p in paths:
            with open(p, "rb") as f:
                shutil.copyfileobj(f, out)
    for p in paths:
        os.remove(p)
