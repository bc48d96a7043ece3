"""PLINK .bed/.bim/.fam import — ``hl.import_plink``.

Parity target: reference impex.py:2505 backed by
hail/hail/src/is/hail/io/plink/LoadPlink.scala (600 LoC).

Format: .bed = 3 magic bytes (0x6c 0x1b 0x01 = SNP-major) then one
record of ceil(n_samples/4) bytes per variant; 2-bit codes per sample
(LSB-first within each byte): 00 = hom A1, 01 = missing, 10 = het,
11 = hom A2. With A2 as reference (the reference's default), the alt
(A1) dosage is 00→2, 10→1, 11→0.

Spark-first split strategy: the .bed record size is fixed, so variant
index ranges ARE byte ranges. We parallelize over variant-index
batches (``spark.range → mapInPandas``); each Arrow batch seeks into
the file and decodes its slice with a 256×4 numpy lookup table (one
table lookup per packed byte — no per-bit Python). This is exactly the
reference's partitioning scheme (LoadPlink computes per-partition
variant ranges) expressed in Spark terms. Local/NFS paths; for object
stores swap ``open`` for a pyarrow filesystem handle.
"""

from __future__ import annotations

import math
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..matrixtable import ENTRIES, MatrixTable

_BED_MAGIC = b"\x6c\x1b\x01"

# byte → 4 samples' alt-allele dosage (A1 count); -1 marks missing
_LUT = np.full((256, 4), 0, dtype=np.int8)
for byte in range(256):
    for s in range(4):
        code = (byte >> (2 * s)) & 3
        _LUT[byte, s] = {0: 2, 1: -1, 2: 1, 3: 0}[code]


def import_plink(
    spark: SparkSession,
    bed: str,
    bim: str | None = None,
    fam: str | None = None,
    n_partitions: int | None = None,
) -> MatrixTable:
    base = bed[:-4] if bed.endswith(".bed") else bed
    bed = base + ".bed"
    bim = bim or base + ".bim"
    fam = fam or base + ".fam"

    samples = []
    with open(fam) as f:
        for line in f:
            parts = line.split()
            if parts:
                samples.append(parts[1])
    n_samples = len(samples)
    bpv = math.ceil(n_samples / 4)  # bytes per variant record

    variants = []
    with open(bim) as f:
        for line in f:
            p = line.split()
            if p:
                # chrom, id, cm, pos, A1(alt), A2(ref)
                variants.append((p[0], p[1], int(p[3]), p[5], p[4]))
    n_variants = len(variants)

    size = os.path.getsize(bed)
    expected = 3 + n_variants * bpv
    with open(bed, "rb") as f:
        if f.read(3) != _BED_MAGIC:
            raise ValueError(f"{bed}: not a SNP-major PLINK .bed file")
    if size != expected:
        raise ValueError(f"{bed}: size {size} != expected {expected} "
                         f"({n_variants} variants × {bpv} B + 3)")

    nparts = n_partitions or min(
        spark.sparkContext.defaultParallelism, max(1, n_variants // 1024) or 1
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        with open(bed, "rb") as fh:
            for pdf in batches:
                idxs = pdf["id"].to_numpy()
                if len(idxs) == 0:
                    continue
                lo, hi = int(idxs.min()), int(idxs.max())
                fh.seek(3 + lo * bpv)
                buf = np.frombuffer(fh.read((hi - lo + 1) * bpv), dtype=np.uint8)
                buf = buf.reshape(hi - lo + 1, bpv)
                rows = []
                for vi in idxs:
                    codes = _LUT[buf[vi - lo]].reshape(-1)[:n_samples]
                    rows.append(
                        {
                            "__vidx": int(vi),
                            "gts": [None if c < 0 else int(c) for c in codes],
                        }
                    )
                yield pd.DataFrame(rows)

    gt_df = spark.range(n_variants, numPartitions=nparts).mapInPandas(
        decode, schema="__vidx bigint, gts array<int>"
    )
    meta_df = spark.createDataFrame(
        [
            {
                "__vidx": i,
                "locus": {"contig": c, "position": pos},
                "alleles": [ref, alt],
                "rsid": rid,
            }
            for i, (c, rid, pos, ref, alt) in enumerate(variants)
        ],
        "__vidx bigint, locus struct<contig:string, position:int>, "
        "alleles array<string>, rsid string",
    )
    rows = (
        gt_df.join(meta_df, on="__vidx")
        .select(
            "locus",
            "alleles",
            "rsid",
            F.transform(
                "gts", lambda g: F.when(g.isNotNull(), F.struct(g.alias("GT")))
            ).alias(ENTRIES),
        )
    )
    cols = [{"s": s} for s in samples]
    return MatrixTable(rows, ("locus", "alleles"), cols, ("s",))


def export_plink(mt: MatrixTable, path: str) -> None:
    """Write .bed/.bim/.fam (ref io/plink/ExportPlink.scala).

    Scale shape matches the reference's per-partition writers: rows are
    globally ordered by locus, each task encodes its partition's 2-bit
    records with vectorized numpy bit-packing and writes one .bed shard
    and one .bim shard; the driver only concatenates shards in partition
    order (see io/shard.py). Nothing row-at-a-time crosses the driver.
    """
    from .shard import concat_shards

    samples = [c["s"] for c in mt._cols]
    n = len(samples)
    bpv = math.ceil(n / 4)
    with open(path + ".fam", "w") as f:
        for s in samples:
            f.write(f"0 {s} 0 0 0 -9\n")
    rows = mt._df.select(
        "locus", "alleles", F.col(ENTRIES).getField("GT").alias("gts")
    ).orderBy(F.col("locus")["contig"], F.col("locus")["position"])
    # gt 0/1/2 -> bed code 3/2/0; missing -> 1
    code_lut = np.array([3, 2, 0], dtype=np.uint8)

    shard_dir = path + ".shards"
    os.makedirs(shard_dir, exist_ok=True)

    def work(idx, it):
        bed_chunks, bim_chunks = [], []
        for r in it:
            loc, al = r["locus"], r["alleles"]
            bim_chunks.append(
                f"{loc['contig']} {loc['contig']}:{loc['position']} 0 "
                f"{loc['position']} {al[1] if len(al) > 1 else '0'} {al[0]}\n".encode()
            )
            g = np.fromiter(
                (-1 if x is None else x for x in r["gts"]), dtype=np.int8, count=n
            )
            codes = np.where(g < 0, np.uint8(1), code_lut[np.clip(g, 0, 2)])
            padded = np.zeros(bpv * 4, dtype=np.uint8)
            padded[:n] = codes
            q = padded.reshape(bpv, 4)
            rec = q[:, 0] | (q[:, 1] << 2) | (q[:, 2] << 4) | (q[:, 3] << 6)
            bed_chunks.append(rec.astype(np.uint8).tobytes())
        for ext, chunks in (("bed", bed_chunks), ("bim", bim_chunks)):
            tmp = os.path.join(shard_dir, f".part-{idx:05d}.{ext}.tmp")
            with open(tmp, "wb") as f:
                f.write(b"".join(chunks))
            os.replace(tmp, os.path.join(shard_dir, f"part-{idx:05d}.{ext}"))
        yield idx

    idxs = sorted(rows.rdd.mapPartitionsWithIndex(work).collect())
    concat_shards(
        [os.path.join(shard_dir, f"part-{i:05d}.bed") for i in idxs],
        path + ".bed",
        header=_BED_MAGIC,
    )
    concat_shards(
        [os.path.join(shard_dir, f"part-{i:05d}.bim") for i in idxs], path + ".bim"
    )
    os.rmdir(shard_dir)
