"""BGEN v1.2 import (ref hl.import_bgen impex.py:1100;
hail/hail/src/is/hail/io/bgen/LoadBgen.scala, StagedBGENReader.scala —
re-derived here from the published BGEN v1.2 specification, not from the
reference code).

Two phases, mirroring the reference's .idx2 design:

1. **Index scan** (driver, once per file): a sequential pass over the
   variant identifying blocks records (file_offset, data_size) per
   variant — identifying data is tiny; the scan never inflates genotype
   blocks.  The index is cached next to the source as
   ``<file>.offsets.json`` so re-imports are metadata-only (that file
   IS our .idx2).
2. **Distributed decode**: the offset list parallelizes into
   ``defaultParallelism`` partitions; each task seeks to its offsets and
   inflates/unpacks only its own genotype blocks (zlib layout-2, 8/16/…
   bit packed probabilities).  Per-task work is pure byte slicing +
   numpy, Arrow-batched back to the JVM.  At cluster scale the open()
   becomes an HDFS/S3 ranged read — the access pattern (seek + bounded
   read) is already the scalable one; nothing is broadcast and no task
   reads another task's bytes.

Limitations: layout 2 only (the v1.2 default), zlib or uncompressed
genotype blocks, diploid samples for GT hard calls (GP is emitted for
any ploidy).  Samples must come from the file's sample block or a .sample
file loaded separately.
"""

from __future__ import annotations

import json
import os
import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..matrixtable import ENTRIES, MatrixTable


def _read_header(fh):
    offset = struct.unpack("<I", fh.read(4))[0]
    h_len, n_var, n_samp = struct.unpack("<III", fh.read(12))
    magic = fh.read(4)
    if magic not in (b"bgen", b"\x00\x00\x00\x00"):
        raise ValueError("not a BGEN file (bad magic)")
    fh.read(h_len - 20)  # free data area
    flags = struct.unpack("<I", fh.read(4))[0]
    compression = flags & 0x3
    layout = (flags >> 2) & 0xF
    has_samples = (flags >> 31) & 0x1
    if layout != 2:
        raise NotImplementedError(f"BGEN layout {layout}; only layout 2 supported")
    if compression not in (0, 1):
        raise NotImplementedError("only zlib/uncompressed BGEN supported")
    samples = []
    if has_samples:
        struct.unpack("<II", fh.read(8))  # block length, N
        for _ in range(n_samp):
            (slen,) = struct.unpack("<H", fh.read(2))
            samples.append(fh.read(slen).decode())
    return offset + 4, n_var, n_samp, compression, samples


def _scan_offsets(path: str) -> dict:
    """Phase 1: per-variant (offset, size) of the genotype block plus
    identifying fields; cached as <path>.offsets.json."""
    cache = path + ".offsets.json"
    if os.path.exists(cache) and os.path.getmtime(cache) >= os.path.getmtime(path):
        with open(cache) as f:
            return json.load(f)
    out = {"variants": []}
    with open(path, "rb") as fh:
        data_start, n_var, n_samp, compression, samples = _read_header(fh)
        out["n_samples"] = n_samp
        out["compression"] = compression
        out["samples"] = samples
        fh.seek(data_start)
        for _ in range(n_var):
            (lid,) = struct.unpack("<H", fh.read(2))
            fh.read(lid)
            (lrs,) = struct.unpack("<H", fh.read(2))
            rsid = fh.read(lrs).decode()
            (lchr,) = struct.unpack("<H", fh.read(2))
            chrom = fh.read(lchr).decode()
            (pos,) = struct.unpack("<I", fh.read(4))
            (k,) = struct.unpack("<H", fh.read(2))
            alleles = []
            for _ in range(k):
                (la,) = struct.unpack("<I", fh.read(4))
                alleles.append(fh.read(la).decode())
            (csize,) = struct.unpack("<I", fh.read(4))
            gt_off = fh.tell()
            out["variants"].append(
                {
                    "rsid": rsid, "contig": chrom, "position": pos,
                    "alleles": alleles, "offset": gt_off, "size": csize,
                }
            )
            fh.seek(gt_off + csize)
    try:
        with open(cache, "w") as f:
            json.dump(out, f)
    except OSError:
        pass  # read-only source dir: index works, just not cached
    return out


def _decode_block(raw: bytes, compression: int) -> tuple:
    """Inflate + unpack one layout-2 genotype block →
    (GP ndarray n×n_genotypes or None, ploidy ndarray, missing ndarray)."""
    if compression == 1:
        (_dlen,) = struct.unpack("<I", raw[:4])
        buf = zlib.decompress(raw[4:])
    else:
        buf = raw
    n, k = struct.unpack("<IH", buf[:6])
    min_pl, max_pl = buf[6], buf[7]
    pl_bytes = np.frombuffer(buf[8 : 8 + n], dtype=np.uint8)
    missing = (pl_bytes & 0x80) != 0
    ploidy = (pl_bytes & 0x3F).astype(np.int64)
    phased = buf[8 + n]
    bits = buf[9 + n]
    if phased != 0:
        raise NotImplementedError("phased BGEN probabilities not supported")
    if bits % 8 != 0:
        raise NotImplementedError("non-byte-aligned BGEN bit depths not supported")
    nbytes = bits // 8
    body = np.frombuffer(buf[10 + n :], dtype=np.uint8)
    denom = float((1 << bits) - 1)
    if min_pl == max_pl == 2:
        # constant-ploidy fast path: vectorized reshape; g = #genotypes
        g = (k * (k + 1)) // 2
        stored = g - 1
        vals = body[: n * stored * nbytes].reshape(n, stored, nbytes)
        acc = np.zeros((n, stored), dtype=np.float64)
        for b in range(nbytes):
            acc += vals[:, :, b].astype(np.float64) * (256.0**b)
        probs = acc / denom
        gp = np.concatenate(
            [probs, (1.0 - probs.sum(axis=1, keepdims=True))], axis=1
        )
        gp[missing] = np.nan
        return gp, ploidy, missing
    raise NotImplementedError("mixed/non-diploid ploidy decode not supported")


def import_bgen(
    spark: SparkSession,
    path: str,
    sample_ids: list | None = None,
    n_partitions: int | None = None,
) -> MatrixTable:
    """BGEN v1.2 → MatrixTable with rows (contig, position, rsid,
    alleles) and entries struct(GT, GP) (ref impex.py:1100).

    GT is the hard call argmax(GP) encoded 0/1/2 (diploid biallelic
    n_alt convention, matching our PLINK/VCF readers); missing samples →
    null entry.
    """
    idx = _scan_offsets(path)
    n_samp = idx["n_samples"]
    compression = idx["compression"]
    samples = sample_ids or idx["samples"] or [f"S{i}" for i in range(n_samp)]
    if len(samples) != n_samp:
        raise ValueError("sample id count does not match BGEN header")
    sc = spark.sparkContext
    nparts = n_partitions or sc.defaultParallelism
    meta = spark.createDataFrame(
        [
            {
                "rsid": v["rsid"], "contig": v["contig"],
                "position": v["position"], "alleles": v["alleles"],
                "offset": v["offset"], "size": v["size"],
            }
            for v in idx["variants"]
        ],
        "rsid string, contig string, position int, alleles array<string>, "
        "offset bigint, size bigint",
    ).repartition(min(nparts, max(1, len(idx["variants"]))))

    out_schema = (
        "contig string, position int, rsid string, alleles array<string>, "
        f"{ENTRIES} array<struct<GT: int, GP: array<double>>>"
    )

    def decode(batches):
        fh = open(path, "rb")
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                fh.seek(int(r["offset"]))
                raw = fh.read(int(r["size"]))
                gp, _, missing = _decode_block(raw, compression)
                gt = np.full(gp.shape[0], -1, dtype=np.int64)
                ok = ~missing
                if ok.any():
                    gt[ok] = np.nanargmax(gp[ok], axis=1)
                ents = [
                    None
                    if missing[j]
                    else {"GT": int(gt[j]), "GP": [float(x) for x in gp[j]]}
                    for j in range(gp.shape[0])
                ]
                rows.append(
                    {
                        "contig": r["contig"], "position": int(r["position"]),
                        "rsid": r["rsid"], "alleles": list(r["alleles"]),
                        ENTRIES: ents,
                    }
                )
            yield pd.DataFrame(rows)
        fh.close()

    df = meta.mapInPandas(decode, schema=out_schema)
    cols = [{"s": s} for s in samples]
    return MatrixTable(df, ("contig", "position"), cols, ("s",))


def export_bgen_test_file(
    path: str,
    variants: list,
    gps: np.ndarray,
    samples: list,
    bits: int = 8,
    compress: bool = True,
) -> None:
    """Write a minimal layout-2 BGEN (test fixture / MatrixBGENWriter
    counterpart, ref matrix_writer.py:121).  ``gps``: (n_variants,
    n_samples, 3) probabilities; NaN rows → missing samples."""
    n_samp = len(samples)
    denom = (1 << bits) - 1
    with open(path, "wb") as fh:
        sample_block = struct.pack("<II", 8 + sum(2 + len(s) for s in samples), n_samp)
        for s in samples:
            sb = s.encode()
            sample_block += struct.pack("<H", len(sb)) + sb
        header = struct.pack("<III", 20, len(variants), n_samp) + b"bgen"
        flags = (1 if compress else 0) | (2 << 2) | (1 << 31)
        header += struct.pack("<I", flags)
        fh.write(struct.pack("<I", 20 + len(sample_block)))
        fh.write(header)
        fh.write(sample_block)
        for vi, (rsid, chrom, pos, alleles) in enumerate(variants):
            rb, cb = rsid.encode(), chrom.encode()
            fh.write(struct.pack("<H", 0))  # empty variant id
            fh.write(struct.pack("<H", len(rb)) + rb)
            fh.write(struct.pack("<H", len(cb)) + cb)
            fh.write(struct.pack("<I", pos))
            fh.write(struct.pack("<H", len(alleles)))
            for a in alleles:
                ab = a.encode()
                fh.write(struct.pack("<I", len(ab)) + ab)
            body = struct.pack("<IH", n_samp, len(alleles)) + bytes([2, 2])
            pl = bytearray()
            for j in range(n_samp):
                pl.append(0x82 if np.isnan(gps[vi, j, 0]) else 0x02)
            body += bytes(pl) + bytes([0, bits])
            probs = bytearray()
            for j in range(n_samp):
                for g in range(2):  # stored = n_genotypes - 1
                    p = gps[vi, j, g]
                    v = 0 if np.isnan(p) else int(round(p * denom))
                    probs += int(v).to_bytes(bits // 8, "little")
            body += bytes(probs)
            if compress:
                comp = zlib.compress(body)
                fh.write(struct.pack("<I", len(comp) + 4))
                fh.write(struct.pack("<I", len(body)))
                fh.write(comp)
            else:
                fh.write(struct.pack("<I", len(body)))
                fh.write(body)
