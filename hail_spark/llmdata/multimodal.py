"""Multimodal columns — image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched pandas UDFs.

This is a training-data-pipeline extension beyond the reference's
surface (the reference has no multimodal layer). Design:

* every asset is a row ``{asset_id, modality, content: binary,
  meta: struct<...>}``; content is never interpreted by Catalyst, so
  predicate pushdown / column pruning on metadata skips decoding
  entirely (a metadata-only query never deserializes bytes);
* decode / resize / frame-sample run inside ``mapInPandas`` — one
  Arrow batch of binaries in, one batch of features out; the batch
  schema and partitioning are the real, tested contract;
* the actual codec calls (PIL/librosa/ffmpeg) are NOT available in
  this container and are STUBBED behind ``_decode_image_stub`` etc. —
  deterministic fakes derived from the bytes, clearly marked. Swap the
  stub body for the real library call in production; nothing else
  changes.

Scale notes: content columns dominate bytes, so the module keeps them
in their own parquet files (``write_assets``/``read_assets``) with
``maxPartitionBytes``-friendly row groups; feature extraction is
map-only (no shuffle); joining features back to a metadata table is a
broadcast join when features are small.
"""

from __future__ import annotations

import hashlib
import struct as _struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

IMAGE_SCHEMA = (
    "asset_id bigint, width int, height int, channels int, format string"
)
AUDIO_SCHEMA = "asset_id bigint, sample_rate int, n_samples bigint, format string"


# ---------------------------------------------------------------------- #
# stubbed codecs — deterministic fakes; replace bodies with PIL/librosa
# ---------------------------------------------------------------------- #
def _decode_image_stub(content: bytes) -> np.ndarray:
    """STUB: stands in for ``PIL.Image.open(BytesIO(content))``.
    Deterministic 8×8×3 uint8 array derived from a blake2 hash of the
    bytes, so tests are stable and the Arrow plumbing is real.
    Raises on empty content like a real decoder would."""
    if not content:
        raise ValueError("cannot decode empty image content")
    h = hashlib.blake2b(content, digest_size=24).digest()
    base = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
    img = np.tile(base, 8)[: 8 * 8 * 3].reshape(8, 8, 3)
    return img.astype(np.uint8)


def _decode_audio_stub(content: bytes, sample_rate: int = 16000) -> np.ndarray:
    """STUB for ``librosa.load`` — deterministic float32 waveform whose
    length is ``len(content)`` samples (bounded at 4096)."""
    if not content:
        raise ValueError("cannot decode empty audio content")
    n = min(len(content), 4096)
    seed = int.from_bytes(hashlib.blake2b(content, digest_size=8).digest(), "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(n).astype(np.float32)


# ---------------------------------------------------------------------- #
# asset table construction / storage
# ---------------------------------------------------------------------- #
def make_asset_table(
    spark: SparkSession, rows: list[dict], modality: str
) -> DataFrame:
    """rows: [{asset_id, content(bytes), **meta}] → typed asset frame."""
    return spark.createDataFrame(
        [
            {
                "asset_id": r["asset_id"],
                "modality": modality,
                "content": r["content"],
                "meta_source": r.get("source", ""),
            }
            for r in rows
        ],
        "asset_id bigint, modality string, content binary, meta_source string",
    )


def write_assets(df: DataFrame, path: str) -> None:
    """Content-bearing parquet, zstd, sized row groups (content column
    dominates; 128 MB parquet block keeps row-group counts sane)."""
    df.write.mode("overwrite").option("compression", "zstd").parquet(path)


def read_assets(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


# ---------------------------------------------------------------------- #
# feature extraction (mapInPandas, map-only)
# ---------------------------------------------------------------------- #
def image_metadata(df: DataFrame) -> DataFrame:
    """Decode → (width, height, channels). Stubbed decode, real batch
    shape: one Arrow batch in, one out, content column pruned after."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                try:
                    arr = _decode_image_stub(bytes(content))
                    out.append(
                        {
                            "asset_id": aid,
                            "width": arr.shape[1],
                            "height": arr.shape[0],
                            "channels": arr.shape[2],
                            "format": "stub",
                        }
                    )
                except ValueError:
                    out.append(
                        {
                            "asset_id": aid,
                            "width": None,
                            "height": None,
                            "channels": None,
                            "format": None,
                        }
                    )
            yield pd.DataFrame(out)

    return df.select("asset_id", "content").mapInPandas(run, schema=IMAGE_SCHEMA)


def image_embed(df: DataFrame, dim: int = 16) -> DataFrame:
    """Decode + mean-pool to a ``dim``-float embedding column —
    the plumbing pattern for a real vision encoder."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                arr = _decode_image_stub(bytes(content)).astype(np.float32) / 255.0
                flat = arr.mean(axis=2).ravel()
                vec = np.resize(flat, dim)
                ids.append(aid)
                vecs.append(vec.tolist())
            yield pd.DataFrame({"asset_id": ids, "embedding": vecs})

    return df.select("asset_id", "content").mapInPandas(
        run, schema="asset_id bigint, embedding array<float>"
    )


def image_resize(df: DataFrame, width: int, height: int) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode (raw bytes) — the
    resize-for-training plumbing. The decode is stubbed (8×8×3 fake)
    but the resize math and the binary-out Arrow batch shape are real:
    swap ``_decode_image_stub`` for PIL and the operator is production
    code. Output: (asset_id, content binary, width, height)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                try:
                    arr = _decode_image_stub(bytes(content))
                except ValueError:
                    out.append(
                        {"asset_id": aid, "content": None, "width": None, "height": None}
                    )
                    continue
                ys = (np.arange(height) * arr.shape[0] // height).clip(0, arr.shape[0] - 1)
                xs = (np.arange(width) * arr.shape[1] // width).clip(0, arr.shape[1] - 1)
                resized = arr[ys][:, xs]
                out.append(
                    {
                        "asset_id": aid,
                        "content": resized.tobytes(),
                        "width": width,
                        "height": height,
                    }
                )
            yield pd.DataFrame(out)

    return df.select("asset_id", "content").mapInPandas(
        run, schema="asset_id bigint, content binary, width int, height int"
    )


def audio_features(df: DataFrame, frame: int = 512) -> DataFrame:
    """Waveform → per-asset RMS energy + zero-crossing rate (real DSP on
    the stub waveform; swap decode for librosa and nothing changes)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                w = _decode_audio_stub(bytes(content))
                rms = float(np.sqrt(np.mean(w**2)))
                zcr = float(np.mean(np.abs(np.diff(np.signbit(w).astype(np.int8)))))
                out.append(
                    {
                        "asset_id": aid,
                        "n_samples": len(w),
                        "rms": rms,
                        "zero_crossing_rate": zcr,
                    }
                )
            yield pd.DataFrame(out)

    return df.select("asset_id", "content").mapInPandas(
        run, schema="asset_id bigint, n_samples bigint, rms double, zero_crossing_rate double"
    )


def video_frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling plumbing: treat content as a concatenation of
    fixed-size fake frames (64 B each — stands in for demuxed packets),
    emit one row per sampled frame. Real ffmpeg demux would replace
    ``_iter_frames`` only."""

    def _iter_frames(content: bytes):
        for off in range(0, len(content) - 63, 64):
            yield off // 64, content[off : off + 64]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                for idx, frame_bytes in _iter_frames(bytes(content)):
                    if idx % every_n == 0:
                        out.append(
                            {
                                "asset_id": aid,
                                "frame_index": idx,
                                "frame_hash": hashlib.blake2b(
                                    frame_bytes, digest_size=8
                                ).hexdigest(),
                            }
                        )
            yield pd.DataFrame(out, columns=["asset_id", "frame_index", "frame_hash"])

    return df.select("asset_id", "content").mapInPandas(
        run, schema="asset_id bigint, frame_index int, frame_hash string"
    )
