"""Round-8 guards: posting-list caps on constant content, the hamming
packing-contract validation, the fixed-width \\x01 corruption guard,
pagerank block hygiene, and the real-codec plug-in seams."""

import numpy as np
import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------------------- #
# posting caps: constant content must complete BOUNDED with the drop
# reported, instead of generating m^2 pair rows
# --------------------------------------------------------------------- #
def test_video_star_content_capped(spark):
    from hail_spark.llmdata.multimodal import (
        video_near_dup,
        video_posting_overflow,
    )

    # 10k assets, each = one SHARED "black" frame + one unique frame.
    # Uncapped, the shared frame alone generates ~5*10^7 pair rows;
    # capped it is dropped and the join sees only singleton postings.
    n = 10_000
    black = bytes(64)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids, blobs = [], []
            for i in pdf["id"]:
                uniq = int(i).to_bytes(8, "big") * 8
                ids.append(int(i))
                blobs.append(black + uniq)
            yield pd.DataFrame({"asset_id": ids, "content": blobs})

    assets = (
        spark.range(n)
        .repartition(8)
        .mapInPandas(gen, schema="asset_id bigint, content binary")
    )
    pairs = video_near_dup(
        assets, min_jaccard=0.1, every_n=1, max_postings_per_hash=100
    )
    assert pairs.count() == 0  # completes fast; nothing survives the cap
    report = video_posting_overflow(assets, 100, every_n=1).collect()
    assert len(report) == 1 and report[0]["n_assets"] == n


def test_video_cap_keeps_full_jaccard_denominator(spark):
    from hail_spark.llmdata.multimodal import video_near_dup

    def mk(vals):
        return b"".join(bytes([v]) * 64 for v in vals)

    # assets 1/2 share frames {1,2,3}; frame 9 is shared by ALL assets
    # (over a cap of 3) and must be dropped from pair generation while
    # still counting in each asset's set size (denominator = 4, not 3)
    rows = [
        (1, mk([1, 2, 3, 9])),
        (2, mk([1, 2, 3, 9])),
        (3, mk([4, 5, 6, 9])),
        (4, mk([7, 8, 10, 9])),
    ]
    df = spark.createDataFrame(rows, "asset_id long, content binary")
    out = video_near_dup(df, min_jaccard=0.2, every_n=1, max_postings_per_hash=3)
    got = {(r["id_a"], r["id_b"]): (r["n_shared"], r["jaccard"]) for r in out.collect()}
    # only (1,2) pairs up: 3 shared (frame 9 capped out), denominators 4+4-3
    assert set(got) == {(1, 2)}
    n_shared, jac = got[(1, 2)]
    assert n_shared == 3 and abs(jac - 3 / 5) < 1e-12


def test_hamming_star_content_capped(spark):
    from hail_spark.llmdata.similarity import (
        hamming_band_overflow,
        hamming_near_dup_pairs,
    )

    n = 5_000
    codes = spark.range(n).select(
        F.col("id").alias("vec_id"), F.array(F.lit(0), F.lit(0)).alias("bits")
    )
    pairs = hamming_near_dup_pairs(
        codes, n_bits=64, max_hamming=3, max_postings_per_band=50
    )
    assert pairs.count() == 0
    rep = hamming_band_overflow(
        codes, n_bits=64, max_hamming=3, max_postings_per_band=50
    ).collect()
    assert len(rep) == 4 and all(r["n_codes"] == n for r in rep)  # 4 bands


def test_hamming_cap_preserves_normal_pairs(spark):
    from hail_spark.llmdata.similarity import hamming_near_dup_pairs

    df = spark.createDataFrame(
        [(1, [0, 0]), (2, [0, 0]), (3, [7, 0])], "vec_id long, bits array<long>"
    )
    got = sorted(
        map(
            tuple,
            hamming_near_dup_pairs(
                df, n_bits=64, max_hamming=3, max_postings_per_band=10
            ).collect(),
        )
    )
    assert got == [(1, 2, 0), (1, 3, 3), (2, 3, 3)]


def test_hamming_packing_contract_raises(spark):
    from hail_spark.llmdata.similarity import hamming_near_dup_pairs

    bad = spark.createDataFrame([(7, [0])], "vec_id long, bits array<long>")
    with pytest.raises(Exception, match="packing contract"):
        hamming_near_dup_pairs(bad, n_bits=64, max_hamming=2).collect()


# --------------------------------------------------------------------- #
# fixed-width \x01 corruption guard
# --------------------------------------------------------------------- #
def test_fixed_width_x01_line_raises(spark, tmp_path):
    from hail_spark.io.impex import import_fixed_width

    fields = [("name", 1, 4, "string"), ("qty", 5, 3, "int")]
    good = tmp_path / "good.txt"
    good.write_text("HDRXXXX\nabcd123\nefgh456\n")
    t = import_fixed_width(spark, str(good), fields, skip_header=1)
    assert sorted(map(tuple, t.df.collect())) == [("abcd", 123), ("efgh", 456)]

    # DEFAULT skip_header=1 path is byte-exact (wholetext): any control
    # bytes — lone, trailing, or the full \x01\x02\x03 sequence — parse
    # identically to the plain line reader. Header kept castable so the
    # skip_header=0 comparison frame can evaluate the int field.
    bad = tmp_path / "bad.txt"
    bad.write_bytes(b"hdrx000\nab\x01d123\nefgh456\x01\nef\x01\x02\x03h456\n")
    fields_s = [("a", 1, 4, "string"), ("b", 5, 3, "string")]
    t1 = import_fixed_width(spark, str(bad), fields_s, skip_header=1)
    t0 = import_fixed_width(spark, str(bad), fields_s, skip_header=0)
    got1 = sorted(map(tuple, t1.df.collect()))
    got0 = sorted(map(tuple, t0.df.collect()))
    assert got1 == [t for t in got0 if t != ("hdrx", "000")]
    assert ("ab\x01d", "123") in got1  # the \x01 byte survived verbatim
    assert ("ef\x01\x02", "\x03h4") in got1  # even the full sequence

    # the opt-in splittable fast path: lone control bytes pass through
    # verbatim; an INTERIOR full separator sequence raises loudly
    fast = tmp_path / "fast.txt"
    fast.write_bytes(b"hdrx000\nab\x01d123\nefgh456\n")
    tf = import_fixed_width(
        spark, str(fast), fields, skip_header=1, splittable_header_skip=True
    )
    assert sorted(map(tuple, tf.df.collect())) == [
        ("ab\x01d", 123), ("efgh", 456)
    ]
    seq = tmp_path / "seq.txt"
    seq.write_bytes(b"HDRXXXX\nabcd123\nef\x01\x02\x03h456\n")
    with pytest.raises(Exception, match="x01"):
        import_fixed_width(
            spark, str(seq), fields, skip_header=1, splittable_header_skip=True
        ).df.collect()


# --------------------------------------------------------------------- #
# pagerank block hygiene: exactly one rank-table block set survives
# --------------------------------------------------------------------- #
def test_pagerank_releases_checkpoint_blocks(spark):
    from hail_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i % 50, (i * 7 + 1) % 50) for i in range(300)], "src long, dst long"
    )
    before = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    r = pagerank(edges, n_iter=12, redistribute_dangling=True)
    assert abs(sum(x["rank"] for x in r.collect()) - 1.0) < 1e-9
    after = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    # only the returned (checkpointed) rank table may remain — statics
    # and superseded per-iteration checkpoints are released eagerly
    assert after <= before + 1


# --------------------------------------------------------------------- #
# real-codec plug-in seams (skip when the optional libs are absent;
# present = the SAME Spark pipeline decodes real JPEG/PNG/FLAC bytes)
# --------------------------------------------------------------------- #
def _has(mod):
    try:
        __import__(mod)
        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _has("PIL"), reason="PIL not installed")
def test_image_dhash_takes_real_png_codec(spark):
    from io import BytesIO

    from PIL import Image

    from hail_spark.llmdata.multimodal import encode_bmp, image_dhash

    rng = np.random.default_rng(5)
    arr = rng.integers(0, 255, size=(16, 16, 3), dtype=np.uint8)
    buf = BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    png, bmp = buf.getvalue(), encode_bmp(arr)
    df = spark.createDataFrame(
        [(1, png), (2, bmp)], "asset_id long, content binary"
    )
    hashes = {r["asset_id"]: r["dhash"] for r in image_dhash(df).collect()}
    # PNG is lossless: both containers hold the same pixels, so the
    # full Spark decode->dHash pipeline must agree across codecs
    assert hashes[1] == hashes[2]


@pytest.mark.skipif(not _has("soundfile"), reason="soundfile not installed")
def test_audio_fingerprint_takes_real_flac_codec(spark):
    from io import BytesIO

    import soundfile as sf

    from hail_spark.llmdata.multimodal import audio_fingerprint, encode_wav_pcm16

    rng = np.random.default_rng(9)
    wave = (rng.standard_normal(16000) * 0.2).astype(np.float32)
    # quantize to int16 grid so FLAC (lossless) and PCM16 WAV agree
    wave = np.round(wave * 32767) / 32767.0
    buf = BytesIO()
    sf.write(buf, wave, 16000, format="FLAC")
    df = spark.createDataFrame(
        [(1, buf.getvalue()), (2, encode_wav_pcm16(wave, 16000))],
        "asset_id long, content binary",
    )
    fps = {r["asset_id"]: tuple(r["afp"]) for r in audio_fingerprint(df).collect()}
    assert fps[1] == fps[2]


# --------------------------------------------------------------------- #
# unigram distributed EM: exact parity with the driver-side path (the
# Viterbi-optimality property therefore transfers — both paths segment
# with the same _uni_viterbi over the same integer counts)
# --------------------------------------------------------------------- #
def test_unigram_distributed_em_matches_driver_path(spark):
    from hail_spark.llmdata import tokenizer
    from hail_spark.llmdata.tokenizer import unigram_train

    rows = [(i, "the thing sings a song " * 2) for i in range(15)]
    rows += [(100 + i, "another ring brings things along") for i in range(7)]
    rows += [(200 + i, f"rare{i % 3} words appear here") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    driver = unigram_train(df, vocab_size=48, n_em_iters=3)
    d_rows = sorted(map(tuple, driver.collect()))

    old = tokenizer.SMALL_VOCAB_CUTOFF
    tokenizer.SMALL_VOCAB_CUTOFF = 0  # force the distributed EM
    try:
        dist = unigram_train(df, vocab_size=48, n_em_iters=3, sample_docs=None)
        x_rows = sorted(map(tuple, dist.collect()))
    finally:
        tokenizer.SMALL_VOCAB_CUTOFF = old
    assert d_rows == x_rows  # bit-for-bit: ids, pieces, log probs, counts


def test_unigram_distributed_em_no_word_table_collect(spark):
    """sample_docs=None over the cutoff must TRAIN (the old behavior
    raised) and the trained vocab must encode/decode losslessly."""
    from hail_spark.llmdata import tokenizer
    from hail_spark.llmdata.tokenizer import (
        unigram_decode_ids,
        unigram_encode_ids,
        unigram_train,
    )

    df = spark.createDataFrame(
        [(i, "encode decode parity check words") for i in range(10)],
        "doc_id long, text string",
    )
    old = tokenizer.SMALL_VOCAB_CUTOFF
    tokenizer.SMALL_VOCAB_CUTOFF = 0
    try:
        pieces_df = unigram_train(df, vocab_size=64, sample_docs=None)
        pieces = [
            (r["piece"], r["log_prob"], r["piece_id"])
            for r in pieces_df.collect()
        ]
        enc = unigram_encode_ids(df, pieces)
        dec = unigram_decode_ids(enc, pieces)
        # decode concatenates pieces without word boundaries by design
        bad = dec.filter(
            F.col("decoded") != F.regexp_replace(F.lower("text"), r"\s+", "")
        )
        assert enc.count() == 10 and bad.count() == 0
    finally:
        tokenizer.SMALL_VOCAB_CUTOFF = old


# --------------------------------------------------------------------- #
# query_table key-range manifest: written at Table.write time, a point
# lookup opens only the files whose range covers the probe
# --------------------------------------------------------------------- #
def test_query_table_manifest_prunes_file_opens(spark, tmp_path):
    import json
    import os
    from unittest import mock

    from hail_spark.io import query_table as qt
    from hail_spark.table import Table

    df = (
        spark.range(4000)
        .select(F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
        .repartition(8, "k")
    )
    p = str(tmp_path / "t")
    # keep the key-sorted write multi-file despite AQE's small-data
    # coalescing, so the file-pruning assertion below is meaningful
    old = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", None)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        Table(df, key=("k",)).write(p)
    finally:
        if old is None:
            spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
        else:
            spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", old)
    assert os.path.exists(os.path.join(p, "_key_manifest.json"))
    with open(os.path.join(p, "_key_manifest.json")) as f:
        manifest = json.load(f)
    n_files = len(manifest["files"])
    assert n_files >= 2  # multi-file layout or the pruning claim is vacuous

    real = qt.pq.ParquetFile
    with mock.patch.object(qt.pq, "ParquetFile", side_effect=real) as spy:
        rows = qt.query_table(p, point=1234)
        assert [r["v"] for r in rows] == [3702]
        # key-sorted write = disjoint file ranges: exactly ONE file
        # covers the probe; without the manifest every footer opens
        assert spy.call_count == 1

    # a file the manifest doesn't know about invalidates it (no
    # silent skips), and lookups fall back to footer pruning
    extra_src = sorted(
        f for f in os.listdir(os.path.join(p, "rows")) if f.endswith(".parquet")
    )[0]
    import shutil

    shutil.copy(
        os.path.join(p, "rows", extra_src),
        os.path.join(p, "rows", "part-extra.parquet"),
    )
    with mock.patch.object(qt.pq, "ParquetFile", side_effect=real) as spy2:
        rows2 = qt.query_table(p, point=1234)
        assert [r["v"] for r in rows2] == [3702]
        assert spy2.call_count > 1  # fallback listed+opened everything


def test_hamming_overflow_report_validates_packing(spark):
    """The overflow report shares the packing validation with the pair
    join: a mis-packed input raises in BOTH, never 'clean report +
    crashing dedup'."""
    from hail_spark.llmdata.similarity import hamming_band_overflow

    bad = spark.createDataFrame([(7, [0])], "vec_id long, bits array<long>")
    with pytest.raises(Exception, match="packing contract"):
        hamming_band_overflow(bad, n_bits=64, max_hamming=2).collect()


def test_audio_decode_stays_loud_on_unsupported_wav(spark):
    """A recognized RIFF/WAVE our PCM16 decoder rejects must raise (not
    silently fingerprint a stub) when no optional codec rescues it."""
    import struct

    from hail_spark.llmdata.multimodal import audio_fingerprint

    # 24-bit PCM WAV header (bits=24) with a tiny data chunk
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 48000, 3, 24)
    body = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    body += b"data" + (6).to_bytes(4, "little") + b"\x00" * 6
    wav24 = b"RIFF" + len(body).to_bytes(4, "little") + body
    df = spark.createDataFrame([(1, wav24)], "asset_id long, content binary")
    try:
        import soundfile  # noqa: F401

        has_sf = True
    except ImportError:
        has_sf = False
    if has_sf:
        assert audio_fingerprint(df).count() == 1  # codec rescued it
    else:
        with pytest.raises(Exception, match="16-bit PCM"):
            audio_fingerprint(df).collect()
