"""Round-7 image near-dup: dHash codec conformance + banded Hamming
pair join."""

import numpy as np
import pytest
from pyspark.sql import functions as F  # noqa: F401

from hail_spark.llmdata.multimodal import (
    encode_bmp,
    image_dhash,
    image_near_dup,
    make_asset_table,
)
from hail_spark.llmdata.similarity import hamming_near_dup_pairs


def _gradient_bmp(cols):
    """8-row image whose identical rows carry the given column
    brightnesses."""
    arr = np.tile(np.array(cols, dtype=np.uint8)[None, :, None], (8, 1, 3))
    return encode_bmp(arr)


def _assets(spark, images):
    return make_asset_table(
        spark,
        [{"asset_id": i, "content": b} for i, b in enumerate(images)],
        "image",
    )


def test_image_dhash_known_bits(spark):
    # strictly increasing columns -> every comparison true -> all 64
    # bits set -> both 32-bit words are 0xFFFFFFFF
    up = _gradient_bmp([10 * j for j in range(9)])
    down = _gradient_bmp([10 * (8 - j) for j in range(9)])
    out = {
        r["asset_id"]: r["dhash"]
        for r in image_dhash(_assets(spark, [up, down])).collect()
    }
    assert out[0] == [0xFFFFFFFF, 0xFFFFFFFF]
    assert out[1] == [0, 0]


def test_image_dhash_brightness_invariant(spark):
    base = [30 + (j * 13) % 90 for j in range(9)]
    brighter = [v + 60 for v in base]
    out = {
        r["asset_id"]: r["dhash"]
        for r in image_dhash(
            _assets(spark, [_gradient_bmp(base), _gradient_bmp(brighter)])
        ).collect()
    }
    assert out[0] == out[1]


def test_image_near_dup_pairs(spark):
    base = [30, 80, 50, 120, 40, 160, 70, 90, 200]
    dup = list(base)  # identical -> hamming 0
    near = list(base)
    near[8] = 10  # flips only the last comparison in all 8 rows -> 8
    far = [200 - v for v in base]
    imgs = [_gradient_bmp(c) for c in (base, dup, near, far)]
    out = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_near_dup(_assets(spark, imgs), max_hamming=8).collect()
    }
    assert out[(0, 1)] == 0
    assert out[(0, 2)] == 8
    assert out[(1, 2)] == 8
    assert (0, 3) not in out and (1, 3) not in out


def test_hamming_near_dup_pairs_exact_vs_bruteforce(spark):
    rng = np.random.default_rng(7)
    codes = rng.integers(0, 1 << 32, size=(40, 2)).tolist()
    # plant near pairs
    codes[1] = list(codes[0])
    codes[2] = [codes[0][0] ^ 0b101, codes[0][1]]  # distance 2
    df = spark.createDataFrame(
        [(i, [int(w) for w in c]) for i, c in enumerate(codes)],
        "vec_id long, bits array<long>",
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_near_dup_pairs(
            df, n_bits=64, max_hamming=4
        ).collect()
    }
    expect = {}
    for i in range(40):
        for j in range(i + 1, 40):
            d = bin(codes[i][0] ^ codes[j][0]).count("1") + bin(
                codes[i][1] ^ codes[j][1]
            ).count("1")
            if d <= 4:
                expect[(i, j)] = d
    assert got == expect
    assert got[(0, 1)] == 0 and got[(0, 2)] == 2


def test_hamming_near_dup_rejects_negative(spark):
    df = spark.createDataFrame([(1, [0, 0])], "vec_id long, bits array<long>")
    with pytest.raises(ValueError):
        hamming_near_dup_pairs(df, max_hamming=-1)


def test_audio_fingerprint_gain_invariant(spark):
    from hail_spark.llmdata.multimodal import audio_fingerprint, encode_wav_pcm16

    amps = [(100 + (w * 37) % 900) for w in range(65)]
    base = np.repeat(np.array(amps, dtype=np.int16), 16)
    louder = np.repeat(np.array([a * 8 for a in amps], dtype=np.int16), 16)
    df = _assets(
        spark, [encode_wav_pcm16(base), encode_wav_pcm16(louder)]
    )
    out = {r["asset_id"]: r["afp"] for r in audio_fingerprint(df).collect()}
    assert out[0] == out[1]


def test_audio_near_dup_pairs(spark):
    from hail_spark.llmdata.multimodal import audio_near_dup, encode_wav_pcm16

    rng = np.random.default_rng(3)
    def wav(amps):
        return encode_wav_pcm16(np.repeat(np.array(amps, dtype=np.int16), 16))
    a = [int(v) for v in rng.integers(100, 5000, size=65)]
    dup = list(a)
    near = list(a)
    near[64] = 30000 if a[64] < a[63] else 10  # flip exactly bit 63
    far = [int(v) for v in rng.integers(100, 5000, size=65)]
    df = _assets(spark, [wav(a), wav(dup), wav(near), wav(far)])
    out = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in audio_near_dup(df, max_hamming=2).collect()
    }
    assert out[(0, 1)] == 0
    assert out[(0, 2)] == 1 and out[(1, 2)] == 1
    assert (0, 3) not in out


def test_hamming_pairs_with_binarize_60bit_words(spark):
    """Lock the word_bits contract: near-dup pairs over
    binarize_embeddings' 60-bit words must be found exactly (the
    32-bit default would silently mis-address band bits)."""
    from hail_spark.llmdata.similarity import (
        binarize_embeddings,
        hamming_near_dup_pairs,
    )

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((30, 64)).astype(float)
    vecs[1] = vecs[0]
    vecs[2] = vecs[0].copy()
    vecs[2][40] = -vecs[2][40]  # flip exactly one sign bit (bit 40)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    coded = binarize_embeddings(df, vec_col="embedding", word_bits=60)
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_near_dup_pairs(
            coded, bits_col="bits", n_bits=64, max_hamming=2, word_bits=60
        ).collect()
    }
    # brute force over the true sign bits
    signs = (vecs >= 0).astype(int)
    expect = {}
    for i in range(30):
        for j in range(i + 1, 30):
            d = int((signs[i] != signs[j]).sum())
            if d <= 2:
                expect[(i, j)] = d
    assert got == expect
    assert got[(0, 1)] == 0 and got[(0, 2)] == 1


def test_video_near_dup_frame_jaccard(spark):
    from hail_spark.llmdata.multimodal import video_near_dup

    import os
    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, 64, dtype=np.uint8).tobytes() for _ in range(40)]
    full = b"".join(frames)                       # 40 frames
    trimmed = b"".join(frames[:30])               # 30/40 shared prefix
    other = b"".join(
        rng.integers(0, 256, 64, dtype=np.uint8).tobytes() for _ in range(40)
    )
    df = _assets(spark, [full, trimmed, other])
    out = {
        (r["id_a"], r["id_b"]): r
        for r in video_near_dup(df, min_jaccard=0.3, every_n=1).collect()
    }
    assert (0, 1) in out
    assert out[(0, 1)]["n_shared"] == 30
    assert out[(0, 1)]["jaccard"] == pytest.approx(30 / 40)
    assert (0, 2) not in out and (1, 2) not in out


def test_video_near_dup_rejects_bad_threshold(spark):
    from hail_spark.llmdata.multimodal import video_near_dup

    df = _assets(spark, [b"x" * 64])
    with pytest.raises(ValueError):
        video_near_dup(df, min_jaccard=0.0)
