"""Distribution samplers (ref test strategy: moment/shape checks over
hash-seeded deterministic draws; determinism across re-evaluation)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hail_spark.expr import functions as hf

N = 20000


@pytest.fixture(scope="module")
def uids(spark):
    return spark.range(N).withColumnRenamed("id", "uid")


def _draws(df, col):
    return np.array([r["x"] for r in df.select(col.alias("x")).collect()])


def test_rand_pois_scalar(uids):
    x = _draws(uids, hf.rand_pois(F.col("uid"), 4.0, seed=1))
    assert abs(x.mean() - 4.0) < 0.1
    assert abs(x.var() - 4.0) < 0.3
    assert x.min() >= 0 and x.dtype.kind in "iu" or np.allclose(x, x.astype(int))


def test_rand_pois_column_lambda(uids):
    df = uids.withColumn("lam", (F.col("uid") % 3 + 1).cast("double"))
    x = np.array(
        [
            (r["lam"], r["x"])
            for r in df.select(
                "lam", hf.rand_pois(F.col("uid"), F.col("lam"), seed=2).alias("x")
            ).collect()
        ]
    )
    for lam in (1.0, 2.0, 3.0):
        sel = x[x[:, 0] == lam, 1]
        assert abs(sel.mean() - lam) < 0.15


def test_rand_gamma_moments(uids):
    x = _draws(uids, hf.rand_gamma(F.col("uid"), 3.0, 2.0, seed=3))
    assert abs(x.mean() - 6.0) < 0.15  # mean = shape*scale
    assert abs(x.var() - 12.0) < 1.0  # var = shape*scale^2
    assert (x > 0).all()


def test_rand_gamma_small_shape(uids):
    x = _draws(uids, hf.rand_gamma(F.col("uid"), 0.5, 1.0, seed=4))
    assert abs(x.mean() - 0.5) < 0.05
    assert (x > 0).all()


def test_rand_beta_moments(uids):
    a, b = 2.0, 5.0
    x = _draws(uids, hf.rand_beta(F.col("uid"), a, b, seed=5))
    assert ((x > 0) & (x < 1)).all()
    assert abs(x.mean() - a / (a + b)) < 0.01
    want_var = a * b / ((a + b) ** 2 * (a + b + 1))
    assert abs(x.var() - want_var) < 0.005


def test_rand_cat(uids):
    probs = [0.2, 0.5, 0.3]
    x = _draws(uids, hf.rand_cat(F.col("uid"), probs, seed=6))
    counts = np.bincount(x.astype(int), minlength=3) / N
    np.testing.assert_allclose(counts, probs, atol=0.02)


def test_rand_dirichlet(uids):
    alphas = [1.0, 2.0, 3.0]
    rows = (
        uids.select(hf.rand_dirichlet(F.col("uid"), alphas, seed=7).alias("x"))
        .collect()
    )
    arr = np.array([r["x"] for r in rows])
    np.testing.assert_allclose(arr.sum(axis=1), 1.0, atol=1e-9)
    np.testing.assert_allclose(arr.mean(axis=0), np.array(alphas) / 6.0, atol=0.02)


def test_rand_hyper(uids):
    # 7 good, 3 bad, draw 5 → mean = 5*7/10 = 3.5
    small = uids.limit(4000)
    x = _draws(small, hf.rand_hyper(F.col("uid"), 7, 3, 5, seed=8))
    assert abs(x.mean() - 3.5) < 0.1
    assert x.min() >= 2 and x.max() <= 5  # support [max(0,5-3), min(7,5)]


def test_determinism(uids):
    a1 = _draws(uids.limit(500), hf.rand_gamma(F.col("uid"), 2.0, 1.0, seed=9))
    a2 = _draws(uids.limit(500), hf.rand_gamma(F.col("uid"), 2.0, 1.0, seed=9))
    b = _draws(uids.limit(500), hf.rand_gamma(F.col("uid"), 2.0, 1.0, seed=10))
    np.testing.assert_array_equal(a1, a2)
    assert not np.array_equal(a1, b)


# ------------------------------------------------------------------ #
# Threefry bit-exact parity (expr/threefry.py vs Random.scala)
# ------------------------------------------------------------------ #

def test_threefry_skein_golden_kats():
    """The exact Skein reference vectors the reference's own
    RandomSuite.scala:16 asserts."""
    from hail_spark.expr.threefry import encrypt, expand_key

    cases = [
        (
            [0, 0, 0, 0], (0, 0), [0, 0, 0, 0],
            [0x09218EBDE6C85537, 0x55941F5266D86105,
             0x4BD25E16282434DC, 0xEE29EC846BD2E40B],
        ),
        (
            [0x1716151413121110, 0x1F1E1D1C1B1A1918,
             0x2726252423222120, 0x2F2E2D2C2B2A2928],
            (0x0706050403020100, 0x0F0E0D0C0B0A0908),
            [0xF8F9FAFBFCFDFEFF, 0xF0F1F2F3F4F5F6F7,
             0xE8E9EAEBECEDEEEF, 0xE0E1E2E3E4E5E6E7],
            [0x008CF75D18C19DA0, 0x1D7D14BE2266E7D8,
             0x5D09E0E985FE673B, 0xB4A5480C6039B172],
        ),
    ]
    for key, tweak, inp, exp in cases:
        assert encrypt(expand_key(key), tweak, inp) == exp


def test_threefry_batch_matches_scalar():
    import numpy as np

    from hail_spark.expr.threefry import DEFAULT_KEY, encrypt, encrypt_batch

    st = [11, 22, 33, 44]
    ctrs = np.arange(17, dtype=np.uint64)
    b = encrypt_batch(DEFAULT_KEY, 5, st, ctrs)
    for i in (0, 7, 16):
        assert list(b[i].astype(object)) == encrypt(DEFAULT_KEY, (5, i), st)


def test_threefry_engine_discipline_and_streams():
    """Engine buffer discipline matches the reference: nextInt serves
    the HIGH 32 bits of each word first; nextLong re-aligns to word
    boundaries; same (nonce, staticID, message) -> identical stream,
    any difference -> divergent stream; doubles in [0, 1)."""
    from hail_spark.expr.threefry import ThreefryRandomEngine

    e = ThreefryRandomEngine.from_pmac(3, 9, [])
    e._fill()
    buf = list(e.buffer)
    e.used_ints = 0
    assert e.next_int() == (buf[0] >> 32) & 0xFFFFFFFF
    assert e.next_int() == buf[0] & 0xFFFFFFFF
    assert e.next_long() == buf[1]  # aligns to the next word

    a = ThreefryRandomEngine.from_pmac(0, 42, [1, 2, 3])
    b = ThreefryRandomEngine.from_pmac(0, 42, [1, 2, 3])
    da = [a.next_double() for _ in range(500)]
    assert da == [b.next_double() for _ in range(500)]
    assert all(0.0 <= d < 1.0 for d in da)
    c = ThreefryRandomEngine.from_pmac(0, 42, [1, 2, 4])
    assert [c.next_double() for _ in range(5)] != da[:5]


def test_threefry_pmac_padding_boundary():
    """Messages at the 4-word block boundary take the no-pad tweak;
    off-boundary messages pad with a 1 word — distinct streams."""
    from hail_spark.expr.threefry import (
        FINAL_BLOCK_NO_PAD_TWEAK,
        FINAL_BLOCK_PADDED_TWEAK,
        pmac,
        pmac_hash,
    )

    _, t4 = pmac_hash(0, 1, [1, 2, 3, 4])
    _, t3 = pmac_hash(0, 1, [1, 2, 3])
    assert t4 == FINAL_BLOCK_NO_PAD_TWEAK
    assert t3 == FINAL_BLOCK_PADDED_TWEAK
    # padded [1,2,3] must NOT collide with explicit [1,2,3,1]
    assert pmac(0, 1, [1, 2, 3]) != pmac(0, 1, [1, 2, 3, 1])


def test_threefry_batch_states_matches_scalar():
    import numpy as np

    from hail_spark.expr.threefry import (
        DEFAULT_KEY,
        encrypt,
        encrypt_batch_states,
    )

    states = np.array(
        [[1, 2, 3, 4], [5, 6, 7, 8], [2**64 - 1, 0, 17, 2**63]],
        dtype=np.uint64,
    )
    b = encrypt_batch_states(DEFAULT_KEY, 9, states, counter=3)
    for i in range(3):
        assert list(b[i].astype(object)) == encrypt(
            DEFAULT_KEY, (9, 3), [int(x) for x in states[i]]
        )


def test_rand_unif_threefry_bit_exact(uids):
    """The opt-in parity engine: a seeded rand_unif column equals the
    reference stream (nonce=0, staticID=seed, message=[uid]) computed
    through the KAT-verified scalar engine — bit for bit."""
    from hail_spark.expr.threefry import ThreefryRandomEngine

    seed = 42
    x = _draws(
        uids.limit(500),
        hf.rand_unif(F.col("uid"), 2.0, 5.0, seed=seed, engine="threefry"),
    )
    for uid, got in enumerate(x):
        eng = ThreefryRandomEngine.from_pmac(0, seed, [uid])
        want = 2.0 + eng.next_double() * (5.0 - 2.0)
        assert got == want  # exact float equality, not isclose


def test_rand_norm_threefry_bit_exact(uids):
    from hail_spark.expr.threefry import ThreefryRandomEngine

    seed = 7
    x = _draws(
        uids.limit(300),
        hf.rand_norm(F.col("uid"), 1.5, 0.5, seed=seed, engine="threefry"),
    )
    for uid, got in enumerate(x):
        eng = ThreefryRandomEngine.from_pmac(0, seed, [uid])
        want = 1.5 + eng.next_gaussian() * 0.5
        assert got == want


def test_set_rng_engine_global_opt_in(uids):
    import hail_spark as hs
    from hail_spark.expr.threefry import ThreefryRandomEngine

    hs.set_rng_engine("threefry")
    try:
        x = _draws(uids.limit(50), hf.rand_unif(F.col("uid"), seed=3))
    finally:
        hs.set_rng_engine("xxhash")
    eng = ThreefryRandomEngine.from_pmac(0, 3, [0])
    assert x[0] == eng.next_double()
    # back on the default engine the draws differ (different stream)
    y = _draws(uids.limit(50), hf.rand_unif(F.col("uid"), seed=3))
    assert x[0] != y[0]
    with pytest.raises(ValueError):
        hs.set_rng_engine("mersenne")
