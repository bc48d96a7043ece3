"""BlockMatrix ops vs numpy reference (differential testing, the
reference's ExecStrategy pattern applied to linalg)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hail_spark.linalg import BlockMatrix


def _bm_from_np(spark, M, block_size=7):
    rows = [
        {"i": i, "j": j, "v": float(M[i, j])}
        for i in range(M.shape[0])
        for j in range(M.shape[1])
        if M[i, j] != 0
    ]
    df = spark.createDataFrame(rows, schema="i bigint, j bigint, v double")
    return BlockMatrix.from_long(df, M.shape[0], M.shape[1], block_size)


@pytest.fixture(scope="module")
def mats(spark):
    rng = np.random.RandomState(7)
    A = np.round(rng.rand(23, 17) * 10)
    B = np.round(rng.rand(17, 11) * 10)
    return A, B, _bm_from_np(spark, A), _bm_from_np(spark, B)


def test_roundtrip(mats):
    A, _, bA, _ = mats
    np.testing.assert_allclose(bA.to_numpy(), A)


def test_matmul(mats):
    A, B, bA, bB = mats
    C = bA.matmul(bB)
    np.testing.assert_allclose(C.to_numpy(), A @ B)


def test_transpose(mats):
    A, _, bA, _ = mats
    np.testing.assert_allclose(bA.transpose().to_numpy(), A.T)


def test_elementwise(mats):
    A, _, bA, _ = mats
    np.testing.assert_allclose(bA.add(bA).to_numpy(), A + A)
    np.testing.assert_allclose(bA.mul(bA).to_numpy(), A * A)
    np.testing.assert_allclose(bA.sub(bA).to_numpy(), A - A)
    np.testing.assert_allclose(bA.scalar_mul(2.5).to_numpy(), A * 2.5)
    np.testing.assert_allclose(
        bA.map(lambda x: F.sqrt(x)).to_numpy(), np.sqrt(A)
    )


def test_reductions(mats):
    A, _, bA, _ = mats
    assert bA.sum() == pytest.approx(A.sum())
    rs = {r["i"]: r["row_sum"] for r in bA.row_sums().collect()}
    for i in range(A.shape[0]):
        assert rs[i] == pytest.approx(A[i].sum())
    diag = {r["i"]: r["v"] for r in bA.diagonal().collect()}
    for i in range(min(A.shape)):
        assert diag[i] == pytest.approx(A[i, i])


def test_gram_matrix(mats):
    A, _, bA, _ = mats
    G = bA.transpose().matmul(bA)
    np.testing.assert_allclose(G.to_numpy(), A.T @ A)


def test_tree_matmul(mats):
    A, B, bA, bB = mats
    np.testing.assert_allclose(bA.tree_matmul(bB, splits=2).to_numpy(), A @ B)
    np.testing.assert_allclose(bA.tree_matmul(bB, splits=5).to_numpy(), A @ B)


def test_sparsify_band(mats):
    A, _, bA, _ = mats
    lo, hi = -2, 3
    expect = A.copy()
    ii, jj = np.indices(A.shape)
    expect[(jj - ii < lo) | (jj - ii > hi)] = 0.0
    np.testing.assert_allclose(bA.sparsify_band(lo, hi).to_numpy(), expect)
    # dropped blocks actually pruned, not just zeroed
    assert bA.sparsify_band(0, 0).df.count() < bA.df.count()


def test_sparsify_rectangles(mats):
    A, _, bA, _ = mats
    rects = [(0, 5, 0, 5), (10, 20, 3, 9)]
    expect = np.zeros_like(A)
    for i0, i1, j0, j1 in rects:
        expect[i0:i1, j0:j1] = A[i0:i1, j0:j1]
    np.testing.assert_allclose(bA.sparsify_rectangles(rects).to_numpy(), expect)


def test_sparsify_row_intervals(mats):
    A, _, bA, _ = mats
    rng = np.random.RandomState(3)
    starts = rng.randint(0, 8, size=A.shape[0]).tolist()
    stops = [s + int(x) for s, x in zip(starts, rng.randint(0, 9, size=A.shape[0]))]
    expect = np.zeros_like(A)
    for i in range(A.shape[0]):
        expect[i, starts[i] : stops[i]] = A[i, starts[i] : stops[i]]
    np.testing.assert_allclose(
        bA.sparsify_row_intervals(starts, stops).to_numpy(), expect
    )


def test_write_read(mats, tmp_path, spark):
    A, _, bA, _ = mats
    p = str(tmp_path / "bm")
    bA.write(p)
    np.testing.assert_allclose(BlockMatrix.read(spark, p).to_numpy(), A)
