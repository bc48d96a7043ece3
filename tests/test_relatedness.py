"""Relatedness (RRM/KING/row_correlation) + MIS/ld_prune tests,
differential vs numpy and planted-structure checks."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hail_spark.matrixtable import ENTRIES, MatrixTable
from hail_spark.methods.misc import ld_prune, maximal_independent_set
from hail_spark.methods.relatedness import (
    king,
    realized_relationship_matrix,
    row_correlation,
)


def _mt(spark, G, positions=None):
    nv, ns = G.shape
    rows = []
    for i in range(nv):
        rows.append(
            {
                "locus": {"contig": "1", "position": int(positions[i]) if positions is not None else i + 1},
                ENTRIES: [
                    None if np.isnan(G[i, j]) else {"GT": int(G[i, j])} for j in range(ns)
                ],
            }
        )
    df = spark.createDataFrame(
        rows,
        f"locus struct<contig:string,position:int>, {ENTRIES} array<struct<GT:int>>",
    ).repartition(3)
    return MatrixTable(df, ("locus",), [{"s": f"S{j}"} for j in range(ns)], ("s",))


def test_rrm_vs_numpy(spark):
    rng = np.random.default_rng(9)
    G = rng.integers(0, 3, size=(60, 12)).astype(float)
    G[rng.random(G.shape) < 0.04] = np.nan
    K = realized_relationship_matrix(_mt(spark, G))
    # numpy reference
    mean = np.nanmean(G, axis=1)
    sd = np.nanstd(G, axis=1)
    keep = sd > 0
    X, mean, sd = G[keep], mean[keep], sd[keep]
    idx = np.where(np.isnan(X))
    X[idx] = np.take(mean, idx[0])
    Z = (X - mean[:, None]) / sd[:, None]
    assert np.allclose(K, Z.T @ Z / len(Z), rtol=1e-10)


def test_king_detects_duplicates(spark):
    rng = np.random.default_rng(10)
    ns = 6
    # KING assumes HWE-ish genotypes: binomial(2, p) per variant
    p = rng.uniform(0.2, 0.8, size=300)
    G = rng.binomial(2, p[:, None], size=(300, ns)).astype(float)
    G[:, 1] = G[:, 0]  # S1 duplicates S0
    phi = {(r["i"], r["j"]): r["phi"] for r in king(_mt(spark, G)).collect()}
    assert phi[("S0", "S1")] == pytest.approx(0.5, abs=0.02)  # MZ twin ~0.5
    others = [v for k, v in phi.items() if k != ("S0", "S1")]
    assert all(abs(v) < 0.15 for v in others)


def test_row_correlation(spark):
    rng = np.random.default_rng(12)
    G = rng.integers(0, 3, size=(10, 20)).astype(float)
    C = row_correlation(_mt(spark, G))
    ref = np.corrcoef(G)
    assert np.allclose(C, ref, atol=1e-10)


def test_mis_greedy():
    # triangle + pendant: MIS removes the hub
    edges = [(1, 2), (2, 3), (1, 3), (3, 4)]
    mis = maximal_independent_set(edges)
    assert 4 in mis and len(mis & {1, 2, 3}) >= 1
    for a, b in edges:
        assert not (a in mis and b in mis)
    assert maximal_independent_set([]) == set()


def test_ld_prune_removes_perfect_ld(spark):
    rng = np.random.default_rng(13)
    nv, ns = 20, 30
    G = rng.integers(0, 3, size=(nv, ns)).astype(float)
    G[1] = G[0]          # perfect LD pair within window
    G[11] = G[10]        # another
    positions = [1000 + 10 * i for i in range(nv)]
    kept = ld_prune(_mt(spark, G, positions), r2=0.95, bp_window_size=500)
    kp = {r["locus"]["position"] for r in kept.collect()}
    assert len(kp & {1000, 1010}) == 1  # exactly one of each LD pair survives
    assert len(kp & {1100, 1110}) == 1
    # uncorrelated variants all kept
    assert len(kp) >= nv - 2


def test_identity_by_descent_plink_mom(spark):
    from hail_spark.methods.relatedness import identity_by_descent

    rng = np.random.default_rng(21)
    ns, nv = 8, 2000
    p = rng.uniform(0.1, 0.9, size=nv)
    G = rng.binomial(2, p[:, None], size=(nv, ns)).astype(float)
    G[:, 1] = G[:, 0]  # duplicate pair → PI_HAT ~ 1
    res = {(r["i"], r["j"]): r for r in identity_by_descent(_mt(spark, G)).collect()}
    dup = res[("S0", "S1")]
    assert dup["PI_HAT"] == pytest.approx(1.0, abs=0.05)
    assert dup["ibs0"] == 0  # identical genotypes can never be IBS0
    # unrelated pair: PI_HAT near 0
    other = res[("S2", "S3")]
    assert other["PI_HAT"] < 0.15
    assert other["ibs0"] > 0
    # Z's sum to ~1
    for r in res.values():
        assert r["Z0"] + r["Z1"] + r["Z2"] == pytest.approx(1.0, abs=1e-6)


def test_pc_relate_duplicates_and_structure(spark):
    from hail_spark.methods.relatedness import pc_relate

    # two diverged subpopulations (Balding-Nichols-ish): PC1 captures the
    # split, so ancestry-adjusted kinship stays near 0 across pops while
    # the within-pop duplicate pair stays ~0.5
    rng = np.random.default_rng(22)
    ns_pop, nv = 8, 4000
    anc = rng.uniform(0.2, 0.8, size=nv)
    fst = 0.15
    a, b = anc * (1 - fst) / fst, (1 - anc) * (1 - fst) / fst
    pA, pB = rng.beta(a, b), rng.beta(a, b)
    GA = rng.binomial(2, pA[:, None], size=(nv, ns_pop)).astype(float)
    GB = rng.binomial(2, pB[:, None], size=(nv, ns_pop)).astype(float)
    G = np.hstack([GA, GB])
    G[:, 1] = G[:, 0]  # MZ duplicate in pop A
    # explicit ancestry scores (the reference's recommended usage: PCs
    # computed on unrelated samples, passed via scores_expr)
    scores = np.array([1.0] * ns_pop + [-1.0] * ns_pop)[:, None]
    kin = {(r["i"], r["j"]): r["kin"]
           for r in pc_relate(_mt(spark, G), scores=scores).collect()}

    # exact differential vs numpy replica of the estimator
    n = 2 * ns_pop
    P = np.column_stack([np.ones(n), scores])
    A = np.linalg.solve(P.T @ P, P.T)
    mu = 0.5 * ((G @ A.T) @ P.T)
    good = (mu > 0.01) & (mu < 0.99)
    C = np.where(good, G - 2 * mu, 0.0)
    S = np.where(good, np.sqrt(np.clip(mu * (1 - mu), 0, None)), 0.0)
    num, den = C.T @ C, S.T @ S
    assert kin[("S0", "S1")] == pytest.approx(num[0, 1] / (4 * den[0, 1]), rel=1e-9)
    assert kin[("S2", "S5")] == pytest.approx(num[2, 5] / (4 * den[2, 5]), rel=1e-9)

    # duplicate pair dominates (estimator shrinks toward 0 at tiny n —
    # with true mu it is 0.5; at n=16 estimated-mu bias gives ~0.35)
    assert kin[("S0", "S1")] == max(kin.values()) and kin[("S0", "S1")] > 0.3
    cross = [v for (i, j), v in kin.items()
             if (int(i[1:]) < ns_pop) != (int(j[1:]) < ns_pop)]
    assert abs(np.mean(cross)) < 0.05


def test_ld_matrix_matches_row_correlation(spark):
    from hail_spark.methods.misc import ld_matrix

    rng = np.random.default_rng(33)
    nv, ns = 25, 14
    G = rng.integers(0, 3, size=(nv, ns)).astype(float)
    positions = np.arange(1, nv + 1) * 10
    mt = _mt(spark, G, positions=positions)
    R = row_correlation(mt)
    got = {
        (r["la"]["position"], r["lb"]["position"]): r["r"]
        for r in ld_matrix(mt, bp_window_size=10_000).collect()
    }
    assert len(got) == nv * (nv - 1) // 2  # all pairs within window
    for (pa, pb), r in got.items():
        i, j = pa // 10 - 1, pb // 10 - 1
        assert r == pytest.approx(R[i, j], rel=1e-9, abs=1e-12)


def test_genetic_relatedness_matrix(spark):
    import numpy as np

    from hail_spark.matrixtable import ENTRIES, MatrixTable
    from hail_spark.methods.relatedness import genetic_relatedness_matrix

    rng = np.random.default_rng(21)
    m, n = 60, 8
    p_true = rng.uniform(0.1, 0.9, size=m)
    G = rng.binomial(2, p_true[:, None], size=(m, n)).astype(float)
    rows = [
        {"vid": i, ENTRIES: [{"GT": int(G[i, j])} for j in range(n)]}
        for i in range(m)
    ]
    df = spark.createDataFrame(rows, f"vid int, {ENTRIES} array<struct<GT: int>>")
    mt = MatrixTable(df, ("vid",), [{"s": f"S{j}"} for j in range(n)], ("s",))
    K = genetic_relatedness_matrix(mt)

    # numpy replay of the reference definition
    mean = G.mean(axis=1)
    p = mean / 2
    keep = (p > 0) & (p < 1)
    Z = (G[keep] - 2 * p[keep][:, None]) / np.sqrt(2 * p[keep] * (1 - p[keep]))[:, None]
    want = Z.T @ Z / keep.sum()
    np.testing.assert_allclose(K, want, atol=1e-10)


def test_table_pandas_round_trip(spark):
    import pandas as pd

    from hail_spark.table import Table

    pdf = pd.DataFrame({"k": [3, 1, 2], "v": ["c", "a", "b"]})
    t = Table.from_pandas(spark, pdf, key=["k"])
    back = t.to_pandas()
    assert list(back["k"]) == [1, 2, 3]  # key order
    assert list(back["v"]) == ["a", "b", "c"]
