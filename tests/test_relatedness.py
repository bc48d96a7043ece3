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
