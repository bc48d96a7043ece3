"""Relatedness methods — realized_relationship_matrix, king,
row_correlation.

Parity targets (reference hail-is/hail):
* ``realized_relationship_matrix`` — statgen.py:3650: K = Zᵀ Z / m over
  the variant-standardized genotype matrix.
* ``king`` — methods/relatedness/king.py: KING-robust kinship
  φ(i,j) = (2·N_het,het − 4·N_opp_hom − …) — implemented with the
  standard estimator φ = (N_hh − 2·N_opp) / (N_het_i + N_het_j).
* ``row_correlation`` — statgen.py:3730 (LD matrix building block).

Spark shape (same as hwe_normalized_pca): all three reduce to s×s
accumulations over variant batches — map-only ``mapInPandas`` partials
(one numpy gemm per Arrow batch), summed on the driver. No shuffle;
scales linearly in variants. s (samples) beyond ~10k needs the
BlockMatrix path (tree_matmul), not implemented here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..matrixtable import ENTRIES, MatrixTable
from .statgen import _entry_matrix


def _accumulate(mt: MatrixTable, kernel, zero):
    """Run `kernel(X_batch, acc)` over entry-matrix batches, summing the
    returned accumulator matrices driver-side."""
    n = len(mt._cols)

    def run(batches):
        acc = [z.copy() for z in zero(n)]
        for pdf in batches:
            X = _entry_matrix(pdf[ENTRIES], "GT", n)
            kernel(X, acc)
        yield pd.DataFrame([{"parts": [a.ravel().tolist() for a in acc]}])

    parts = mt._df.select(ENTRIES).mapInPandas(
        run, schema="parts array<array<double>>"
    ).collect()
    accs = [z for z in zero(n)]
    for r in parts:
        for i, flat in enumerate(r["parts"]):
            accs[i] += np.asarray(flat).reshape(accs[i].shape)
    return accs


def realized_relationship_matrix(mt: MatrixTable, x_field: str = "GT") -> np.ndarray:
    """RRM (ref statgen.py:3650): standardize each variant row to mean 0
    variance 1 (mean-imputed missing), K = ZᵀZ / m."""
    n = len(mt._cols)

    def zero(n):
        return [np.zeros((n, n)), np.zeros((1, 1))]

    def kernel(X, acc):
        mean = np.nanmean(X, axis=1)
        sd = np.nanstd(X, axis=1)
        keep = sd > 0
        X, mean, sd = X[keep], mean[keep], sd[keep]
        idx = np.where(np.isnan(X))
        X[idx] = np.take(mean, idx[0])
        Z = (X - mean[:, None]) / sd[:, None]
        acc[0] += Z.T @ Z
        acc[1] += np.array([[len(Z)]])

    K, m = _accumulate(mt, kernel, zero)
    return K / max(m[0, 0], 1.0)


def king(mt: MatrixTable, x_field: str = "GT"):
    """KING-robust kinship (ref relatedness/king.py):
    φ(i,j) = (N_het,het(i,j) − 2·N_opp_hom(i,j)) / (N_het(i) + N_het(j)).
    Returns a DataFrame (i, j, phi) for i<j over sample names."""

    def zero(n):
        return [np.zeros((n, n)), np.zeros((n, n))]

    def kernel(X, acc):
        H = (X == 1).astype(float)   # het indicators (NaN-safe: NaN != 1)
        A = (X == 0).astype(float)
        B = (X == 2).astype(float)
        acc[0] += H.T @ H            # pairwise het-het counts
        acc[1] += A.T @ B + B.T @ A  # opposite homozygotes

    hh, opp = _accumulate(mt, kernel, zero)
    n_het = np.diag(hh)
    spark = mt._df.sparkSession
    names = [c["s"] for c in mt._cols]
    rows = []
    n = len(names)
    for i in range(n):
        for j in range(i + 1, n):
            denom = n_het[i] + n_het[j]
            phi = (hh[i, j] - 2.0 * opp[i, j]) / denom if denom > 0 else float("nan")
            rows.append({"i": names[i], "j": names[j], "phi": float(phi)})
    return spark.createDataFrame(rows, "i string, j string, phi double")


def row_correlation(mt: MatrixTable, x_field: str = "GT") -> np.ndarray:
    """Pearson correlation between variant rows (ref statgen.py:3730).
    Driver-side result (m×m) in row-key order — only for bounded m; the
    windowed ld_prune path (methods/misc.py) is the at-scale consumer."""
    rows = mt._df.select(*mt._row_key, ENTRIES).orderBy(*mt._row_key).collect()
    n = len(mt._cols)
    X = _entry_matrix(pd.Series([r[ENTRIES] for r in rows]), x_field, n)
    mean = np.nanmean(X, axis=1)
    idx = np.where(np.isnan(X))
    X[idx] = np.take(mean, idx[0])
    Z = X - X.mean(axis=1, keepdims=True)
    sd = Z.std(axis=1)
    sd[sd == 0] = np.nan
    Zn = Z / sd[:, None]
    return (Zn @ Zn.T) / X.shape[1]
