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
from pyspark.sql import functions as F

from ..matrixtable import ENTRIES, MatrixTable
from .statgen import _entry_matrix, _x_doubles, hwe_normalized_pca


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

    parts = mt._df.select(_x_doubles("GT")).mapInPandas(
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


def genetic_relatedness_matrix(mt: MatrixTable, x_field: str = "GT") -> np.ndarray:
    """GRM (ref statgen.py:3576 `genetic_relatedness_matrix`): unlike the
    RRM's empirical-sd standardization, the GRM standardizes by the
    binomial variance — Z_vk = (g_vk − 2p_v) / √(2 p_v (1−p_v)),
    K = ZᵀZ / m. Same map-only gemm accumulation; no shuffle."""
    n = len(mt._cols)

    def zero(n):
        return [np.zeros((n, n)), np.zeros((1, 1))]

    def kernel(X, acc):
        mean = np.nanmean(X, axis=1)
        p = mean / 2.0
        keep = (p > 0) & (p < 1)
        X, mean, p = X[keep], mean[keep], p[keep]
        idx = np.where(np.isnan(X))
        X[idx] = np.take(mean, idx[0])
        Z = (X - 2.0 * p[:, None]) / np.sqrt(2.0 * p * (1.0 - p))[:, None]
        acc[0] += Z.T @ Z
        acc[1] += np.array([[len(Z)]])

    K, m = _accumulate(mt, kernel, zero)
    return K / max(m[0, 0], 1.0)


def king(mt: MatrixTable, x_field: str = "GT"):
    """KING-robust between-family kinship (ref relatedness/king.py):

        φ(i,j) = 0.5 + (2·N_hh − 4·N_opp − N_het_i − N_het_j)
                       / (4 · min(N_het_i, N_het_j))

    with het counts restricted to PAIRWISE-DEFINED sites (both samples
    non-missing), matching the reference. The pairwise het counts are one
    extra gemm: (H.T @ D)[i,j] = #sites het in i and defined in j.
    Returns a DataFrame (i, j, phi) for i<j over sample names."""

    def zero(n):
        return [np.zeros((n, n)), np.zeros((n, n)), np.zeros((n, n))]

    def kernel(X, acc):
        H = (X == 1).astype(float)   # het indicators (NaN-safe: NaN != 1)
        A = (X == 0).astype(float)
        B = (X == 2).astype(float)
        D = (~np.isnan(X)).astype(float)
        acc[0] += H.T @ H            # pairwise het-het counts
        acc[1] += A.T @ B + B.T @ A  # opposite homozygotes
        acc[2] += H.T @ D            # het_i over sites defined in j

    hh, opp, hd = _accumulate(mt, kernel, zero)
    spark = mt._df.sparkSession
    key = mt._col_key[0]
    names = [c[key] for c in mt._cols]
    rows = []
    n = len(names)
    for i in range(n):
        for j in range(i + 1, n):
            het_i, het_j = hd[i, j], hd[j, i]
            denom = 4.0 * min(het_i, het_j)
            phi = (
                0.5 + (2.0 * hh[i, j] - 4.0 * opp[i, j] - het_i - het_j) / denom
                if denom > 0
                else float("nan")
            )
            rows.append({"i": names[i], "j": names[j], "phi": float(phi)})
    return spark.createDataFrame(rows, "i string, j string, phi double")


def row_correlation_bm(mt: MatrixTable, x_field: str = "GT", block_size: int = 1024):
    """Pearson correlation between variant rows as a BlockMatrix
    (ref statgen.py:3730, which routes through BlockMatrix the same
    way). Per-row standardization is array HOFs over the entries array
    (no shuffle); the m×m gram is a distributed BlockMatrix matmul and
    never materializes on the driver. Rows with zero variance come back
    as all-zero (the reference errors on them; callers wanting NaN can
    post-filter on the diagonal)."""
    import math

    from ..linalg.blockmatrix import BlockMatrix
    from ..operators.scans import add_index
    from ..table import Table

    n = len(mt._cols)
    t = add_index(Table(mt._df.select(*mt._row_key, ENTRIES), key=mt._row_key), "__i")
    # The indexed entries feed the row count AND the standardize chain,
    # and the gram joins the standardized blocks against themselves —
    # uncheckpointed, the pivot+sort+index lineage runs once per
    # consumer (4 full passes). Materialize it once; blocks are
    # ContextCleaner-reclaimed (and the entries copy is released early
    # below, once the block table supersedes it).
    tdf = t.df.localCheckpoint()
    g = F.transform(F.col(ENTRIES), lambda e: e[x_field].cast("double"))
    df = tdf.select(F.col("__i"), g.alias("__g"))
    nn = F.filter(F.col("__g"), lambda v: v.isNotNull())
    # mean/sd land in their own columns, referenced multiple times, so
    # Catalyst keeps them evaluated once per row instead of inlining the
    # array fold into the per-element lambda below
    df = df.withColumn(
        "__mean",
        F.aggregate(nn, F.lit(0.0), lambda a, v: a + v)
        / F.nullif(F.size(nn).cast("double"), F.lit(0.0)),
    )
    imputed = F.transform(F.col("__g"), lambda v: F.coalesce(v, F.col("__mean")))
    df = df.withColumn(
        "__sd",
        F.sqrt(
            F.aggregate(
                imputed,
                F.lit(0.0),
                lambda a, v: a + (v - F.col("__mean")) * (v - F.col("__mean")),
            )
            / F.lit(float(n))
        ),
    )
    # fold the 1/sqrt(n) into z so C = Z @ Zᵀ directly
    z = F.transform(
        imputed,
        lambda v: (v - F.col("__mean"))
        / F.nullif(F.col("__sd") * math.sqrt(n), F.lit(0.0)),
    )
    long = df.select("__i", F.posexplode(z).alias("__j", "__v")).where(
        F.col("__v").isNotNull()
    )
    m = tdf.count()
    A = BlockMatrix.from_long(long, m, n, block_size, i="__i", j="__j", v="__v")
    from ..operators.graph import _lc_release

    blocks = A.df.localCheckpoint()
    _lc_release(tdf)
    A = BlockMatrix(blocks, A.n_rows, A.n_cols, A.block_size)
    return A.matmul(A.transpose())


def row_correlation(mt: MatrixTable, x_field: str = "GT") -> np.ndarray:
    """ndarray form of :func:`row_correlation_bm` (parity with the
    reference API, which exposes the result as a BlockMatrix; collecting
    to numpy is only sensible for bounded m). Zero-variance rows are
    NaN, as before."""
    C = row_correlation_bm(mt, x_field).to_numpy()
    d = np.diag(C).copy()
    C[d == 0.0, :] = np.nan
    C[:, d == 0.0] = np.nan
    return C


def identity_by_descent(
    mt: MatrixTable,
    maf=None,
    bounded: bool = True,
    min: float | None = None,
    max: float | None = None,
    x_field: str = "GT",
):
    """PLINK method-of-moments IBD estimation (ref
    methods/relatedness/identity_by_descent.py; Scala
    methods/IBD.scala:152-198 `ibsForGenotypes`/`calculateIBDInfo`).

    Per-pair IBS0/1/2 counts are three sample×sample gemms accumulated
    map-only over variant batches (no shuffle; same _accumulate shape as
    KING).  Per-variant expected-IBS terms (with PLINK's small-sample
    x/y/Na correction factors, IBD.scala:190-198) are summed alongside,
    then averaged over variants and rescaled by each pair's non-missing
    count (IBD.scala:210 `ibse.scaled(N0+N1+N2)`).

    Returns DataFrame (i, j, Z0, Z1, Z2, PI_HAT, ibs0, ibs1, ibs2) for
    i<j in column order.  ``maf``: optional per-variant minor-allele
    frequency floor (variants below it are dropped, as in the reference's
    common usage); expectations always use sample-estimated frequencies.
    """

    def zero(n):
        return [np.zeros((n, n)), np.zeros((n, n)), np.zeros((n, n)), np.zeros((6, 1))]

    def kernel(X, acc):
        V = ~np.isnan(X)
        na = 2.0 * V.sum(axis=1)                    # called alleles per variant
        with np.errstate(invalid="ignore", divide="ignore"):
            x = np.nansum(2.0 - X, axis=1)          # ref allele count
        y = na - x
        p = np.where(na > 0, x / np.where(na > 0, na, 1.0), np.nan)
        q = 1.0 - p
        ok = (na > 3) & (x > 0) & (y > 0)
        if maf is not None:
            ok &= np.minimum(p, q) >= maf
        X = X[ok]
        if X.shape[0] == 0:
            return
        na, x, y, p, q = na[ok], x[ok], y[ok], p[ok], q[ok]
        A0 = (X == 0).astype(float)
        A1 = (X == 1).astype(float)
        A2 = (X == 2).astype(float)
        Vf = (A0 + A1 + A2)
        acc[0] += A0.T @ A2 + A2.T @ A0                      # IBS0
        acc[1] += A0.T @ A0 + A1.T @ A1 + A2.T @ A2          # IBS2
        acc[2] += Vf.T @ Vf                                   # pairwise called
        # PLINK-corrected per-variant expectations (IBD.scala:190-198)
        c3 = (na / (na - 1)) * (na / (na - 2)) * (na / (na - 3))
        c2 = (na / (na - 1)) * (na / (na - 2))
        a00 = 2 * p * p * q * q * ((x - 1) / x * (y - 1) / y) * c3
        a10 = (4 * p**3 * q * ((x - 1) / x * (x - 2) / x)
               + 4 * p * q**3 * ((y - 1) / y * (y - 2) / y)) * c3
        a20 = (q**4 * ((y - 1) / y * (y - 2) / y * (y - 3) / y)
               + p**4 * ((x - 1) / x * (x - 2) / x * (x - 3) / x)
               + 4 * p * p * q * q * ((x - 1) / x * (y - 1) / y)) * c3
        a11 = (2 * p * p * q * ((x - 1) / x) + 2 * p * q * q * ((y - 1) / y)) * c2
        a21 = (p**3 * ((x - 1) / x * (x - 2) / x) + q**3 * ((y - 1) / y * (y - 2) / y)
               + p * p * q * ((x - 1) / x) + p * q * q * ((y - 1) / y)) * c2
        fin = np.isfinite(a00) & np.isfinite(a10) & np.isfinite(a20) \
            & np.isfinite(a11) & np.isfinite(a21)
        acc[3] += np.array([[a00[fin].sum()], [a10[fin].sum()], [a20[fin].sum()],
                            [a11[fin].sum()], [a21[fin].sum()], [float(fin.sum())]])

    ibs0m, ibs2m, npair, esums = _accumulate(mt, kernel, zero)
    m = esums[5, 0]
    if m == 0:
        raise ValueError("identity_by_descent: no usable variants")
    e00, e10, e20, e11, e21 = (esums[i, 0] / m for i in range(5))
    ck = mt._col_key[0] if mt._col_key else "s"
    names = [c[ck] for c in mt._cols]
    n = len(names)
    rows = []
    for i in range(n):
        for j in range(i + 1, n):
            N = npair[i, j]
            ibs0 = ibs0m[i, j]
            ibs2 = ibs2m[i, j]
            ibs1 = N - ibs0 - ibs2
            if N == 0 or e00 == 0 or e11 == 0:
                z0 = z1 = z2 = float("nan")
            else:
                z0 = ibs0 / (e00 * N)
                z1 = (ibs1 - z0 * e10 * N) / (e11 * N)
                z2 = (ibs2 - z0 * e20 * N - z1 * e21 * N) / N
                if bounded:
                    if z0 > 1:
                        z0, z1, z2 = 1.0, 0.0, 0.0
                    elif z1 > 1:
                        z0, z1, z2 = 0.0, 1.0, 0.0
                    elif z2 > 1:
                        z0, z1, z2 = 0.0, 0.0, 1.0
                    elif z0 < 0:
                        s = z1 + z2
                        z0, z1, z2 = 0.0, z1 / s, z2 / s
                    elif z1 < 0:
                        s = z0 + z2
                        z0, z1, z2 = z0 / s, 0.0, z2 / s
                    elif z2 < 0:
                        s = z0 + z1
                        z0, z1, z2 = z0 / s, z1 / s, 0.0
            pi_hat = z1 / 2.0 + z2
            if min is not None and not (pi_hat >= min):
                continue
            if max is not None and not (pi_hat <= max):
                continue
            rows.append({
                "i": names[i], "j": names[j],
                "Z0": float(z0), "Z1": float(z1), "Z2": float(z2),
                "PI_HAT": float(pi_hat),
                "ibs0": int(ibs0), "ibs1": int(ibs1), "ibs2": int(ibs2),
            })
    spark = mt._df.sparkSession
    return spark.createDataFrame(
        rows,
        "i string, j string, Z0 double, Z1 double, Z2 double, "
        "PI_HAT double, ibs0 long, ibs1 long, ibs2 long",
    )


def pc_relate(
    mt: MatrixTable,
    k: int = 2,
    scores: np.ndarray | None = None,
    min_individual_maf: float = 0.01,
    x_field: str = "GT",
):
    """PC-Relate kinship (ref methods/relatedness/pc_relate.py; Scala
    methods/PCRelate.scala): ancestry-adjusted kinship using per-
    individual allele frequencies mu predicted from principal components.

        phi_ij = sum_s (g_is - 2 mu_is)(g_js - 2 mu_js)
                 / (4 * sum_s sqrt(mu_is(1-mu_is) mu_js(1-mu_js)))

    Spark shape: one driver-side (k+1)-column least-squares operator is
    broadcast; each Arrow batch of variants computes beta = A g per
    variant (one gemm), the centered matrix and the sqrt-variance matrix,
    and accumulates BOTH the numerator and denominator as sample×sample
    gemms — map-only, no shuffle, linear in variants.

    Missing entries contribute 0 to numerator and are masked out of the
    denominator (the reference's exclude-missing semantics).  Entries
    whose predicted mu falls outside [min_individual_maf,
    1-min_individual_maf] are likewise excluded (ref pc_relate.py
    `min_individual_maf`).

    Returns DataFrame (i, j, kin) for i<j in column order.
    """
    if scores is None:
        _, scores_df, _ = hwe_normalized_pca(mt, k=k, x_field=x_field)
        order = {tuple(c[kf] for kf in mt._col_key): i for i, c in enumerate(mt._cols)}
        S = np.zeros((len(mt._cols), k))
        for r in scores_df.collect():
            S[order[tuple(r[kf] for kf in mt._col_key)]] = r["scores"]
        scores = S
    n = len(mt._cols)
    P = np.column_stack([np.ones(n), np.asarray(scores, dtype=float)])
    A = np.linalg.solve(P.T @ P, P.T)  # (k+1) × n least-squares operator
    lo, hi = min_individual_maf, 1.0 - min_individual_maf

    def zero(n):
        return [np.zeros((n, n)), np.zeros((n, n))]

    def kernel(X, acc):
        M = ~np.isnan(X)
        Xi = np.where(M, X, 0.0)
        # per-variant regression of g on [1 | PCs] using observed entries:
        # approximate with mean-imputed g (dense gemm) — bias is O(missing%)
        mean = np.where(M.sum(axis=1) > 0, Xi.sum(axis=1) / np.maximum(M.sum(axis=1), 1), 0.0)
        Xd = np.where(M, X, mean[:, None])
        beta = Xd @ A.T                       # variants × (k+1)
        mu = 0.5 * (beta @ P.T)               # variants × samples
        good = M & (mu > lo) & (mu < hi)
        C = np.where(good, Xd - 2.0 * mu, 0.0)
        Sq = np.where(good, np.sqrt(np.clip(mu * (1.0 - mu), 0.0, None)), 0.0)
        acc[0] += C.T @ C
        acc[1] += Sq.T @ Sq

    num, den = _accumulate(mt, kernel, zero)
    ck = mt._col_key[0] if mt._col_key else "s"
    names = [c[ck] for c in mt._cols]
    rows = []
    for i in range(n):
        for j in range(i + 1, n):
            d = 4.0 * den[i, j]
            kin = num[i, j] / d if d > 0 else float("nan")
            rows.append({"i": names[i], "j": names[j], "kin": float(kin)})
    spark = mt._df.sparkSession
    return spark.createDataFrame(rows, "i string, j string, kin double")


def simulate_random_mating(
    mt: MatrixTable,
    n_rounds: int = 1,
    generation_size_multiplier: float = 1.0,
    keep_founders: bool = True,
    seed: int = 0,
) -> MatrixTable:
    """Simulate random diploid mating (ref
    methods/relatedness/mating_simulation.py:7 `simulate_random_mating`):
    each round draws floor(prev_size·multiplier) offspring, each with a
    random mother and father from the previous generation; a child's GT
    at a variant is one random allele from each parent.

    Spark shape: the pedigree (who mates with whom) is column metadata —
    tiny, built driver-side with a seeded RNG, exactly like the
    reference's globals-level scan.  Per row, each generation extends
    the entries array via a pure-Column transform over a literal
    (mother_idx, father_idx) array; allele draws for het parents are
    deterministic xxhash64 coin flips keyed on (row key, child, parent
    side) — no Python in the row path, one map-only stage, no shuffle."""
    import random as _random

    if generation_size_multiplier <= 0:
        raise ValueError("generation_size_multiplier must be > 0")
    if n_rounds < 1:
        raise ValueError("n_rounds must be positive")

    ck = mt._col_key[0]
    rng = _random.Random(seed)

    founders = [
        {"s": f"generation_0_idx_{i}", "original": str(c[ck]), "mother": None, "father": None}
        for i, c in enumerate(mt._cols)
    ]
    generations = [founders]
    prev_size = len(founders)
    for g in range(n_rounds):
        n_new = int(prev_size * generation_size_multiplier)
        new_gen = [
            {
                "s": f"generation_{g + 1}_idx_{i}",
                "original": None,
                "mother": rng.randrange(prev_size),
                "father": rng.randrange(prev_size),
            }
            for i in range(n_new)
        ]
        generations.append(new_gen)
        prev_size = (prev_size + n_new) if keep_founders else n_new

    key_cols = [F.col(k) for k in mt._row_key]

    def coin(tag: str) -> F.Column:
        # deterministic per-(row, child, parent-side) allele coin
        return F.pmod(F.xxhash64(*key_cols, F.lit(tag), F.lit(seed)), F.lit(2)).cast("int")

    def draw(parent_gt, tag: str) -> F.Column:
        # one random allele (0 or 1) from an n_alt-coded diploid GT
        return (
            F.when(parent_gt == 0, F.lit(0))
            .when(parent_gt == 2, F.lit(1))
            .when(parent_gt == 1, coin(tag))
        )

    df = mt._df
    prev_entries = F.col(ENTRIES)
    for g, new_gen in enumerate(generations[1:], start=1):
        kids = [
            F.struct(
                (
                    draw(prev_entries[k["mother"]]["GT"], f"g{g}k{i}m")
                    + draw(prev_entries[k["father"]]["GT"], f"g{g}k{i}f")
                ).alias("GT")
            )
            for i, k in enumerate(new_gen)
        ]
        kid_arr = F.array(*kids) if kids else F.array().cast(df.schema[ENTRIES].dataType)
        prev_entries = (
            F.concat(prev_entries, kid_arr) if keep_founders else kid_arr
        )

    out_df = df.withColumn(ENTRIES, prev_entries)
    if keep_founders:
        new_cols = [c for gen in generations for c in gen]
    else:
        new_cols = list(generations[-1])
    return MatrixTable(out_df, mt._row_key, new_cols, ("s",), mt._globals)
