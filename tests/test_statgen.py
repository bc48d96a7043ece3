"""Differential tests for statgen methods: engine results vs direct
numpy reference computation on the same random matrix (the reference's
own strategy — golden numeric expectations, SURVEY.md §5)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hail_spark.matrixtable import ENTRIES, MatrixTable
from hail_spark.methods.statgen import (
    hwe_normalized_pca,
    linear_regression_rows,
    logistic_regression_rows,
)

N_SAMPLES, N_VARIANTS = 30, 40


@pytest.fixture(scope="module")
def sim(spark):
    rng = np.random.default_rng(42)
    G = rng.integers(0, 3, size=(N_VARIANTS, N_SAMPLES)).astype(float)
    G[rng.random(G.shape) < 0.05] = np.nan  # 5% missing entries
    cov = rng.normal(size=N_SAMPLES)
    y_lin = rng.normal(size=N_SAMPLES) + 0.3 * cov
    y_bin = (rng.random(N_SAMPLES) < 0.5).astype(float)
    rows = []
    for i in range(N_VARIANTS):
        ents = [
            {"GT": None if np.isnan(G[i, j]) else int(G[i, j])} for j in range(N_SAMPLES)
        ]
        rows.append({"vid": i, ENTRIES: ents})
    df = spark.createDataFrame(rows, f"vid int, {ENTRIES} array<struct<GT: int>>").repartition(4)
    cols = [{"s": f"S{j}", "cov": float(cov[j]), "y": float(y_lin[j]), "yb": float(y_bin[j])}
            for j in range(N_SAMPLES)]
    mt = MatrixTable(df, ("vid",), cols, ("s",))
    return mt, G, cov, y_lin, y_bin


def _impute(G):
    X = G.copy()
    mu = np.nanmean(X, axis=1)
    idx = np.where(np.isnan(X))
    X[idx] = np.take(mu, idx[0])
    return X


def test_linear_regression_rows(sim):
    mt, G, cov, y, _ = sim
    res = {r["vid"]: r for r in linear_regression_rows(mt, "y", ["cov"]).collect()}
    X = _impute(G)
    C = np.column_stack([np.ones(N_SAMPLES), cov])
    for i in [0, 7, 23, N_VARIANTS - 1]:
        M = np.column_stack([C, X[i]])
        beta_full, res_ss, *_ = np.linalg.lstsq(M, y, rcond=None)
        beta = beta_full[-1]
        dof = N_SAMPLES - M.shape[1]
        resid = y - M @ beta_full
        sigma2 = resid @ resid / dof
        se = np.sqrt(sigma2 * np.linalg.inv(M.T @ M)[-1, -1])
        assert res[i]["beta"] == pytest.approx(beta, rel=1e-8)
        assert res[i]["standard_error"] == pytest.approx(se, rel=1e-8)
        assert res[i]["t_stat"] == pytest.approx(beta / se, rel=1e-8)
        assert 0.0 <= res[i]["p_value"] <= 1.0
        assert res[i]["n"] == N_SAMPLES
    assert len(res) == N_VARIANTS


def test_logistic_regression_rows_wald_vs_lrt(sim):
    mt, G, cov, _, yb = sim
    wald = {r["vid"]: r for r in logistic_regression_rows(mt, "wald", "yb", ["cov"]).collect()}
    lrt = {r["vid"]: r for r in logistic_regression_rows(mt, "lrt", "yb", ["cov"]).collect()}
    # reference Newton fit in-test
    def fit(M, y):
        b = np.zeros(M.shape[1])
        for _ in range(50):
            mu = 1 / (1 + np.exp(-(M @ b)))
            W = mu * (1 - mu)
            delta = np.linalg.solve((M * W[:, None]).T @ M, M.T @ (y - mu))
            b = b + delta
            if np.max(np.abs(delta)) < 1e-12:
                break
        eta = M @ b
        ll = float(np.sum(y * eta - np.log1p(np.exp(eta))))
        finv = np.linalg.inv((M * (1 / (1 + np.exp(-eta)) * (1 - 1 / (1 + np.exp(-eta))))[:, None]).T @ M)
        return b, ll, finv

    X = _impute(G)
    C = np.column_stack([np.ones(N_SAMPLES), cov])
    _, ll0, _ = fit(C, yb)
    for i in [3, 17]:
        M = np.column_stack([C, X[i]])
        b, ll, finv = fit(M, yb)
        assert wald[i]["beta"] == pytest.approx(b[-1], rel=1e-6)
        # reference wald shape: z = beta/se with its standard error
        se = np.sqrt(finv[-1, -1])
        assert wald[i]["standard_error"] == pytest.approx(se, rel=1e-6)
        assert wald[i]["z_stat"] == pytest.approx(b[-1] / se, rel=1e-6)
        assert lrt[i]["chi_sq_stat"] == pytest.approx(2 * (ll - ll0), rel=1e-6, abs=1e-9)
        assert wald[i]["fit_converged"] is True


def test_logistic_regression_rows_score(sim):
    mt, G, cov, _, yb = sim
    score = {r["vid"]: r for r in logistic_regression_rows(mt, "score", "yb", ["cov"]).collect()}

    def fit(M, y):
        b = np.zeros(M.shape[1])
        for _ in range(50):
            mu = 1 / (1 + np.exp(-(M @ b)))
            W = mu * (1 - mu)
            delta = np.linalg.solve((M * W[:, None]).T @ M, M.T @ (y - mu))
            b = b + delta
            if np.max(np.abs(delta)) < 1e-12:
                break
        return b

    X = _impute(G)
    C = np.column_stack([np.ones(N_SAMPLES), cov])
    b0 = fit(C, yb)
    mu0 = 1 / (1 + np.exp(-(C @ b0)))
    W0 = mu0 * (1 - mu0)
    for i in [3, 17, 29]:
        M = np.column_stack([C, X[i]])
        U = M.T @ (yb - mu0)
        I = (M * W0[:, None]).T @ M
        stat = U @ np.linalg.solve(I, U)
        assert score[i]["chi_sq_stat"] == pytest.approx(stat, rel=1e-6)
        assert score[i]["fit_converged"] is True


def test_logistic_regression_rows_firth(sim):
    mt, G, cov, _, yb = sim
    firth = {r["vid"]: r for r in logistic_regression_rows(mt, "firth", "yb", ["cov"]).collect()}
    wald = {r["vid"]: r for r in logistic_regression_rows(mt, "wald", "yb", ["cov"]).collect()}
    X = _impute(G)
    C = np.column_stack([np.ones(N_SAMPLES), cov])
    for i in [3, 17]:
        b_hat = firth[i]["beta"]
        assert firth[i]["fit_converged"] is True
        assert np.isfinite(firth[i]["p_value"])
        # Firth shrinks toward zero but stays in the MLE's neighborhood here
        assert abs(b_hat) <= abs(wald[i]["beta"]) + 0.05
        assert b_hat == pytest.approx(wald[i]["beta"], abs=0.35)
    # stationarity: the returned full fit must zero the Firth-penalized score
    from hail_spark.methods.statgen import _firth_fit

    M = np.column_stack([C, X[3]])
    b, pll, ok = _firth_fit(M, yb, tol=1e-14)
    assert ok
    mu = 1 / (1 + np.exp(-(M @ b)))
    W = mu * (1 - mu)
    MW = M * W[:, None]
    finv = np.linalg.inv(MW.T @ M)
    h = np.einsum("ij,jk,ik->i", MW, finv, M)
    Ustar = M.T @ (yb - mu + h * (0.5 - mu))
    assert np.max(np.abs(Ustar)) < 1e-6


def test_firth_handles_separation(spark):
    # a perfectly separating variant: the MLE diverges, Firth stays finite
    n = 20
    x = np.array([0.0] * 10 + [2.0] * 10)
    y = np.array([0.0] * 10 + [1.0] * 10)
    rows = [{"vid": 0, ENTRIES: [{"GT": int(v)} for v in x]}]
    df = spark.createDataFrame(rows, f"vid int, {ENTRIES} array<struct<GT: int>>")
    cols = [{"s": f"S{j}", "yb": float(y[j])} for j in range(n)]
    mt = MatrixTable(df, ("vid",), cols, ("s",))
    res = logistic_regression_rows(mt, "firth", "yb", []).collect()[0]
    assert res["fit_converged"] is True
    assert np.isfinite(res["beta"]) and abs(res["beta"]) < 10
    assert 0.0 <= res["p_value"] <= 1.0


def test_hwe_normalized_pca(sim, spark):
    mt, G, *_ = sim
    evals, scores_df, loadings_df = hwe_normalized_pca(mt, k=5, compute_loadings=True)
    # numpy reference
    X = G.copy()
    mean = np.nanmean(X, axis=1)
    p = mean / 2.0
    keep = (p > 0) & (p < 1)
    X, mean, p = X[keep], mean[keep], p[keep]
    idx = np.where(np.isnan(X))
    X[idx] = np.take(mean, idx[0])
    Xn = (X - mean[:, None]) / np.sqrt(2 * p * (1 - p) * N_VARIANTS)[:, None]
    ref_evals = np.sort(np.linalg.eigvalsh(Xn.T @ Xn))[::-1][:5]
    assert np.allclose(evals, ref_evals, rtol=1e-8)
    scores = np.array(
        [r["scores"] for r in scores_df.orderBy("s").collect()]
    )
    assert scores.shape == (N_SAMPLES, 5)
    # scores columns are eigvec*sqrt(eval): their gram is diag(evals)
    got = scores.T @ scores
    assert np.allclose(np.diag(got), ref_evals, rtol=1e-6)
    assert np.allclose(got - np.diag(np.diag(got)), 0.0, atol=1e-6)
    # loadings: Xn ≈ loadings @ diag(sqrt(evals)) @ V' — check shapes + norm
    L = np.array([r["loadings"] for r in loadings_df.orderBy("vid").collect()])
    assert L.shape == (N_VARIANTS, 5)
    assert np.isfinite(L[np.array(keep)]).all()


def test_logreg_rejects_bad_input(sim):
    mt, *_ = sim
    with pytest.raises(ValueError):
        logistic_regression_rows(mt, "bogus_test", "yb", ["cov"])
    with pytest.raises(ValueError):
        logistic_regression_rows(mt, "wald", "cov", [])  # non-binary y


def test_poisson_regression_rows_wald(spark, sim):
    from hail_spark.methods.statgen import poisson_regression_rows

    mt, G, cov, _, _ = sim
    rng = np.random.default_rng(7)
    y_cnt = rng.poisson(2.0, size=N_SAMPLES).astype(float)
    cols = [{**c, "yc": float(y_cnt[j])} for j, c in enumerate(mt._cols)]
    mt2 = MatrixTable(mt._df, mt._row_key, cols, mt._col_key)
    res = {r["vid"]: r for r in poisson_regression_rows(
        mt2, "wald", "yc", covariates=["cov"]).collect()}

    # numpy IRLS reference for a few variants
    Gi = _impute(G)
    for vid in (0, 5, 17):
        X = np.column_stack([np.ones(N_SAMPLES), cov, Gi[vid]])
        b = np.zeros(3)
        for _ in range(50):
            mu = np.exp(np.clip(X @ b, -30, 30))
            step = np.linalg.solve((X * mu[:, None]).T @ X, X.T @ (y_cnt - mu))
            b = b + step
            if np.abs(step).max() < 1e-12:
                break
        mu = np.exp(X @ b)
        se = np.sqrt(np.linalg.inv((X * mu[:, None]).T @ X)[-1, -1])
        r = res[vid]
        assert r["beta"] == pytest.approx(b[-1], rel=1e-6, abs=1e-10)
        assert r["chi_sq_stat"] == pytest.approx((b[-1] / se) ** 2, rel=1e-5, abs=1e-9)


def test_linear_skat_null_uniform_and_signal(spark, sim):
    from hail_spark.methods.statgen import linear_skat

    mt, G, cov, y_lin, _ = sim
    # group variants into 4 gene groups of 10
    df = mt._df.withColumn("gene", (F.col("vid") / 10).cast("int"))
    mt2 = MatrixTable(df, mt._row_key, mt._cols, mt._col_key)
    res = {r["group"]: r for r in linear_skat(
        mt2, "gene", "y", covariates=["cov"]).collect()}
    assert set(res) == {0, 1, 2, 3}
    for g, r in res.items():
        assert r["size"] == 10
        assert 0.0 <= r["p_value"] <= 1.0

    # numpy reference for group 0: Q and Imhof p
    Gi = _impute(G)[:10].T  # n × 10
    C = np.column_stack([np.ones(N_SAMPLES), cov])
    Q0, _ = np.linalg.qr(C)
    resid = y_lin - Q0 @ (Q0.T @ y_lin)
    s2 = resid @ resid / (N_SAMPLES - 2)
    q_ref = ((Gi.T @ resid) ** 2).sum() / (2 * s2)
    assert res[0]["q_stat"] == pytest.approx(q_ref, rel=1e-8)

    # planted signal: y strongly driven by group-2 variants → small p
    beta = np.zeros(40); beta[20:30] = 1.0
    y_sig = _impute(G).T @ beta + np.random.default_rng(3).normal(0, 0.5, N_SAMPLES)
    cols = [{**c, "ys": float(y_sig[j])} for j, c in enumerate(mt._cols)]
    mt3 = MatrixTable(df, mt._row_key, cols, mt._col_key)
    res3 = {r["group"]: r for r in linear_skat(mt3, "gene", "ys").collect()}
    assert res3[2]["p_value"] < 1e-6


def test_logistic_skat(spark, sim):
    from hail_spark.methods.statgen import _logreg_fit, logistic_skat
    from hail_spark.expr.stats import pgenchisq

    mt, G, cov, _, y_bin = sim
    df = mt._df.withColumn("gene", (F.col("vid") / 10).cast("int"))
    mt2 = MatrixTable(df, mt._row_key, mt._cols, mt._col_key)
    res = {r["group"]: r for r in logistic_skat(
        mt2, "gene", "yb", covariates=["cov"]).collect()}
    assert set(res) == {0, 1, 2, 3}
    for r in res.values():
        assert r["size"] == 10 and 0.0 <= r["p_value"] <= 1.0

    # numpy replica for group 1
    Gi = _impute(G)[10:20].T
    C = np.column_stack([np.ones(N_SAMPLES), cov])
    beta, *_ = _logreg_fit(C, y_bin)
    mu = 1 / (1 + np.exp(-(C @ beta)))
    v = mu * (1 - mu)
    r_ = y_bin - mu
    q_ref = ((Gi.T @ r_) ** 2).sum() / 2
    assert res[1]["q_stat"] == pytest.approx(q_ref, rel=1e-8)
    Qv, _ = np.linalg.qr(C * np.sqrt(v)[:, None])
    Gv = Gi * np.sqrt(v)[:, None]
    B = Gv.T @ Gv - (Gv.T @ Qv) @ (Qv.T @ Gv)
    lam = np.linalg.eigvalsh(B) / 2
    lam = lam[lam > 1e-10 * lam.max()]
    assert res[1]["p_value"] == pytest.approx(pgenchisq(q_ref, lam), abs=1e-8)

    # planted signal: case status driven by group-3 burden → small p
    burden = _impute(G)[30:40].sum(axis=0)
    y_sig = (burden > np.median(burden)).astype(float)
    cols = [{**c, "ysig": float(y_sig[j])} for j, c in enumerate(mt._cols)]
    mt3 = MatrixTable(df, mt._row_key, cols, mt._col_key)
    res3 = {r["group"]: r for r in logistic_skat(mt3, "gene", "ysig").collect()}
    assert res3[3]["p_value"] < 0.05
    assert res3[3]["p_value"] < min(res3[g]["p_value"] for g in (0, 1))


def test_blanczos_pca_matches_gram(sim, spark):
    """_blanczos_pca (randomized block-Krylov over BlockMatrix matmuls)
    must reproduce the gram-matrix PCA eigenvalues/scores when the
    Krylov dimension covers the spectrum — no n×n gram on the driver."""
    from hail_spark.methods.statgen import _blanczos_pca

    mt, G, *_ = sim
    evals_g, scores_g, _ = hwe_normalized_pca(mt, k=5)
    # oversampling so the Krylov space spans the 30-sample spectrum:
    # then blanczos is exact, not just approximate
    evals_b, scores_b, loadings_b = _blanczos_pca(
        mt, k=5, compute_loadings=True, oversampling=10
    )
    assert np.allclose(evals_b, evals_g, rtol=1e-6, atol=1e-9)
    sg = {r["s"]: np.array(r["scores"]) for r in scores_g.collect()}
    sb = {r["s"]: np.array(r["scores"]) for r in scores_b.collect()}
    # eigenvectors match up to per-component sign
    Mg = np.array([sg[f"S{j}"] for j in range(N_SAMPLES)])
    Mb = np.array([sb[f"S{j}"] for j in range(N_SAMPLES)])
    for c in range(5):
        assert (
            np.allclose(Mg[:, c], Mb[:, c], atol=1e-6)
            or np.allclose(Mg[:, c], -Mb[:, c], atol=1e-6)
        ), c
    assert loadings_b.count() > 0


def test_hwe_pca_blanczos_dispatch(sim):
    mt, *_ = sim
    ev_g, _, _ = hwe_normalized_pca(mt, k=4)
    ev_b, scores_b, _ = hwe_normalized_pca(
        mt, k=4, method="blanczos", q_iterations=8, oversampling=10
    )
    np.testing.assert_allclose(ev_b, ev_g, rtol=1e-6)
    assert scores_b.count() == N_SAMPLES


def test_entry_unpack_fast_path(spark):
    """r03 verdict item 4: the regression kernels project entries to
    array<double> JVM-side (_x_doubles) so _entry_matrix takes its
    vectorized path — same values as the struct path, and measurably
    faster per batch at a 5k-sample width (the interpreted per-genotype
    loop was the one remaining row-at-a-time hot loop)."""
    import time

    import numpy as np
    import pandas as pd

    from hail_spark.methods.statgen import _entry_matrix

    def _timed(fn):
        t0 = time.time()
        fn()
        return time.time() - t0

    rng = np.random.default_rng(7)
    n_s, n_v = 5000, 200
    X = rng.integers(0, 3, size=(n_v, n_s)).astype(float)
    X[rng.random(size=X.shape) < 0.05] = np.nan
    # struct path input: list of dicts per row (what un-projected
    # entries arrive as through Arrow)
    structs = pd.Series(
        [
            [None if np.isnan(v) else {"GT": int(v)} for v in row]
            for row in X
        ]
    )
    # primitive path input: float64 ndarrays (what _x_doubles delivers)
    prims = pd.Series([row.copy() for row in X])

    # best-of-3 per path: a single-shot wall-clock compare flaked under
    # ambient load (r10: 0.546 vs 0.497 on a quiet box — the two paths
    # are close enough at this width that one scheduler hiccup flips
    # the sign); min-of-N isolates the code cost from the noise
    t_struct = min(
        _timed(lambda: _entry_matrix(structs, "GT", n_s)) for _ in range(3)
    )
    t_prim = min(
        _timed(lambda: _entry_matrix(prims, "GT", n_s)) for _ in range(3)
    )
    A = _entry_matrix(structs, "GT", n_s)
    B = _entry_matrix(prims, "GT", n_s)
    np.testing.assert_array_equal(np.isnan(A), np.isnan(B))
    np.testing.assert_allclose(np.nan_to_num(A), np.nan_to_num(B))
    assert t_prim < t_struct, (t_prim, t_struct)


def test_x_doubles_projection_matches_struct(spark):
    """End-to-end: linreg over the projected entries equals linreg over
    raw structs (the monkeypatched pre-r04 path) bit-for-bit."""
    import numpy as np
    from pyspark.sql import functions as F

    import hail_spark.methods.statgen as sg
    from hail_spark.matrixtable import ENTRIES, MatrixTable

    n_s, n_v = 40, 60
    df = spark.range(n_v).select(
        F.col("id").alias("vid"),
        F.transform(
            F.sequence(F.lit(0), F.lit(n_s - 1)),
            lambda j: F.when(
                (F.col("id") * 31 + j * 17) % 11 != 0,
                F.struct(((F.col("id") * 7 + j * 13) % 3).cast("int").alias("GT")),
            ),
        ).alias(ENTRIES),
    )
    cols = [{"s": f"s{i}"} for i in range(n_s)]
    mt = MatrixTable(df, ("vid",), cols, ("s",))
    y = np.random.default_rng(3).normal(size=n_s)
    new = {r["vid"]: r for r in sg.linear_regression_rows(mt, y).collect()}
    orig = sg._x_doubles
    try:
        sg._x_doubles = lambda f: F.col(ENTRIES)
        old = {r["vid"]: r for r in sg.linear_regression_rows(mt, y).collect()}
    finally:
        sg._x_doubles = orig
    assert new.keys() == old.keys()
    for k in new:
        for fld in ("n", "sum_x", "beta", "standard_error", "p_value"):
            a, b = new[k][fld], old[k][fld]
            if a is None or (isinstance(a, float) and a != a):
                assert b is None or b != b
            else:
                assert abs(a - b) < 1e-12, (k, fld, a, b)
