"""Statistical distribution functions — hl.pnorm/qnorm/dnorm,
pchisqtail/qchisqtail, dpois/ppois/qpois, pT/pF, dbeta/dgamma/pgamma/
qgamma, phyper, binom_test, fisher_exact_test, chi_squared_test,
contingency_table_test, hardy_weinberg_test.

Parity target: reference functions.py:746-2954 backed by Apache
commons-math in hail/hail/src/is/hail/expr/ir/functions/
MathFunctions.scala. No scipy in this environment, so the classical
kernels are implemented here directly (regularized incomplete
gamma/beta via series + Lentz continued fractions, Acklam's inverse
normal, Wigginton's exact HWE test) — all standard published
algorithms, accurate to ~1e-10 relative, well inside the fp tolerance
the reference's own differential tests allow commons-math.

Spark surface: every scalar has a vectorized pandas-UDF wrapper
(``*_udf`` via :func:`vec_udf`) operating on Arrow batches — these are
finalizer-grade functions (called on aggregated results or per-row
p-values), not the 100-TB scan path, so Python-side numerics match the
reference's own per-row commons-math calls in cost shape.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_EPS = 3e-14
_ITMAX = 300


# ---------------------------------------------------------------------- #
# kernels: erf / incomplete gamma / incomplete beta
# ---------------------------------------------------------------------- #
_erf = np.vectorize(math.erf, otypes=[float])
_erfc = np.vectorize(math.erfc, otypes=[float])
_lgamma = np.vectorize(math.lgamma, otypes=[float])


def _gser(a, x):
    """Series for regularized lower incomplete gamma P(a,x), x < a+1."""
    ap, s = a, 1.0 / a
    d = s
    for _ in range(_ITMAX):
        ap += 1.0
        d *= x / ap
        s += d
        if abs(d) < abs(s) * _EPS:
            break
    return s * math.exp(-x + a * math.log(x) - math.lgamma(a))


def _gcf(a, x):
    """Lentz continued fraction for Q(a,x), x >= a+1."""
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, _ITMAX + 1):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        de = d * c
        h *= de
        if abs(de - 1.0) < _EPS:
            break
    return math.exp(-x + a * math.log(x) - math.lgamma(a)) * h


def _gammp_scalar(a, x):
    if x < 0 or a <= 0 or math.isnan(x) or math.isnan(a):
        return float("nan")
    if x == 0:
        return 0.0
    return _gser(a, x) if x < a + 1.0 else 1.0 - _gcf(a, x)


def _gammq_scalar(a, x):
    if x < 0 or a <= 0 or math.isnan(x) or math.isnan(a):
        return float("nan")
    if x == 0:
        return 1.0
    return 1.0 - _gser(a, x) if x < a + 1.0 else _gcf(a, x)


gammp = np.vectorize(_gammp_scalar, otypes=[float])
gammq = np.vectorize(_gammq_scalar, otypes=[float])


def _betacf(a, b, x):
    tiny = 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < tiny:
        d = tiny
    d = 1.0 / d
    h = d
    for m in range(1, _ITMAX + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        de = d * c
        h *= de
        if abs(de - 1.0) < _EPS:
            break
    return h


def _ibeta_scalar(a, b, x):
    """Regularized incomplete beta I_x(a,b)."""
    if math.isnan(x) or x < 0 or x > 1:
        return float("nan")
    if x == 0:
        return 0.0
    if x == 1:
        return 1.0
    ln = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log1p(-x)
    )
    if x < (a + 1.0) / (a + b + 2.0):
        return math.exp(ln) * _betacf(a, b, x) / a
    return 1.0 - math.exp(ln) * _betacf(b, a, 1.0 - x) / b


ibeta = np.vectorize(_ibeta_scalar, otypes=[float])


# ---------------------------------------------------------------------- #
# normal (ref functions.py pnorm:2714, qnorm:2840, dnorm:746)
# ---------------------------------------------------------------------- #
def pnorm(x, mu=0.0, sigma=1.0, lower_tail=True, log_p=False):
    z = (np.asarray(x, dtype=float) - mu) / sigma
    # each tail computed directly via erfc — 1 - lower would cancel to
    # exactly 0 for z ≳ 8 (commons-math keeps extreme-tail accuracy)
    p = 0.5 * _erfc(-z / math.sqrt(2.0)) if lower_tail else 0.5 * _erfc(z / math.sqrt(2.0))
    return np.log(p) if log_p else p


def dnorm(x, mu=0.0, sigma=1.0, log_p=False):
    z = (np.asarray(x, dtype=float) - mu) / sigma
    ld = -0.5 * z * z - math.log(sigma * math.sqrt(2 * math.pi))
    return ld if log_p else np.exp(ld)


# Acklam's rational approximation for the inverse normal CDF, refined
# with one Halley step → ~1e-15 relative error.
_A = [-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
      1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00]
_B = [-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
      6.680131188771972e01, -1.328068155288572e01]
_C = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
      -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00]
_D = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
      3.754408661907416e00]


def _qnorm_scalar(p):
    if math.isnan(p) or p < 0 or p > 1:
        return float("nan")
    if p == 0:
        return -math.inf
    if p == 1:
        return math.inf
    p_low, p_high = 0.02425, 1 - 0.02425
    if p < p_low:
        q = math.sqrt(-2 * math.log(p))
        x = (((((_C[0] * q + _C[1]) * q + _C[2]) * q + _C[3]) * q + _C[4]) * q + _C[5]) / (
            (((_D[0] * q + _D[1]) * q + _D[2]) * q + _D[3]) * q + 1
        )
    elif p <= p_high:
        q = p - 0.5
        r = q * q
        x = (((((_A[0] * r + _A[1]) * r + _A[2]) * r + _A[3]) * r + _A[4]) * r + _A[5]) * q / (
            ((((_B[0] * r + _B[1]) * r + _B[2]) * r + _B[3]) * r + _B[4]) * r + 1
        )
    else:
        q = math.sqrt(-2 * math.log1p(-p))
        x = -(((((_C[0] * q + _C[1]) * q + _C[2]) * q + _C[3]) * q + _C[4]) * q + _C[5]) / (
            (((_D[0] * q + _D[1]) * q + _D[2]) * q + _D[3]) * q + 1
        )
    # one Halley refinement
    e = 0.5 * math.erfc(-x / math.sqrt(2)) - p
    u = e * math.sqrt(2 * math.pi) * math.exp(x * x / 2)
    return x - u / (1 + x * u / 2)


def qnorm(p, mu=0.0, sigma=1.0, lower_tail=True):
    p = np.asarray(p, dtype=float)
    if not lower_tail:
        p = 1.0 - p
    return mu + sigma * np.vectorize(_qnorm_scalar, otypes=[float])(p)


# ---------------------------------------------------------------------- #
# chi-squared / gamma / poisson / t / F / beta
# ---------------------------------------------------------------------- #
def pchisqtail(x, df, lower_tail=False):
    """Upper-tail chi²; ref functions.py:810 (pchisqtail default upper)."""
    x, df = np.asarray(x, dtype=float), np.asarray(df, dtype=float)
    return gammp(df / 2.0, x / 2.0) if lower_tail else gammq(df / 2.0, x / 2.0)


def qchisqtail(p, df, lower_tail=False):
    """Inverse upper-tail chi² via bracketed bisection + Newton polish."""

    def solve(pp, dd):
        if math.isnan(pp) or pp <= 0 or pp > 1:
            return float("nan")
        target = 1.0 - pp if not lower_tail else pp
        lo, hi = 0.0, max(10.0, dd)
        while _gammp_scalar(dd / 2, hi / 2) < target and hi < 1e10:
            hi *= 2
        for _ in range(200):
            mid = (lo + hi) / 2
            if _gammp_scalar(dd / 2, mid / 2) < target:
                lo = mid
            else:
                hi = mid
            if hi - lo < 1e-12 * max(1.0, hi):
                break
        return (lo + hi) / 2

    return np.vectorize(solve, otypes=[float])(p, df)


def qgamma(p, shape, scale=1.0, lower_tail=True):
    """Inverse gamma CDF (ref functions.py qgamma) — bracketed bisection
    on the per-tail regularized incomplete gamma kernels."""

    def solve(pp, aa):
        if math.isnan(pp) or pp <= 0 or pp >= 1:
            return float("nan") if (pp != 0 and pp != 1) else (0.0 if (pp == 0) == lower_tail else float("inf"))
        target = pp if lower_tail else 1.0 - pp
        lo, hi = 0.0, max(10.0, aa * 4.0)
        while _gammp_scalar(aa, hi) < target and hi < 1e12:
            hi *= 2
        for _ in range(200):
            mid = (lo + hi) / 2
            if _gammp_scalar(aa, mid) < target:
                lo = mid
            else:
                hi = mid
            if hi - lo < 1e-13 * max(1.0, hi):
                break
        return (lo + hi) / 2

    return np.vectorize(solve, otypes=[float])(p, shape) * scale


def pgamma(x, shape, scale=1.0, lower_tail=True):
    # each tail via its own kernel — no 1-p cancellation in the far tail
    x = np.asarray(x, dtype=float)
    return gammp(shape, x / scale) if lower_tail else gammq(shape, x / scale)


def dgamma(x, shape, scale=1.0, log_p=False):
    x = np.asarray(x, dtype=float)
    ld = (
        (shape - 1) * np.log(x)
        - x / scale
        - _lgamma(shape)
        - shape * math.log(scale)
    )
    return ld if log_p else np.exp(ld)


def dbeta(x, a, b):
    x = np.asarray(x, dtype=float)
    return np.exp(
        (a - 1) * np.log(x)
        + (b - 1) * np.log1p(-x)
        + _lgamma(a + b)
        - _lgamma(a)
        - _lgamma(b)
    )


def dpois(k, lamb, log_p=False):
    k = np.asarray(k, dtype=float)
    ld = k * np.log(lamb) - lamb - _lgamma(k + 1.0)
    return ld if log_p else np.exp(ld)


def ppois(k, lamb, lower_tail=True):
    """P(X ≤ k) = Q(k+1, λ); P(X > k) = P(k+1, λ) — direct per-tail
    kernels avoid 1-p cancellation."""
    k = np.floor(np.asarray(k, dtype=float))
    lamb = np.asarray(lamb, dtype=float)
    return gammq(k + 1.0, lamb) if lower_tail else gammp(k + 1.0, lamb)


def qpois(p, lamb, lower_tail=True):
    def solve(pp, ll):
        if math.isnan(pp) or pp < 0 or pp > 1:
            return -1
        target = pp if lower_tail else 1.0 - pp
        if ll < 30.0:
            # direct summation is exact and exp(-λ) doesn't underflow
            k, cdf = 0, math.exp(-ll)
            pmf = math.exp(-ll)
            while cdf < target - 1e-12 and k < 10**9:
                k += 1
                pmf *= ll / k
                cdf += pmf
            return k
        # large λ: exp(-λ) underflows, so seed with the Wilson–Hilferty /
        # Cornish–Fisher normal approximation and refine against the
        # stable regularized-gamma CDF P(X ≤ k) = Q(k+1, λ)
        z = float(qnorm(min(max(target, 1e-300), 1 - 1e-16)))
        k = max(0, int(math.floor(ll + z * math.sqrt(ll) + (z * z - 1.0) / 6.0)))

        def cdf_at(kk: int) -> float:
            return float(gammq(kk + 1.0, ll))

        while k > 0 and cdf_at(k - 1) >= target - 1e-12:
            k -= 1
        while cdf_at(k) < target - 1e-12:
            k += 1
        return k

    return np.vectorize(solve, otypes=[int])(p, lamb)


def pT(t, df, lower_tail=True):
    """Student t CDF via incomplete beta (ref functions.py:2954 pT)."""
    t = np.asarray(t, dtype=float)
    df = np.asarray(df, dtype=float)
    x = df / (df + t * t)
    tail = 0.5 * ibeta(df / 2.0, 0.5, x)  # P(T > |t|)
    # pick the small-tail expression directly (no 1-(1-tail) cancellation)
    if lower_tail:
        return np.where(t > 0, 1.0 - tail, tail)
    return np.where(t > 0, tail, 1.0 - tail)


def pF(x, df1, df2, lower_tail=True):
    x = np.asarray(x, dtype=float)
    if lower_tail:
        return ibeta(df1 / 2.0, df2 / 2.0, df1 * x / (df1 * x + df2))
    # complement identity I_x(a,b) = 1 - I_{1-x}(b,a): direct upper tail
    return ibeta(df2 / 2.0, df1 / 2.0, df2 / (df1 * x + df2))


def phyper(k, K, N, n, lower_tail=True):
    """P(X ≤ k), X ~ Hypergeom(N total, K successes, n draws)."""

    def solve(kk, KK, NN, nn):
        kk = int(kk)
        lo = max(0, nn - (NN - KK))
        hi = min(nn, KK)
        if kk < lo:
            return 0.0 if lower_tail else 1.0
        if kk >= hi:
            return 1.0 if lower_tail else 0.0
        tot = 0.0
        denom = math.lgamma(NN + 1) - math.lgamma(nn + 1) - math.lgamma(NN - nn + 1)
        for i in range(lo, kk + 1):
            tot += math.exp(
                math.lgamma(KK + 1)
                - math.lgamma(i + 1)
                - math.lgamma(KK - i + 1)
                + math.lgamma(NN - KK + 1)
                - math.lgamma(nn - i + 1)
                - math.lgamma(NN - KK - nn + i + 1)
                - denom
            )
        return min(1.0, tot) if lower_tail else max(0.0, 1.0 - tot)

    return np.vectorize(solve, otypes=[float])(k, K, N, n)


# ---------------------------------------------------------------------- #
# exact tests (driver/finalizer-side; ref functions.py binom_test:2258,
# fisher_exact_test:1030, chi_squared_test:848, hardy_weinberg_test:1193)
# ---------------------------------------------------------------------- #
def binom_test(k: int, n: int, p: float, alternative: str = "two.sided") -> float:
    def pmf(i):
        return math.exp(
            math.lgamma(n + 1)
            - math.lgamma(i + 1)
            - math.lgamma(n - i + 1)
            + i * math.log(p)
            + (n - i) * math.log1p(-p)
        )

    if alternative in ("greater",):
        return float(min(1.0, sum(pmf(i) for i in range(k, n + 1))))
    if alternative in ("less",):
        return float(min(1.0, sum(pmf(i) for i in range(0, k + 1))))
    if alternative not in ("two.sided", "two-sided"):
        raise ValueError(alternative)
    pk = pmf(k) * (1 + 1e-7)
    return float(min(1.0, sum(pmf(i) for i in range(0, n + 1) if pmf(i) <= pk)))


def fisher_exact_test(a: int, b: int, c: int, d: int) -> dict:
    """2×2 Fisher exact test (ref functions.py:1145 doctests): p_value
    + CONDITIONAL-MLE odds ratio and exact 95% CI, R fisher.test's
    convention (the reference's FisherExactTest.scala mirrors R)."""
    n = a + b + c + d
    row1, col1 = a + b, a + c
    lo = max(0, row1 + col1 - n)
    hi = min(row1, col1)

    def lpmf(x):
        return (
            math.lgamma(row1 + 1)
            - math.lgamma(x + 1)
            - math.lgamma(row1 - x + 1)
            + math.lgamma(n - row1 + 1)
            - math.lgamma(col1 - x + 1)
            - math.lgamma(n - row1 - col1 + x + 1)
            - (math.lgamma(n + 1) - math.lgamma(col1 + 1) - math.lgamma(n - col1 + 1))
        )

    p_obs = math.exp(lpmf(a)) * (1 + 1e-7)
    p = sum(math.exp(lpmf(x)) for x in range(lo, hi + 1) if math.exp(lpmf(x)) <= p_obs)

    # conditional MLE odds ratio + exact CI — R fisher.test's convention
    # (the reference's FisherExactTest mirrors R): psi maximizing the
    # noncentral hypergeometric likelihood / bounding its tails
    support = np.arange(lo, hi + 1)
    base = np.array([lpmf(int(x)) for x in support])

    def nch(logpsi):
        w = base + support * logpsi
        w -= w.max()
        w = np.exp(w)
        return w / w.sum()

    def mean_at(logpsi):
        return float((nch(logpsi) * support).sum())

    def solve(fn, target, lo_=-50.0, hi_=50.0, tol=1e-12):
        # fn monotone increasing in logpsi
        flo, fhi = fn(lo_), fn(hi_)
        if target <= flo:
            return lo_
        if target >= fhi:
            return hi_
        for _ in range(200):
            mid = 0.5 * (lo_ + hi_)
            if fn(mid) < target:
                lo_ = mid
            else:
                hi_ = mid
            if hi_ - lo_ < tol:
                break
        return 0.5 * (lo_ + hi_)

    if a == hi:
        odds = float("inf") if a > lo else float("nan")
    elif a == lo:
        odds = 0.0
    else:
        odds = math.exp(solve(mean_at, float(a)))

    def upper_tail(logpsi):  # P(X >= a), increasing in psi
        w = nch(logpsi)
        return float(w[support >= a].sum())

    def lower_tail_neg(logpsi):  # -P(X <= a), increasing in psi
        w = nch(logpsi)
        return -float(w[support <= a].sum())

    alpha = 0.025
    ci_lo = 0.0 if a == lo else math.exp(solve(upper_tail, alpha))
    ci_hi = float("inf") if a == hi else math.exp(solve(lower_tail_neg, -alpha))
    return {
        "p_value": float(min(1.0, p)),
        "odds_ratio": float(odds),
        "ci_95_lower": float(ci_lo),
        "ci_95_upper": float(ci_hi),
    }


def chi_squared_test(a: int, b: int, c: int, d: int) -> dict:
    n = a + b + c + d
    e_a, e_b = (a + b) * (a + c) / n, (a + b) * (b + d) / n
    e_c, e_d = (c + d) * (a + c) / n, (c + d) * (b + d) / n
    stat = sum(
        (o - e) ** 2 / e for o, e in ((a, e_a), (b, e_b), (c, e_c), (d, e_d))
    )
    return {
        "p_value": float(_gammq_scalar(0.5, stat / 2.0)),
        "odds_ratio": float((a * d) / (b * c)) if b * c > 0 else float("inf"),
    }


def contingency_table_test(a: int, b: int, c: int, d: int, min_cell_count: int = 5) -> dict:
    if min(a, b, c, d) < min_cell_count:
        return fisher_exact_test(a, b, c, d)
    return chi_squared_test(a, b, c, d)


def hardy_weinberg_test(
    n_hom_ref: int, n_het: int, n_hom_var: int, one_sided: bool = False
) -> dict:
    """Wigginton et al. 2005 exact HWE test (the algorithm the
    reference's HWE aggregator implements; ref functions.py:1193).
    ``one_sided=True`` returns the mid-p excess-heterozygosity test
    (min(0.5, P(N_het > obs) + P(N_het = obs)/2)) as the p_value, like
    the reference's ``one_sided`` flag; ``hardy_weinberg_full`` exposes
    both at once for variant_qc."""
    n_rare = 2 * min(n_hom_ref, n_hom_var) + n_het
    n = n_hom_ref + n_het + n_hom_var
    if n == 0:
        nan = float("nan")
        return {"het_freq_hwe": nan, "p_value": nan}
    probs = np.zeros(n_rare + 1)
    mid = n_rare * (2 * n - n_rare) // (2 * n)
    if (mid % 2) != (n_rare % 2):
        mid += 1
    probs[mid] = 1.0
    het, total = mid, 1.0
    hom_r = (n_rare - mid) // 2
    hom_c = n - het - hom_r
    while het > 1:
        probs[het - 2] = probs[het] * het * (het - 1.0) / (4.0 * (hom_r + 1.0) * (hom_c + 1.0))
        total += probs[het - 2]
        het -= 2
        hom_r += 1
        hom_c += 1
    het, hom_r, hom_c = mid, (n_rare - mid) // 2, n - mid - (n_rare - mid) // 2
    while het <= n_rare - 2:
        probs[het + 2] = (
            probs[het] * 4.0 * hom_r * hom_c / ((het + 2.0) * (het + 1.0))
        )
        total += probs[het + 2]
        het += 2
        hom_r -= 1
        hom_c -= 1
    probs /= total
    # n_rare = 2*min_hom + n_het ≥ n_het always, so n_het indexes probs.
    # Both tests are MID-p like the reference (LeveneHaldane.scala:62,68
    # exactMidP/rightMidP): bins with the observed bin's probability
    # count half.
    p_obs = probs[n_het]
    less = probs[probs < p_obs * (1 - 1e-9)].sum()
    eq = probs[np.abs(probs - p_obs) <= p_obs * 1e-9].sum()
    p = float(min(1.0, less + 0.5 * eq))
    # expected het frequency = mean of the Levene–Haldane distribution
    het_freq = float(np.dot(np.arange(n_rare + 1), probs) / n)
    p_hi = float(probs[n_het + 1 :].sum() + 0.5 * p_obs)
    if one_sided:
        return {"het_freq_hwe": het_freq, "p_value": p_hi}
    return {"het_freq_hwe": het_freq, "p_value": p}


def hardy_weinberg_full(n_hom_ref: int, n_het: int, n_hom_var: int) -> dict:
    """het_freq_hwe + two-sided p + one-sided excess-het mid-p in one
    distribution build (the variant_qc finalizer shape, ref qc.py:219
    p_value_hwe / p_value_excess_het)."""
    two = hardy_weinberg_test(n_hom_ref, n_het, n_hom_var)
    one = hardy_weinberg_test(n_hom_ref, n_het, n_hom_var, one_sided=True)
    return {
        "het_freq_hwe": two["het_freq_hwe"],
        "p_value_hwe": two["p_value"],
        "p_value_excess_het": one["p_value"],
    }


def pgenchisq(q, w, max_u: float = 200.0, n_points: int = 20001):
    """Upper-tail CDF of a weighted sum of independent chi-square(1)
    variables Q = sum_i w_i X_i, X_i ~ chisq(1) — Imhof's (1961)
    numerical inversion of the characteristic function (the reference's
    `hl.pgenchisq` / Davies algorithm, functions.py:6660, implemented
    here from the published formula, no external dependency):

        P(Q > q) = 1/2 + (1/pi) * int_0^inf sin(theta(u)) / (u rho(u)) du
        theta(u) = (1/2) sum_i atan(w_i u) - q u / 2
        rho(u)   = prod_i (1 + w_i^2 u^2)^(1/4)

    Trapezoid quadrature on [0, max_u]; the integrand decays like
    1/(u rho(u)) so accuracy ~1e-6 for typical SKAT eigenvalue spreads.
    """
    w = np.asarray(w, dtype=float)
    w = w[np.abs(w) > 1e-300]
    if w.size == 0:
        return 1.0 if q <= 0 else 0.0
    # scale for numerical conditioning: P(Q>q) = P(Q/s > q/s)
    s = np.max(np.abs(w))
    w, q = w / s, q / s
    u = np.linspace(1e-8, max_u, n_points)
    theta = 0.5 * np.sum(np.arctan(w[:, None] * u[None, :]), axis=0) - 0.5 * q * u
    log_rho = 0.25 * np.sum(np.log1p((w[:, None] ** 2) * (u[None, :] ** 2)), axis=0)
    integrand = np.sin(theta) / (u * np.exp(log_rho))
    trapz = getattr(np, "trapezoid", None) or np.trapz
    p = 0.5 + trapz(integrand, u) / np.pi
    return float(np.clip(p, 0.0, 1.0))


# ---------------------------------------------------------------------- #
# Spark column surface — Arrow-batched pandas UDFs
# ---------------------------------------------------------------------- #
def vec_udf(kernel, ret: str = "double"):
    """Wrap an elementwise numpy kernel f(ndarray)->ndarray as a
    vectorized pandas UDF."""

    @pandas_udf(ret)
    def u(*cols: pd.Series) -> pd.Series:
        arrs = [c.to_numpy(dtype=float) for c in cols]
        return pd.Series(kernel(*arrs))

    return u


_UDF_KERNELS = {
    "pnorm_udf": lambda x: pnorm(x),
    "dnorm_udf": lambda x: dnorm(x),
    "qnorm_udf": lambda p: qnorm(p),
    "pchisqtail_udf": lambda x, df: pchisqtail(x, df),
    "qchisqtail_udf": lambda p, df: qchisqtail(p, df),
    "ppois_udf": lambda k, l: ppois(k, l),
    "dpois_udf": lambda k, l: dpois(k, l),
    "pT_udf": lambda t, df: pT(t, df),
    "pF_udf": lambda x, d1, d2: pF(x, d1, d2),
    "pgamma_udf": lambda x, sh, sc: pgamma(x, sh, sc),
}
_udf_cache: dict = {}


def __getattr__(name: str):
    # UDF construction needs an active SparkSession, so build lazily on
    # first column-surface use (module import stays session-free)
    if name in _UDF_KERNELS:
        if name not in _udf_cache:
            _udf_cache[name] = vec_udf(_UDF_KERNELS[name])
        return _udf_cache[name]
    raise AttributeError(name)


def uniroot(f, a: float, b: float, tol: float = 1.22e-4, max_iter: int = 100):
    """Root of a continuous scalar function on [a, b] with a sign change
    (ref functions.py:2954 `hl.uniroot`; same contract as R's uniroot /
    commons-math Brent).  Classic Brent's method, implemented from the
    published algorithm.  Returns None when f(a), f(b) share a sign
    (the reference returns missing)."""
    fa, fb = f(a), f(b)
    if fa == 0:
        return a
    if fb == 0:
        return b
    if fa * fb > 0:
        return None
    c, fc = a, fa
    d = e = b - a
    for _ in range(max_iter):
        if abs(fc) < abs(fb):
            a, b, c = b, c, b
            fa, fb, fc = fb, fc, fb
        m = 0.5 * (c - b)
        tol1 = 2.0 * 2.220446049250313e-16 * abs(b) + 0.5 * tol
        if abs(m) <= tol1 or fb == 0:
            return b
        if abs(e) < tol1 or abs(fa) <= abs(fb):
            d = e = m
        else:
            s = fb / fa
            if a == c:
                p, q = 2.0 * m * s, 1.0 - s
            else:
                q0, r = fa / fc, fb / fc
                p = s * (2.0 * m * q0 * (q0 - r) - (b - a) * (r - 1.0))
                q0 = (q0 - 1.0) * (r - 1.0) * (s - 1.0)
                q = q0
            if p > 0:
                q = -q
            p = abs(p)
            if 2.0 * p < min(3.0 * m * q - abs(tol1 * q), abs(e * q)):
                e, d = d, p / q
            else:
                d = e = m
        a, fa = b, fb
        b += d if abs(d) > tol1 else (tol1 if m > 0 else -tol1)
        fb = f(b)
        if (fb > 0) == (fc > 0):
            c, fc = a, fa
            d = e = b - a
    return b


def cochran_mantel_haenszel_test(a, b, c, d):
    """CMH test for 2x2xK stratified tables (ref functions.py:746
    `hl.cochran_mantel_haenszel_test`; commons-math underneath): chi-sq
    statistic with continuity correction and the common odds-ratio
    estimate.  a,b,c,d: per-stratum cell-count sequences."""
    a = np.asarray(a, dtype=float)
    b = np.asarray(b, dtype=float)
    c = np.asarray(c, dtype=float)
    d = np.asarray(d, dtype=float)
    n = a + b + c + d
    r1, r2 = a + b, c + d
    c1 = a + c
    num = np.sum(a - r1 * c1 / n)
    var = np.sum(r1 * r2 * c1 * (b + d) / (n * n * (n - 1)))
    stat = (abs(num) - 0.5) ** 2 / var if var > 0 else float("nan")
    p = float(pchisqtail(np.array([stat]), 1.0)[0]) if var > 0 else float("nan")
    orr = np.sum(a * d / n) / np.sum(b * c / n) if np.sum(b * c / n) > 0 else float("inf")
    return {"test_statistic": float(stat), "p_value": p, "odds_ratio": float(orr)}


class LinearMixedModel:
    """Reference-parity stub (ref stats/linear_mixed_model.py:1): the
    reference removed LMM support in 0.2.94 and its constructor raises
    exactly like this one."""

    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "LinearMixedModel is no longer implemented/supported as of "
            "Hail 0.2.94 (the reference raises the same error)"
        )
