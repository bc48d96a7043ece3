"""Distribution-function tests pinned against R golden values
(the reference's own test style: fixed numeric expectations, see
SURVEY.md §5 / test_statgen.py)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from hail_spark.expr import stats as st

A = 1e-10  # absolute tolerance vs R


def test_pnorm_qnorm_dnorm():
    # R: pnorm(c(-3,-1,0,0.5,2)) / qnorm / dnorm
    assert np.allclose(
        st.pnorm([-3, -1, 0, 0.5, 2]),
        [0.001349898031630095, 0.158655253931457, 0.5, 0.691462461274013, 0.977249868051821],
        atol=A,
    )
    assert np.allclose(
        st.qnorm([0.001349898031630095, 0.5, 0.977249868051821]), [-3, 0, 2], atol=1e-9
    )
    assert np.allclose(
        st.dnorm([0.0, 1.0]), [0.3989422804014327, 0.24197072451914337], atol=A
    )
    assert st.pnorm(2, lower_tail=False) == pytest.approx(0.0227501319481792, abs=A)
    # round trip over a grid
    p = np.linspace(1e-12, 1 - 1e-12, 101)
    assert np.allclose(st.pnorm(st.qnorm(p)), p, atol=1e-9)


def test_pchisqtail_qchisqtail():
    # R: pchisq(c(1,5,20), df, lower.tail=FALSE)
    assert st.pchisqtail(1.0, 1.0) == pytest.approx(0.317310507862914, abs=A)
    assert st.pchisqtail(5.0, 2.0) == pytest.approx(0.0820849986238988, abs=A)
    assert st.pchisqtail(20.0, 10.0) == pytest.approx(0.0292526880769611, abs=A)
    assert st.qchisqtail(0.05, 1.0) == pytest.approx(3.84145882069412, abs=1e-8)
    assert st.qchisqtail(0.01, 10.0) == pytest.approx(23.2092511589544, abs=1e-8)


def test_poisson():
    # exact: sum_{k<=3} e^-2.5 2.5^k/k!  = 0.7575761331330659
    assert st.ppois(3, 2.5) == pytest.approx(0.7575761331330659, abs=1e-9)
    assert st.dpois(3, 2.5) == pytest.approx(0.213763017249736, abs=A)
    assert int(st.qpois(0.9, 4)) == 7
    assert st.ppois(3, 2.5, lower_tail=False) == pytest.approx(0.2424238668669341, abs=1e-9)


def test_t_and_f():
    # high-precision numeric integration of the t density
    assert st.pT(2.0, 10.0) == pytest.approx(0.9633059826146273, abs=1e-9)
    assert st.pT(-1.5, 5.0) == pytest.approx(0.0969518401212337, abs=1e-9)
    # numeric integration of the F density
    assert st.pF(3.0, 4.0, 20.0) == pytest.approx(0.9567990016657699, abs=1e-9)
    assert st.pF(3.0, 4.0, 20.0, lower_tail=False) == pytest.approx(
        0.0432009983342301, abs=1e-9
    )


def test_gamma_beta():
    # R: pgamma(2, shape=3, scale=1) = 0.3233236; dgamma(2,3,scale=1)=0.2706706
    assert st.pgamma(2.0, 3.0) == pytest.approx(0.323323583816936, abs=A)
    assert st.dgamma(2.0, 3.0) == pytest.approx(0.270670566473225, abs=A)
    # exact: 30 * 0.3 * 0.7^4
    assert st.dbeta(0.3, 2.0, 5.0) == pytest.approx(2.1609000, abs=1e-6)


def test_phyper():
    # exact rational hypergeometric sum, m=10 white / 7 black / 8 draws
    assert st.phyper(2, 10, 17, 8) == pytest.approx(0.0133689839572193, abs=1e-9)


def test_binom_and_fisher():
    # exact rational two-sided binomial sum
    assert st.binom_test(7, 20, 0.5) == pytest.approx(0.2631759643554688, abs=1e-9)
    # exact lower tail
    assert st.binom_test(7, 20, 0.5, "less") == pytest.approx(0.1315879821777344, abs=1e-9)
    # exact rational Fisher 2x2 sum
    r = st.fisher_exact_test(8, 2, 1, 5)
    assert r["p_value"] == pytest.approx(0.0349650349650350, abs=1e-9)
    # stat = 1.0101..., p = erfc(sqrt(stat/2)), no continuity correction
    c = st.chi_squared_test(20, 30, 25, 25)
    assert c["p_value"] == pytest.approx(0.3148786413364199, abs=1e-9)
    # contingency_table_test routes small cells to fisher
    assert st.contingency_table_test(8, 2, 1, 5, min_cell_count=5)["p_value"] == pytest.approx(
        0.0349650349650350, abs=1e-9
    )


def test_hwe():
    # Wigginton et al. 2005 example: 57 hom-ref / 14 het / 50 hom-var
    r = st.hardy_weinberg_test(57, 14, 50)
    assert r["p_value"] < 1e-15  # massively out of HWE
    # equilibrium-ish case: 25 / 50 / 25
    r2 = st.hardy_weinberg_test(25, 50, 25)
    assert r2["p_value"] > 0.5
    assert 0.45 < r2["het_freq_hwe"] < 0.55


def test_spark_udf_surface(spark):
    df = spark.range(1, 6).select(
        (F.col("id").cast("double") - 3.0).alias("z"),
        F.col("id").cast("double").alias("df_"),
    )
    out = df.select(
        st.pnorm_udf("z").alias("p"), st.pchisqtail_udf(F.abs("z") + 1.0, "df_").alias("q")
    ).collect()
    assert out[2]["p"] == pytest.approx(0.5, abs=1e-12)  # z=0
    assert out[0]["p"] == pytest.approx(st.pnorm(-2.0), abs=1e-12)
    assert all(0.0 <= r["q"] <= 1.0 for r in out)


def test_uniroot_brent():
    from hail_spark.expr.stats import uniroot

    import math

    assert uniroot(lambda x: x * x - 2, 0, 2) == pytest.approx(math.sqrt(2), abs=1e-4)
    assert uniroot(lambda x: math.cos(x), 0, 3, tol=1e-10) == pytest.approx(math.pi / 2, abs=1e-8)
    assert uniroot(lambda x: x + 5, 0, 1) is None  # no sign change → missing


def test_cochran_mantel_haenszel():
    from hail_spark.expr.stats import cochran_mantel_haenszel_test

    # two strata, association in same direction
    res = cochran_mantel_haenszel_test([10, 8], [2, 4], [3, 5], [9, 7])
    assert res["p_value"] < 0.05  # continuity-corrected: ~0.0107
    assert res["odds_ratio"] > 1
    # null-ish: balanced tables
    res0 = cochran_mantel_haenszel_test([5, 5], [5, 5], [5, 5], [5, 5])
    assert res0["p_value"] > 0.5


def test_qgamma_inverts_pgamma():
    from hail_spark.expr.stats import pgamma, qgamma

    for p, a, s in [(0.5, 2.0, 1.0), (0.95, 3.5, 2.0), (0.01, 0.7, 1.3)]:
        x = float(qgamma(p, a, s))
        assert abs(float(pgamma(x, a, s)) - p) < 1e-9
    # R qgamma(0.5, 2, scale=1) = 1.678346990
    assert abs(float(qgamma(0.5, 2.0, 1.0)) - 1.678346990) < 1e-8


def test_fisher_conditional_mle_or_and_ci():
    # reference doctests (functions.py:1145): R fisher.test convention —
    # conditional-MLE odds ratio + exact 95% CI. R's own uniroot
    # tolerance is ~1e-4, so match to 1e-3 relative.
    r = st.fisher_exact_test(10, 10, 10, 10)
    assert r["p_value"] == pytest.approx(1.0, abs=1e-9)
    assert r["odds_ratio"] == pytest.approx(1.0, rel=1e-3)
    assert r["ci_95_lower"] == pytest.approx(0.24385796914260355, rel=1e-3)
    assert r["ci_95_upper"] == pytest.approx(4.100747675033819, rel=1e-3)
    r2 = st.fisher_exact_test(51, 43, 22, 92)
    assert r2["p_value"] == pytest.approx(2.1564999740157304e-07, rel=1e-9)
    assert r2["odds_ratio"] == pytest.approx(4.918058171469967, rel=1e-3)
    assert r2["ci_95_lower"] == pytest.approx(2.5659373368248444, rel=1e-3)
    assert r2["ci_95_upper"] == pytest.approx(9.677929632035475, rel=1e-3)
    # degenerate margins: zero/infinite OR with one-sided CIs
    z = st.fisher_exact_test(0, 10, 10, 10)
    assert z["odds_ratio"] == 0.0 and z["ci_95_lower"] == 0.0
    i = st.fisher_exact_test(10, 0, 0, 10)
    assert i["odds_ratio"] == float("inf") and i["ci_95_upper"] == float("inf")
    # contingency_table_test inherits the fisher fields on the small-cell path
    ct = st.contingency_table_test(51, 43, 22, 92, min_cell_count=23)
    assert ct["odds_ratio"] == pytest.approx(4.918058171469967, rel=1e-3)
