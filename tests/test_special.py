"""Golden pins for functions/special.py — the library-free incomplete
beta/gamma behind p-values. No scipy in the image, so every golden is a
CLOSED FORM computable with math alone:

- Student t with df=1 is Cauchy (p = 1 − 2·atan(t)/π) and df=2 has the
  elementary CDF ½ + t/(2√(2+t²));
- chi² survival with k=2 is exp(−x/2), k=4 is exp(−x/2)(1+x/2), and
  k=1 is erfc(√(x/2));
- I_x(a, b) with integer a, b is the binomial tail sum
  Σ_{j≥a} C(a+b−1, j) x^j (1−x)^(a+b−1−j).
"""

from __future__ import annotations

from math import atan, comb, erfc, exp, pi, sqrt

import pytest

from financial_big_data_spark.functions.special import (
    betainc_reg,
    chi2_sf,
    reg_gamma_p,
    reg_gamma_q,
    student_t_sf_two_sided,
)


def _binom_tail(a: int, b: int, x: float) -> float:
    n = a + b - 1
    return sum(comb(n, j) * x**j * (1 - x) ** (n - j) for j in range(a, n + 1))


@pytest.mark.parametrize("a,b,x", [
    (2, 3, 0.4), (1, 1, 0.7), (5, 2, 0.9), (3, 7, 0.15), (10, 10, 0.5),
])
def test_betainc_integer_params_binomial_closed_form(a, b, x):
    assert betainc_reg(a, b, x) == pytest.approx(_binom_tail(a, b, x), abs=1e-12)


def test_betainc_symmetry_and_bounds():
    for a, b, x in [(0.5, 0.5, 0.3), (2.5, 7.1, 0.6), (11.0, 0.7, 0.82)]:
        assert betainc_reg(a, b, x) + betainc_reg(b, a, 1 - x) == pytest.approx(
            1.0, abs=1e-12
        )
    assert betainc_reg(3.0, 4.0, 0.0) == 0.0
    assert betainc_reg(3.0, 4.0, 1.0) == 1.0
    with pytest.raises(ValueError):
        betainc_reg(0.0, 1.0, 0.5)


@pytest.mark.parametrize("t", [0.0, 0.5, 1.0, 2.0, 5.0, -3.0])
def test_t_pvalue_df1_is_cauchy(t):
    want = 1.0 - 2.0 * atan(abs(t)) / pi
    assert student_t_sf_two_sided(t, 1.0) == pytest.approx(want, abs=1e-10)


@pytest.mark.parametrize("t", [0.25, 1.0, 2.0, 4.5])
def test_t_pvalue_df2_closed_form(t):
    # CDF(t; df=2) = 1/2 + t / (2*sqrt(2+t^2)) -> two-sided p
    want = 1.0 - t / sqrt(2.0 + t * t)
    assert student_t_sf_two_sided(t, 2.0) == pytest.approx(want, abs=1e-10)


def test_t_pvalue_published_critical_values():
    # t-table: t_(0.025, 10) = 2.228..., t_(0.005, 20) = 2.845...
    assert student_t_sf_two_sided(2.228, 10.0) == pytest.approx(0.05, abs=5e-4)
    assert student_t_sf_two_sided(2.845, 20.0) == pytest.approx(0.01, abs=5e-4)


@pytest.mark.parametrize("x", [0.1, 1.0, 3.84, 10.0, 40.0])
def test_chi2_sf_closed_forms(x):
    assert chi2_sf(x, 2.0) == pytest.approx(exp(-x / 2.0), abs=1e-12)
    assert chi2_sf(x, 4.0) == pytest.approx(
        exp(-x / 2.0) * (1.0 + x / 2.0), abs=1e-12
    )
    assert chi2_sf(x, 1.0) == pytest.approx(erfc(sqrt(x / 2.0)), abs=1e-12)


def test_chi2_published_critical_values():
    # chi2-table: P(X >= 3.841; k=1) = 0.05, P(X >= 9.488; k=4) = 0.05
    assert chi2_sf(3.841, 1.0) == pytest.approx(0.05, abs=5e-4)
    assert chi2_sf(9.488, 4.0) == pytest.approx(0.05, abs=5e-4)


def test_gamma_p_q_complement_both_branches():
    # x < s+1 exercises the series; x >= s+1 the continued fraction
    for s, x in [(3.0, 1.0), (3.0, 10.0), (0.5, 0.2), (0.5, 9.0), (25.0, 24.0)]:
        assert reg_gamma_p(s, x) + reg_gamma_q(s, x) == pytest.approx(1.0, abs=1e-12)
    assert reg_gamma_p(2.0, 0.0) == 0.0
    # P(1, x) = 1 - exp(-x) exactly
    assert reg_gamma_p(1.0, 2.5) == pytest.approx(1.0 - exp(-2.5), abs=1e-12)


def test_edge_inputs():
    assert chi2_sf(0.0, 3.0) == 1.0
    assert student_t_sf_two_sided(0.0, 7.0) == pytest.approx(1.0, abs=1e-12)
    # huge statistic -> p underflows toward 0, never negative/NaN
    p = student_t_sf_two_sided(100.0, 50.0)
    assert 0.0 <= p < 1e-20
    q = chi2_sf(500.0, 3.0)
    assert 0.0 <= q < 1e-50
