"""Library-free special functions for p-values — regularized incomplete
beta (Student-t CDF) and regularized incomplete gamma (chi-square
survival), so ``welch_ttest`` / ``chi2_independence`` can return an
actual ``p_value`` without scipy (not in the runtime image).

Classic Numerical-Recipes-style formulations (continued fraction via
modified Lentz, power series for the gamma lower tail), driven to
~3e-16 relative convergence — pinned to 1e-10 against closed forms in
tests/test_special.py (t with df∈{1,2} and chi² with k∈{1,2,4} have
exact elementary/erfc expressions; integer-parameter incomplete beta is
a finite binomial sum). Pure ``math``-module scalar code: callers wrap
it in an Arrow-vectorized ``pandas_udf`` (see functions/stats.py) so the
per-row cost stays off the hot path — these run on 1-row statistic
frames, not fact tables.

Reference parity: the reference's analysis notebooks lean on
scipy.stats for significance; this module is the dependency-free
re-expression (same definitions: two-sided t p-value
``I_{df/(df+t²)}(df/2, ½)``, chi² p-value ``Q(k/2, x/2)``).
"""

from __future__ import annotations

from math import exp, lgamma, log, log1p

_EPS = 3e-16
_FPMIN = 1e-300
_MAXIT = 500


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (modified Lentz)."""
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < _FPMIN:
        d = _FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, _MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        delt = d * c
        h *= delt
        if abs(delt - 1.0) < _EPS:
            break
    return h


def betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b) for a, b > 0, 0 ≤ x ≤ 1."""
    if a <= 0 or b <= 0:
        raise ValueError(f"betainc_reg needs a, b > 0, got a={a} b={b}")
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        lgamma(a + b) - lgamma(a) - lgamma(b) + a * log(x) + b * log1p(-x)
    )
    front = exp(ln_front)
    # use the CF on the side where it converges fast, symmetry elsewhere
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def reg_gamma_p(s: float, x: float) -> float:
    """Regularized lower incomplete gamma P(s, x), s > 0, x ≥ 0."""
    if s <= 0:
        raise ValueError(f"reg_gamma_p needs s > 0, got {s}")
    if x < 0:
        raise ValueError(f"reg_gamma_p needs x >= 0, got {x}")
    if x == 0.0:
        return 0.0
    if x < s + 1.0:
        # power series around 0
        ap = s
        summ = 1.0 / s
        delt = summ
        for _ in range(_MAXIT):
            ap += 1.0
            delt *= x / ap
            summ += delt
            if abs(delt) < abs(summ) * _EPS:
                break
        return summ * exp(-x + s * log(x) - lgamma(s))
    return 1.0 - _gamma_q_cf(s, x)


def _gamma_q_cf(s: float, x: float) -> float:
    """Upper regularized gamma Q(s, x) by continued fraction (x ≥ s+1)."""
    b = x + 1.0 - s
    c = 1.0 / _FPMIN
    d = 1.0 / b
    h = d
    for i in range(1, _MAXIT):
        an = -i * (i - s)
        b += 2.0
        d = an * d + b
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = b + an / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        delt = d * c
        h *= delt
        if abs(delt - 1.0) < _EPS:
            break
    return exp(-x + s * log(x) - lgamma(s)) * h


def reg_gamma_q(s: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(s, x) = 1 − P(s, x)."""
    if x < s + 1.0:
        return 1.0 - reg_gamma_p(s, x)
    return _gamma_q_cf(s, x)


def student_t_sf_two_sided(t: float, df: float) -> float:
    """Two-sided Student-t p-value P(|T| ≥ |t|) = I_{df/(df+t²)}(df/2, ½)."""
    if df <= 0:
        raise ValueError(f"student_t_sf_two_sided needs df > 0, got {df}")
    return betainc_reg(df / 2.0, 0.5, df / (df + t * t))


def chi2_sf(x: float, k: float) -> float:
    """Chi-square survival P(X ≥ x) with k degrees of freedom = Q(k/2, x/2)."""
    if k <= 0:
        raise ValueError(f"chi2_sf needs k > 0, got {k}")
    if x <= 0:
        return 1.0
    return reg_gamma_q(k / 2.0, x / 2.0)
