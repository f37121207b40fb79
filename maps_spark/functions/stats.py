"""Exact scalar distributions for serving-time finishers.

The dual-dialect trend SQL (operators/regression.py:trend_sql) keeps
the slope-significance inside the SQL using Hill's t->normal transform
so the value is oracle-reproducible; the reference's JSON endpoint
(vectortile-server RegressionResource.java:351, commons-math
``SimpleRegression.getSignificance()``) uses the exact Student-t CDF.
This module provides the exact form as a driver-side scalar finisher —
the regression itself stays distributed; only the one-row closed-form
p-value is recomputed exactly before the JSON response.

Implementation is the standard continued-fraction evaluation of the
regularized incomplete beta function (Lentz's algorithm; see
Abramowitz & Stegun 26.5.8 and the usual numerical-recipes form) —
pure stdlib math, double precision.
"""

from __future__ import annotations

import math

_MAX_ITER = 300
_EPS = 3e-14
_FPMIN = 1e-300


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (modified Lentz)."""
    qab = a + b
    qap = a + 1.0
    qam = a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < _FPMIN:
        d = _FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, _MAX_ITER + 1):
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
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            return h
    return h  # converged to double precision long before this in practice


def betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b), 0 <= x <= 1."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
                + a * math.log(x) + b * math.log1p(-x))
    front = math.exp(ln_front)
    # use the symmetry that keeps the continued fraction convergent
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def t_sf_two_sided(t: float, df: float) -> float:
    """Two-sided Student-t tail P(|T_df| >= |t|) — the exact
    significance of a regression slope (t = slope / stderr at n-2 df),
    matching commons-math ``TDistribution``:
    ``P = I_{df/(df+t^2)}(df/2, 1/2)``."""
    if df <= 0:
        return float("nan")
    if t == 0.0:
        return 1.0
    if math.isinf(t):
        return 0.0
    x = df / (df + t * t)
    return betainc_reg(df / 2.0, 0.5, x)


def slope_significance(slope: float, slope_stderr: float,
                       n: int) -> float:
    """Exact two-sided p-value of a fitted slope
    (``SimpleRegression.getSignificance()`` semantics)."""
    if slope_stderr is None or slope_stderr <= 0 or n is None or n < 3:
        return float("nan")
    return t_sf_two_sided(abs(slope) / slope_stderr, n - 2)
