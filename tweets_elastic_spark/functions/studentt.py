"""Student's t distribution: two-sided p-value from (t, df).

The one piece of ES's ``t_test`` aggregation that is NOT a distributed
aggregate: the final CDF lookup. All data-dependent work (counts, means,
variances, the t statistic and Welch degrees of freedom) happens JVM-side
in one conditional-aggregation pass (plans/aggs.py); this scalar
transform then runs over the already-reduced BUCKET relation — a handful
of rows — via an Arrow ``pandas_udf``.

The regularized incomplete beta is evaluated with the standard continued
fraction (modified Lentz iteration; the textbook algorithm, e.g.
Abramowitz & Stegun 26.5.8 / DLMF 8.17.22), accurate to ~1e-12 —
far inside the 6-dp rounding every float column here carries.
"""

from __future__ import annotations

import math


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (modified Lentz)."""
    tiny = 1e-30
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < tiny:
        d = tiny
    d = 1.0 / d
    h = d
    for m in range(1, 300):
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
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 3e-14:
            return h
    raise ArithmeticError(f"betacf did not converge for a={a} b={b} x={x}")


def betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if not (0.0 <= x <= 1.0):
        raise ValueError(f"x out of [0,1]: {x}")
    if x == 0.0 or x == 1.0:
        return x
    ln_front = (
        a * math.log(x)
        + b * math.log1p(-x)
        + math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def student_t_two_sided_p(t: float, df: float) -> float:
    """Two-tailed p-value of Student's t: P(|T| >= |t|) with df degrees
    of freedom = I_{df/(df+t^2)}(df/2, 1/2)."""
    if df <= 0:
        raise ValueError(f"df must be > 0, got {df}")
    if math.isnan(t) or math.isnan(df):
        return float("nan")
    x = df / (df + t * t)
    return betainc_reg(df / 2.0, 0.5, x)
