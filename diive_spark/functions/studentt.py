"""Exact Student-t quantiles in pure numpy (no scipy in the runtime).

The reference computes prediction-band t quantiles with
``scipy.stats.t.ppf`` (diive/core/dfun/fits.py:123); this module
reproduces it from first principles so fit bands stay exact:

- regularized incomplete beta I_x(a, b) via the standard continued
  fraction (Lentz's algorithm — the classic public-domain numerical
  method, see Numerical Recipes §6.4 / DLMF 8.17.22), vectorized;
- t CDF through the identity  F(t; nu) = 1 - I_{nu/(nu+t^2)}(nu/2, 1/2)/2
  for t >= 0;
- t PPF by monotone bisection on the CDF to ~1e-12.

Everything is deterministic float64 numpy — safe inside Arrow pandas
UDFs over per-key fit tables (O(keys) rows, never the data path).
"""

from __future__ import annotations

import math

import numpy as np

_MAX_ITER = 300
_EPS = 3e-16
_FPMIN = 1e-300


def _betacf(a, b, x):
    """Continued fraction for the incomplete beta (vectorized Lentz)."""
    a = np.asarray(a, dtype="float64")
    b = np.asarray(b, dtype="float64")
    x = np.asarray(x, dtype="float64")
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = np.ones_like(x)
    d = 1.0 - qab * x / qap
    d = np.where(np.abs(d) < _FPMIN, _FPMIN, d)
    d = 1.0 / d
    h = d.copy()
    for m in range(1, _MAX_ITER + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        d = np.where(np.abs(d) < _FPMIN, _FPMIN, d)
        c = 1.0 + aa / c
        c = np.where(np.abs(c) < _FPMIN, _FPMIN, c)
        d = 1.0 / d
        h = h * d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        d = np.where(np.abs(d) < _FPMIN, _FPMIN, d)
        c = 1.0 + aa / c
        c = np.where(np.abs(c) < _FPMIN, _FPMIN, c)
        d = 1.0 / d
        delta = d * c
        h = h * delta
        if np.all(np.abs(delta - 1.0) < _EPS):
            break
    return h


def betainc_reg(a, b, x):
    """Regularized incomplete beta I_x(a, b), vectorized."""
    a = np.asarray(a, dtype="float64")
    b = np.asarray(b, dtype="float64")
    x = np.asarray(x, dtype="float64")
    x = np.clip(x, 0.0, 1.0)
    ln_front = (
        np.vectorize(math.lgamma)(a + b)
        - np.vectorize(math.lgamma)(a)
        - np.vectorize(math.lgamma)(b)
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        front = np.exp(ln_front + a * np.log(x) + b * np.log1p(-x))
    # use the symmetric form whichever side converges fast
    use_direct = x < (a + 1.0) / (a + b + 2.0)
    direct = np.where(
        use_direct, front * _betacf(a, b, np.where(use_direct, x, 0.5)) / a, 0.0
    )
    mirror = np.where(
        ~use_direct,
        1.0 - front * _betacf(b, a, np.where(~use_direct, 1.0 - x, 0.5)) / b,
        0.0,
    )
    out = np.where(use_direct, direct, mirror)
    out = np.where(x <= 0.0, 0.0, out)
    out = np.where(x >= 1.0, 1.0, out)
    return out


def t_cdf(t, nu):
    """Student-t CDF, vectorized over both arguments."""
    t = np.asarray(t, dtype="float64")
    nu = np.asarray(nu, dtype="float64")
    xbeta = nu / (nu + t * t)
    tail = 0.5 * betainc_reg(nu / 2.0, 0.5, xbeta)
    return np.where(t >= 0.0, 1.0 - tail, tail)


def t_ppf(p, nu):
    """Student-t quantile (inverse CDF) by bisection; matches
    ``scipy.stats.t.ppf`` to ~1e-10.  ``p`` in (0, 1), ``nu`` > 0;
    vectorized (broadcasts p against nu)."""
    p = np.atleast_1d(np.asarray(p, dtype="float64"))
    nu = np.atleast_1d(np.asarray(nu, dtype="float64"))
    p, nu = np.broadcast_arrays(p, nu)
    lo = np.full(p.shape, -1e3)
    hi = np.full(p.shape, 1e3)
    # widen bounds for extreme quantiles / tiny dof
    for _ in range(60):
        need_lo = t_cdf(lo, nu) > p
        need_hi = t_cdf(hi, nu) < p
        if not (need_lo.any() or need_hi.any()):
            break
        lo = np.where(need_lo, lo * 8.0, lo)
        hi = np.where(need_hi, hi * 8.0, hi)
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        below = t_cdf(mid, nu) < p
        lo = np.where(below, mid, lo)
        hi = np.where(below, hi, mid)
    out = 0.5 * (lo + hi)
    return np.where(p == 0.5, 0.0, out)   # exact center, no bisection dust
