"""Shapiro-Wilk normality test (Royston 1995, AS R94) and the reference's
Monte-Carlo variant.

The reference calls scipy.stats.shapiro for ESD routing (catch.py:1718)
and scipy.stats.monte_carlo_test(data, rvs=norm.rvs,
statistic=shapiro_W, alternative='greater', n_resamples=10000) for the
STL/MSTL dispersion-method gate (catch.py:1168-1187). Neither scipy nor
statsmodels exists in this sandbox; W and its p-value are implemented
from the published AS R94 algorithm, and the Monte-Carlo null
distribution of W is precomputed per series length from a seeded
generator (SURVEY.md K6: deterministic, broadcastable).
"""

from __future__ import annotations

import math

import numpy as np

from .special import norm_ppf, norm_sf

# polynomial coefficients from AS R94 (Royston 1995), low order first
_C1 = [0.0, 0.221157, -0.147981, -2.071190, 4.434685, -2.706056]
_C2 = [0.0, 0.042981, -0.293762, -1.752461, 5.682633, -3.582633]
_C3 = [0.5440, -0.39978, 0.025054, -6.714e-4]
_C4 = [1.3822, -0.77857, 0.062767, -0.0020322]
_C5 = [-1.5861, -0.31082, -0.083751, 0.0038915]
_C6 = [-0.4803, -0.082676, 0.0030302]


def _poly(c, x):
    r = 0.0
    for coef in reversed(c):
        r = r * x + coef
    return r


def _sw_weights(n: int) -> np.ndarray:
    """AS R94 coefficient vector a (length n, antisymmetric)."""
    if n < 3:
        raise ValueError("need at least 3 observations")
    m = norm_ppf((np.arange(1, n + 1) - 0.375) / (n + 0.25))
    ssm = float(np.sum(m * m))
    rsn = 1.0 / math.sqrt(n)
    a = m / math.sqrt(ssm)
    if n > 5:
        # a_n and a_{n-1} per AS R94
        an = _poly(_C1, rsn) + a[-1]
        an1 = _poly(_C2, rsn) + a[-2]
        phi = (ssm - 2.0 * m[-1] ** 2 - 2.0 * m[-2] ** 2) / (
            1.0 - 2.0 * an ** 2 - 2.0 * an1 ** 2)
        a = m / math.sqrt(phi)
        a[-1], a[-2] = an, an1
        a[0], a[1] = -an, -an1
    elif n > 3:
        an = _poly(_C1, rsn) + a[-1]
        phi = (ssm - 2.0 * m[-1] ** 2) / (1.0 - 2.0 * an ** 2)
        a = m / math.sqrt(phi)
        a[-1] = an
        a[0] = -an
    return a


def shapiro_w(x: np.ndarray) -> float:
    """Shapiro-Wilk W statistic."""
    x = np.sort(np.asarray(x, dtype=np.float64))
    n = x.shape[0]
    a = _sw_weights(n)
    xm = x - x.mean()
    denom = float(np.sum(xm * xm))
    if denom == 0.0:
        return 1.0
    num = float(np.dot(a, x))
    return num * num / denom


def _shapiro_pvalue(w: float, n: int) -> float:
    if n == 3:
        pi6, stqr = 6.0 / math.pi, math.asin(math.sqrt(0.75))
        p = pi6 * (math.asin(math.sqrt(w)) - stqr)
        return min(max(p, 0.0), 1.0)
    if n <= 11:
        gamma = -2.273 + 0.459 * n
        if gamma - math.log(1.0 - w) <= 0:
            return 1e-99
        g = -math.log(gamma - math.log(1.0 - w))
        mu = _poly(_C3, float(n))
        sigma = math.exp(_poly(_C4, float(n)))
    else:
        u = math.log(n)
        g = math.log(1.0 - w)
        mu = _poly(_C5, u)
        sigma = math.exp(_poly(_C6, u))
    if sigma <= 0:
        return 1.0
    z = (g - mu) / sigma
    return float(norm_sf(z))


def shapiro(x: np.ndarray) -> tuple[float, float]:
    """(W, p) like scipy.stats.shapiro — used for ESD routing (catch.py:1718)."""
    w = shapiro_w(x)
    n = len(np.asarray(x))
    return w, _shapiro_pvalue(w, n)


def shapiro_w_batch(samples: np.ndarray) -> np.ndarray:
    """W statistic for each row of a (k, n) matrix — vectorized null table."""
    s = np.sort(np.asarray(samples, dtype=np.float64), axis=1)
    n = s.shape[1]
    a = _sw_weights(n)
    num = s @ a
    sm = s - s.mean(axis=1, keepdims=True)
    denom = np.einsum("ij,ij->i", sm, sm)
    with np.errstate(divide="ignore", invalid="ignore"):
        w = num * num / denom
    return np.where(denom == 0.0, 1.0, w)


_NULL_CACHE: dict[int, np.ndarray] = {}
N_RESAMPLES = 10_000
_NULL_SEED = 20240101


def shapiro_null_table(n: int, n_resamples: int = N_RESAMPLES) -> np.ndarray:
    """Seeded null distribution of W for samples of size n ~ N(0,1).

    Deterministic per n, so executors regenerate identical tables; for
    large n the sampling is chunked to bound memory.
    """
    key = n
    cached = _NULL_CACHE.get(key)
    if cached is not None:
        return cached
    rng = np.random.default_rng(_NULL_SEED + n)
    chunk = max(1, min(n_resamples, int(2e7 // max(n, 1))))
    parts = []
    done = 0
    while done < n_resamples:
        k = min(chunk, n_resamples - done)
        parts.append(shapiro_w_batch(rng.standard_normal((k, n))))
        done += k
    table = np.concatenate(parts)
    table.sort()
    if len(_NULL_CACHE) < 64:  # bound worker memory
        _NULL_CACHE[key] = table
    return table


def monte_carlo_shapiro_pvalue(x: np.ndarray) -> tuple[float, float]:
    """(W, p) per scipy.stats.monte_carlo_test(..., alternative='greater').

    p = (#{null W >= observed W} + 1) / (n_resamples + 1) — the exact
    semantics of the reference gate at catch.py:1168-1187, including its
    counter-intuitive direction (low W ⇒ p near 1 ⇒ z-score path).
    """
    x = np.asarray(x, dtype=np.float64)
    w = shapiro_w(x)
    table = shapiro_null_table(len(x))
    ge = len(table) - int(np.searchsorted(table, w, side="left"))
    p = (ge + 1.0) / (len(table) + 1.0)
    return w, p
