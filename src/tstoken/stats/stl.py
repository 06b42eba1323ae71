"""STL — Seasonal-Trend decomposition using LOESS (Cleveland et al. 1990).

From-scratch NumPy implementation of the algorithm statsmodels wraps
(the original Fortran), with statsmodels' defaults as called at
reference catch.py:1079-1081 (STL(series, seasonal=s, period=p).fit()):
  seasonal_deg = trend_deg = low_pass_deg = 1, jumps = 1,
  trend window  = smallest odd int >= 1.5*period / (1 - 1.5/seasonal),
  low_pass      = smallest odd int > period,
  robust=False → inner_iter=2, outer_iter=0.

Per-iteration steps (paper §2.2 / Fortran stlstp):
  1. detrend                 y - T
  2. cycle-subseries LOESS   each of the `period` subseries smoothed
                             with q=seasonal, extended ±1 cycle → C (n+2p)
  3. low-pass                MA(p)∘MA(p)∘MA(3) on C, then LOESS
                             q=low_pass → L (n)
  4. seasonal                S = C[p:p+n] - L
  5. deseasonalize           y - S
  6. trend                   T = LOESS(y - S, q=trend)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .loess import loess_subseries_extended, loess_uniform


@dataclass
class STLResult:
    observed: np.ndarray
    seasonal: np.ndarray
    trend: np.ndarray
    resid: np.ndarray


def _odd_at_least(v: float) -> int:
    k = int(np.ceil(v))
    return k if k % 2 == 1 else k + 1


def _moving_average(x: np.ndarray, w: int) -> np.ndarray:
    """Simple MA of window w; output length len(x)-w+1 (Fortran stlma)."""
    c = np.cumsum(np.concatenate(([0.0], x)))
    return (c[w:] - c[:-w]) / w


def _low_pass(c: np.ndarray, period: int, window: int, deg: int) -> np.ndarray:
    """Fortran stlfts + trailing LOESS: MA(p), MA(p), MA(3), LOESS(q=nl)."""
    f = _moving_average(c, period)        # n+2p → n+p+1
    f = _moving_average(f, period)        # → n+2
    f = _moving_average(f, 3)             # → n
    return loess_uniform(f, window, deg)


def stl_fit(y: np.ndarray, period: int, seasonal: int = 7,
            trend: int | None = None, low_pass: int | None = None,
            seasonal_deg: int = 1, trend_deg: int = 1, low_pass_deg: int = 1,
            robust: bool = False, inner_iter: int | None = None,
            outer_iter: int | None = None) -> STLResult:
    y = np.asarray(y, dtype=np.float64)
    n = y.shape[0]
    if period < 2:
        raise ValueError("period must be >= 2")
    if n < 2 * period:
        raise ValueError("series must have at least 2 full periods")
    if seasonal % 2 == 0 or seasonal < 3:
        raise ValueError("seasonal must be odd and >= 3")
    if trend is None:
        trend = _odd_at_least(1.5 * period / (1.0 - 1.5 / seasonal))
    if low_pass is None:
        low_pass = period + 1 if period % 2 == 1 else period + 1
        if low_pass % 2 == 0:
            low_pass += 1
    if inner_iter is None:
        inner_iter = 2 if not robust else 1
    if outer_iter is None:
        outer_iter = 0 if not robust else 15

    T = np.zeros(n)
    S = np.zeros(n)
    rw = np.ones(n)  # robustness weights (unused when robust=False)

    for outer in range(outer_iter + 1):
        for _ in range(inner_iter):
            # 1. detrend
            detrended = y - T
            # 2. cycle-subseries smoothing → C of length n + 2*period
            C = np.empty(n + 2 * period)
            for k in range(period):
                sub = detrended[k::period]
                sm = loess_subseries_extended(sub, seasonal, seasonal_deg)
                # subseries k (length m, extended to m+2 for positions
                # -1..m) occupies C[k], C[k+p], ..., C[k+(m+1)p]
                C[k::period][:sm.shape[0]] = sm
            # 3. low-pass filter
            L = _low_pass(C, period, low_pass, low_pass_deg)
            # 4. seasonal
            S = C[period:period + n] - L
            # 5./6. trend
            T = loess_uniform(y - S, trend, trend_deg)
        if outer < outer_iter:
            # robustness weights (bisquare on |resid|) — only when robust
            R = y - T - S
            s = 6.0 * np.median(np.abs(R))
            if s == 0:
                rw = np.ones(n)
            else:
                u = np.clip(np.abs(R) / s, 0.0, 1.0)
                rw = (1.0 - u * u) ** 2
    resid = y - T - S
    return STLResult(observed=y, seasonal=S, trend=T, resid=resid)
