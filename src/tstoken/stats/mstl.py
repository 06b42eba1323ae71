"""MSTL — Multiple Seasonal-Trend decomposition using LOESS
(Bandara, Hyndman & Bergmeir 2021), as wrapped by statsmodels and called
at reference catch.py:1305-1306 (MSTL(series, periods=...).fit()).

statsmodels defaults reproduced:
  - periods sorted ascending; periods >= nobs/2 dropped
  - windows = 7 + 4*k for the k-th period (k = 1..K), i.e. 11, 15, ...
  - iterate = 2 (1 when only a single period)
  - each inner fit is a plain STL(period=p_k, seasonal=window_k)
Residual = deseasonalized - trend of the final STL fit.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .stl import STLResult, stl_fit


@dataclass
class MSTLResult:
    observed: np.ndarray
    seasonal: np.ndarray      # (K, n) or (n,) when K == 1
    trend: np.ndarray
    resid: np.ndarray
    periods: tuple[int, ...]


def _default_windows(k: int) -> list[int]:
    return [7 + 4 * i for i in range(1, k + 1)]


def mstl_fit(y: np.ndarray, periods, windows=None, iterate: int = 2) -> MSTLResult:
    y = np.asarray(y, dtype=np.float64)
    n = y.shape[0]
    if np.isscalar(periods):
        periods = (int(periods),)
    periods = tuple(sorted(int(p) for p in periods))
    # statsmodels drops periods that don't fit two full cycles
    kept = tuple(p for p in periods if p >= 2 and n > 2 * p)
    if not kept:
        # degenerate: no usable seasonality → trend-only STL-like smooth
        # (statsmodels raises; reference only hits this off the dispatch
        # table, so fall back to zero seasonal + mean trend)
        trend = np.full(n, y.mean())
        return MSTLResult(observed=y, seasonal=np.zeros(n), trend=trend,
                          resid=y - trend, periods=())
    periods = kept
    k = len(periods)
    if windows is None:
        windows = _default_windows(k)
    elif np.isscalar(windows):
        windows = [int(windows)] * k
    if k == 1:
        iterate = 1

    seasonal = np.zeros((k, n))
    deseas = y.copy()
    res: STLResult | None = None
    for _ in range(iterate):
        for i in range(k):
            deseas += seasonal[i]
            res = stl_fit(deseas, period=periods[i], seasonal=windows[i])
            seasonal[i] = res.seasonal
            deseas -= seasonal[i]
    trend = res.trend
    resid = deseas - trend
    seas_out = seasonal[0] if k == 1 else seasonal
    return MSTLResult(observed=y, seasonal=seas_out, trend=trend,
                      resid=resid, periods=periods)
