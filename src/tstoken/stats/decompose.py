"""Classical seasonal decomposition (moving-average method), pure NumPy.

Mirrors statsmodels.tsa.seasonal.seasonal_decompose(x, model=...,
extrapolate_trend='freq') as called at reference catch.py:628-647:
  - trend: centered moving average (even periods use the half-weight
    [0.5, 1, ..., 1, 0.5]/p filter), NaN at the edges
  - extrapolate_trend='freq': linear fit over the first/last `period`
    valid trend points, extrapolated to fill the NaN edges
  - seasonal: per-position means of the detrended series, de-meaned
    (additive) / normalized by their mean (multiplicative), tiled
  - resid: x - trend - seasonal, or x / (trend * seasonal)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class DecomposeResult:
    observed: np.ndarray
    seasonal: np.ndarray
    trend: np.ndarray
    resid: np.ndarray


def _centered_ma(x: np.ndarray, period: int) -> np.ndarray:
    n = x.shape[0]
    if period % 2 == 0:
        filt = np.full(period + 1, 1.0 / period)
        filt[0] = filt[-1] = 0.5 / period
    else:
        filt = np.full(period, 1.0 / period)
    k = filt.shape[0]
    trend = np.full(n, np.nan)
    if n >= k:
        conv = np.convolve(x, filt[::-1], mode="valid")
        lo = (k - 1) // 2
        trend[lo:lo + conv.shape[0]] = conv
    return trend


def _extrapolate_trend(trend: np.ndarray, npoints: int) -> np.ndarray:
    """statsmodels._extrapolate_trend: linear fit on the first/last
    npoints valid values, extended over the NaN edges."""
    trend = trend.copy()
    valid = ~np.isnan(trend)
    if not valid.any():
        return trend
    front = int(np.argmax(valid))
    back = trend.shape[0] - 1 - int(np.argmax(valid[::-1]))
    front_last = min(front + npoints, back)
    back_first = max(front, back - npoints)

    idx = np.arange(front, front_last)
    if idx.shape[0] >= 2:
        k, b = np.linalg.lstsq(
            np.c_[idx, np.ones_like(idx, dtype=float)],
            trend[front:front_last], rcond=-1)[0]
        trend[:front] = np.arange(0, front) * k + b
    else:
        trend[:front] = trend[front]

    idx = np.arange(back_first, back)
    if idx.shape[0] >= 2:
        k, b = np.linalg.lstsq(
            np.c_[idx, np.ones_like(idx, dtype=float)],
            trend[back_first:back], rcond=-1)[0]
        trend[back + 1:] = np.arange(back + 1, trend.shape[0]) * k + b
    else:
        trend[back + 1:] = trend[back]
    return trend


def seasonal_decompose(x: np.ndarray, model: str = "additive",
                       period: int | None = None,
                       extrapolate_trend: str | int = "freq") -> DecomposeResult:
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[0]
    if period is None:
        raise ValueError("period must be provided")
    if n < 2 * period:
        raise ValueError(
            f"x must have 2 complete cycles ({2 * period} observations); got {n}")
    mul = model.startswith("m")
    if mul and np.any(x <= 0):
        raise ValueError("Multiplicative seasonality is not appropriate for "
                         "zero and negative values")

    trend = _centered_ma(x, period)
    if extrapolate_trend == "freq":
        trend = _extrapolate_trend(trend, period)
    elif isinstance(extrapolate_trend, int) and extrapolate_trend > 0:
        trend = _extrapolate_trend(trend, extrapolate_trend)

    detrended = x / trend if mul else x - trend
    period_averages = np.array([np.nanmean(detrended[i::period])
                                for i in range(period)])
    if mul:
        period_averages /= np.mean(period_averages)
    else:
        period_averages -= np.mean(period_averages)
    seasonal = np.tile(period_averages, n // period + 1)[:n]
    resid = x / (trend * seasonal) if mul else x - trend - seasonal
    return DecomposeResult(observed=x, seasonal=seasonal, trend=trend, resid=resid)
