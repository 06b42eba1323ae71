"""Generalized and Seasonal ESD (Extreme Studentized Deviate) tests.

Reimplements the `sesd` package semantics the reference calls at
catch.py:1623 (sesd.generalized_esd) and catch.py:1675
(sesd.seasonal_esd), per Rosner (1983) and Hochenbaum/Vallis/Kejariwal
(arXiv:1704.07706):
  - test statistic: max |x - center| / scale over unmasked points,
    center/scale = mean/std_pop (hybrid=False) or median/MAD (hybrid=True)
  - critical value λ_i = (n-i)·t / sqrt((n-i-1+t²)(n-i+1)) with
    t = t_ppf(1 - α/(2(n-i+1)), n-i-1)
  - number of outliers = LARGEST i with statistic_i > λ_i (all
    max_anomalies candidates are examined)
  - seasonal variant: residual = x - STL.seasonal - median(x), then the
    generalized test on the residual.
"""

from __future__ import annotations

import numpy as np

from .special import t_ppf
from .stl import stl_fit


def _test_statistic(x: np.ndarray, mask: np.ndarray, hybrid: bool) -> tuple[int, float]:
    vals = np.where(mask, np.nan, x)
    if hybrid:
        center = np.nanmedian(vals)
        scale = np.nanmedian(np.abs(vals - center))
    else:
        center = np.nanmean(vals)
        scale = np.nanstd(vals)  # population std, as np.ma .std()
    with np.errstate(divide="ignore", invalid="ignore"):
        dev = np.abs(vals - center) / scale
    dev = np.where(np.isnan(dev), -np.inf, dev)
    idx = int(np.argmax(dev))
    return idx, float(dev[idx])


def _critical_value(size: int, alpha: float) -> float:
    """Rosner's λ for the current effective sample size."""
    if size <= 2:
        return np.inf
    t = t_ppf(1.0 - alpha / (2.0 * size), size - 2)
    return ((size - 1) * t) / np.sqrt((size - 2 + t * t) * size)


def generalized_esd(x: np.ndarray, max_anomalies: int, alpha: float = 0.05,
                    hybrid: bool = False) -> list[int]:
    """Indices of detected anomalies (positional), sesd-compatible."""
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[0]
    max_anomalies = int(min(max_anomalies, max(n - 3, 0)))
    mask = np.zeros(n, dtype=bool)
    candidates: list[int] = []
    num_outliers = 0
    for i in range(1, max_anomalies + 1):
        idx, stat = _test_statistic(x, mask, hybrid)
        crit = _critical_value(n - len(candidates), alpha)
        if np.isfinite(stat) and stat > crit:
            num_outliers = i
        candidates.append(idx)
        mask[idx] = True
    return candidates[:num_outliers]


def seasonal_esd(x: np.ndarray, periodicity: int | None = None,
                 max_anomalies: int = 10, alpha: float = 0.05,
                 hybrid: bool = False) -> list[int]:
    """Seasonal ESD (arXiv:1704.07706): ESD on x - STL.seasonal - median."""
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[0]
    period = int(periodicity) if periodicity else max(n // 2, 2)
    seasonal = stl_fit(x, period=period,
                       seasonal=_odd(period)).seasonal if n > 2 * period else np.zeros(n)
    resid = x - seasonal - np.median(x)
    return generalized_esd(resid, max_anomalies=max_anomalies,
                           alpha=alpha, hybrid=hybrid)


def _odd(p: int) -> int:
    s = p if p % 2 == 1 else p + 1
    return max(s, 7)
