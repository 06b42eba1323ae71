"""Autocorrelation function via FFT + sum-of-squares-of-ACF model selector.

Mirrors statsmodels.tsa.stattools.acf(x, fft=True) as called at reference
catch.py:333-376 (get_ssacf): default nlags = min(int(10*log10(n)), n-1),
adjusted=False (denominator n), includes lag 0. The SSACF model pick
(additive iff ssacf_add < ssacf_mul) is at catch.py:670-675.
"""

from __future__ import annotations

import numpy as np


def acf(x: np.ndarray, nlags: int | None = None) -> np.ndarray:
    """ACF at lags 0..nlags using FFT autocovariance, denominator n."""
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[0]
    if n == 0:
        raise ValueError("empty series")
    if nlags is None:
        nlags = min(int(10 * np.log10(n)), n - 1) if n > 1 else 0
    xd = x - x.mean()
    nfft = 1 << int(np.ceil(np.log2(2 * n + 1)))
    f = np.fft.rfft(xd, nfft)
    acov = np.fft.irfft(f * np.conjugate(f), nfft)[: nlags + 1].real / n
    if acov[0] == 0:
        out = np.zeros(nlags + 1)
        out[0] = 1.0
        return out
    return acov / acov[0]


def ssacf(residuals: np.ndarray) -> float:
    """Sum of squares of the ACF values (catch.py:289-330 + 333-376)."""
    a = acf(np.asarray(residuals, dtype=np.float64))
    return float(np.sum(a ** 2))
