"""LOESS smoothing on a uniformly spaced grid, as used inside STL.

Implements the `est` weighted-local-regression kernel of Cleveland et
al. (1990) STL (the routine statsmodels wraps from the original
Fortran), specialized to the uniform grid STL always uses. For interior
points the tricube-weighted degree-1 fit reduces to a fixed convolution
kernel, so the hot path is a single np.convolve (O(n·q) in C, no Python
loop); only the 2·(q//2) boundary points get individual fits.
"""

from __future__ import annotations

import numpy as np


def _est_point(y: np.ndarray, xs: float, nleft: int, nright: int,
               window: int, deg: int, n: int) -> float:
    """One weighted local fit at position xs over y[nleft:nright+1].

    Positions are 0-based; mirrors the Fortran est() arithmetic
    (tricube weights over half-width h, with the (window-n)/2 widening
    when window > n, and the degree-1 equivalent-kernel correction).
    """
    rng = float(n - 1)
    h = max(xs - nleft, nright - xs)
    if window > n:
        h += (window - n) / 2.0
    h9 = 0.999 * h
    h1 = 0.001 * h
    j = np.arange(nleft, nright + 1, dtype=np.float64)
    r = np.abs(j - xs)
    w = np.zeros_like(r)
    inside = r <= h9
    w[inside] = np.where(r[inside] <= h1, 1.0,
                         (1.0 - (r[inside] / h) ** 3) ** 3)
    a = w.sum()
    if a <= 0.0:
        return np.nan
    w /= a
    if h > 0.0 and deg > 0:
        xbar = float(np.dot(w, j))
        b = xs - xbar
        c = float(np.dot(w, (j - xbar) ** 2))
        if np.sqrt(c) > 0.001 * rng:
            b /= c
            w = w * (b * (j - xbar) + 1.0)
    return float(np.dot(w, y[nleft:nright + 1]))


def _interior_kernel(window: int, deg: int) -> np.ndarray:
    """Equivalent kernel for a symmetric interior window (odd length)."""
    hw = window // 2
    h = float(hw)
    j = np.arange(-hw, hw + 1, dtype=np.float64)
    r = np.abs(j)
    if h == 0.0:
        return np.array([1.0])
    w = np.where(r <= 0.001 * h, 1.0,
                 np.where(r <= 0.999 * h, (1.0 - (r / h) ** 3) ** 3, 0.0))
    w /= w.sum()
    # symmetric window → xbar = xs → degree-1 correction vanishes
    return w


def loess_uniform(y: np.ndarray, window: int, deg: int = 1) -> np.ndarray:
    """Smooth y (uniform grid) with q=window nearest neighbors, tricube.

    window must be odd (STL guarantees this). Returns fitted values at
    every input position (jump=1).
    """
    y = np.asarray(y, dtype=np.float64)
    n = y.shape[0]
    if n == 0:
        return y.copy()
    if n == 1:
        return y.copy()
    out = np.empty(n)
    if window >= n:
        # every window is all points; widths differ per xs → per-point fits
        for i in range(n):
            out[i] = _est_point(y, float(i), 0, n - 1, window, deg, n)
        return out
    hw = window // 2
    # interior via convolution
    kern = _interior_kernel(window, deg)
    if n >= window:
        conv = np.convolve(y, kern[::-1], mode="valid")  # length n-window+1
        out[hw:n - hw] = conv
    # boundaries: sliding window clamped to [0, n-1], size=window
    for i in range(min(hw, n)):
        out[i] = _est_point(y, float(i), 0, window - 1, window, deg, n)
    for i in range(max(n - hw, 0), n):
        out[i] = _est_point(y, float(i), n - window, n - 1, window, deg, n)
    return out


def loess_subseries_extended(sub: np.ndarray, window: int, deg: int = 1) -> np.ndarray:
    """Smooth a cycle-subseries and extrapolate one position at each end.

    Returns length m+2: fits at positions -1, 0..m-1, m — the STL
    cycle-subseries smoothing step (positions 0 and n+1 in the paper).
    """
    sub = np.asarray(sub, dtype=np.float64)
    m = sub.shape[0]
    if m == 0:
        return np.zeros(2)
    if m == 1:
        return np.repeat(sub[0], 3)
    body = loess_uniform(sub, window, deg)
    if window >= m:
        left = _est_point(sub, -1.0, 0, m - 1, window, deg, m)
        right = _est_point(sub, float(m), 0, m - 1, window, deg, m)
    else:
        left = _est_point(sub, -1.0, 0, window - 1, window, deg, m)
        right = _est_point(sub, float(m), m - window, m - 1, window, deg, m)
    return np.concatenate(([left], body, [right]))
