"""Box-Cox transform with MLE lambda, and its inverse.

Mirrors scipy.stats.boxcox(x) / scipy.special.inv_boxcox as used at
reference catch.py:1078, 1132, 1139, 1355, 1362: lambda chosen by
maximizing the Box-Cox log-likelihood with Brent's method bracketed
from (-2.0, 2.0) (scipy's default). Brent/bracket implemented from the
published algorithm (Numerical Recipes §10.2-10.3).
"""

from __future__ import annotations

import math

import numpy as np


def boxcox_transform(x: np.ndarray, lmbda: float) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    if abs(lmbda) < 1e-300:
        return np.log(x)
    # expm1/log1p formulation keeps precision for small lmbda*log(x)
    return np.expm1(lmbda * np.log(x)) / lmbda


def inv_boxcox(y: np.ndarray, lmbda: float) -> np.ndarray:
    """Inverse Box-Cox: exp(log1p(lmbda*y)/lmbda), exp(y) at lmbda=0."""
    y = np.asarray(y, dtype=np.float64)
    if abs(lmbda) < 1e-300:
        return np.exp(y)
    with np.errstate(invalid="ignore"):
        return np.exp(np.log1p(lmbda * y) / lmbda)


def _neg_llf(lmbda: float, x: np.ndarray, logx_sum: float) -> float:
    y = boxcox_transform(x, lmbda)
    n = y.shape[0]
    var = np.var(y)  # population variance, as scipy's boxcox_llf
    if var <= 0 or not np.isfinite(var):
        return math.inf
    llf = (lmbda - 1.0) * logx_sum - n / 2.0 * math.log(var)
    return -llf


def _bracket(f, xa=-2.0, xb=2.0):
    """Expand (xa, xb) downhill to a bracketing triple (NR §10.1 / scipy bracket)."""
    gold, glimit, tiny = 1.618034, 110.0, 1e-21
    fa, fb = f(xa), f(xb)
    if fa < fb:
        xa, xb, fa, fb = xb, xa, fb, fa
    xc = xb + gold * (xb - xa)
    fc = f(xc)
    it = 0
    while fc < fb and it < 1000:
        it += 1
        tmp1 = (xb - xa) * (fb - fc)
        tmp2 = (xb - xc) * (fb - fa)
        val = tmp2 - tmp1
        denom = 2.0 * tiny if abs(val) < tiny else 2.0 * val
        w = xb - ((xb - xc) * tmp2 - (xb - xa) * tmp1) / denom
        wlim = xb + glimit * (xc - xb)
        if (w - xc) * (xb - w) > 0.0:
            fw = f(w)
            if fw < fc:
                return xb, w, xc
            if fw > fb:
                return xa, xb, w
            w = xc + gold * (xc - xb)
            fw = f(w)
        elif (w - wlim) * (wlim - xc) >= 0.0:
            w = wlim
            fw = f(w)
        elif (w - wlim) * (xc - w) > 0.0:
            fw = f(w)
            if fw < fc:
                xb, xc, w = xc, w, w + gold * (w - xc)
                fb, fc, fw = fc, fw, f(w)
        else:
            w = xc + gold * (xc - xb)
            fw = f(w)
        xa, xb, xc = xb, xc, w
        fa, fb, fc = fb, fc, fw
    return xa, xb, xc


def _brent(f, xa, xb, xc, tol=1.48e-8, maxiter=500):
    """Brent scalar minimization on a bracketing triple (NR §10.2)."""
    cg = 0.3819660
    a, b = (xa, xc) if xa < xc else (xc, xa)
    x = w = v = xb
    fx = fw = fv = f(x)
    d = e = 0.0
    for _ in range(maxiter):
        xm = 0.5 * (a + b)
        tol1 = tol * abs(x) + 1e-11
        tol2 = 2.0 * tol1
        if abs(x - xm) <= tol2 - 0.5 * (b - a):
            break
        if abs(e) > tol1:
            r = (x - w) * (fx - fv)
            q = (x - v) * (fx - fw)
            p = (x - v) * q - (x - w) * r
            q = 2.0 * (q - r)
            if q > 0.0:
                p = -p
            q = abs(q)
            etemp = e
            e = d
            if abs(p) >= abs(0.5 * q * etemp) or p <= q * (a - x) or p >= q * (b - x):
                e = (a - x) if x >= xm else (b - x)
                d = cg * e
            else:
                d = p / q
                u = x + d
                if u - a < tol2 or b - u < tol2:
                    d = math.copysign(tol1, xm - x)
        else:
            e = (a - x) if x >= xm else (b - x)
            d = cg * e
        u = x + d if abs(d) >= tol1 else x + math.copysign(tol1, d)
        fu = f(u)
        if fu <= fx:
            if u >= x:
                a = x
            else:
                b = x
            v, w, x = w, x, u
            fv, fw, fx = fw, fx, fu
        else:
            if u < x:
                a = u
            else:
                b = u
            if fu <= fw or w == x:
                v, w = w, u
                fv, fw = fw, fu
            elif fu <= fv or v == x or v == w:
                v, fv = u, fu
    return x


def boxcox(x: np.ndarray) -> tuple[np.ndarray, float]:
    """(transformed, lmbda) with lmbda by MLE — scipy.stats.boxcox(x)."""
    x = np.asarray(x, dtype=np.float64)
    if x.ndim != 1:
        raise ValueError("boxcox input must be 1-d")
    if np.any(x <= 0):
        raise ValueError("Data must be positive.")
    if np.all(x == x[0]):
        raise ValueError("Data must not be constant.")
    logx_sum = float(np.sum(np.log(x)))

    def f(l):
        return _neg_llf(l, x, logx_sum)

    xa, xb, xc = _bracket(f, -2.0, 2.0)
    lmbda = _brent(f, xa, xb, xc)
    return boxcox_transform(x, lmbda), float(lmbda)
