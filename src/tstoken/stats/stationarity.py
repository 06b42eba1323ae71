"""Stationarity diagnostics: ADF + KPSS in pure NumPy (SURVEY.md K12).

Reimplements the two tests the reference invokes with statsmodels
defaults at `diagnostics.py:262-319` (`adfuller(series)`,
`kpss(series)`), since statsmodels is unavailable here:

  - ADF: regression='c', autolag='AIC' — Said-Dickey augmented
    regression dy_t = a + g*y_{t-1} + sum_i d_i dy_{t-i} + e_t, lag
    order chosen by AIC over 0..maxlag with a common estimation sample
    (maxlag = ceil(12*(n/100)^(1/4))), then refit at the chosen lag on
    the longest sample. Critical values are MacKinnon (2010) response
    surfaces beta_inf + b1/T + b2/T^2 for the constant-only case.
  - KPSS: regression='c', nlags='auto' (Hobijn et al. 1998 data-driven
    bandwidth), Bartlett-kernel Newey-West long-run variance,
    critical values from Kwiatkowski et al. (1992) Table 1.

P-values are monotone log-linear interpolations through the critical
value grid — exact at the tabulated quantiles, approximate between
them. The reference's verdict logic only compares p to 0.05 and the
statistic to the 5% critical value, so verdicts match statsmodels
except for razor-edge statistics.
"""

from __future__ import annotations

import numpy as np

# MacKinnon (2010) response-surface coefficients, constant-only ('c'),
# one variable: crit(T) = b_inf + b1/T + b2/T^2 at 1% / 5% / 10%.
_ADF_C_CRIT = {
    "1%": (-3.43035, -6.5393, -16.786),
    "5%": (-2.86154, -2.8903, -4.234),
    "10%": (-2.56677, -1.5384, -2.809),
}
# asymptotic tau quantiles for interpolation of the p-value (DF 'c'):
# P(tau <= q). Grid from the standard Dickey-Fuller distribution.
_ADF_TAU_GRID = [
    (0.01, -3.43), (0.025, -3.12), (0.05, -2.86), (0.10, -2.57),
    (0.25, -2.18), (0.50, -1.57), (0.75, -0.94), (0.90, -0.44),
    (0.95, -0.07), (0.975, 0.23), (0.99, 0.60),
]

# KPSS level-stationarity ('c') critical values (Kwiatkowski 1992).
_KPSS_C_CRIT = [(0.10, 0.347), (0.05, 0.463), (0.025, 0.574),
                (0.01, 0.739)]


def _ols(X: np.ndarray, y: np.ndarray):
    """OLS via lstsq; returns (beta, resid, se_beta)."""
    beta, _, _, _ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ beta
    n, k = X.shape
    sigma2 = resid @ resid / (n - k)
    xtx_inv = np.linalg.pinv(X.T @ X)
    se = np.sqrt(np.diag(xtx_inv) * sigma2)
    return beta, resid, se


def _aic(resid: np.ndarray, k_params: int) -> float:
    n = resid.shape[0]
    ssr = float(resid @ resid)
    llf = -n / 2.0 * (np.log(2 * np.pi) + np.log(ssr / n) + 1.0)
    return -2.0 * llf + 2.0 * k_params


def _adf_regression(y: np.ndarray, k: int, trim: int):
    """Build the ADF design for lag order k using observations from
    index `trim` on (common-sample trimming for autolag)."""
    dy = np.diff(y)
    ylag = y[:-1]
    rows = np.arange(trim, dy.shape[0])
    cols = [ylag[rows]]
    for i in range(1, k + 1):
        cols.append(dy[rows - i])
    cols.append(np.ones(rows.shape[0]))
    X = np.column_stack(cols)
    return X, dy[rows]


def _interp_p(stat: float, grid) -> float:
    """Monotone linear interpolation of P(X <= stat) through
    (p, q) grid points; clamped to [1e-4, 0.9999] at the tails."""
    ps = [p for p, _ in grid]
    qs = [q for _, q in grid]
    if stat <= qs[0]:
        return max(ps[0] * np.exp(stat - qs[0]), 1e-4)
    if stat >= qs[-1]:
        return min(1 - (1 - ps[-1]) * np.exp(qs[-1] - stat), 0.9999)
    return float(np.interp(stat, qs, ps))


def adfuller(x, maxlag: int | None = None):
    """Augmented Dickey-Fuller test, regression='c', autolag='AIC'.

    Returns (adfstat, pvalue, usedlag, nobs, critvalues_dict) —
    the fields of statsmodels' return the reference consumes
    (`diagnostics.py:290-301`).
    """
    y = np.asarray(x, dtype=np.float64)
    y = y[~np.isnan(y)]
    n = y.shape[0]
    if n < 8:
        raise ValueError("series too short for ADF")
    if maxlag is None:
        maxlag = int(np.ceil(12.0 * (n / 100.0) ** 0.25))
        maxlag = min(maxlag, (n - 1) // 2 - 2)
        maxlag = max(maxlag, 0)
    # lag selection on the common sample (all candidates see the same
    # observations, trimmed for the largest lag)
    best_k, best_aic = 0, np.inf
    for k in range(maxlag + 1):
        X, dy = _adf_regression(y, k, trim=maxlag)
        _, resid, _ = _ols(X, dy)
        a = _aic(resid, X.shape[1])
        if a < best_aic:
            best_aic, best_k = a, k
    # refit at the chosen order on the longest available sample
    X, dy = _adf_regression(y, best_k, trim=best_k)
    beta, resid, se = _ols(X, dy)
    stat = float(beta[0] / se[0])
    nobs = dy.shape[0]
    crit = {pct: b0 + b1 / nobs + b2 / nobs ** 2
            for pct, (b0, b1, b2) in _ADF_C_CRIT.items()}
    pval = _interp_p(stat, _ADF_TAU_GRID)
    return stat, pval, best_k, nobs, crit


def kpss(x, nlags: str | int = "auto"):
    """KPSS level-stationarity test, regression='c'.

    Returns (statistic, pvalue, nlags, critvalues_dict) matching the
    tuple shape the reference unpacks (`diagnostics.py:310`).
    """
    y = np.asarray(x, dtype=np.float64)
    y = y[~np.isnan(y)]
    n = y.shape[0]
    resid = y - y.mean()
    if nlags == "auto":  # Hobijn et al. (1998) data-driven bandwidth
        covlags = int(n ** (2.0 / 9.0))
        s0 = float(resid @ resid) / n
        s1 = 0.0
        for i in range(1, covlags + 1):
            g = float(resid[i:] @ resid[:-i]) / (n / 2.0)
            s0 += g
            s1 += i * g
        s_hat = s1 / s0 if s0 != 0 else 0.0
        gamma_hat = 1.1447 * (s_hat * s_hat) ** (1.0 / 3.0)
        lags = min(int(gamma_hat * n ** (1.0 / 3.0)), n - 1)
    elif nlags == "legacy":
        lags = min(int(np.ceil(12.0 * (n / 100.0) ** 0.25)), n - 1)
    else:
        lags = int(nlags)
    # Newey-West long-run variance, Bartlett kernel
    s2 = float(resid @ resid) / n
    for i in range(1, lags + 1):
        w = 1.0 - i / (lags + 1.0)
        s2 += 2.0 * w * float(resid[i:] @ resid[:-i]) / n
    S = np.cumsum(resid)
    # Zero long-run variance (constant / near-constant series): the
    # KPSS null of level stationarity trivially holds, so report
    # stat=0 → p=0.10 → stationary. statsmodels raises here instead;
    # inf would clamp p to 0.01 and mislabel a flat series as
    # non-stationary (round-1 ADVICE).
    stat = float(S @ S) / (n * n * s2) if s2 > 0 else 0.0
    crit = {f"{int(p*100)}%" if p != 0.025 else "2.5%": q
            for p, q in _KPSS_C_CRIT}
    # statsmodels-style table interpolation; p clamped to [0.01, 0.10]
    # outside the tabulated range (it warns, we just clamp)
    qs = [q for _, q in _KPSS_C_CRIT]          # ascending statistics
    ps = [p for p, _ in _KPSS_C_CRIT]          # descending p-values
    pval = float(np.interp(stat, qs, ps))
    return stat, pval, lags, crit


def stationarity_verdicts(x) -> dict:
    """Both tests + the reference's verdict logic
    (`diagnostics.py:298-301`, `:319`) as a plain dict."""
    adf_stat, adf_p, usedlag, nobs, adf_crit = adfuller(x)
    k_stat, k_p, k_lags, k_crit = kpss(x)
    return {
        "adf_stat": adf_stat, "adf_p": adf_p, "adf_usedlag": usedlag,
        "adf_stationary": bool((adf_p <= 0.05)
                               and (adf_crit["5%"] > adf_stat)),
        "kpss_stat": k_stat, "kpss_p": k_p, "kpss_lags": k_lags,
        "kpss_stationary": bool(k_p >= 0.05),
    }
