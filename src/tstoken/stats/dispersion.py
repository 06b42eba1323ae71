"""Dispersion / fence kernels: z-score, MAD modified z, IQR.

Numeric semantics mirror the reference exactly (SURVEY.md A1–A3):
  - z-score uses the POPULATION std (np.std ddof=0), catch.py:186
  - MAD labels follow PyOD's MAD(threshold=3.5): modified z-score
    0.6745*|x - median| / MAD > 3.5 (Iglewicz–Hoaglin), catch.py:216-235
  - IQR quartiles use linear interpolation (pandas .quantile default),
    fences at ±1.5*IQR, catch.py:150-157
"""

from __future__ import annotations

import numpy as np

MAD_CONSISTENCY = 0.6745
MAD_THRESHOLD = 3.5


def zscore(x: np.ndarray) -> np.ndarray:
    """(x - mean) / std_pop — reference catch.py:186 (anomaly_zscore)."""
    x = np.asarray(x, dtype=np.float64)
    mean = np.nanmean(x)
    std = np.sqrt(np.nanmean((x - mean) ** 2))  # ddof=0, NaN-skipping like pandas
    with np.errstate(divide="ignore", invalid="ignore"):
        return (x - mean) / std


def mad_scores(x: np.ndarray) -> np.ndarray:
    """Modified z-scores per PyOD MAD.decision_function (catch.py:228-232).

    score = 0.6745 * |x - median| / median(|x - median|); non-finite
    values are clamped like np.nan_to_num (inf -> huge, nan -> 0).
    """
    x = np.asarray(x, dtype=np.float64).ravel()
    med = np.nanmedian(x)
    diff = np.abs(x - med)
    mad = np.nanmedian(diff)
    with np.errstate(divide="ignore", invalid="ignore"):
        scores = MAD_CONSISTENCY * diff / mad
    return np.nan_to_num(scores)


def mad_labels(x: np.ndarray, threshold: float = MAD_THRESHOLD) -> np.ndarray:
    """Boolean outlier labels: modified z > threshold (catch.py:233-235)."""
    return mad_scores(x) > threshold


def iqr_fences(x: np.ndarray) -> tuple[float, float]:
    """(lo, hi) = (Q1 - 1.5*IQR, Q3 + 1.5*IQR), linear-interp quartiles.

    Matches pandas Series.quantile([.25, .75]) — catch.py:150-157.
    """
    x = np.asarray(x, dtype=np.float64)
    q1, q3 = np.percentile(x[~np.isnan(x)], [25.0, 75.0])  # 'linear' default
    iqr = q3 - q1
    return q1 - 1.5 * iqr, q3 + 1.5 * iqr


def iqr_labels(x: np.ndarray) -> np.ndarray:
    """Boolean labels for values strictly outside the IQR fences (catch.py:157)."""
    x = np.asarray(x, dtype=np.float64)
    lo, hi = iqr_fences(x)
    return (x < lo) | (x > hi)
