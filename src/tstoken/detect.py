"""Anomaly detectors over rolled-up tiers.

Two layers (SURVEY.md §7.3):
  - NATIVE detectors (IQR, z-score, MAD, moving-average + CV window
    search): pure pyspark.sql expressions — whole-stage codegen, no
    Python in the data path. These are exact reimplementations of the
    reference's fence math (catch.py:124-165, 186, 216-235, 743-947).
  - GROUPED Arrow-UDF detectors (classic/STL/MSTL/ESD): applyInPandas
    per source, each group being ONE rolled-up series (bounded size:
    buckets, never raw rows), running the tstoken.compat pipeline.

Flag schema (FIXTURES.md A2): (source, bucket_ts, method, is_outlier,
score). All buckets are emitted with a boolean, not just the hits.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (BooleanType, DoubleType, StringType,
                               StructField, StructType, TimestampType)

from .rollup import TIER_MSTL_PERIODS, TIER_PERIOD

FLAG_SCHEMA = StructType([
    StructField("source", StringType()),
    StructField("bucket_ts", TimestampType()),
    StructField("method", StringType()),
    StructField("is_outlier", BooleanType()),
    StructField("score", DoubleType()),
])

VALUE_COL = "sum_n_tok"


def _flags_select(df: DataFrame, method: str, flag, score) -> DataFrame:
    return df.select(
        "source", "bucket_ts", F.lit(method).alias("method"),
        flag.alias("is_outlier"), score.cast("double").alias("score"))


# ------------------------------------------------------------------ IQR

def iqr_flags(rollup: DataFrame, value_col: str = VALUE_COL) -> DataFrame:
    """Per-source IQR fences, fully native (catch.py:150-157 semantics:
    exact linear-interpolation percentiles, fences ±1.5·IQR)."""
    v = F.col(value_col).cast("double")
    fences = (rollup.groupBy("source")
              .agg(F.percentile(v, F.array(F.lit(0.25), F.lit(0.75)))
                   .alias("q")))
    fences = fences.select(
        "source",
        (F.col("q")[0] - 1.5 * (F.col("q")[1] - F.col("q")[0])).alias("lo"),
        (F.col("q")[1] + 1.5 * (F.col("q")[1] - F.col("q")[0])).alias("hi"),
        (F.col("q")[1] - F.col("q")[0]).alias("iqr"))
    j = rollup.join(F.broadcast(fences), "source")
    flag = (v < F.col("lo")) | (v > F.col("hi"))
    dist = F.greatest(F.col("lo") - v, v - F.col("hi"), F.lit(0.0))
    score = F.when(F.col("iqr") > 0, dist / F.col("iqr")).otherwise(dist)
    return _flags_select(j, "iqr", flag, score)


# -------------------------------------------------------------- z-score

def zscore_flags(rollup: DataFrame, value_col: str = VALUE_COL,
                 threshold: float = 2.0) -> DataFrame:
    """|population z| > 2 per source (catch.py:186)."""
    v = F.col(value_col).cast("double")
    stats = rollup.groupBy("source").agg(
        F.avg(v).alias("mu"), F.stddev_pop(v).alias("sd"))
    j = rollup.join(F.broadcast(stats), "source")
    z = F.when(F.col("sd") > 0, F.abs((v - F.col("mu")) / F.col("sd"))) \
         .otherwise(F.lit(0.0))
    return _flags_select(j, "zscore", z > threshold, z)


# ------------------------------------------------------------------ MAD

def mad_flags(rollup: DataFrame, value_col: str = VALUE_COL,
              threshold: float = 3.5) -> DataFrame:
    """Modified z-score 0.6745·|x-med|/MAD > 3.5 (catch.py:216-235),
    in two native aggregation passes — no UDF (SURVEY.md A3)."""
    v = F.col(value_col).cast("double")
    med = rollup.groupBy("source").agg(
        F.percentile(v, F.lit(0.5)).alias("med"))
    j1 = rollup.join(F.broadcast(med), "source") \
               .withColumn("absdev", F.abs(v - F.col("med")))
    mad = j1.groupBy("source").agg(
        F.percentile(F.col("absdev"), F.lit(0.5)).alias("mad"))
    j2 = j1.join(F.broadcast(mad), "source")
    score = F.when(F.col("mad") > 0,
                   F.lit(0.6745) * F.col("absdev") / F.col("mad")) \
             .otherwise(F.when(F.col("absdev") > 0, F.lit(1e308))
                        .otherwise(F.lit(0.0)))
    return _flags_select(j2, "mad", score > threshold, score)


# --------------------------------------------------------- moving average

_MA_WINDOWS = list(range(2, 21))


def _ma_base(rollup: DataFrame, value_col: str, n_splits: int) -> DataFrame:
    v = F.col(value_col).cast("double")
    w_src = Window.partitionBy("source").orderBy("bucket_ts")
    n_w = Window.partitionBy("source")
    base = (rollup.select("source", "bucket_ts", v.alias("v"))
            .withColumn("idx", F.row_number().over(w_src) - 1)
            .withColumn("n", F.count(F.lit(1)).over(n_w))
            .withColumn("test_size", (F.col("n") / (n_splits + 1)).cast("int")))
    # TimeSeriesSplit fold id of each row (null = never in a test fold)
    fold_raw = F.floor((F.col("idx") - (F.col("n") - n_splits * F.col("test_size")))
                       / F.col("test_size"))
    return base.withColumn(
        "fold",
        F.when((F.col("test_size") >= 1) & (fold_raw >= 0), fold_raw))


def optimal_window(rollup: DataFrame, value_col: str = VALUE_COL,
                   n_splits: int = 5) -> DataFrame:
    """(source, wstar): CV-optimal MA window, fully native (SURVEY.md K9:
    19 window aggregates in one pass + stack + argmin, no UDF, no
    driver loop — the reference's 19×5-fold pandas search collapsed
    into one shuffle)."""
    windows = _MA_WINDOWS
    base = _ma_base(rollup, value_col, n_splits)
    # per-fold trailing MAs for all candidate windows (one shuffle total:
    # the window functions share the (source) partitioning)
    fold_win = Window.partitionBy("source", "fold").orderBy("bucket_ts")
    test = base.filter(F.col("fold").isNotNull())
    ma_cols = []
    for w in windows:
        frame = fold_win.rowsBetween(-(w - 1), 0)
        ma = F.when(F.count("v").over(frame) == w, F.avg("v").over(frame))
        ma_cols.append(ma.alias(f"ma_{w}"))
    test = test.select("source", "fold", "v", *ma_cols)

    stack_expr = "stack({}, {}) as (w, ma)".format(
        len(windows), ", ".join(f"{w}, ma_{w}" for w in windows))
    melted = test.selectExpr("source", "fold", "v", stack_expr)
    fold_rmse = (melted.filter(F.col("ma").isNotNull())
                 .groupBy("source", "w", "fold")
                 .agg(F.sqrt(F.avg(F.pow(F.col("v") - F.col("ma"), 2)))
                      .alias("rmse")))
    mean_rmse = fold_rmse.groupBy("source", "w").agg(F.avg("rmse").alias("mean_rmse"))
    pick = Window.partitionBy("source").orderBy(F.col("mean_rmse").asc(),
                                                F.col("w").asc())
    return (mean_rmse.withColumn("rk", F.row_number().over(pick))
            .filter(F.col("rk") == 1).select("source", F.col("w").alias("wstar")))


def ma_flags(rollup: DataFrame, value_col: str = VALUE_COL,
             n_splits: int = 5) -> DataFrame:
    """Moving-average detector with CV-optimal window, fully native.

    Reference semantics (catch.py:743-947): optimal w ∈ [2,20] minimizes
    the mean RMSE of a trailing rolling(w).mean() over 5 TimeSeriesSplit
    test folds (rolling restarted inside each fold, min_periods=w); the
    final flags are |z| > 2 on the w*-rolling mean of the whole series.
    """
    windows = _MA_WINDOWS
    w_src = Window.partitionBy("source").orderBy("bucket_ts")
    base = _ma_base(rollup, value_col, n_splits)
    wstar = optimal_window(rollup, value_col, n_splits)

    # full-series MAs for every candidate window, picked by wstar
    full_cols = []
    for w in windows:
        frame = w_src.rowsBetween(-(w - 1), 0)
        ma = F.when(F.count("v").over(frame) == w, F.avg("v").over(frame))
        full_cols.append(ma.alias(f"ma_{w}"))
    full = base.select("source", "bucket_ts", "v", *full_cols) \
               .join(F.broadcast(wstar), "source")
    chosen = F.element_at(F.array(*[F.col(f"ma_{w}") for w in windows]),
                          F.col("wstar").cast("int") - 1)
    full = full.withColumn("ma", chosen)

    # z-score of the MA series (NaN head skipped, population std)
    zstats = full.groupBy("source").agg(
        F.avg("ma").alias("mu"), F.stddev_pop("ma").alias("sd"))
    j = full.join(F.broadcast(zstats), "source")
    z = F.when(F.col("ma").isNull(), F.lit(None).cast("double")) \
         .when(F.col("sd") > 0, F.abs((F.col("ma") - F.col("mu")) / F.col("sd"))) \
         .otherwise(F.lit(0.0))
    return _flags_select(j.withColumn("z", z), "ma",
                         F.coalesce(F.col("z") > 2.0, F.lit(False)), F.col("z"))


# ------------------------------------------------ extrema ensemble

def extrema_ensemble_flags(rollup: DataFrame, half_window: int = 30,
                           avg_threshold: float = 3.5,
                           spike_threshold: float = 3.5,
                           dip_threshold: float = 8.0,
                           adaptive_dip: bool = False,
                           adaptive_dip_low: float = 7.0,
                           adaptive_dip_max_density: float = 3.0
                           ) -> DataFrame:
    """Engine-native ensemble over the rollup's order-statistic columns
    (no reference counterpart; SURVEY §2.9 K14 family). Fully native —
    window aggregates + MAD fences, no Python in the data path.

    A level-shift anomaly in a bucket rescales EVERY document in it, so
    beyond the mean ratio (sum_n_tok/n_docs) it also shifts the bucket
    extremes: a spike lifts min_n_tok above the per-source typical
    floor, a dip caps max_n_tok far below the typical ceiling — and the
    extremes stay informative on sparse buckets where the mean ratio
    drowns in document-sampling noise. Three robust fences, OR-ed:

      1. MAD modified-z on avg tokens/doc (the round-1 mad_ratio row);
      2. MAD on log min_n_tok detrended by a +-half_window rolling mean
         (spike side — typical-floor exceedance);
      3. MAD on detrended log max_n_tok, NEGATIVE side only, with a
         deep threshold (dip side — the low tail of single-document
         buckets is long, so only far-below-ceiling counts).

    Thresholds were selected on the synthetic bench's planted-anomaly
    sweep (BENCH_r02; avg 3.5 / spike 3.5 / dip 8.0 -> F1 0.83 vs 0.68
    for the best single detector) — disclosed tuning, same protocol as
    the round-1 engine-native rows. Rolling-mean detrending absorbs
    seasonality; log scale makes x8 spikes and x1/8 dips symmetric.

    Scale note: MAD is inherently two-pass, so the windowed feature
    subtree is referenced by both aggregation passes and the final
    projection. Run this over a MATERIALIZED tier table (the engine's
    TableIO pipeline does), not over an unmaterialized rollup lineage —
    otherwise each reference recomputes the rollup upstream.

    `adaptive_dip=True` (OPT-IN; the frozen defaults above are never
    altered by it being off) lowers the dip threshold to
    `adaptive_dip_low` for sources whose median docs/bucket is at most
    `adaptive_dip_max_density`: on sparse sources the bucket max is
    doc-sampling noisy, so its detrended-log MAD is wide and a weak
    dip (e.g. x0.2) scores well under the deep fixed fence — the
    recall loss the round-4 held-out table showed on the rare-weak
    regime. Dense sources keep the deep threshold (their tight MAD
    makes even weak dips score high, and the long single-doc low tail
    the deep fence guards against lives in MID-density sources).
    Adaptive parameters were grid-tuned on the seed-0 TRAINING regime
    only (BENCH/adaptive_probe.py: low 7.0 / density 3.0 -> train F1
    0.8438 vs 0.8387 frozen, recall +3.4pt at precision 0.911; the
    a-priori low=5.0 flooded false positives, train F1 0.57 — kept in
    the probe table as the cautionary row); held-out scores in
    BENCH/holdout_f1.json.
    """
    ng = rollup
    if "gap_filled" in rollup.columns:
        ng = rollup.filter(~F.col("gap_filled"))
    w = Window.partitionBy("source").orderBy("bucket_ts") \
        .rowsBetween(-half_window, half_window)
    avg_v = F.col("sum_n_tok").cast("double") / F.col("n_docs")
    lmin = F.log(F.col("min_n_tok").cast("double") + 1.0)
    lmax = F.log(F.col("max_n_tok").cast("double") + 1.0)
    dens_cols = [F.col("n_docs")] if adaptive_dip else []
    feat = (ng.select("source", "bucket_ts", avg_v.alias("avg_n_tok"),
                      lmin.alias("lmin"), lmax.alias("lmax"), *dens_cols)
            .withColumn("d_min", F.col("lmin") - F.avg("lmin").over(w))
            .withColumn("d_max", F.col("lmax") - F.avg("lmax").over(w)))

    # All three MAD fences share ONE two-pass aggregation over feat
    # (3 medians in pass 1, 3 MADs in pass 2, broadcast joins back) —
    # calling mad_flags three times would re-derive the windowed feat
    # subtree up to 6x. Fence math is identical to mad_flags.
    cols = {"a": "avg_n_tok", "s": "d_min", "d": "d_max"}
    dens_agg = ([F.percentile(F.col("n_docs").cast("double"), F.lit(0.5))
                 .alias("med_docs")] if adaptive_dip else [])
    med = feat.groupBy("source").agg(*[
        F.percentile(F.col(c), F.lit(0.5)).alias(f"med_{t}")
        for t, c in cols.items()], *dens_agg)
    j1 = feat.join(F.broadcast(med), "source")
    for t, c in cols.items():
        j1 = j1.withColumn(f"ad_{t}", F.abs(F.col(c) - F.col(f"med_{t}")))
    mad = j1.groupBy("source").agg(*[
        F.percentile(F.col(f"ad_{t}"), F.lit(0.5)).alias(f"mad_{t}")
        for t in cols])
    j2 = j1.join(F.broadcast(mad), "source")

    def mscore(t: str) -> F.Column:
        return F.when(F.col(f"mad_{t}") > 0,
                      F.lit(0.6745) * F.col(f"ad_{t}") / F.col(f"mad_{t}")) \
                .otherwise(F.when(F.col(f"ad_{t}") > 0, F.lit(1e308))
                           .otherwise(F.lit(0.0)))

    s_a, s_s, s_d = mscore("a"), mscore("s"), mscore("d")
    dip_fence = F.lit(dip_threshold)
    if adaptive_dip:
        dip_fence = F.when(
            F.col("med_docs") <= adaptive_dip_max_density,
            F.lit(adaptive_dip_low)).otherwise(F.lit(dip_threshold))
    flag = (s_a > avg_threshold) | (s_s > spike_threshold) \
        | ((s_d > dip_fence) & (F.col("d_max") < 0))
    score = F.greatest(s_a, s_s, s_d)
    out = _flags_select(j2, "extrema_ensemble", flag, score)
    if "gap_filled" in rollup.columns:
        # flag contract: EVERY input bucket gets a boolean (module
        # docstring / FIXTURES A2). Gap-filled buckets carry no
        # statistical signal (zero docs, null extremes) — emit them as
        # non-outliers instead of dropping them from the frame.
        gaps = rollup.filter(F.col("gap_filled"))
        out = out.unionByName(_flags_select(
            gaps, "extrema_ensemble", F.lit(False), F.lit(0.0)))
    return out


# ------------------------------------------- grouped Arrow-UDF detectors

GROUPED_METHODS = ("iqr", "stl", "stl_z", "stl_mad", "mstl", "classic",
                   "esd")


def _series_detector(method: str, period: int,
                     mstl_periods: tuple | None = None):
    """Build the per-group pandas function for applyInPandas.

    Each group is one source's rolled series — bounded by bucket count
    (≤ ~10^5 points/tier), never raw rows (SURVEY.md §4.1).

    When a decomposition kernel degenerates (constant series, zero
    residual spread) the detector falls back to IQR fences and SAYS SO:
    the output `method` column reads "iqr_fallback", never the
    requested method (round-1 verdict #3 — a silent fallback would ship
    wrong-but-plausible flags on a kernel regression). Only the known
    degenerate path (ValueError) falls back; any other kernel error
    propagates and fails the query loudly.
    """
    if method not in GROUPED_METHODS:
        raise ValueError(f"unknown method {method}")

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        from . import compat
        from .stats.dispersion import mad_scores, zscore as _zs
        from .stats.normality import monte_carlo_shapiro_pvalue
        from .stats.stl import stl_fit

        pdf = pdf.sort_values("bucket_ts").reset_index(drop=True)
        src = pdf["source"].iloc[0]
        x = pdf["value"].to_numpy(dtype=np.float64)
        n = len(x)
        flags = np.zeros(n, dtype=bool)
        score = np.zeros(n, dtype=np.float64)

        def iqr_fallback():
            from .stats.dispersion import iqr_fences
            lo, hi = iqr_fences(x)
            f = (x < lo) | (x > hi)
            iqr = (hi - lo) / 3.0 if hi > lo else 1.0
            s = np.maximum(np.maximum(lo - x, x - hi), 0.0) / iqr
            return f, s

        method_out = method
        try:
            if method == "iqr":
                flags, score = iqr_fallback()
            elif n < 2 * period + 1:
                flags, score = iqr_fallback()
                method_out = "iqr_fallback"
            elif method == "stl":
                resid = stl_fit(x, period=period,
                                seasonal=period + (period % 2 == 0)).resid
                if compat._degenerate_decomposition(resid, x):
                    raise ValueError("degenerate decomposition")
                _, p = monte_carlo_shapiro_pvalue(resid[~np.isnan(resid)])
                if p > 0.05:
                    z = np.abs(_zs(resid))
                    flags, score = z > 2.0, z
                else:
                    s = mad_scores(resid)
                    flags, score = s > 3.5, s
            elif method == "stl_z":
                # engine-native: STL residuals + fixed |z| > 2 (the
                # reference's normal-residuals branch, K6, applied
                # unconditionally). On heavy-tailed residuals the
                # MC-Shapiro gate always routes to MAD whose modified
                # z explodes against a tiny robust scale; the plain
                # z-score stays calibrated. Threshold is the
                # reference's own (catch.py:1156), not tuned.
                resid = stl_fit(x, period=period,
                                seasonal=period + (period % 2 == 0)).resid
                if compat._degenerate_decomposition(resid, x):
                    raise ValueError("degenerate decomposition")
                z = np.abs(_zs(resid))
                flags, score = z > 2.0, z
            elif method == "stl_mad":
                # engine-native (no reference counterpart): STL
                # residuals scored with the robust MAD fence
                # unconditionally. The reference's dispersion gate
                # (K6) picks |z|>2 when residuals look normal, which
                # flags ~2.5% of ANY series; skipping the gate keeps
                # STL's recall at MAD's precision.
                resid = stl_fit(x, period=period,
                                seasonal=period + (period % 2 == 0)).resid
                if compat._degenerate_decomposition(resid, x):
                    raise ValueError("degenerate decomposition")
                s = mad_scores(resid)
                flags, score = s > 3.5, s
            elif method == "mstl":
                from .stats.mstl import mstl_fit
                periods = mstl_periods or (period,)
                usable = tuple(p for p in periods if n > 2 * p)
                resid = mstl_fit(x, periods=usable or (period,)).resid
                if compat._degenerate_decomposition(resid, x):
                    raise ValueError("degenerate decomposition")
                s = mad_scores(resid)
                flags, score = s > 3.5, s
            elif method == "classic":
                from .stats.decompose import seasonal_decompose
                dec_a = seasonal_decompose(x, "additive", period=period)
                if np.all(x > 0):
                    dec_m = seasonal_decompose(x, "multiplicative", period=period)
                    ra = compat.get_residuals(dec_a)
                    rm = compat.get_residuals(dec_m)
                    dec = dec_a if compat.get_ssacf(ra) < compat.get_ssacf(rm) \
                        else dec_m
                else:
                    dec = dec_a
                s = mad_scores(dec.resid)
                flags, score = s > 3.5, s
            elif method == "esd":
                from .stats.esd import generalized_esd, seasonal_esd
                from .stats.normality import shapiro
                _, p = shapiro(x)
                if p > 0.05:
                    idx = generalized_esd(x, max_anomalies=n // 20)
                else:
                    idx = seasonal_esd(x, periodicity=period,
                                       max_anomalies=n // 20, hybrid=True)
                flags = np.zeros(n, dtype=bool)
                flags[list(idx)] = True
                score = flags.astype(np.float64)
        except ValueError:
            # degenerate decomposition / zero-spread series only —
            # other kernel exceptions propagate (see docstring)
            flags, score = iqr_fallback()
            method_out = "iqr_fallback"

        return pd.DataFrame({
            "source": src, "bucket_ts": pdf["bucket_ts"],
            "method": method_out, "is_outlier": flags,
            "score": np.nan_to_num(score, posinf=1e308, neginf=-1e308),
        })

    return fn


def grouped_flags(rollup: DataFrame, tier: str, method: str,
                  value_col: str = VALUE_COL) -> DataFrame:
    """classic/stl/mstl/esd flags via applyInPandas per source."""
    period = TIER_PERIOD[tier]
    src = rollup.select("source", "bucket_ts",
                        F.col(value_col).cast("double").alias("value"))
    return src.groupBy("source").applyInPandas(
        _series_detector(method, period, TIER_MSTL_PERIODS.get(tier)),
        schema=FLAG_SCHEMA)


def all_flags(rollup: DataFrame, tier: str,
              methods=("iqr", "zscore", "mad", "ma", "stl"),
              value_col: str = VALUE_COL) -> DataFrame:
    """Union of the requested detectors' flags for one tier."""
    out = None
    native = {"iqr": iqr_flags, "zscore": zscore_flags, "mad": mad_flags,
              "ma": ma_flags}
    for m in methods:
        df = native[m](rollup, value_col) if m in native else \
            grouped_flags(rollup, tier, m, value_col)
        out = df if out is None else out.unionByName(df)
    return out


STATIONARITY_SCHEMA = StructType([
    StructField("source", StringType()),
    StructField("adf_stat", DoubleType()),
    StructField("adf_p", DoubleType()),
    StructField("adf_usedlag", DoubleType()),
    StructField("adf_stationary", BooleanType()),
    StructField("kpss_stat", DoubleType()),
    StructField("kpss_p", DoubleType()),
    StructField("kpss_lags", DoubleType()),
    StructField("kpss_stationary", BooleanType()),
])


def stationarity_check(rollup: DataFrame,
                       value_col: str = VALUE_COL) -> DataFrame:
    """Per-source ADF + KPSS diagnostics over rolled series
    (SURVEY.md K12; reference `diagnostics.py:262-319`) — one grouped
    Arrow UDF per source, OLS via numpy.linalg.lstsq inside."""
    import pandas as pd

    from .stats.stationarity import stationarity_verdicts

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_ts")
        v = stationarity_verdicts(pdf["value"].to_numpy())
        return pd.DataFrame([{"source": pdf["source"].iloc[0], **{
            k: float(val) if not isinstance(val, bool) else val
            for k, val in v.items()}}])

    src = rollup.select("source", "bucket_ts",
                        F.col(value_col).cast("double").alias("value"))
    return src.groupBy("source").applyInPandas(
        fn, schema=STATIONARITY_SCHEMA)
