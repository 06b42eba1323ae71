"""Data-only diagnostics parity (SURVEY.md §2.9 / round-1 verdict
"what's missing" #1).

The reference's diagnostics module is mostly matplotlib plot builders
(`reference/src/pycatcher/diagnostics.py:58,196,237,391,...`); the
sandbox has no matplotlib, so this module implements the DATA halves —
the exact frames those plots draw — as native Spark operators:

  - monthwise_box: per (source, month) box-plot statistics, the data
    behind `build_monthwise_plot` (diagnostics.py:237-259), computed
    with one exact-percentile aggregation (SQL-expressible → oracled).
  - decompose_tier: per-source seasonal/trend/resid/observed export
    over a rolled tier, the Spark analogue of
    `build_decomposition_results` (diagnostics.py:322-388) — classic
    additive/multiplicative decomposition auto-selected by SSACF, one
    grouped Arrow UDF per source (bounded series, never raw rows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, StringType, StructField,
                               StructType, TimestampType)

from .rollup import TIER_PERIOD

DECOMP_SCHEMA = StructType([
    StructField("source", StringType()),
    StructField("bucket_ts", TimestampType()),
    StructField("observed", DoubleType()),
    StructField("seasonal", DoubleType()),
    StructField("trend", DoubleType()),
    StructField("resid", DoubleType()),
    StructField("model", StringType()),
])


def monthwise_box(daily: DataFrame, value_col: str = "n_events",
                  ts_col: str = "bucket_ts") -> DataFrame:
    """Per-(source, month) box-plot statistics.

    Data half of the reference's month-wise box plot
    (`diagnostics.py:237-259`): seaborn's boxplot over (Month-Year,
    Count) reduces to exactly these aggregates — quartiles with linear
    interpolation (matplotlib's default), 1.5·IQR whiskers clipped to
    the data, and the count of fliers. One shuffle on (source, month);
    every statistic is a native aggregate under codegen.
    """
    v = F.col(value_col).cast("double")
    q = F.percentile(v, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    base = (daily.groupBy(
        "source", F.date_trunc("month", F.col(ts_col)).alias("month"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.min(v).alias("vmin"), F.max(v).alias("vmax"),
             q.alias("q")))
    q1, med, q3 = base["q"][0], base["q"][1], base["q"][2]
    iqr = q3 - q1
    lo_fence = q1 - 1.5 * iqr
    hi_fence = q3 + 1.5 * iqr
    stats = base.select(
        "source", "month", "n", "vmin", "vmax",
        q1.alias("q1"), med.alias("median"), q3.alias("q3"))
    # whiskers = extreme data points inside the fences; fliers = points
    # outside. Second pass joins the (tiny, broadcast) fences back.
    fences = base.select("source", "month", lo_fence.alias("lo"),
                         hi_fence.alias("hi"))
    pts = daily.select(
        "source", F.date_trunc("month", F.col(ts_col)).alias("month"),
        v.alias("v")).join(F.broadcast(fences), ["source", "month"])
    whisk = (pts.groupBy("source", "month")
             .agg(F.min(F.when((F.col("v") >= F.col("lo")), F.col("v")))
                   .alias("whisker_lo"),
                  F.max(F.when((F.col("v") <= F.col("hi")), F.col("v")))
                   .alias("whisker_hi"),
                  F.sum(F.when((F.col("v") < F.col("lo"))
                               | (F.col("v") > F.col("hi")), 1)
                         .otherwise(0)).alias("n_fliers")))
    return stats.join(whisk, ["source", "month"])


def decompose_tier(rollup: DataFrame, tier: str,
                   value_col: str = "sum_n_tok") -> DataFrame:
    """Per-source decomposition export over a rolled tier.

    Spark analogue of `build_decomposition_results`
    (`reference/src/pycatcher/diagnostics.py:322-388`): classic
    seasonal decomposition, additive vs multiplicative chosen by the
    smaller residual SSACF (the reference's selector, catch.py
    semantics via tstoken.compat), emitted as one tidy frame
    (observed/seasonal/trend/resid + chosen model) per source.
    """
    period = TIER_PERIOD[tier]

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        from . import compat
        from .stats.decompose import seasonal_decompose

        pdf = pdf.sort_values("bucket_ts").reset_index(drop=True)
        x = pdf["value"].to_numpy(dtype=np.float64)
        n = len(x)
        if n < 2 * period + 1:
            nan = np.full(n, np.nan)
            return pd.DataFrame({
                "source": pdf["source"], "bucket_ts": pdf["bucket_ts"],
                "observed": x, "seasonal": nan, "trend": nan,
                "resid": nan, "model": "too_short"})
        dec_a = seasonal_decompose(x, "additive", period=period)
        model = "additive"
        dec = dec_a
        if np.all(x > 0):
            dec_m = seasonal_decompose(x, "multiplicative", period=period)
            if compat.get_ssacf(compat.get_residuals(dec_a)) \
                    >= compat.get_ssacf(compat.get_residuals(dec_m)):
                dec, model = dec_m, "multiplicative"
        return pd.DataFrame({
            "source": pdf["source"], "bucket_ts": pdf["bucket_ts"],
            "observed": dec.observed, "seasonal": dec.seasonal,
            "trend": dec.trend, "resid": dec.resid, "model": model})

    src = rollup.select("source", "bucket_ts",
                        F.col(value_col).cast("double").alias("value"))
    return src.groupBy("source").applyInPandas(fn, schema=DECOMP_SCHEMA)
