"""One-off probe: tune adaptive_dip parameters on the TRAINING regime
only (seed 0) — precision/recall per (low, max_density) combo, plus
the frozen baseline. Held-out regimes are never touched here; the
chosen combo is validated afterwards by BENCH/holdout_f1.py.

Usage: python BENCH/adaptive_probe.py
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.join(REPO, "src")):
    if p not in sys.path:
        sys.path.insert(0, p)

ROWS = 500_000
SOURCES = 16
CPUS = 16


def main():
    from pyspark.sql import functions as F

    from tstoken import detect, synth
    from tstoken.gapfill import gap_fill
    from tstoken.rollup import rollup_1m
    from tstoken.session import get_spark

    spark = get_spark("adaptive-probe", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    raw = synth.generate_tokens_raw(spark, ROWS, n_sources=SOURCES)
    gf = gap_fill(rollup_1m(raw), "1m").localCheckpoint()
    gt = (synth.ground_truth(spark, ROWS, n_sources=SOURCES)
          .select("source", "bucket_ts").distinct()
          .join(gf.select("source", "bucket_ts"),
                ["source", "bucket_ts"], "left_semi").cache())
    n_truth = gt.count()
    gaps = gf.filter("gap_filled").select("source", "bucket_ts")

    # source density map, for interpreting which class fires
    dens = (gf.filter(~F.col("gap_filled")).groupBy("source")
            .agg(F.percentile(F.col("n_docs").cast("double"),
                              F.lit(0.5)).alias("med_docs"))
            .orderBy("med_docs"))
    print("per-source median docs/bucket:")
    for r in dens.collect():
        print(f"  {r['source']}: {r['med_docs']}")

    grid_out = []

    def score(df, label):
        pred = (df.filter("is_outlier").select("source", "bucket_ts")
                .join(gaps, ["source", "bucket_ts"], "left_anti")
                .distinct().cache())
        n_pred = pred.count()
        tp = pred.join(gt, ["source", "bucket_ts"], "left_semi").count()
        prec = tp / max(n_pred, 1)
        rec = tp / max(n_truth, 1)
        f1 = 2 * prec * rec / max(prec + rec, 1e-9)
        print(f"{label:34s} pred={n_pred:5d} tp={tp:4d} "
              f"P={prec:.3f} R={rec:.3f} F1={f1:.4f}", flush=True)
        grid_out.append({"variant": label, "n_pred": n_pred, "tp": tp,
                         "precision": round(prec, 4),
                         "recall": round(rec, 4), "f1": round(f1, 4)})
        pred.unpersist()
        return f1

    t0 = time.time()
    score(detect.extrema_ensemble_flags(gf), "frozen (dip 8.0)")
    for low in (5.0, 6.0, 6.5, 7.0):
        for dmax in (1.5, 2.0, 3.0):
            score(detect.extrema_ensemble_flags(
                gf, adaptive_dip=True, adaptive_dip_low=low,
                adaptive_dip_max_density=dmax),
                f"adaptive low={low} dens<={dmax}")
    print(f"total {time.time() - t0:.0f}s")
    import json
    with open(os.path.join(REPO, "BENCH", "adaptive_probe.json"),
              "w") as f:
        json.dump({"rows": ROWS, "sources": SOURCES,
                   "regime": "train(seed0) ONLY", "n_truth": n_truth,
                   "grid": grid_out}, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
