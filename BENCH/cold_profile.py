"""Root-cause the tok_pipeline cold/steady gap (VERDICT r3 #6).

BENCH_r03 recorded tok_pipeline_cold 61.3 s vs steady 16.7 s at sf0.1.
Hypotheses: (a) generic JVM/codegen infrastructure warm-up (JIT of
Spark's own classes — would be absorbed by ANY prior job); (b)
plan-shape-specific JIT (only repeating the SAME pipeline warms it);
(c) Python worker spin-up / Arrow init; (d) parquet footer reads on
first touch of the staged table.

Design: two fresh processes over the same staged table.

  mode=cold    pipeline immediately, 3 iterations, per-phase walls
  mode=warmed  run an UNRELATED warm-up job first (groupBy-agg over a
               synthetic range — exercises codegen, shuffle, parquet
               write/read machinery, but a different plan shape), then
               the same 3 pipeline iterations

If warmed-iter1 ≈ cold-iter2, the gap is generic infra warm-up (a);
if warmed-iter1 ≈ cold-iter1, it is plan-specific (b). Phase walls
localize the cost. Writes one JSON line per mode; cold_profile.json
aggregates via --both (runs each mode as a subprocess, sequentially).
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.join(REPO, "src")):
    if p not in sys.path:
        sys.path.insert(0, p)

ROWS = int(os.environ.get("TSTOKEN_BENCH_ROWS", "2000000"))
SOURCES = int(os.environ.get("TSTOKEN_BENCH_SOURCES", "16"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ITERS = 3


def run_mode(mode: str) -> dict:
    from pyspark.sql import functions as F

    from tstoken import detect, gapfill, rollup, synth
    from tstoken.session import get_spark

    spark = get_spark(f"tstoken-coldprof-{mode}", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 8))
    spark.sparkContext.setLogLevel("ERROR")
    t_session = time.time()
    staged = synth.stage_tokens_raw(spark, ROWS, n_sources=SOURCES)

    if mode == "warmed":
        # unrelated plan shape: range -> wide agg -> shuffle -> collect
        t0 = time.time()
        (spark.range(0, 20_000_000)
         .withColumn("k", F.pmod(F.col("id") * 2654435761, F.lit(997)))
         .withColumn("v", F.sin(F.col("id").cast("double")))
         .groupBy("k").agg(F.sum("v"), F.avg("v"), F.max("v"))
         .orderBy("k").count())
        warmup_wall = time.time() - t0
    else:
        warmup_wall = 0.0

    iters = []
    prev = None
    for _ in range(ITERS):
        if prev is not None:
            prev.unpersist(blocking=True)
        phases = {}
        t0 = time.time()
        raw = spark.read.parquet(staged)
        t1m = rollup.rollup_1m(raw, n_salts=CPUS).persist()
        n_1m = t1m.count()
        phases["rollup_1m"] = round(time.time() - t0, 3)
        t1 = time.time()
        t1h = rollup.rollup_cascade(t1m, "1h").persist()
        t1h.count()
        rollup.rollup_cascade(t1h, "1d").count()
        t1h.unpersist()
        phases["cascades"] = round(time.time() - t1, 3)
        t1 = time.time()
        gf = gapfill.gap_fill(t1m, "1m")
        iqr_fl = detect.iqr_flags(gf)
        mad_fl = detect.mad_flags(gf)
        (iqr_fl.select("source", "bucket_ts",
                       F.lit("iqr").alias("m"), "is_outlier")
         .unionByName(mad_fl.select("source", "bucket_ts",
                                    F.lit("mad").alias("m"), "is_outlier"))
         .write.format("noop").mode("overwrite").save())
        phases["gapfill_flags"] = round(time.time() - t1, 3)
        phases["total"] = round(time.time() - t0, 3)
        iters.append(phases)
        prev = t1m
    out = {"mode": mode, "rows": ROWS, "cpus": CPUS,
           "warmup_wall": round(warmup_wall, 3),
           "session_to_first_total": round(
               iters[0]["total"] + warmup_wall, 3),
           "iters": iters, "n_1m": n_1m}
    spark.stop()
    return out


def main():
    if "--both" in sys.argv:
        results = {}
        for mode in ("cold", "warmed"):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), mode],
                capture_output=True, text=True)
            lines = [ln for ln in r.stdout.splitlines()
                     if ln.startswith("{")]
            if r.returncode != 0 or not lines:
                raise RuntimeError(
                    f"{mode} child failed (rc={r.returncode}); "
                    f"stderr tail: {r.stderr[-2000:]}")
            results[mode] = json.loads(lines[-1])
        out = os.path.join(REPO, "BENCH", "cold_profile.json")
        with open(out, "w") as f:
            json.dump(results, f, indent=1)
            f.write("\n")
        print(json.dumps(results, indent=1))
        return
    mode = sys.argv[1] if len(sys.argv) > 1 else "cold"
    print(json.dumps(run_mode(mode)))


if __name__ == "__main__":
    main()
