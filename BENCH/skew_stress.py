"""Adversarial skew stress for the salted 1m rollup (round-5 VERDICT
item #4 — the north rule's "salted repartitioning by source handles
skewed key cardinalities" claim, measured instead of asserted).

Three staged tables, all fresh-process measured (min of post-first
iterations, same protocol as BENCH/scaling.py):

  balanced    the bench generator's default geometry (zipf 1.2);
  skew90      zipf 3.5 over 16 sources — ~90% of all rows land in ONE
              source (the actual share is measured and recorded);
  hotminute   the truly pathological shape zipf cannot produce with
              this generator (a bigger source spreads over MORE
              minutes at a fixed docs/min rate, so per-key cardinality
              stays bounded): 90% of docs carry wrapped sequence
              numbers, concentrating them onto ~9 minute buckets —
              per-(source,bucket_ts) explode cardinality in the
              hundreds of millions. Run twice: n_salts=32 (the
              engine's two-phase salted agg) and n_salts=1 (salting
              disabled — every hot key is ONE reducer task).

Per-run evidence beyond wall clock: Spark event logs are enabled and
the dominant stage's task-duration spread (max/median) is parsed out —
the direct measurement of "task-time balance".

Criteria recorded in the summary:
  - skew90 rolled-points throughput within ~20% of balanced (VERDICT
    wording; rolled points differ per table so points/sec is the
    comparable unit);
  - hotminute salted beats unsalted wall AND shows a smaller dominant-
    stage task spread.

Usage: python BENCH/skew_stress.py [rows] — writes BENCH/skew_stress.json
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import glob, json, os, sys, time
sys.path.insert(0, os.path.join({repo!r}, "src"))
from tstoken.session import get_spark
from tstoken import rollup

evdir = {evdir!r}
os.makedirs(evdir, exist_ok=True)
spark = get_spark("skew-stress", master="local[32]",
                  shuffle_partitions=32,
                  extra_conf={{"spark.eventLog.enabled": "true",
                               "spark.eventLog.dir": "file:" + evdir}})
spark.sparkContext.setLogLevel("ERROR")

walls = []
for i in range({iters}):
    t0 = time.time()
    raw = spark.read.parquet({path!r})
    t1m = rollup.rollup_1m(raw, n_salts={n_salts})
    t1m.write.format("noop").mode("overwrite").save()
    walls.append(round(time.time() - t0, 2))
points = rollup.rollup_1m(spark.read.parquet({path!r}),
                          n_salts={n_salts}).count()
best = min(walls[1:]) if len(walls) > 1 else walls[0]
print(json.dumps({{"walls": walls, "wall_sec": best,
                   "rolled_points": points,
                   "points_per_sec": round(points / best, 1)}}))
spark.stop()
"""

STAGE = r"""
import json, sys
sys.path.insert(0, {src!r})
from pyspark.sql import functions as F
from tstoken.session import get_spark
from tstoken import synth

spark = get_spark("skew-stage", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
kind = {kind!r}
rows = {rows}
path = {path!r}
if kind == "balanced":
    df = synth.generate_tokens_raw(spark, rows, n_sources=16)
elif kind == "skew90":
    df = synth.generate_tokens_raw(spark, rows, n_sources=16,
                                   zipf_exp=3.5)
elif kind == "hotminute":
    # 90% hot: unique doc_ids whose LAST dash field (the seq the
    # engine derives event_ts from) wraps modulo 180 -> with src-000's
    # 3 s step all hot docs land in ~9 minute buckets; 10% cold docs
    # keep the bench shape. n_tok/tokens mirror the synth generator's
    # distribution so per-doc explode cost matches.
    n_hot = int(rows * 0.9)
    hot = (spark.range(0, n_hot, numPartitions=max(32, n_hot // 50_000))
           .withColumn("seq", F.pmod(F.col("id"), F.lit(180)))
           .withColumn("n_tok", (F.lit(64) + F.pmod(
               F.col("id") * F.lit(2654435761) + F.lit(17),
               F.lit(1985))).cast("int"))
           .withColumn("source", F.lit("src-000"))
           .withColumn("doc_id", F.format_string(
               "src-000-u%012d-%012d", F.col("id"), F.col("seq")))
           .withColumn("tokens", F.transform(
               F.sequence(F.lit(0), F.col("n_tok") - 1),
               lambda i: F.pmod(F.col("id") * F.lit(131) + i + F.lit(7),
                                F.lit(50257)).cast("int")))
           .select("doc_id", "tokens", "n_tok", "source"))
    cold = synth.generate_tokens_raw(spark, rows - n_hot, n_sources=15)
    # shift cold sources off src-000 so the hot source stays pure
    cold = cold.withColumn(
        "source", F.regexp_replace("source", "^src-000$", "src-015"))
    df = hot.unionByName(cold)
else:
    raise ValueError(kind)
df.write.mode("overwrite").parquet(path)
top = (spark.read.parquet(path).groupBy("source").count()
       .orderBy(F.desc("count")).limit(1).collect()[0])
total = spark.read.parquet(path).count()
print(json.dumps({{"top_source": top["source"],
                   "top_share": round(top["count"] / total, 4),
                   "rows": total}}))
spark.stop()
"""


def run(code: str) -> dict:
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=7200)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"child produced no JSON:\n{out.stderr[-3000:]}")
    return json.loads(lines[-1])


def task_spread(evdir: str) -> dict:
    """Parse the newest event log: per-stage task durations; return
    the dominant stage's (by total task time) max/median spread."""
    logs = sorted(glob.glob(os.path.join(evdir, "*")),
                  key=os.path.getmtime)
    if not logs:
        return {"error": "no event log"}
    stages: dict[int, list[float]] = {}
    with open(logs[-1]) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") != "SparkListenerTaskEnd":
                continue
            ti = ev.get("Task Info") or {}
            dur = (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) \
                / 1000.0
            stages.setdefault(ev.get("Stage ID", -1), []).append(dur)
    if not stages:
        return {"error": "no TaskEnd events"}
    dom = max(stages, key=lambda s: sum(stages[s]))
    ds = sorted(stages[dom])
    med = ds[len(ds) // 2]
    return {
        "dominant_stage": dom,
        "n_tasks": len(ds),
        "task_sec_median": round(med, 2),
        "task_sec_max": round(ds[-1], 2),
        "max_over_median": round(ds[-1] / max(med, 1e-9), 2),
        "stage_task_sec_total": round(sum(ds), 1),
    }


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    hot_rows = rows // 2
    src = os.path.join(REPO, "src")
    results = {"rows": rows, "hotminute_rows": hot_rows}

    tables = {}
    for kind, n in (("balanced", rows), ("skew90", rows),
                    ("hotminute", hot_rows)):
        path = f"/tmp/tstoken_skew_{kind}_{n}"
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            info = run(STAGE.format(src=src, kind=kind, rows=n, path=path))
        else:
            info = {"path_reused": True}
        tables[kind] = {"path": path, **info}
        print(json.dumps({kind: tables[kind]}), flush=True)
    results["tables"] = tables

    runs = {}
    jobs = [("balanced", tables["balanced"]["path"], 32, 4),
            ("skew90", tables["skew90"]["path"], 32, 4),
            ("hotminute_salted", tables["hotminute"]["path"], 32, 4),
            ("hotminute_unsalted", tables["hotminute"]["path"], 1, 2)]
    for name, path, n_salts, iters in jobs:
        evdir = f"/tmp/tstoken_skew_ev_{name}_{int(time.time())}"
        r = run(CHILD.format(repo=REPO, path=path, n_salts=n_salts,
                             iters=iters, evdir=evdir))
        r["spread"] = task_spread(evdir)
        runs[name] = r
        print(json.dumps({name: r}), flush=True)
    results["runs"] = runs

    bal, sk = runs["balanced"], runs["skew90"]
    hs, hu = runs["hotminute_salted"], runs["hotminute_unsalted"]
    results["criteria"] = {
        "skew90_pps_over_balanced":
            round(sk["points_per_sec"] / bal["points_per_sec"], 3),
        "skew90_within_20pct":
            sk["points_per_sec"] >= 0.8 * bal["points_per_sec"],
        "hotminute_salted_speedup":
            round(hu["wall_sec"] / hs["wall_sec"], 2),
        "hotminute_salted_beats_unsalted":
            hs["wall_sec"] < hu["wall_sec"],
        "hotminute_spread_salted":
            hs["spread"].get("max_over_median"),
        "hotminute_spread_unsalted":
            hu["spread"].get("max_over_median"),
    }
    with open(os.path.join(REPO, "BENCH", "skew_stress.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results["criteria"]))


if __name__ == "__main__":
    main()
