"""Pin the tok_pipeline steady state (round-5 VERDICT item #1).

Round 4 left an ambiguity: the driver-run bench measured 17.5 s /
28.3k rolled-points/s while the same-round quiet-window re-run said
19.9 s / 24.8k — a ±3 s spread inside the host's documented campaign
band, but unresolved. This harness resolves it with the same protocol
as BENCH/scaling.py: >= CAMPAIGNS independent fresh-process campaigns
over the same staged table, each reporting the min of its post-first
iterations (bench.py's exact pipeline: staged 2M-row parquet ->
salted 1m rollup -> 1h -> 1d cascades -> gap-fill -> fused IQR+MAD
flags), pooled min across campaigns. The campaign-level pooling is
what single bench runs lack — a whole campaign can land in a
contended window and its min is then biased high.

Usage: python BENCH/pipeline_pin.py [campaigns] [rows]
Writes BENCH/pipeline_pin_r5.json; every wall of every campaign stays
recorded. Verdict fields state whether the r4 bar (<= 17 s and
>= 25k pts/s) is met by the pooled min.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.path.join({repo!r}, "src"))
from tstoken.session import get_spark
from tstoken import detect, gapfill, rollup, synth
from pyspark.sql import functions as F

cpus = 32
rows = {rows}
spark = get_spark("pipeline-pin", master=f"local[{{cpus}}]",
                  shuffle_partitions=max(cpus, 8))
spark.sparkContext.setLogLevel("ERROR")
staged = synth.stage_tokens_raw(spark, rows, n_sources=16)

state = {{}}

def tok_pipeline():
    prev = state.pop("t1m", None)
    if prev is not None:
        prev.unpersist(blocking=True)
    raw = spark.read.parquet(staged)
    t1m = rollup.rollup_1m(raw, n_salts=cpus).persist()
    n_1m = t1m.count()
    t1h = rollup.rollup_cascade(t1m, "1h").persist()
    n_1h = t1h.count()
    n_1d = rollup.rollup_cascade(t1h, "1d").count()
    gf = gapfill.gap_fill(t1m, "1m")
    iqr_fl = detect.iqr_flags(gf)
    mad_fl = detect.mad_flags(gf)
    (iqr_fl.select("source", "bucket_ts", F.lit("iqr").alias("m"),
                   "is_outlier")
     .unionByName(mad_fl.select("source", "bucket_ts",
                                F.lit("mad").alias("m"), "is_outlier"))
     .write.format("noop").mode("overwrite").save())
    state["t1m"] = t1m
    t1h.unpersist()
    return n_1m + n_1h + n_1d

walls = []
points = 0
while True:
    t0 = time.time()
    points = tok_pipeline()
    walls.append(round(time.time() - t0, 2))
    n = len(walls)
    if n >= 10:
        break
    if n < 5:
        continue
    best = min(walls[1:])
    if best > walls[0]:
        continue  # contention signature — keep going
    if best >= 0.98 * min(walls[1:-2]):
        break
best = min(walls[1:])
print(json.dumps({{"walls": walls, "wall_sec": best,
                   "rolled_points": points,
                   "points_per_sec": round(points / best, 1)}}))
spark.stop()
"""


def loadavg() -> float:
    return os.getloadavg()[0]


def main():
    campaigns = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    sys.path.insert(0, os.path.join(REPO, "BENCH"))
    from scaling import code_stamp

    stamp = code_stamp()
    runs = []
    for i in range(campaigns):
        pre_load = loadavg()
        t0 = time.time()
        out = subprocess.run(
            [sys.executable, "-c", CHILD.format(repo=REPO, rows=rows)],
            capture_output=True, text=True, timeout=3600)
        line = [l for l in out.stdout.splitlines()
                if l.startswith("{")][-1]
        r = json.loads(line)
        r["pre_loadavg"] = round(pre_load, 2)
        r["campaign_wall"] = round(time.time() - t0, 1)
        runs.append(r)
        print(json.dumps({"campaign": i + 1, **r}), flush=True)
    pooled = min(r["wall_sec"] for r in runs)
    points = runs[0]["rolled_points"]
    pps = round(points / pooled, 1)
    summary = {
        "rows": rows,
        "campaigns": campaigns,
        "code_stamp": stamp,
        "runs": runs,
        "pooled_min_wall_sec": pooled,
        "rolled_points": points,
        "pooled_points_per_sec": pps,
        "bar": {"wall_sec": 17.0, "points_per_sec": 25000.0},
        "meets_wall_bar": pooled <= 17.0,
        "meets_pps_bar": pps >= 25000.0,
    }
    with open(os.path.join(REPO, "BENCH", "pipeline_pin_r5.json"),
              "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
