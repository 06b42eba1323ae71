"""Two-parallelism scaling evidence (BASELINE.json: throughput scaling
efficiency >= 0.8 from N to 4N executors; sandbox proxy per the task
brief: the same job at local[8] and local[32] on identical input).

Runs the token-engine pipeline (synth -> salted 1m rollup -> 1h -> 1d
-> IQR+MAD flags) in a fresh Spark session per parallelism level and
reports throughput at both plus efficiency = (T_8 / T_32) / 4.

Usage: python BENCH/scaling.py [rows] — writes BENCH/scaling.json.
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

cpus = {cpus}
rows = {rows}
spark = get_spark("scaling", master=f"local[{{cpus}}]",
                  shuffle_partitions=max(cpus, 8))
spark.sparkContext.setLogLevel("ERROR")
t0 = time.time()
raw = synth.generate_tokens_raw(spark, rows, n_sources=16)
t1m = rollup.rollup_1m(raw, n_salts=cpus).localCheckpoint()
n_1m = t1m.count()
t1h = rollup.rollup_cascade(t1m, "1h").localCheckpoint()
n_1h = t1h.count()
n_1d = rollup.rollup_cascade(t1h, "1d").count()
gf = gapfill.gap_fill(t1m, "1m")
detect.iqr_flags(gf).write.format("noop").mode("overwrite").save()
detect.mad_flags(gf).write.format("noop").mode("overwrite").save()
wall = time.time() - t0
points = n_1m + n_1h + n_1d
print(json.dumps({{"cpus": cpus, "rows": rows, "wall_sec": round(wall, 2),
                   "rolled_points": points,
                   "points_per_sec": round(points / wall, 1),
                   "raw_rows_per_sec": round(rows / wall, 1)}}))
spark.stop()
"""


def run(cpus: int, rows: int) -> dict:
    code = CHILD.format(repo=REPO, cpus=cpus, rows=rows)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3600)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    results = {}
    for cpus in (8, 32):
        results[f"local[{cpus}]"] = run(cpus, rows)
    t8 = results["local[8]"]["wall_sec"]
    t32 = results["local[32]"]["wall_sec"]
    eff = (t8 / t32) / 4.0
    summary = {
        "rows": rows,
        "local8": results["local[8]"],
        "local32": results["local[32]"],
        "speedup_8_to_32": round(t8 / t32, 3),
        "scaling_efficiency_N_to_4N": round(eff, 3),
        "criterion": ">= 0.8",
        "pass": eff >= 0.8,
    }
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
