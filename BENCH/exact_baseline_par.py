"""Measure the exact-baseline embedding queries (BNLJ cosine scoring)
at the big-SF dir, where the corpus parquet is ONE file: without an
explicit repartition of the stream side, the whole O(n*q)/O(n^2)
scoring runs in a single task. Run this script at two working trees
(with/without the simsearch repartition fix) and compare walls — the
effect is a task-count change (1 -> defaultParallelism), far above
the host's documented contention band.

Usage: python BENCH/exact_baseline_par.py [sf_dir] [label]
Prints one JSON line with min-of-2 walls per query.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.join(REPO, "src")):
    if p not in sys.path:
        sys.path.insert(0, p)

QUERIES = ["emb_cosine_topk", "emb_neardup_pairs"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tstoken_sfbig"
    label = sys.argv[2] if len(sys.argv) > 2 else "run"

    import __spark_entry__ as entrymod
    from tstoken.session import get_spark

    spark = get_spark("exact-baseline-par", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    walls = {}
    for name in QUERIES:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            best = min(best, time.time() - t0)
        walls[name] = round(best, 2)
    spark.stop()
    print(json.dumps({"label": label, "sf_dir": sf_dir, "walls": walls}))


if __name__ == "__main__":
    main()
