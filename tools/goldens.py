"""Golden fixtures for the rows-only (non-SQL-oracle) contract queries.

Eight queries have no exact SQL oracle of their own (iterative LOESS
in STL/MSTL, Rosner ESD, ADF/KPSS regressions, the binary codec,
binary media decoders, and the two xxhash64 dedup pipelines whose md5
oracle twins pin logic but not the xxhash64 outputs) so the driver
records only row counts for them, and the pytest checks are
behavioral ranges — silent numeric drift would pass. These goldens
pin the exact output at sf0.001: a canonical
sorted serialization of every row, digested, checked into
tests/goldens/ and exact-compared in CI (tests/test_goldens.py).

Regenerate ONLY after an intentional kernel change, with:

    python tools/goldens.py            # writes tests/goldens/*.json

and commit the diff alongside the kernel change so review sees both.
"""

import hashlib
import json
import math
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.join(REPO, "src")):
    if p not in sys.path:
        sys.path.insert(0, p)

GOLDEN_DIR = os.path.join(REPO, "tests", "goldens")
SF_DIR = "/root/testdata/sf0.001"

# the rows-only queries from __spark_entry__.queries(); tok_compress_blocks
# included because its block framing (lengths per chunk) is likewise
# unpinnable by SQL
GOLDEN_QUERIES = [
    "tok_stl_flags",
    "tok_mstl_flags",
    "tok_esd_flags",
    "tok_stationarity",
    "tok_compress_blocks",
    "media_features",
    # the two xxhash64 dedup pipelines: their md5 oracle twins pin the
    # pipeline LOGIC in DuckDB, but a drift in the xxhash64-specific
    # path (seeding, slot mixing) would pass — these goldens pin the
    # exact outputs directly (round-4 VERDICT item #2)
    "doc_minhash_pairs",
    "doc_simhash_pairs",
]


def _flags_with_scores(method):
    # the contract queries project flags only (booleans), so a numeric
    # drift that flips no flag would hide; the golden pins the rounded
    # detector SCORE per row as well (the STL perturbation experiment
    # showed flag-only goldens miss a trend-window constant change)
    def q(spark, sf_dir):
        import __spark_entry__ as entry
        from pyspark.sql import functions as F
        from tstoken.detect import grouped_flags
        from tstoken.gapfill import gap_fill
        from tstoken.rollup import rollup_1m
        gf = gap_fill(rollup_1m(entry._tok_raw(spark)), "1m")
        fl = grouped_flags(gf, "1m", method)
        return fl.select("source", "bucket_ts", "method", "is_outlier",
                         F.round("score", 6).alias("score"))
    return q


# golden-only builders override queries()[name] where the contract
# projection is too coarse to pin the kernel
GOLDEN_BUILDERS = {
    "tok_stl_flags": _flags_with_scores("stl"),
    "tok_mstl_flags": _flags_with_scores("mstl"),
    "tok_esd_flags": _flags_with_scores("esd"),
}


def _fmt(v) -> str:
    import datetime

    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return "null"
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            # distinct from the None/NaT token: a kernel drift that
            # turns a NaN score into a true NULL (or vice versa) must
            # change the digest (ADVICE r4)
            return "nan"
        # queries already round to <=6 decimals; re-round for a stable
        # text form independent of float repr quirks
        return repr(round(f, 6))
    if isinstance(v, (bytes, bytearray)):
        return hashlib.md5(bytes(v)).hexdigest()
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return v.isoformat()
    return str(v)


def canonical_lines(df) -> list:
    """Spark DataFrame -> sorted canonical row serialization."""
    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    lines = sorted(
        "|".join(_fmt(v) for v in row)
        for row in pdf.itertuples(index=False, name=None))
    return [",".join(cols)] + lines


def digest(lines) -> str:
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()


def build_golden(spark, name: str) -> dict:
    import __spark_entry__ as entry

    fn = GOLDEN_BUILDERS.get(name) or entry.queries()[name]
    lines = canonical_lines(fn(spark, SF_DIR))
    try:
        commit = subprocess.run(
            ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True).stdout.strip()
    except OSError:
        commit = "unknown"
    return {
        "query": name,
        "sf_dir": SF_DIR,
        "rows": len(lines) - 1,
        "sha256": digest(lines),
        "columns": lines[0],
        "sample": lines[1:6],
        "generated_at_commit": commit,
    }


def main():
    from tstoken.session import get_spark

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    spark = get_spark("tstoken-goldens", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    for name in GOLDEN_QUERIES:
        g = build_golden(spark, name)
        out = os.path.join(GOLDEN_DIR, f"{name}.json")
        with open(out, "w") as f:
            json.dump(g, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {out}: {g['rows']} rows sha={g['sha256'][:12]}")
    spark.stop()


if __name__ == "__main__":
    main()
