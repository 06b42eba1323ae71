"""Per-partition checkpoint ledger: lineage + throughput metrics + resume.

North rule: "resumable from per-partition checkpoints carrying lineage +
throughput metrics". The ledger is itself a table (FIXTURES.md A2):

    ledger(tier, source, chunk, input_snapshot, rows_in, rows_out,
           wall_ms, points_per_sec, finished_at)

A work unit is (tier, source, chunk) where chunk is a day index of the
bucket. `pending_units` anti-joins the candidate units against the
ledger (SURVEY.md J3), so a re-run after a crash processes only the
missing units; tier writes go through overwrite_partitions, so
replaying a unit is idempotent (byte-identical tiers).
"""

from __future__ import annotations

import time
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (IntegerType, LongType, DoubleType, StringType,
                               StructField, StructType, TimestampType)

from .tableio import TableIO

LEDGER_TABLE = "ledger"
LEDGER_SCHEMA = StructType([
    StructField("tier", StringType()),
    StructField("source", StringType()),
    StructField("chunk", IntegerType()),      # day index since epoch
    StructField("input_snapshot", StringType()),
    StructField("rows_in", LongType()),
    StructField("rows_out", LongType()),
    StructField("wall_ms", LongType()),
    StructField("points_per_sec", DoubleType()),
    StructField("finished_at", TimestampType()),
])


def chunk_col() -> F.Column:
    return F.floor(F.col("bucket_ts").cast("long") / F.lit(86400)).cast("int")


def read_ledger(io: TableIO) -> DataFrame:
    if io.exists(LEDGER_TABLE):
        return io.read(LEDGER_TABLE)
    return io.spark.createDataFrame([], LEDGER_SCHEMA)


def pending_units(candidates: DataFrame, ledger: DataFrame,
                  tier: str) -> DataFrame:
    """(source, chunk) units not yet in the ledger for this tier."""
    done = ledger.filter(F.col("tier") == tier).select("source", "chunk")
    return candidates.select("source", "chunk").distinct() \
        .join(done, ["source", "chunk"], "left_anti")


def record_units(io: TableIO, tier: str, units_with_counts: DataFrame,
                 input_snapshot: str, wall_ms: int) -> None:
    """Append finished units. units_with_counts: (source, chunk,
    rows_in, rows_out). Throughput is attributed evenly by rows."""
    total = units_with_counts.agg(F.sum("rows_out")).collect()[0][0] or 0
    pps = (total / (wall_ms / 1000.0)) if wall_ms > 0 else 0.0
    now = datetime.now(timezone.utc)
    rows = (units_with_counts
            .withColumn("tier", F.lit(tier))
            .withColumn("input_snapshot", F.lit(input_snapshot))
            .withColumn("wall_ms", F.lit(wall_ms).cast("long"))
            .withColumn("points_per_sec", F.lit(float(pps)))
            .withColumn("finished_at", F.lit(now))
            .select([f.name for f in LEDGER_SCHEMA.fields]))
    io.append(LEDGER_TABLE, rows, partition_by=("tier",))


def run_incremental_rollup(spark: SparkSession, io: TableIO, raw: DataFrame,
                           n_salts: int = 16) -> dict[str, int]:
    """Checkpointed tier build: only pending (source, chunk) units are
    (re)computed; tier writes are partition-overwrites ⇒ idempotent.

    Returns per-tier counts of processed units.
    """
    from .rollup import rollup_1m, rollup_cascade

    ledger = read_ledger(io)
    processed: dict[str, int] = {}

    # ---- 1m from raw
    t0 = time.time()
    full_1m = rollup_1m(raw, n_salts=n_salts).withColumn("chunk", chunk_col())
    pend = pending_units(full_1m, ledger, "1m")
    n_pend = pend.count()
    processed["1m"] = n_pend
    if n_pend > 0:
        work = full_1m.join(F.broadcast(pend), ["source", "chunk"], "left_semi")
        work = work.cache()
        io_snapshot = "raw"
        if io.exists("rollup_1m"):
            merged = io.read("rollup_1m").join(
                pend, ["source", "chunk"], "left_anti").unionByName(work)
            io.overwrite_safe("rollup_1m", merged, partition_by=("source",))
        else:
            io.overwrite("rollup_1m", work, partition_by=("source",))
        counts = work.groupBy("source", "chunk").agg(
            F.sum("n_docs").alias("rows_in"),
            F.count(F.lit(1)).alias("rows_out"))
        record_units(io, "1m", counts, io_snapshot,
                     int((time.time() - t0) * 1000))
        work.unpersist()

    # ---- cascades
    for src_tier, dst_tier in (("1m", "1h"), ("1h", "1d")):
        t0 = time.time()
        ledger = read_ledger(io)
        src_df = io.read(f"rollup_{src_tier}")
        full = rollup_cascade(src_df.drop("chunk"), dst_tier) \
            .withColumn("chunk", chunk_col())
        pend = pending_units(full, ledger, dst_tier)
        n_pend = pend.count()
        processed[dst_tier] = n_pend
        if n_pend > 0:
            work = full.join(F.broadcast(pend), ["source", "chunk"], "left_semi")
            work = work.cache()
            if io.exists(f"rollup_{dst_tier}"):
                merged = io.read(f"rollup_{dst_tier}").join(
                    pend, ["source", "chunk"], "left_anti").unionByName(work)
                io.overwrite_safe(f"rollup_{dst_tier}", merged,
                                  partition_by=("source",))
            else:
                io.overwrite(f"rollup_{dst_tier}", work, partition_by=("source",))
            counts = work.groupBy("source", "chunk").agg(
                F.sum("n_docs").alias("rows_in"),
                F.count(F.lit(1)).alias("rows_out"))
            record_units(io, dst_tier, counts,
                         f"rollup_{src_tier}@{io.snapshot_id(f'rollup_{src_tier}')}",
                         int((time.time() - t0) * 1000))
            work.unpersist()
    return processed
