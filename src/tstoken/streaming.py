"""Structured Streaming ingestion for the 1m tier.

The reference is pure batch (SURVEY.md §2.10); the north rule's
"continuous aggregates" get a streaming variant here: readStream →
watermarked tumbling-window aggregation → writeStream. The same bucket/
aggregate expressions as rollup.py, so batch and streaming tiers agree.

The 1h/1d cascades stay batch-incremental (they re-aggregate closed 1m
buckets via the checkpoint ledger), which avoids multi-level streaming
state entirely — at 10^12 scale the finest tier is the only one that
needs sub-minute freshness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rollup import with_event_time


def streaming_rollup_1m(raw_stream: DataFrame,
                        watermark: str = "10 minutes") -> DataFrame:
    """tokens_raw stream → per-minute continuous aggregate.

    outputMode('update')-compatible: late rows inside the watermark
    re-emit their bucket; MERGE on (source, bucket_ts) downstream keeps
    the tier idempotent (same keys as the batch path).
    """
    df = with_event_time(raw_stream)
    df = df.withWatermark("event_ts", watermark)
    agg = (df.groupBy("source", F.window("event_ts", "1 minute").alias("win"))
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum(F.col("n_tok").cast("long")).alias("sum_n_tok"),
                F.min("n_tok").alias("min_n_tok"),
                F.max("n_tok").alias("max_n_tok")))
    return agg.select("source", F.col("win.start").alias("bucket_ts"),
                      "n_docs", "sum_n_tok", "min_n_tok", "max_n_tok",
                      F.lit(False).alias("gap_filled"))


def run_stream_to_memory(spark, raw_stream: DataFrame, query_name: str,
                         watermark: str = "10 minutes"):
    """Test harness: stream → in-memory sink (complete mode)."""
    agg = streaming_rollup_1m(raw_stream, watermark)
    return (agg.writeStream.format("memory").queryName(query_name)
            .outputMode("update").start())
