"""Structured Streaming jobs.

The reference is batch-only (SURVEY §2.14): its 'incrementality' is a
re-pulled 61-day window reconciled by delete-insert. Here the same
semantics run as real streams: file source → event-time windowed
aggregation with a watermark → sink, with `availableNow` triggers giving
batch-equivalent runs (that's what the correctness oracle checks).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import rnd


def run_tumbling_agg_availablenow(
    spark: SparkSession,
    events_path: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time window aggregation over the events table,
    executed as a bounded stream (`Trigger.AvailableNow`) into a memory
    sink. In production the source is a directory/Kafka stream and the
    sink a Delta table; the plan is identical.

    The watermark bounds state: windows older than (max event time −
    watermark) are finalized and evicted — that is what makes this plan
    runnable on an unbounded stream, unlike the reference's re-pull."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(events_path).schema
    # The streaming file source requires a directory; stage a symlink dir
    # (in production this IS a directory/Kafka topic — testdata is one file).
    stage_dir = os.path.join(
        tempfile.gettempdir(), f"stream_src_{abs(hash(events_path)) % 10**8}"
    )
    os.makedirs(stage_dir, exist_ok=True)
    link = os.path.join(stage_dir, os.path.basename(events_path))
    if not os.path.exists(link):
        os.symlink(events_path, link)
    src = spark.readStream.schema(schema).parquet(stage_dir)
    if dict(src.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) parquet read as int64 nanos → truncate to micros
        src = src.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    stream = (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            rnd(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("event_type"),
            F.col("n_events"),
            F.col("total_value"),
        )
    )
    sink = f"stream_sink_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)
