"""Streaming queries (Structured Streaming executed with availableNow
triggers so the driver's batch oracle can verify them)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming.jobs import run_tumbling_agg_availablenow

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def q_stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows over the events stream
    (readStream → watermark → windowed agg → memory sink). The oracle is
    the batch equivalent: date_trunc('hour', ts)."""
    return run_tumbling_agg_availablenow(spark, f"{sf_dir}/events.parquet")


QUERIES["stream_tumbling_agg"] = q_stream_tumbling_agg
ORACLES["stream_tumbling_agg"] = """
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
"""
