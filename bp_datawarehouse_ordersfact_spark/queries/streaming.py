"""Streaming queries (Structured Streaming executed with availableNow
triggers so the driver's batch oracle can verify them)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming.jobs import (
    run_session_agg_availablenow,
    run_sliding_agg_availablenow,
    run_stateful_user_stats_availablenow,
    run_stream_dedup_availablenow,
    run_tumbling_agg_availablenow,
)

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


def q_stream_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h windows every 30min with a 2h watermark. The batch
    oracle expands each event into its two containing windows (epoch-grid
    arithmetic identical to Spark's window assignment)."""
    return run_sliding_agg_availablenow(spark, f"{sf_dir}/events.parquet")


QUERIES["stream_sliding_agg"] = q_stream_sliding_agg
ORACLES["stream_sliding_agg"] = """
    SELECT CAST(to_timestamp((CAST(floor(epoch(ts) / 1800) AS BIGINT) - k) * 1800)
                AS TIMESTAMP) AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k)
    GROUP BY 1, 2
"""


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once source (stream unioned with itself) collapsed to
    exactly-once by streaming dropDuplicates on event_id; the oracle is the
    single-copy batch rollup — replays must not change the answer."""
    return run_stream_dedup_availablenow(spark, f"{sf_dir}/events.parquet")


QUERIES["stream_dedup"] = q_stream_dedup
ORACLES["stream_dedup"] = """
    SELECT event_type, count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM events GROUP BY 1
"""


def q_stream_session_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows (30-min inactivity gap) per user; the
    oracle is batch gaps-and-islands sessionization — same sessions, same
    aggregates (no exact-30-min gaps exist in the data, so the boundary
    convention can't diverge)."""
    return run_session_agg_availablenow(spark, f"{sf_dir}/events.parquet")


QUERIES["stream_session_agg"] = q_stream_session_agg
ORACLES["stream_session_agg"] = """
    WITH flagged AS (
      SELECT user_id, ts, value,
             -- INCLUSIVE <=: verified empirically — Spark merges an event
             -- landing exactly at last_event + gap into the same session
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_s
      FROM events),
    sess AS (
      SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged)
    SELECT min(ts) AS session_start, user_id,
           count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM sess GROUP BY user_id, sid
"""


def q_stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState per-user running stats — the custom
    stateful operator path. Under availableNow with a single source file
    the run is exactly one micro-batch, so each user emits one final
    row and the output equals the batch per-user aggregate — which makes
    the run fully oracle-checkable (emission CADENCE is the only
    batching-dependent property, and a one-batch run has none)."""
    from pyspark.sql import functions as F

    from ..functions.rounding import rnd

    out = run_stateful_user_stats_availablenow(spark, f"{sf_dir}/events.parquet")
    return out.select(
        "user_id",
        "n_events",
        rnd(F.col("total_value"), 2).alias("total_value"),
        rnd(F.col("max_value"), 2).alias("max_value"),
    )


QUERIES["stream_stateful_user_stats"] = q_stream_stateful_user_stats
ORACLES["stream_stateful_user_stats"] = """
    SELECT user_id,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value,
           round(max(value), 2) AS max_value
    FROM events
    GROUP BY user_id
"""


def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (purchase ← same-user clicks within
    the previous hour). Watermarks on both sides + the bounded interval
    condition give finite join state on unbounded streams; availableNow
    over the static source makes the output equal the batch interval
    join, so the oracle hash-checks every attribution pair."""
    from ..streaming.jobs import run_stream_stream_join_availablenow

    return run_stream_stream_join_availablenow(spark, f"{sf_dir}/events.parquet")


QUERIES["stream_stream_join"] = q_stream_stream_join
ORACLES["stream_stream_join"] = """
    SELECT p.user_id,
           p.event_id AS purchase_id,
           c.event_id AS click_id,
           p.ts AS purchase_ts,
           c.ts AS click_ts,
           round(p.value, 2) AS purchase_value
    FROM events p
    JOIN events c
      ON p.user_id = c.user_id
     AND c.ts <= p.ts
     AND c.ts >= p.ts - INTERVAL 1 HOUR
    WHERE p.event_type = 'purchase'
      AND c.event_type = 'click'
"""
