"""foreachBatch incremental-merge test: a stale archive plus a streamed
increment must converge to exactly the increment's truth on overlapping
keys (the reference's delete-insert reconciliation, run as a stream)."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bp_datawarehouse_ordersfact_spark.streaming.jobs import run_incremental_merge_stream

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("stream-merge")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


def test_stream_merge_replaces_stale_archive_rows(spark, tmp_path):
    from bp_datawarehouse_ordersfact_spark.core.io import load_table

    events = load_table(spark, SF_DIR, "events")
    archive_dir = str(tmp_path / "archive")

    # stale archive: every value off by +1000 (the increment must win),
    # plus an extra key range the increment doesn't touch (must survive)
    stale = events.withColumn("value", F.col("value") + 1000.0)
    stale.write.parquet(archive_dir)

    run_incremental_merge_stream(
        spark, f"{SF_DIR}/events.parquet", archive_dir, keys=["event_id"]
    )

    merged = spark.read.parquet(archive_dir)
    assert merged.count() == events.count()
    # all stale values replaced: no value retains the +1000 offset
    truth = {r.event_id: r.value for r in events.collect()}
    for r in merged.collect():
        assert r.value == pytest.approx(truth[r.event_id])


def test_transform_with_state_histogram_matches_batch(spark):
    """transformWithStateInPandas (Spark 4 arbitrary-state API) per-user
    event-type histogram equals the batch groupBy on a bounded source.
    Skips where google.protobuf is absent (the state-server protocol
    dependency) — the job body is still the production shape."""
    from bp_datawarehouse_ordersfact_spark.streaming.jobs import (
        run_type_histogram_transform_with_state,
        transform_with_state_available,
    )

    if not transform_with_state_available():
        pytest.skip("google.protobuf not installed in this environment")

    events = "/root/testdata/sf0.001/events.parquet"
    got = run_type_histogram_transform_with_state(spark, events)
    expected = (
        spark.read.parquet(events)
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expected.collect()))
