"""Delta-ready MERGE test (skipped where delta-spark is not installed).

The incremental upsert (reference ``dw3_merge_inc.py:114-125``) ships as
the storage-agnostic anti-join + union (``operators/joins.anti_join_merge``).
On Delta/Iceberg staging the same delete-insert semantics are a MERGE:

    MERGE INTO archive a
    USING (SELECT DISTINCT <keys> FROM increment) i ON <keys match>
    WHEN MATCHED THEN DELETE          -- drop every archived row per key
    ; then APPEND increment           -- whole-key replacement

(The UPDATE-star MERGE form is NOT equivalent: delete-insert replaces
many-to-many per key, which a row-wise UPDATE cannot express.) This test
asserts the two paths produce identical tables whenever the delta
package is available, so the mapping stays honest when the engine runs
on a real lakehouse.
"""

from __future__ import annotations

import importlib.util

import pytest

HAS_DELTA = importlib.util.find_spec("delta") is not None


@pytest.fixture(scope="module")
def spark(tmp_path_factory):
    if not HAS_DELTA:
        yield None
        return
    from delta import configure_spark_with_delta_pip
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master("local[2]")
        .appName("delta-merge")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.sql.warehouse.dir", str(tmp_path_factory.mktemp("delta-warehouse"))
        )
        .config("spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension")
        .config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
    )
    s = configure_spark_with_delta_pip(builder).getOrCreate()
    yield s
    s.stop()


@pytest.mark.skipif(not HAS_DELTA, reason="delta-spark not installed in this container")
def test_merge_into_matches_anti_join_merge(spark, tmp_path):
    from pyspark.sql import Row

    from bp_datawarehouse_ordersfact_spark.operators.joins import anti_join_merge

    archive = spark.createDataFrame(
        [
            Row(k=1, v="a1"),
            Row(k=1, v="a2"),  # many rows per key: whole-key replacement
            Row(k=2, v="b1"),
            Row(k=3, v="c1"),
        ]
    )
    increment = spark.createDataFrame(
        [
            Row(k=1, v="A"),
            Row(k=4, v="D1"),
            Row(k=4, v="D2"),  # many increment rows per key
        ]
    )

    expected = sorted(
        tuple(r) for r in anti_join_merge(archive, increment, ["k"]).collect()
    )

    path = str(tmp_path / "archive_delta")
    archive.write.format("delta").save(path)
    spark.sql(
        f"""
        MERGE INTO delta.`{path}` a
        USING (SELECT DISTINCT k FROM {{inc}}) i ON a.k = i.k
        WHEN MATCHED THEN DELETE
        """,
        inc=increment,
    )
    increment.write.format("delta").mode("append").save(path)

    got = sorted(tuple(r) for r in spark.read.format("delta").load(path).collect())
    assert got == expected
