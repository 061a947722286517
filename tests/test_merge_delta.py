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


@pytest.mark.skipif(not HAS_DELTA, reason="delta-spark not installed in this container")
def test_scd2_as_two_action_merge_matches_operator(spark, tmp_path):
    """operators/scd.scd2_apply's docstring claims the storage-agnostic
    logic equals the classic two-action Delta MERGE (close changed open
    rows, then insert new versions). This pins that equivalence whenever
    delta is present: same dim, same change set, row-identical result."""
    import datetime

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from bp_datawarehouse_ordersfact_spark.operators.scd import scd2_apply

    d = datetime.date
    eff = d(1996, 6, 1)
    dim = spark.createDataFrame(
        [
            Row(k=1, seg="A", valid_from=d(1990, 1, 1), valid_to=d(1994, 1, 1),
                is_current=0),
            Row(k=1, seg="B", valid_from=d(1994, 1, 1), valid_to=None, is_current=1),
            Row(k=2, seg="C", valid_from=d(1994, 1, 1), valid_to=None, is_current=1),
            Row(k=3, seg="D", valid_from=d(1994, 1, 1), valid_to=None, is_current=1),
        ],
        "k long, seg string, valid_from date, valid_to date, is_current int",
    )
    changes = spark.createDataFrame(
        [Row(k=1, seg="B2"), Row(k=2, seg="C"), Row(k=9, seg="N")],
        "k long, seg string",
    )

    expected = sorted(
        tuple(r) for r in scd2_apply(dim, changes, "k", ["seg"], eff).collect()
    )

    path = str(tmp_path / "dim_delta")
    dim.write.format("delta").save(path)
    # action 1: close the open row of every key whose attrs actually differ
    spark.sql(
        f"""
        MERGE INTO delta.`{path}` t
        USING {{chg}} c
        ON t.k = c.k AND t.is_current = 1
           AND NOT (t.seg <=> c.seg)
        WHEN MATCHED THEN UPDATE SET
          t.valid_to = DATE'1996-06-01', t.is_current = 0
        """,
        chg=changes,
    )
    # action 2: insert a new open version for changed keys and brand-new keys
    current = spark.read.format("delta").load(path)
    open_now = current.filter("is_current = 1").select("k", "seg")
    to_open = (
        changes.join(open_now, ["k", "seg"], "left_anti")
        .select(
            "k",
            "seg",
            F.lit(eff).alias("valid_from"),
            F.lit(None).cast("date").alias("valid_to"),
            F.lit(1).alias("is_current"),
        )
    )
    to_open.write.format("delta").mode("append").save(path)

    got = sorted(
        tuple(r) for r in spark.read.format("delta").load(path).collect()
    )
    assert got == expected
