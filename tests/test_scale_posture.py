"""Scale-posture tests: salting correctness and bucketed-join plan shape
— the two levers beyond broadcast that matter on a 1000-executor cluster.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, SparkSession
from pyspark.sql import functions as F

from bp_datawarehouse_ordersfact_spark.core.io import write_bucketed
from bp_datawarehouse_ordersfact_spark.operators.joins import salted_join


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    s = (
        SparkSession.builder.master("local[4]")
        .appName("scale")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.warehouse.dir", wh)
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


def test_salted_join_matches_plain_join(spark):
    # one pathologically hot key (90% of rows) + a long tail
    big = spark.createDataFrame(
        [Row(k="hot", v=i) for i in range(900)]
        + [Row(k=f"cold{i}", v=i) for i in range(100)]
    )
    small = spark.createDataFrame(
        [Row(k="hot", w="H")] + [Row(k=f"cold{i}", w=f"C{i}") for i in range(100)]
    )
    plain = big.join(small, "k").groupBy("k", "w").count()
    salted = salted_join(big, small, "k", salt_n=8).groupBy("k", "w").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_rows_preserved(spark):
    big = spark.createDataFrame([Row(k="a", v=1), Row(k="a", v=2), Row(k="b", v=3)])
    small = spark.createDataFrame([Row(k="a", w="x"), Row(k="b", w="y")])
    out = salted_join(big, small, "k", salt_n=4)
    assert out.count() == 3  # exactly one replicated match per left row


def test_bucketed_join_has_no_exchange(spark):
    """Two tables bucketed on the join key ⇒ the join plan contains NO
    shuffle exchange — the co-location was paid once at write time."""
    li = spark.range(0, 1000).select(
        F.col("id").alias("orderkey"), (F.col("id") % 7).alias("qty")
    )
    o = spark.range(0, 200).select(
        F.col("id").alias("orderkey"), (F.col("id") % 3).alias("status")
    )
    write_bucketed(li, "li_bucketed", ["orderkey"], n_buckets=8)
    write_bucketed(o, "o_bucketed", ["orderkey"], n_buckets=8)
    j = spark.table("li_bucketed").join(spark.table("o_bucketed"), "orderkey")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan  # bucketing removed the shuffle
    assert j.count() == 200
